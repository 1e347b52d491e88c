"""Memory-mapped .npy corpus store: conversion, auto-detection, streaming.

The reference's pickle contract forces whole-corpus RAM residency; the
store (dfac_tpu/io/npy_store.py) streams from disk with O(batch) resident
memory while keeping every consumer (load_dataset, batch iterators, CLIs)
unchanged.
"""

import numpy as np
import pytest

from dfac_tpu.data.pipeline import ArrayDataset, batch_iterator, load_dataset
from dfac_tpu.io.npy_store import is_npy_store, load_npy_dataset, save_npy_dataset


def _ds(rng, n=10, f=6, t=8, labeled=True):
    labels = (np.arange(n) % 2).astype(np.int32) if labeled else None
    feats = rng.normal(size=(n, f, t)).astype(np.float32)
    return ArrayDataset([f"u{i:03d}" for i in range(n)], feats, labels)


def test_roundtrip_and_mmap(tmp_path, rng):
    ds = _ds(rng)
    out = str(tmp_path / "store")
    save_npy_dataset(ds, out)
    assert is_npy_store(out)

    back = load_npy_dataset(out)
    assert back.uttids == ds.uttids
    np.testing.assert_array_equal(np.asarray(back.features), ds.features)
    np.testing.assert_array_equal(back.labels, ds.labels)
    # memory-mapped: the features array is backed by the file, not RAM
    assert isinstance(back.features, np.memmap) or back.features.base is not None


def test_load_dataset_autodetects_store(tmp_path, rng):
    ds = _ds(rng)
    out = str(tmp_path / "store")
    save_npy_dataset(ds, out)
    back = load_dataset(out)
    np.testing.assert_array_equal(np.asarray(back.features), ds.features)
    np.testing.assert_array_equal(back.labels, ds.labels)


def test_store_with_external_labels_merges_on_uttid(tmp_path, rng):
    import pandas as pd

    ds = _ds(rng, labeled=False)
    out = str(tmp_path / "store")
    save_npy_dataset(ds, out)
    # labels.pkl in shuffled uttid order: the strict inner merge must align
    perm = np.random.default_rng(1).permutation(len(ds))
    labels = (np.arange(len(ds)) % 2).astype(np.int64)
    pd.DataFrame(
        {"uttid": [ds.uttids[i] for i in perm], "label": labels[perm]}
    ).to_pickle(tmp_path / "labels.pkl")

    back = load_dataset(out, str(tmp_path / "labels.pkl"))
    np.testing.assert_array_equal(back.labels, labels)


def test_batch_iterator_streams_from_store(tmp_path, rng):
    ds = _ds(rng, n=11)
    out = str(tmp_path / "store")
    save_npy_dataset(ds, out)
    back = load_dataset(out)

    rows = []
    for b in batch_iterator(back, 4, pad_tail=False):
        assert b.features.dtype == np.float32
        rows.append(b.index)
    assert sorted(np.concatenate(rows).tolist()) == list(range(11))

    # label-filtered views of a memmapped corpus materialize correctly
    bona = back.filter_label(1)
    assert len(bona) == 5
    np.testing.assert_array_equal(
        np.asarray(bona.features), ds.features[ds.labels == 1]
    )


def test_convert_cli_and_predict_on_store(tmp_path, rng, capsys):
    """dfac data_tools convert-to-npy + training/predicting directly off the
    converted directory."""
    torch = pytest.importorskip("torch")
    import pandas as pd

    from dfac_tpu.cli import data_tools

    n, f, t = 12, 6, 8
    ds = _ds(rng, n=n, f=f, t=t)
    pd.DataFrame({
        "uttid": ds.uttids,
        "features": [torch.from_numpy(ds.features[i].copy()) for i in range(n)],
    }).to_pickle(tmp_path / "features.pkl")
    pd.DataFrame({"uttid": ds.uttids, "label": ds.labels.astype(np.int64)}).to_pickle(
        tmp_path / "labels.pkl"
    )

    out = str(tmp_path / "store")
    data_tools.main([
        "convert-to-npy", str(tmp_path / "features.pkl"), out,
        "--labels", str(tmp_path / "labels.pkl"),
    ])
    assert "12 utterances (labeled)" in capsys.readouterr().out

    back = load_dataset(out)
    np.testing.assert_array_equal(np.asarray(back.features), ds.features)
    np.testing.assert_array_equal(back.labels, ds.labels)
