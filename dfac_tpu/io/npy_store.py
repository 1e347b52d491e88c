"""Memory-mapped corpus store for production-scale corpora.

The reference's data contract is a pickled DataFrame whose every cell is a
torch.Tensor (``/root/reference/README.md:28-103``) — pickle cannot be
memory-mapped, so loading forces the entire corpus into host RAM
(a 100k-utterance corpus at the production [180, 321] geometry is ~23 GB).
This store converts a corpus ONCE into a directory of plain ``.npy``
arrays; afterwards :func:`load_npy_dataset` opens the feature tensor with
``np.memmap`` semantics (``np.load(..., mmap_mode="r")``), so batch
iterators stream slices from the page cache with O(batch) resident memory.

Layout of ``<dir>/``:

* ``features.npy`` — (N, F, T) float32 (padded to the corpus max T)
* ``uttids.npy``   — (N,) unicode
* ``labels.npy``   — (N,) int32 (absent for unlabeled corpora)
* ``lengths.npy``  — (N,) int32 true frame counts (absent if fixed-length)

``data.pipeline.load_dataset`` auto-detects a directory path and routes
here, so every CLI accepts either a ``features.pkl`` or a converted store
interchangeably. ``dfac_tpu.cli.data_tools convert-to-npy`` performs the
conversion.
"""

from __future__ import annotations

import os

import numpy as np

FEATURES = "features.npy"
UTTIDS = "uttids.npy"
LABELS = "labels.npy"
LENGTHS = "lengths.npy"


def save_npy_dataset(ds, out_dir: str) -> None:
    """Write an :class:`~dfac_tpu.data.pipeline.ArrayDataset` as a store."""
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, FEATURES), np.ascontiguousarray(ds.features))
    np.save(os.path.join(out_dir, UTTIDS), np.asarray(ds.uttids))
    if ds.labels is not None:
        np.save(os.path.join(out_dir, LABELS), np.asarray(ds.labels, np.int32))
    if ds.lengths is not None:
        np.save(os.path.join(out_dir, LENGTHS), np.asarray(ds.lengths, np.int32))


def is_npy_store(path: str) -> bool:
    return os.path.isdir(path) and os.path.exists(os.path.join(path, FEATURES))


def load_npy_dataset(
    path: str, labels_path: str | None = None, mmap: bool = True, strict: bool = True
):
    """Open a store; features stay memory-mapped (read-only) when ``mmap``.

    ``labels_path`` may name a second store directory or a ``labels.pkl``
    to inner-merge on uttid (strict, like the pickle path).
    """
    from dfac_tpu.data.pipeline import ArrayDataset

    feats = np.load(os.path.join(path, FEATURES), mmap_mode="r" if mmap else None)
    uttids = [str(u) for u in np.load(os.path.join(path, UTTIDS))]
    labels = None
    lengths = None
    lp = os.path.join(path, LENGTHS)
    if os.path.exists(lp):
        lengths = np.load(lp)
    own_labels = os.path.join(path, LABELS)
    if labels_path is not None:
        if is_npy_store(labels_path):
            luttids = [str(u) for u in np.load(os.path.join(labels_path, UTTIDS))]
            raw = np.load(os.path.join(labels_path, LABELS))
        else:
            from dfac_tpu.io.pickle_io import load_labels

            luttids, raw = load_labels(labels_path)
        from dfac_tpu.data.pipeline import align_labels

        labels = align_labels(uttids, luttids, raw, strict=strict)
    elif os.path.exists(own_labels):
        labels = np.load(own_labels)
    return ArrayDataset(uttids=uttids, features=feats, labels=labels, lengths=lengths)
