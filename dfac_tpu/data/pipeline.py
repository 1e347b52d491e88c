"""Dense dataset container + static-shape batch pipeline.

Replaces the reference's DataLoader/Dataset stack (``src/dataset.py``,
``src/dataloaders.py``): instead of per-row Python objects fed by worker
subprocesses, a corpus is one dense ``[N, F, T]`` numpy array; batching is
index arithmetic; the time/feature axis swap, normalization, padding, and
augmentation all happen on device inside the jit'd step.

TPU contract: batch shapes are static. Training paths request
``pad_tail=False`` and receive the final partial batch at its TRUE size —
one extra compiled shape per corpus, but bit-exact reference semantics
(the reference trains on the smaller final batch: its BatchNorm statistics
and loss are computed over real rows only, ``src/train.py:31-91``).
Evaluation paths keep the padded tail (single compiled shape): BatchNorm
runs on running averages there, so pad rows only produce scores that the
weight mask discards — loss sums and EER are still exact.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import numpy as np

from dfac_tpu.io.pickle_io import align_labels, load_features, load_labels


@dataclasses.dataclass
class ArrayDataset:
    """A corpus: uttids + dense stored-orientation features [N, F, T]."""

    uttids: list[str]
    features: np.ndarray  # (N, F, T) float32, stored orientation
    labels: np.ndarray | None = None  # (N,) int32
    lengths: np.ndarray | None = None  # (N,) int32 valid time frames

    def __len__(self) -> int:
        return len(self.uttids)

    def filter_label(self, label: int) -> "ArrayDataset":
        """Bonafide-only view (reference ``BonafideDataset``,
        ``src/dataset_cae.py:57-86``).

        NOTE: the fancy-index below MATERIALIZES the filtered subset —
        on a memory-mapped npy-store corpus that pages the whole subset
        into RAM. For corpora whose filtered half exceeds host RAM,
        filter at conversion time instead:
        ``data_tools convert-to-npy --filter-label 1``."""
        if self.labels is None:
            raise ValueError("dataset has no labels")
        keep = np.nonzero(self.labels == label)[0]
        return ArrayDataset(
            uttids=[self.uttids[i] for i in keep],
            features=self.features[keep],
            labels=self.labels[keep],
            lengths=None if self.lengths is None else self.lengths[keep],
        )


def load_dataset(
    features_path: str, labels_path: str | None = None, strict: bool = True
) -> ArrayDataset:
    """Load features (+ optionally labels inner-merged on uttid, strict).

    ``features_path`` may be a reference-contract ``features.pkl`` or a
    converted memory-mapped ``.npy`` store directory
    (:mod:`dfac_tpu.io.npy_store`) — the latter streams batches with
    O(batch) resident memory for corpora too large for host RAM.

    Variable-length corpora come back padded with ``lengths`` populated, so
    masked pooling (the detector's StatsPool) sees the true frame counts.
    """
    from dfac_tpu.io.npy_store import is_npy_store, load_npy_dataset

    if is_npy_store(features_path):
        return load_npy_dataset(features_path, labels_path, strict=strict)
    uttids, feats, lengths = load_features(features_path, return_lengths=True)
    labels = None
    if labels_path is not None:
        luttids, raw = load_labels(labels_path)
        labels = align_labels(uttids, luttids, raw, strict=strict)
    return ArrayDataset(uttids=uttids, features=feats, labels=labels, lengths=lengths)


@dataclasses.dataclass
class Batch:
    """One static-shape step input (host numpy; jit moves it to device)."""

    features: np.ndarray  # (B, F, T) stored orientation
    labels: np.ndarray  # (B,) float32 (zeros if unlabeled)
    weights: np.ndarray  # (B,) float32; 0 marks padding rows
    index: np.ndarray  # (B,) int32 row ids into the dataset (-1 padding)


def pad_to_batch(arr: np.ndarray, batch_size: int, pad_value=0) -> np.ndarray:
    n = arr.shape[0]
    if n == batch_size:
        return arr
    pad = np.full((batch_size - n, *arr.shape[1:]), pad_value, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def batch_iterator(
    ds: ArrayDataset,
    batch_size: int,
    shuffle: bool = False,
    seed: int | None = None,
    drop_last: bool = False,
    pad_tail: bool = True,
) -> Iterator[Batch]:
    """Fixed-size batches. With ``pad_tail`` (eval paths) the final partial
    batch is zero-padded with weight 0 — one compiled shape. With
    ``pad_tail=False`` (training paths) it comes out at its true size — a
    second compiled shape, but no phantom rows in BatchNorm statistics."""
    n = len(ds)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    labels = ds.labels if ds.labels is not None else np.zeros(n, np.int32)

    for start in range(0, n, batch_size):
        idx = order[start : start + batch_size]
        if len(idx) < batch_size and drop_last:
            return
        if not shuffle:
            # basic slice: zero-copy view (memmap-backed corpora stay on
            # disk until the ingest cast pulls the pages, in parallel)
            feats = ds.features[start : start + len(idx)]
        elif (
            isinstance(ds.features, np.ndarray)
            and ds.features.dtype == np.float32
            and ds.features.flags.c_contiguous
        ):
            # shuffled row gather fanned over the native thread pool —
            # page-in of memmap-backed training corpora parallelizes
            from dfac_tpu.io.fastcast import gather_f32

            feats = gather_f32(ds.features, idx)
        else:
            feats = ds.features[idx]
        labs = labels[idx].astype(np.float32)
        w = np.ones(len(idx), np.float32)
        if not pad_tail:
            yield Batch(features=feats, labels=labs, weights=w, index=idx.astype(np.int32))
            continue
        yield Batch(
            features=pad_to_batch(feats, batch_size),
            labels=pad_to_batch(labs, batch_size),
            weights=pad_to_batch(w, batch_size),
            index=pad_to_batch(idx.astype(np.int32), batch_size, pad_value=-1),
        )


def num_batches(n: int, batch_size: int, drop_last: bool = False) -> int:
    return n // batch_size if drop_last else -(-n // batch_size)


def create_datasets(
    train_features: str,
    train_labels: str,
    dev_features: str,
    dev_labels: str,
    test_features: str | None = None,
    test_labels: str | None = None,
) -> tuple[ArrayDataset, ArrayDataset, ArrayDataset | None]:
    """Train/dev/test trio loader (reference ``create_dataloaders``,
    ``src/dataloaders.py:8-53`` — minus its labels-for-test bug: the test
    split is loaded label-free when no labels path is given)."""
    train = load_dataset(train_features, train_labels)
    dev = load_dataset(dev_features, dev_labels)
    test = load_dataset(test_features, test_labels) if test_features else None
    return train, dev, test
