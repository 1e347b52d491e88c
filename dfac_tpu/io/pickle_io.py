"""Pickled-DataFrame I/O contract.

The public data surface of the framework is identical to the reference
(``README.md:28-103``):

* ``features.pkl`` — pandas DataFrame, columns ``uttid`` (str) and
  ``features`` (per-row tensor of shape ``[180, 321]`` = [feature, time]).
* ``labels.pkl`` — DataFrame with ``uttid`` and ``label`` in {0, 1}
  (1 = bonafide, 0 = spoof/deepfake).
* ``prediction.pkl`` — DataFrame with ``uttid`` and ``predictions`` (float).

The reference stores ``torch.Tensor`` cells. This module can read those
**without importing torch**: a custom ``pickle.Unpickler`` maps
``torch._utils._rebuild_tensor_v2`` / ``torch.storage._load_from_bytes``
onto numpy reconstructions, parsing torch's legacy serialization format
directly (the same byte-level format that reference
``scripts/analyze_pickles.py`` inspects via ``pickletools``). If torch *is*
importable it is used only as a fallback for exotic pickles.

All loaders return dense, batch-ready numpy arrays (uttids list + a single
``[N, 180, 321]`` float32 array) — the TPU framework's datasets are plain
arrays, not per-row Python objects.
"""

from __future__ import annotations

import io as _io
import pickle
from typing import Any

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# Torch-free tensor reconstruction
# ---------------------------------------------------------------------------

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("bool"),
}

_MAGIC_NUMBER = 0x1950A86A20F9469CFC6C


class _NumpyStorage:
    """Stand-in for a torch storage: flat numpy array + element size."""

    __slots__ = ("array",)

    def __init__(self, array: np.ndarray):
        self.array = array


def _storage_dtype(typename: str) -> np.dtype:
    name = typename.split(".")[-1]
    if name == "BFloat16Storage":
        import ml_dtypes  # shipped with jax

        return np.dtype(ml_dtypes.bfloat16)
    if name not in _STORAGE_DTYPES:
        raise ValueError(f"Unsupported torch storage type: {typename}")
    return _STORAGE_DTYPES[name]


def _load_storage_from_bytes(data: bytes) -> _NumpyStorage:
    """Parse torch's *legacy* single-storage serialization format.

    Layout (what ``torch.storage._load_from_bytes`` consumes): four pickled
    values — magic number, protocol version, sys info, then the storage
    object whose ``persistent_id`` is ``('storage', type, key, location,
    numel)`` — followed by, per storage key, an int64 element count and the
    raw little-endian buffer.
    """
    f = _io.BytesIO(data)
    magic = pickle.load(f)
    if magic != _MAGIC_NUMBER:
        raise ValueError("not a torch legacy storage blob (bad magic)")
    pickle.load(f)  # protocol version
    pickle.load(f)  # sys info (little_endian flag etc.)

    storages: dict[str, tuple[np.dtype, str]] = {}

    def persistent_load(pid: Any):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unexpected persistent id {pid!r}")
        storage_type, key = pid[1], pid[2]
        typename = getattr(storage_type, "__name__", str(storage_type))
        dtype = _storage_dtype(typename)
        storages[key] = (dtype, typename)
        return key  # placeholder; resolved after the data section

    class _StorageUnpickler(pickle.Unpickler):
        def find_class(self, module: str, name: str):
            if module.startswith("torch"):
                # Storage *types* appear as globals; a lightweight marker
                # class carrying the name is all we need.
                return type(name, (), {"__module__": module})
            return super().find_class(module, name)

    unpickler = _StorageUnpickler(f)
    unpickler.persistent_load = persistent_load
    key = unpickler.load()
    keys = pickle.load(f)  # deserialized storage keys, in write order
    arrays: dict[str, np.ndarray] = {}
    for k in keys:
        (numel,) = np.frombuffer(f.read(8), dtype="<i8")
        dtype, _ = storages[k]
        buf = f.read(int(numel) * dtype.itemsize)
        arrays[k] = np.frombuffer(buf, dtype=dtype).copy()
    return _NumpyStorage(arrays[key])


def _rebuild_tensor_v2(
    storage, storage_offset, size, stride, requires_grad=False, backward_hooks=None, metadata=None
) -> np.ndarray:
    arr = storage.array
    itemsize = arr.dtype.itemsize
    strides_bytes = tuple(int(s) * itemsize for s in stride)
    out = np.lib.stride_tricks.as_strided(
        arr[int(storage_offset):], shape=tuple(int(s) for s in size), strides=strides_bytes
    )
    return np.ascontiguousarray(out)


def _rebuild_from_type_v2(func, new_type, args, state):
    return func(*args)


class _TorchFreeUnpickler(pickle.Unpickler):
    """Unpickler that reconstructs torch tensors as numpy arrays."""

    _TORCH_SHIMS = {
        ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
        ("torch._tensor", "_rebuild_from_type_v2"): _rebuild_from_type_v2,
        ("torch.storage", "_load_from_bytes"): _load_storage_from_bytes,
    }

    def find_class(self, module: str, name: str):
        shim = self._TORCH_SHIMS.get((module, name))
        if shim is not None:
            return shim
        if module == "torch" and name == "Tensor":
            return np.ndarray
        if module.startswith("torch"):
            # dtype globals (torch.float32 ...), device markers, storage types
            return type(name, (), {"__module__": module})
        return super().find_class(module, name)


def read_pickle_torchfree(path: str) -> Any:
    """``pd.read_pickle`` equivalent that never imports torch.

    torch.Tensor cells come back as numpy arrays of the same dtype/shape.
    """
    with open(path, "rb") as f:
        return _TorchFreeUnpickler(f).load()


def _read_pickle(path: str) -> Any:
    try:
        return read_pickle_torchfree(path)
    except Exception as torchfree_err:
        # Exotic pickle (e.g. new torch zipfile-format cells): fall back to a
        # real torch unpickle if the library is present. Chain the original
        # parse error — on a torch-free host the fallback dies with an
        # unhelpful "No module named 'torch'" that would otherwise mask the
        # real problem (e.g. a truncated file).
        try:
            return pd.read_pickle(path)
        except Exception as fallback_err:
            raise fallback_err from torchfree_err


# ---------------------------------------------------------------------------
# Dense loaders (the framework-facing API)
# ---------------------------------------------------------------------------


def _cell_to_numpy(cell: Any) -> np.ndarray:
    if isinstance(cell, np.ndarray):
        return cell
    if hasattr(cell, "detach"):  # torch.Tensor without importing torch
        return cell.detach().cpu().numpy()
    return np.asarray(cell)


def load_features(
    path: str, dtype=np.float32, return_lengths: bool = False
) -> tuple[list[str], np.ndarray] | tuple[list[str], np.ndarray, np.ndarray | None]:
    """Load ``features.pkl`` into ``(uttids, array[N, F, T])``.

    Stored orientation is ``[feature=180, time=321]`` (reference
    ``README.md:76``); no transpose is applied here — axis handling is an
    explicit, jit-compiled step downstream (:mod:`dfac_tpu.data.pipeline`).

    With ``return_lengths``, also returns the per-utterance true time
    lengths for variable-length corpora (None when all rows share a shape).
    """
    df = _read_pickle(path)
    if "uttid" not in df.columns or "features" not in df.columns:
        raise ValueError(f"{path}: features.pkl must have 'uttid' and 'features' columns")
    uttids = [str(u) for u in df["uttid"].tolist()]
    mats = [_cell_to_numpy(c).astype(dtype, copy=False) for c in df["features"]]
    shapes = {m.shape for m in mats}
    lengths = None
    if len(shapes) == 1:
        feats = np.stack(mats).astype(dtype, copy=False)
    else:
        # Variable-length corpus (dlqueen path): right-pad time to the max,
        # keeping the true lengths for masked pooling downstream.
        f_dim = mats[0].shape[0]
        t_max = max(m.shape[1] for m in mats)
        feats = np.zeros((len(mats), f_dim, t_max), dtype=dtype)
        lengths = np.zeros(len(mats), np.int32)
        for i, m in enumerate(mats):
            feats[i, :, : m.shape[1]] = m
            lengths[i] = m.shape[1]
    if return_lengths:
        return uttids, feats, lengths
    return uttids, feats


def load_feature_lengths(path: str) -> np.ndarray:
    """Per-utterance time lengths (for variable-length corpora)."""
    df = _read_pickle(path)
    return np.asarray([_cell_to_numpy(c).shape[1] for c in df["features"]], dtype=np.int32)


def load_labels(path: str) -> tuple[list[str], np.ndarray]:
    df = _read_pickle(path)
    if "uttid" not in df.columns or "label" not in df.columns:
        raise ValueError(f"{path}: labels.pkl must have 'uttid' and 'label' columns")
    return [str(u) for u in df["uttid"].tolist()], df["label"].to_numpy().astype(np.int32)


def load_predictions(path: str) -> tuple[list[str], np.ndarray]:
    df = _read_pickle(path)
    if "uttid" not in df.columns or "predictions" not in df.columns:
        raise ValueError(f"{path}: prediction.pkl must have 'uttid' and 'predictions' columns")
    return [str(u) for u in df["uttid"].tolist()], df["predictions"].to_numpy().astype(np.float64)


def align_labels(
    feat_uttids: list[str], label_uttids: list[str], labels: np.ndarray, strict: bool = True
) -> np.ndarray:
    """Inner-merge semantics of the reference datasets (``src/dataset.py:24-30``).

    Returns labels reordered to ``feat_uttids``. With ``strict`` (the
    ``verify_uttid_alignment`` contract, reference ``src/evaluation.py:107-124``)
    any mismatch between the two uttid sets raises.
    """
    if len(set(label_uttids)) != len(label_uttids):
        # dict(zip(...)) below would silently keep the LAST occurrence;
        # the reference inner-merge would instead duplicate feature rows
        # and fail its length check — surface the corrupt labels file here
        from collections import Counter

        dup, cnt = Counter(label_uttids).most_common(1)[0]
        raise ValueError(
            f"labels file has duplicated uttids (e.g. {dup!r} x{cnt}) — "
            "each uttid must carry exactly one label"
        )
    lab_map = dict(zip(label_uttids, labels.tolist()))
    missing = [u for u in feat_uttids if u not in lab_map]
    if strict and (missing or len(lab_map) != len(feat_uttids)):
        raise ValueError(
            f"uttid mismatch between features and labels: {len(missing)} features missing labels, "
            f"{len(lab_map)} labels for {len(feat_uttids)} features"
        )
    if missing:
        # even non-strict mode must return one label PER FEATURE ROW —
        # silently dropping rows would misalign the caller's un-filtered
        # feature tensor. Non-strict only tolerates EXTRA labels.
        raise ValueError(
            f"{len(missing)} feature uttids have no label (e.g. {missing[0]!r})"
        )
    return np.asarray([lab_map[u] for u in feat_uttids], dtype=np.int32)


def verify_uttid_alignment(features_path: str, labels_path: str) -> None:
    """Strict features/labels uttid agreement check; raises on any mismatch
    (reference ``src/evaluation.py:107-124``). Reads only the uttid columns."""
    fdf = _read_pickle(features_path)
    ldf = _read_pickle(labels_path)
    for df, name, col in ((fdf, "features.pkl", "uttid"), (ldf, "labels.pkl", "uttid")):
        if col not in df.columns:
            raise ValueError(f"{name} must contain '{col}'")
    fu, lu = set(fdf["uttid"]), set(ldf["uttid"])
    if fu != lu or len(fdf) != len(ldf):
        raise ValueError("uttid mismatch between features and labels")


def write_predictions(path: str, uttids: list[str], scores) -> pd.DataFrame:
    """Write ``prediction.pkl`` byte-compatible with the reference consumers
    (``scripts/evaluation.py`` / ``scripts/generate_submission.py``)."""
    scores = np.asarray(scores, dtype=np.float64).reshape(-1)
    if len(scores) != len(uttids):
        raise ValueError(f"{len(scores)} predictions for {len(uttids)} uttids")
    df = pd.DataFrame({"uttid": uttids, "predictions": scores})
    df.to_pickle(path)
    return df


def write_features(path: str, uttids: list[str], features: np.ndarray, tensor_format: str = "auto"):
    """Write a ``features.pkl`` (used by the LFCC extraction CLI).

    ``tensor_format='torch'`` stores torch.Tensor cells (bit-compatible with
    the reference corpus); ``'numpy'`` stores numpy arrays; ``'auto'`` uses
    torch when importable.
    """
    cells: list[Any]
    if tensor_format == "auto":
        try:
            import torch  # noqa: F401

            tensor_format = "torch"
        except ImportError:
            tensor_format = "numpy"
    if tensor_format == "torch":
        import torch

        cells = [torch.from_numpy(np.ascontiguousarray(m)) for m in features]
    else:
        cells = [np.ascontiguousarray(m) for m in features]
    pd.DataFrame({"uttid": uttids, "features": cells}).to_pickle(path)
