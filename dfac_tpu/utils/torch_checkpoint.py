"""Torch-free reader for ``torch.save`` checkpoint files.

Supports both on-disk formats without importing torch:

* **zipfile format** (torch >= 1.6 default): a zip archive holding
  ``data.pkl`` — a pickle whose tensors are persistent-id references
  ``('storage', type, key, location, numel)`` — plus one raw little-endian
  buffer per storage key under ``<name>/data/<key>``.
* **legacy format** (``_use_new_zipfile_serialization=False``): magic /
  protocol / sys-info pickles, the main object pickle (tensors appear as
  rebuild calls over persistent-id storage references), a pickled list of
  storage keys, then per key an int64 element count and the raw
  little-endian buffer. Storage bytes follow the object pickle, so tensor
  rebuilds are deferred and resolved after the data section is read.

Used to import the reference project's ``*_best.pt`` checkpoints
(``src/training/checkpoint.py:42-71`` dicts or raw state_dicts) into the
flax model zoo via :mod:`dfac_tpu.utils.torch_import`.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any

import numpy as np

from dfac_tpu.io.pickle_io import (
    _MAGIC_NUMBER,
    _NumpyStorage,
    _load_storage_from_bytes,
    _rebuild_from_type_v2,
    _rebuild_tensor_v2,
    _storage_dtype,
)


class _AttrDict(dict):
    """dict that tolerates pickle BUILD state (torch state_dicts are
    OrderedDicts carrying a ``_metadata`` attribute)."""


def _load_zip_checkpoint(path: str) -> Any:
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("data.pkl"))
        prefix = pkl_name[: -len("data.pkl")]

        def persistent_load(pid):
            if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
                raise pickle.UnpicklingError(f"unexpected persistent id {pid!r}")
            storage_type, key = pid[1], pid[2]
            typename = getattr(storage_type, "__name__", str(storage_type))
            dtype = _storage_dtype(typename)
            raw = zf.read(f"{prefix}data/{key}")
            return _NumpyStorage(np.frombuffer(raw, dtype=dtype).copy())

        class _Unpickler(pickle.Unpickler):
            def find_class(self, module: str, name: str):
                shims = {
                    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
                    ("torch._tensor", "_rebuild_from_type_v2"): _rebuild_from_type_v2,
                    ("torch.storage", "_load_from_bytes"): _load_storage_from_bytes,
                    ("torch.serialization", "_get_layout"): lambda name: None,
                    ("collections", "OrderedDict"): _AttrDict,
                }
                if (module, name) in shims:
                    return shims[(module, name)]
                if module.startswith("torch"):
                    return type(name, (), {"__module__": module})
                return super().find_class(module, name)

        up = _Unpickler(io.BytesIO(zf.read(pkl_name)))
        up.persistent_load = persistent_load
        return up.load()


class _LazyStorage:
    """Storage reference whose bytes arrive after the object pickle."""

    def __init__(self, dtype: np.dtype):
        self.dtype = dtype
        self.array: np.ndarray | None = None


class _LazyTensor:
    """Deferred ``_rebuild_tensor_v2``: resolved once storages are read."""

    def __init__(self, storage, offset, size, stride):
        self.storage, self.offset, self.size, self.stride = storage, offset, size, stride

    def resolve(self) -> np.ndarray:
        return _rebuild_tensor_v2(self.storage, self.offset, self.size, self.stride)


def _resolve_lazy(obj: Any) -> Any:
    if isinstance(obj, _LazyTensor):
        return obj.resolve()
    if isinstance(obj, dict):
        return type(obj)((k, _resolve_lazy(v)) for k, v in obj.items())
    if isinstance(obj, tuple):
        resolved = [_resolve_lazy(v) for v in obj]
        if type(obj) is tuple:
            return tuple(resolved)
        # tuple subclasses: namedtuples take positional fields; Size-style
        # subclasses take a single iterable — try both before degrading
        try:
            return type(obj)(*resolved)
        except TypeError:
            try:
                return type(obj)(resolved)
            except TypeError:
                return tuple(resolved)
    if isinstance(obj, list):
        return type(obj)(_resolve_lazy(v) for v in obj)
    return obj


def _load_legacy_checkpoint(data: bytes) -> Any:
    f = io.BytesIO(data)
    magic = pickle.load(f)
    if magic != _MAGIC_NUMBER:
        raise ValueError("not a torch checkpoint (legacy magic mismatch)")
    pickle.load(f)  # protocol version
    pickle.load(f)  # sys info

    storages: dict[Any, _LazyStorage] = {}

    def persistent_load(pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unexpected persistent id {pid!r}")
        storage_type, key = pid[1], pid[2]
        if key not in storages:
            typename = getattr(storage_type, "__name__", str(storage_type))
            storages[key] = _LazyStorage(_storage_dtype(typename))
        return storages[key]

    def rebuild_lazy(storage, offset, size, stride, *_args, **_kw):
        return _LazyTensor(storage, offset, size, stride)

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module: str, name: str):
            shims = {
                ("torch._utils", "_rebuild_tensor_v2"): rebuild_lazy,
                ("torch._tensor", "_rebuild_from_type_v2"):
                    lambda func, new_type, args, state: func(*args),
                ("torch.storage", "_load_from_bytes"): _load_storage_from_bytes,
                ("torch.serialization", "_get_layout"): lambda name: None,
                ("collections", "OrderedDict"): _AttrDict,
            }
            if (module, name) in shims:
                return shims[(module, name)]
            if module.startswith("torch"):
                return type(name, (), {"__module__": module})
            return super().find_class(module, name)

    up = _Unpickler(f)
    up.persistent_load = persistent_load
    obj = up.load()
    keys = pickle.load(f)  # storage keys in write order
    for k in keys:
        (numel,) = np.frombuffer(f.read(8), dtype="<i8")
        st = storages[k]
        st.array = np.frombuffer(
            f.read(int(numel) * st.dtype.itemsize), dtype=st.dtype
        ).copy()
    return _resolve_lazy(obj)


def load_torch_checkpoint(path: str) -> Any:
    """Load a ``.pt`` file as a pytree of numpy arrays, torch-free."""
    if zipfile.is_zipfile(path):
        return _load_zip_checkpoint(path)
    with open(path, "rb") as f:
        data = f.read()
    return _load_legacy_checkpoint(data)


def extract_state_dict(ckpt: Any) -> dict[str, np.ndarray]:
    """Accept both wrapped {model_state_dict: ...} checkpoints and raw
    state_dicts (reference ``src/evaluation.py:197-200`` tolerance rule)."""
    if isinstance(ckpt, dict):
        for key in ("model_state_dict", "model_state", "state_dict"):
            if key in ckpt:
                ckpt = ckpt[key]
                break
    if not isinstance(ckpt, dict):
        raise ValueError("unrecognized checkpoint structure")
    return {k: np.asarray(v) for k, v in ckpt.items() if isinstance(v, np.ndarray)}
