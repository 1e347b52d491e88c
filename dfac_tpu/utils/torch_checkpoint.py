"""Torch-free reader for ``torch.save`` checkpoint files.

Supports both on-disk formats without importing torch:

* **zipfile format** (torch >= 1.6 default): a zip archive holding
  ``data.pkl`` — a pickle whose tensors are persistent-id references
  ``('storage', type, key, location, numel)`` — plus one raw little-endian
  buffer per storage key under ``<name>/data/<key>``.
* **legacy format**: the same byte layout parsed by
  :func:`dfac_tpu.io.pickle_io._load_storage_from_bytes`.

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


def load_torch_checkpoint(path: str) -> Any:
    """Load a ``.pt`` file as a pytree of numpy arrays, torch-free."""
    if zipfile.is_zipfile(path):
        return _load_zip_checkpoint(path)
    with open(path, "rb") as f:
        data = f.read()
    # Legacy torch.save: magic pickle + storages appendix.
    return _load_storage_from_bytes(data).array  # pragma: no cover - rare path


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
