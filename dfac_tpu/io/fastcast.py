"""ctypes loader for the native host-ingest kernels (``fastcast.cpp``).

The serving ingest path casts float32 feature rows to bfloat16 on the
host before the async device upload (``models/fast_infer._ingest`` —
bit-identical to casting on device, half the bytes over the link). numpy's
ml_dtypes astype is single-threaded; the native kernel fans the cast over
a thread pool and reads straight from the memory-mapped corpus, so page
faults (disk read) parallelize with conversion.

Build/load strategy (robust against the classic native-extension traps):

* the shared object is built lazily with g++ on first use, into a cache
  directory OUTSIDE the package tree (``$DFAC_TPU_NATIVE_CACHE``, then
  ``~/.cache/dfac_tpu``, then a per-uid temp dir whose OWNERSHIP is
  verified before use — a world-writable fixed /tmp path would let
  another local user pre-plant a library);
* the filename embeds a hash of the source text and compile flags, so a
  source edit or flag change can never pick up a stale binary (no mtime
  heuristics), and binaries from different versions coexist;
* the compile writes to a pid-suffixed temp name and ``os.replace``s it
  into place — concurrent loaders either see nothing (and build their
  own) or a complete file, never a half-written one;
* default flags are portable (``-O3``, no ``-march=native``): the cast is
  memory-bound, ISA-specific vectorization buys little, and a binary that
  outlives the build host must not SIGILL elsewhere. Opt in to stronger
  flags via ``DFAC_TPU_NATIVE_CFLAGS``.

Every caller falls back to the numpy path when no compiler is available —
the native library is a throughput optimization, never a correctness
dependency. Bit-exactness with ml_dtypes' round-to-nearest-even is
test-enforced (tests/test_fastcast.py).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fastcast.cpp")
_ABI = 2
_BASE_FLAGS = ["-O3", "-shared", "-fPIC", "-pthread"]

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _flags() -> list[str]:
    extra = os.environ.get("DFAC_TPU_NATIVE_CFLAGS", "")
    return _BASE_FLAGS + (extra.split() if extra else [])


def _so_name() -> str:
    with open(_SRC, "rb") as f:
        src = f.read()
    h = hashlib.sha256(src + " ".join(_flags()).encode()).hexdigest()[:12]
    return f"_dfac_fastcast_{h}.so"


def _cache_dirs():
    env = os.environ.get("DFAC_TPU_NATIVE_CACHE")
    if env:
        yield env
    yield os.path.join(os.path.expanduser("~"), ".cache", "dfac_tpu")
    yield os.path.join(tempfile.gettempdir(), f"dfac_tpu_native_uid{os.getuid()}")


def _dir_usable(d: str) -> bool:
    try:
        os.makedirs(d, exist_ok=True)
        st = os.stat(d)
    except OSError:
        return False
    # refuse a cache dir owned by someone else (pre-planted library risk)
    return st.st_uid == os.getuid()


def _build(so_path: str) -> bool:
    tmp = f"{so_path}.tmp{os.getpid()}"
    cmd = ["g++", *_flags(), "-o", tmp, _SRC]
    try:
        proc = subprocess.run(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, timeout=120
        )
        if proc.returncode != 0 or not os.path.exists(tmp):
            return False
        os.replace(tmp, so_path)  # atomic: readers never see a partial file
        return True
    except (OSError, subprocess.TimeoutExpired):
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def _bind(lib) -> bool:
    try:
        if lib.dfac_native_abi_version() != _ABI:
            return False
        lib.dfac_cast_f32_bf16.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
        ]
        lib.dfac_gather_cast_f32_bf16.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int,
        ]
        lib.dfac_gather_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int,
        ]
        lib.dfac_quant_i8.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.dfac_gather_quant_i8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        return True
    except AttributeError:
        return False


def load():
    """Return the bound native library, building it on first use.

    Returns None (and remembers the failure) when no compiler/cache dir
    is usable — callers then take the numpy fallback.
    """
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if os.environ.get("DFAC_TPU_NO_NATIVE") or not os.path.exists(_SRC):
            _lib_failed = True
            return None
        name = _so_name()
        for d in _cache_dirs():
            if not _dir_usable(d):
                continue
            so_path = os.path.join(d, name)
            if not os.path.exists(so_path) and not _build(so_path):
                continue
            try:
                lib = ctypes.CDLL(so_path)
            except OSError:
                continue
            if _bind(lib):
                _lib = lib
                return _lib
        _lib_failed = True
        return None


def native_available() -> bool:
    return load() is not None


def default_threads() -> int:
    env = os.environ.get("DFAC_TPU_INGEST_THREADS")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            import logging

            logging.getLogger(__name__).warning(
                "DFAC_TPU_INGEST_THREADS=%r is not an integer; using the "
                "default thread count", env,
            )
    # a floor of 8 beats min(8, cpu_count): the cast is memory/page-fault
    # bound, so extra threads hide stalls even under a 1-core cgroup quota
    # (measured 4.5 vs 3.8 GB/s on the 1-core CI host; numpy: 3.0). Hosts
    # with more cores scale UP with them — pod hosts have dozens, and the
    # cast is the serving pipeline's host-side floor.
    return max(8, os.cpu_count() or 1)


def _checked_idx(idx, n_rows: int) -> np.ndarray:
    """Validate gather indices before handing raw pointers to C — the
    native kernel has no bounds checks (numpy's fancy-index would raise;
    the kernel would read out of bounds)."""
    idx64 = np.ascontiguousarray(np.asarray(idx, dtype=np.int64))
    if len(idx64) and (idx64.min() < 0 or idx64.max() >= n_rows):
        bad = idx64[(idx64 < 0) | (idx64 >= n_rows)][0]
        raise IndexError(
            f"gather index {bad} out of bounds for {n_rows} rows "
            "(negative indices are not supported on the native path)"
        )
    return idx64


def cast_bf16(arr: np.ndarray, threads: int | None = None) -> np.ndarray:
    """float32 array -> bfloat16 (ml_dtypes) array, multithreaded.

    ``arr`` may be a memmap view; rows are pulled and converted inside the
    worker threads. Non-f32 / non-contiguous inputs and builds without a
    compiler fall back to numpy's (single-threaded, identical-bits) astype.
    """
    import ml_dtypes

    lib = load()
    a = np.asarray(arr)
    if lib is None or a.dtype != np.float32 or not a.flags.c_contiguous:
        return a.astype(ml_dtypes.bfloat16)
    out = np.empty(a.shape, dtype=ml_dtypes.bfloat16)
    lib.dfac_cast_f32_bf16(
        a.ctypes.data, out.ctypes.data, a.size,
        threads if threads is not None else default_threads(),
    )
    return out


def gather_cast_bf16(
    src: np.ndarray, idx: np.ndarray, threads: int | None = None
) -> np.ndarray:
    """``bf16(src[idx])`` without the float32 intermediate.

    ``src`` is (N, ...) float32 (typically the memory-mapped corpus),
    ``idx`` any int row indices. Falls back to fancy-index + astype.
    """
    import ml_dtypes

    lib = load()
    src = np.asarray(src) if not isinstance(src, np.ndarray) else src
    if (
        lib is None
        or src.dtype != np.float32
        or not src.flags.c_contiguous
        or src.ndim < 1
    ):
        return np.asarray(src[np.asarray(idx)]).astype(ml_dtypes.bfloat16)
    idx64 = _checked_idx(idx, len(src))
    row_elems = int(np.prod(src.shape[1:], dtype=np.int64)) if src.ndim > 1 else 1
    out = np.empty((len(idx64),) + src.shape[1:], dtype=ml_dtypes.bfloat16)
    lib.dfac_gather_cast_f32_bf16(
        src.ctypes.data, idx64.ctypes.data, len(idx64), row_elems,
        out.ctypes.data,
        threads if threads is not None else default_threads(),
    )
    return out


def _quant_i8_numpy(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Reference int8 quantize, bit-exact with the native kernel: same f32
    divide and round-to-nearest-even (np.rint == C nearbyint under the
    default rounding mode)."""
    a = np.asarray(a, dtype=np.float32)
    amax = np.max(np.abs(a), axis=-1)
    scales = np.where(amax > 0, amax / np.float32(127.0), np.float32(1.0)).astype(
        np.float32
    )
    q = np.clip(np.rint(a / scales[..., None]), -127, 127).astype(np.int8)
    return q, scales


def quant_i8(
    arr: np.ndarray, threads: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-group int8 quantization of feature rows.

    ``arr`` is (..., G) float32 (typically (B, F, T): each feature dim's T
    contiguous frames form one scale group); returns ``(q, scales)`` with
    ``q`` int8 of ``arr``'s shape and ``scales`` float32 of shape
    ``arr.shape[:-1]`` such that ``q * scales[..., None] ~= arr`` with
    ~1/254 of the group's max-abs as the quantization step. Halves the
    host->device bytes again vs bf16 — the serving ingest path for
    transfer-bound links (``dfac-predict --fast --ingest-int8``). Groups
    whose max-abs is 0 get scale 1.0 (all-zero q). Native multithreaded
    kernel with a bit-exact numpy fallback.
    """
    a = np.asarray(arr)
    lib = load()
    if (
        lib is None
        or a.dtype != np.float32
        or not a.flags.c_contiguous
        or a.ndim < 2
    ):
        return _quant_i8_numpy(a)
    group_elems = a.shape[-1]
    n_groups = a.shape[-2]
    n_rows = int(np.prod(a.shape[:-2], dtype=np.int64)) if a.ndim > 2 else 1
    q = np.empty(a.shape, dtype=np.int8)
    scales = np.empty(a.shape[:-1], dtype=np.float32)
    lib.dfac_quant_i8(
        a.ctypes.data, n_rows, n_groups, group_elems,
        q.ctypes.data, scales.ctypes.data,
        threads if threads is not None else default_threads(),
    )
    return q, scales


def gather_quant_i8(
    src: np.ndarray, idx: np.ndarray, threads: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """``quant_i8(src[idx])`` without the float32 intermediate — shuffled
    batch assembly straight off the memory-mapped corpus. ``src`` is
    (N, G, T) float32; returns ``(q (len(idx), G, T) int8, scales
    (len(idx), G) f32)``."""
    lib = load()
    src = np.asarray(src) if not isinstance(src, np.ndarray) else src
    if (
        lib is None
        or src.dtype != np.float32
        or not src.flags.c_contiguous
        or src.ndim < 3
    ):
        return _quant_i8_numpy(np.asarray(src[np.asarray(idx)]))
    idx64 = _checked_idx(idx, len(src))
    n_groups = int(np.prod(src.shape[1:-1], dtype=np.int64))
    group_elems = src.shape[-1]
    q = np.empty((len(idx64),) + src.shape[1:], dtype=np.int8)
    scales = np.empty((len(idx64),) + src.shape[1:-1], dtype=np.float32)
    lib.dfac_gather_quant_i8(
        src.ctypes.data, idx64.ctypes.data, len(idx64), n_groups, group_elems,
        q.ctypes.data, scales.ctypes.data,
        threads if threads is not None else default_threads(),
    )
    return q, scales


def gather_f32(
    src: np.ndarray, idx: np.ndarray, threads: int | None = None
) -> np.ndarray:
    """``src[idx]`` as a parallel row copy (page faults spread over the
    pool) — the non-bf16 ingest path's analogue of :func:`gather_cast_bf16`."""
    lib = load()
    if lib is None or src.dtype != np.float32 or not src.flags.c_contiguous:
        return np.asarray(src[np.asarray(idx)], dtype=np.float32)
    idx64 = _checked_idx(idx, len(src))
    row_elems = int(np.prod(src.shape[1:], dtype=np.int64)) if src.ndim > 1 else 1
    out = np.empty((len(idx64),) + src.shape[1:], dtype=np.float32)
    lib.dfac_gather_f32(
        src.ctypes.data, idx64.ctypes.data, len(idx64), row_elems,
        out.ctypes.data,
        threads if threads is not None else default_threads(),
    )
    return out
