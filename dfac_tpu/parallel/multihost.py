"""Multi-host (multi-process) execution support.

TPU pod slices span multiple host processes, each owning a subset of chips
(e.g. a v5e-16 is 4 hosts x 4 chips). jit/GSPMD programs and ``shard_map``
are multi-process-transparent — every process runs the same Python and XLA
launches one global program over ICI/DCN — so this framework's single-
process multi-chip code (:mod:`dfac_tpu.parallel.mesh`,
:mod:`~dfac_tpu.parallel.data_parallel`, :mod:`~dfac_tpu.parallel.serving`)
already expresses the right computation on a multi-host mesh. What changes
is **array placement**: ``jax.device_put`` reaches only process-addressable
devices, so global arrays must be assembled from each process's local
contribution. This module holds that placement layer plus process-role
helpers (coordinator gating for checkpoint writes, per-process corpus row
ranges).

The reference has no distributed code of any kind (SURVEY.md §2
parallelism audit: no torch.distributed/NCCL/MPI anywhere) — this
subsystem is new TPU-first surface, designed per the scaling-book recipe:
pick a mesh, annotate shardings, let XLA insert the collectives.

Typical multi-host training setup::

    from dfac_tpu.parallel import mesh as pm, multihost as mh

    mh.initialize()                      # auto-detects on TPU pods
    mesh = pm.make_mesh()                # all global devices on 'data'
    state = pm.shard_train_state(state, mesh, placer=mh.put_global)
    lo, hi = mh.local_row_range(mesh, n_rows)     # rows THIS host loads
    feats = mh.batch_from_local(local_feats, mesh, global_rows=n_rows)
    ...                                  # steps/scans unchanged
    if mh.is_coordinator():
        save_checkpoint(...)

Verified end-to-end by ``tests/test_multihost.py``, which runs 2 processes
x 4 virtual CPU devices with gloo cross-process collectives and asserts
numeric parity of the GSPMD train step, the shard_map DP step, sharded
eval, and the folded fast serving chain against single-device references.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: Any | None = None,
) -> None:
    """Join the global JAX runtime (thin ``jax.distributed.initialize``).

    On TPU pod VMs all arguments auto-detect from the metadata server —
    call with no arguments. Explicit arguments support CPU/GPU clusters
    and tests. Must run before any other jax API touches the backend.
    """
    kwargs = {}
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(
        coordinator_address, num_processes, process_id, **kwargs
    )


def is_coordinator() -> bool:
    """True on exactly one process — gate checkpoint/report writes on it.

    Mirrors the reference's implicit single-process assumption that whoever
    trains also writes ``*_best.pt`` (/root/reference/src/train.py:549):
    on a pod, only the coordinator writes.
    """
    return jax.process_index() == 0


def put_global(x: Any, sharding: NamedSharding) -> jax.Array:
    """Place a host value onto a (possibly multi-host) sharding.

    Every process must hold the SAME full value (deterministic init,
    replicated normalizer stats, ...). Works for any sharding — including
    tensor-sharded params whose shards live on other hosts — because each
    process materializes only its addressable shards from the full value.
    Drop-in ``placer`` for :func:`dfac_tpu.parallel.mesh.shard_train_state`.
    """
    def host_value(v):
        # jit outputs on a multi-host mesh are not fully addressable; their
        # full value is still locally available when fully replicated (the
        # case for every re-replication in the per-epoch loops)
        if isinstance(v, jax.Array) and not v.is_fully_addressable:
            if not v.sharding.is_fully_replicated:
                raise ValueError(
                    f"put_global needs the full value on this host, but the "
                    f"input is non-addressable with sharding {v.sharding} — "
                    "all-gather it first (gather_rows)"
                )
            return np.asarray(v.addressable_data(0))
        return np.asarray(v)

    if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
        if not sharding.is_fully_replicated:
            raise ValueError("PRNG keys are only placed replicated")
        data = host_value(jax.random.key_data(x))
        impl = jax.random.key_impl(x)
        global_data = jax.make_array_from_callback(
            data.shape, sharding, lambda idx: data[idx]
        )
        return jax.random.wrap_key_data(global_data, impl=impl)
    x = host_value(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    """``put_global`` every leaf fully replicated over ``mesh``."""
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: put_global(x, rep), tree)


def local_row_range(mesh: Mesh, n_rows: int, axis: str = "data") -> tuple[int, int]:
    """The contiguous ``[lo, hi)`` slice of a batch-sharded global array's
    leading axis that THIS process's devices own — i.e. the corpus rows this
    host must load for :func:`batch_from_local`.

    Derived from the sharding's device→index map (no assumption about
    device enumeration order); raises if the process's rows are not one
    contiguous block (never the case for the meshes
    :func:`dfac_tpu.parallel.mesh.make_mesh` builds from the default
    process-major device order).
    """
    sh = NamedSharding(mesh, P(axis))
    index_map = sh.devices_indices_map((n_rows,))
    spans = sorted(
        {
            (idx[0].start or 0, n_rows if idx[0].stop is None else idx[0].stop)
            for d, idx in index_map.items()
            if d.process_index == jax.process_index()
        }
    )
    if not spans:
        raise ValueError(
            f"process {jax.process_index()} owns no devices of this mesh "
            f"({dict(mesh.shape)} over {mesh.size} of {len(jax.devices())} "
            "global devices) — in multihost mode the mesh must span every "
            "host's chips (e.g. leave --data-parallel at its global default)"
        )
    lo, hi = spans[0][0], spans[-1][1]
    covered = sum(b - a for a, b in spans)
    if covered != hi - lo:
        raise ValueError(f"process rows not contiguous: {spans}")
    return lo, hi


def batch_from_local(
    local_rows: np.ndarray,
    mesh: Mesh,
    axis: str = "data",
    global_rows: int | None = None,
) -> jax.Array:
    """Global leading-axis-sharded array from THIS process's local rows.

    ``local_rows`` must be exactly the :func:`local_row_range` slice of the
    global batch. The result carries ``NamedSharding(mesh, P(axis))`` and
    feeds the existing GSPMD/shard_map steps unchanged.
    """
    local_rows = np.asarray(local_rows)
    sh = NamedSharding(mesh, P(axis))
    global_shape = None
    if global_rows is not None:
        global_shape = (global_rows,) + local_rows.shape[1:]
    return jax.make_array_from_process_local_data(sh, local_rows, global_shape)


def stream_global_batches(
    feats_src: np.ndarray,
    row_arrays: tuple,
    order: np.ndarray,
    batch_size: int,
    mesh: Mesh,
):
    """Per-batch multi-host feeding: walk ``order`` in ``batch_size`` steps,
    gather THIS process's row slice of each global batch on the host
    (native threaded gather — a memmap corpus pages in only this host's
    rows), and yield ``(feats, *rows)`` as global batch-sharded arrays.

    Host gather of batch k+1 runs in a prefetch thread overlapping the
    device's work on batch k; device placement happens at the consumer
    (mirrors :func:`dfac_tpu.train.chunked.stream_chunks`). Every process
    must iterate the SAME ``order`` (seeded identically).
    """
    from dfac_tpu.io.prefetch import prefetched

    n = len(order)
    ranges: dict[int, tuple[int, int]] = {}

    def host_side():
        from dfac_tpu.io.fastcast import gather_f32

        native = (
            isinstance(feats_src, np.ndarray)
            and feats_src.dtype == np.float32
            and feats_src.flags.c_contiguous
        )
        for start in range(0, n, batch_size):
            rows = order[start : start + batch_size]
            b = len(rows)
            if b not in ranges:
                ranges[b] = local_row_range(mesh, b)
            lo, hi = ranges[b]
            local = rows[lo:hi]
            feats = (
                gather_f32(feats_src, local) if native
                else np.asarray(feats_src[local])
            )
            yield b, feats, tuple(np.asarray(r)[local] for r in row_arrays)

    for b, feats, rows in prefetched(host_side()):
        yield (
            batch_from_local(feats, mesh, global_rows=b),
            *(batch_from_local(r, mesh, global_rows=b) for r in rows),
        )


def fetch_replicated(x: jax.Array) -> np.ndarray:
    """Host copy of a fully-replicated global array (reductions, scores with
    replicated out_shardings). Every process gets the full value from its
    own shard — no cross-host fetch."""
    if not x.sharding.is_fully_replicated:
        raise ValueError(
            f"array is {x.sharding}, not fully replicated — "
            "request replicated out_shardings or all-gather first"
        )
    return np.asarray(x.addressable_data(0))


def gather_rows(x: jax.Array) -> np.ndarray:
    """Host copy of a leading-axis-sharded global array on EVERY process
    (cross-host allgather) — e.g. sharded corpus scores that a CLI must
    write to one file. For fully-replicated arrays prefer
    :func:`fetch_replicated` (no collective)."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    if x.sharding.is_fully_replicated:
        return fetch_replicated(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def broadcast_pyobj(obj: Any) -> Any:
    """Broadcast an arbitrary picklable object from the coordinator to every
    process. Non-coordinators' ``obj`` is ignored (pass ``None``).

    Used for resume: checkpoints live on the coordinator's filesystem only
    (the non-coordinators never write them), so the coordinator reads the
    file once and the payload rides the distributed runtime — two
    fixed-shape broadcasts (length, then bytes), since
    ``broadcast_one_to_all`` needs matching shapes on every process.
    """
    import pickle

    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return obj
    if is_coordinator():
        payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    else:
        payload = np.zeros(0, np.uint8)
    n = int(multihost_utils.broadcast_one_to_all(np.int64(len(payload))))
    buf = np.zeros(n, np.uint8)
    if is_coordinator():
        buf[:] = payload
    buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return pickle.loads(buf.tobytes())


def sync(name: str = "dfac") -> None:
    """Barrier across all processes (e.g. before the coordinator reads a
    file another process wrote)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
