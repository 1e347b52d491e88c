"""Shared machinery for chunked streaming training.

All three trainers (supervised ``train/loop.py``, CAE ``train/cae_loop.py``,
detector ``train/detector_loop.py``) stream larger-than-HBM corpora the same
way: the epoch's shuffled/sampled row order is partitioned into chunks of
``G`` batches, the host gathers each chunk with the native threaded kernels
(:mod:`dfac_tpu.io.fastcast`), uploads it (pre-sharded over the mesh's
'data' axis under data parallelism) while the device scans the previous
chunk, and the final partial batch runs at its TRUE size so BatchNorm
statistics stay clean. This module holds the one copy of that logic; the
trainers keep only their step arity and accounting.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def check_dp_tail(n: int, batch_size: int, dp: int, what: str) -> None:
    """Every batch — including the epoch tail — must divide over shards.
    ``what`` names the caller's mode (e.g. "chunked training", "multihost
    CAE training") so the error points at the feature actually in use."""
    if dp > 1 and (n % batch_size) % dp != 0:
        raise ValueError(
            f"data-parallel {what} needs every batch (including the "
            f"{n % batch_size}-row tail of the {n}-sample epoch) to divide "
            f"over {dp} shards — pick a batch_size with tail % data_parallel == 0"
        )


def chunk_shardings(mesh):
    """(chunk, tail) NamedShardings for a 'data'-axis mesh, or (None, None)."""
    if mesh is None:
        return None, None
    from jax.sharding import NamedSharding, PartitionSpec

    return (
        NamedSharding(mesh, PartitionSpec(None, "data")),  # (g, B, ...) on B
        NamedSharding(mesh, PartitionSpec("data")),  # (tail, ...) on rows
    )


INGEST_MODES = ("f32", "bf16", "int8")


def stream_chunks(
    feats_src: np.ndarray,
    row_arrays: Sequence[np.ndarray],
    order: np.ndarray,
    batch_size: int,
    chunk_batches: int,
    mesh=None,
    multihost: bool = False,
    stats=None,
    ingest: str = "f32",
):
    """Yield ``(ci, full, tail)`` device chunks over an epoch's ``order``.

    ``full`` is ``(feats (g, B, ...), *rows (g, B))`` (None when the final
    chunk holds only the tail); ``tail`` is ``(feats (t, ...), *rows (t,))``
    for the epoch's one partial batch (or None). Feature rows are gathered
    with the native threaded kernel (memmap page-in parallelizes; numpy
    fallback inside) in :func:`host_chunks` — run THAT stage in
    :func:`dfac_tpu.io.prefetch.prefetched` — while the ``device_put``
    happens at the CONSUMER (this generator composes the two), so HBM
    holds at most TWO chunks: the one the device is scanning and the one
    uploading behind it. (A producer-side put would add a third: the
    prefetch queue's chunk.)

    With ``multihost=True`` (one process per pod host, ``jax.distributed``
    initialized, ``mesh`` spanning every host's devices), each process
    gathers only ITS row slice of every batch in the chunk
    (:func:`dfac_tpu.parallel.multihost.local_row_range` of the batch dim)
    and the global ``(g, B, ...)`` arrays are assembled with
    ``jax.make_array_from_process_local_data`` — ``device_put`` cannot
    reach other hosts' devices. Every process must iterate the SAME
    ``order`` (seeded identically). The chunk scan then runs one global
    GSPMD program per chunk: large-program dispatch amortization and pod
    data parallelism compose.

    ``ingest`` compresses the host->device link for full chunks — the
    measured bottleneck of chunked training on slow-ingest hosts
    (results/v5e_measurements.md round 4: 104-187 utt/s disk-bound vs
    5,366 resident, rates scaling ~1/bytes). ``"bf16"`` halves the bytes
    (features bf16-rounded, step numerics otherwise exact f32);
    ``"int8"`` quarters them (per-(row, feature-dim) symmetric scales via
    :func:`dfac_tpu.io.fastcast.quant_i8`; the chunk scan dequantizes
    fused into the step — build it with
    ``chunk_scan_over(..., ingest="int8")``). The epoch's one partial
    TAIL batch always stays f32 (its bytes are negligible and the
    trainers' tail step keeps its plain signature). Training-quality
    impact is EER-gated in ``tests/test_chunked.py`` like the serving
    chain's quantized ingest.
    """
    from dfac_tpu.io.prefetch import prefetched

    if ingest not in INGEST_MODES:
        raise ValueError(f"ingest must be one of {INGEST_MODES}, got {ingest!r}")

    chunk_sh, tail_sh = chunk_shardings(mesh)
    batch_slice = None
    if multihost:
        from dfac_tpu.parallel import multihost as mh

        ranges: dict[int, tuple[int, int]] = {}

        def batch_slice(b: int) -> tuple[int, int]:
            if b not in ranges:
                ranges[b] = mh.local_row_range(mesh, b)
            return ranges[b]

    # depth=1 bounds HBM to two chunks (the one scanning + the one behind
    # it); ``stats`` (io.prefetch.PrefetchStats) records whether the epoch
    # waited on the host gather (host-bound) or on device scans (healthy)
    host = prefetched(
        host_chunks(
            feats_src, row_arrays, order, batch_size, chunk_batches,
            batch_slice=batch_slice, ingest=ingest,
        ),
        depth=1,
        stats=stats,
    )
    if not multihost:
        for ci, full, tail in host:
            yield (
                ci,
                None if full is None else tuple(jax.device_put(a, chunk_sh) for a in full),
                None if tail is None else tuple(jax.device_put(a, tail_sh) for a in tail),
            )
        return

    t_global = len(order) % batch_size  # the one partial batch's TRUE size
    for ci, full, tail in host:
        out_full = out_tail = None
        if full is not None:
            g = full[0].shape[0]
            out_full = tuple(
                jax.make_array_from_process_local_data(
                    chunk_sh, a, (g, batch_size) + a.shape[2:]
                )
                for a in full
            )
        if tail is not None:
            out_tail = tuple(
                jax.make_array_from_process_local_data(
                    tail_sh, a, (t_global,) + a.shape[1:]
                )
                for a in tail
            )
        yield ci, out_full, out_tail


def tail_ones(t: int, mesh=None, multihost: bool = False):
    """Weights-of-ones for the epoch's tail batch. Single-host: a plain
    device array. Multi-host: a global batch-sharded array (an uncommitted
    ``jnp.ones`` cannot be committed to other hosts' devices, and the tail
    runs through the same batch-sharded step as full batches)."""
    if multihost:
        from dfac_tpu.parallel import multihost as mh

        lo, hi = mh.local_row_range(mesh, t)
        return mh.batch_from_local(np.ones(hi - lo, np.float32), mesh, global_rows=t)
    return jnp.ones((t,), jnp.float32)


def host_chunks(
    feats_src: np.ndarray,
    row_arrays: Sequence[np.ndarray],
    order: np.ndarray,
    batch_size: int,
    chunk_batches: int,
    batch_slice=None,
    ingest: str = "f32",
):
    """The host stage of :func:`stream_chunks`: gather + reshape (+ the
    optional ``ingest`` compression — bf16 cast or int8 quantization of
    full chunks, native multithreaded kernels, tail untouched).

    ``batch_slice(b) -> (lo, hi)`` (optional) restricts every gathered
    batch of global size ``b`` to its ``[lo, hi)`` row slice — the
    multi-host caller's per-process shard of each batch."""
    from dfac_tpu.io.fastcast import cast_bf16, gather_f32, quant_i8

    B, G, n = batch_size, chunk_batches, len(order)
    rows_per = G * B
    for ci, c0 in enumerate(range(0, n, rows_per)):
        rows = order[c0 : c0 + rows_per]
        g = len(rows) // B
        full = tail = None
        if g:
            fr = rows[: g * B]
            w = B
            if batch_slice is not None:
                lo, hi = batch_slice(B)
                w = hi - lo
                fr = fr.reshape(g, B)[:, lo:hi].reshape(-1)
            f = gather_f32(feats_src, fr)
            if ingest == "int8":
                q, scales = quant_i8(f)
                feat_arrays = (
                    q.reshape((g, w) + q.shape[1:]),
                    scales.reshape((g, w) + scales.shape[1:]),
                )
            elif ingest == "bf16":
                feat_arrays = (cast_bf16(f).reshape((g, w) + f.shape[1:]),)
            else:
                feat_arrays = (f.reshape((g, w) + f.shape[1:]),)
            full = (
                *feat_arrays,
                *(r[fr].reshape(g, w) for r in row_arrays),
            )
        trows = rows[g * B :]
        if len(trows):  # only ever the epoch's final partial batch
            if batch_slice is not None:
                tlo, thi = batch_slice(len(trows))
                trows = trows[tlo:thi]
            tail = (gather_f32(feats_src, trows), *(r[trows] for r in row_arrays))
        yield ci, full, tail


def chunk_scan_over(step: Any, append_ones: bool, track_count: bool,
                    ingest: str = "f32"):
    """``lax.scan`` a jit'd train step over a chunk of pre-batched rows.

    ``step`` is the per-batch train step (its traced body is reused via
    ``__wrapped__`` so the key-split chain matches per-batch dispatch
    exactly); ``append_ones`` appends a ones weight vector to each call
    (steps whose signature ends in weights); ``track_count`` selects the
    ``(state, loss, count)`` step contract over ``(state, loss)``.
    Floats agree with per-batch dispatch up to XLA reassociation (the scan
    body and the standalone step compile as different programs).

    ``ingest`` must match the :func:`stream_chunks` that feeds it:
    ``"bf16"`` upcasts the bf16 feature slice to f32 before the step (one
    fused elementwise op; the step itself runs exact f32 on bf16-rounded
    values); ``"int8"`` expects ``(q, scales, *rows)`` chunks and
    dequantizes fused into the step's first read."""
    if ingest not in INGEST_MODES:
        raise ValueError(f"ingest must be one of {INGEST_MODES}, got {ingest!r}")
    base = step.__wrapped__ if hasattr(step, "__wrapped__") else step

    @jax.jit
    def chunk_scan(state, *xs):
        ones = jnp.ones((xs[0].shape[1],), jnp.float32)

        def call(st, sl):
            if ingest == "int8":
                q, scales, *rows = sl
                feats = q.astype(jnp.float32) * scales[..., None]
                sl = (feats, *rows)
            elif ingest == "bf16":
                sl = (sl[0].astype(jnp.float32), *sl[1:])
            return base(st, *sl, ones) if append_ones else base(st, *sl)

        if track_count:
            def body(carry, sl):
                st, loss_acc, count_acc = carry
                st, loss, count = call(st, sl)
                return (st, loss_acc + loss, count_acc + count), None

            (st, loss, count), _ = jax.lax.scan(
                body, (state, jnp.zeros(()), jnp.zeros(())), xs
            )
            return st, loss, count

        def body(carry, sl):
            st, loss_acc = carry
            st, loss = call(st, sl)
            return (st, loss_acc + loss), None

        (st, loss), _ = jax.lax.scan(body, (state, jnp.zeros(())), xs)
        return st, loss

    return chunk_scan
