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


def stream_chunks(
    feats_src: np.ndarray,
    row_arrays: Sequence[np.ndarray],
    order: np.ndarray,
    batch_size: int,
    chunk_batches: int,
    mesh=None,
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
    """
    from dfac_tpu.io.prefetch import prefetched

    chunk_sh, tail_sh = chunk_shardings(mesh)
    host = prefetched(
        host_chunks(feats_src, row_arrays, order, batch_size, chunk_batches),
        depth=1,
    )
    for ci, full, tail in host:
        yield (
            ci,
            None if full is None else tuple(jax.device_put(a, chunk_sh) for a in full),
            None if tail is None else tuple(jax.device_put(a, tail_sh) for a in tail),
        )


def host_chunks(
    feats_src: np.ndarray,
    row_arrays: Sequence[np.ndarray],
    order: np.ndarray,
    batch_size: int,
    chunk_batches: int,
):
    """The host stage of :func:`stream_chunks`: gather + reshape only."""
    from dfac_tpu.io.fastcast import gather_f32

    B, G, n = batch_size, chunk_batches, len(order)
    rows_per = G * B
    for ci, c0 in enumerate(range(0, n, rows_per)):
        rows = order[c0 : c0 + rows_per]
        g = len(rows) // B
        full = tail = None
        if g:
            fr = rows[: g * B]
            f = gather_f32(feats_src, fr)
            full = (
                f.reshape((g, B) + f.shape[1:]),
                *(r[fr].reshape(g, B) for r in row_arrays),
            )
        trows = rows[g * B :]
        if len(trows):  # only ever the epoch's final partial batch
            tail = (gather_f32(feats_src, trows), *(r[trows] for r in row_arrays))
        yield ci, full, tail


def chunk_scan_over(step: Any, append_ones: bool, track_count: bool):
    """``lax.scan`` a jit'd train step over a chunk of pre-batched rows.

    ``step`` is the per-batch train step (its traced body is reused via
    ``__wrapped__`` so the key-split chain matches per-batch dispatch
    exactly); ``append_ones`` appends a ones weight vector to each call
    (steps whose signature ends in weights); ``track_count`` selects the
    ``(state, loss, count)`` step contract over ``(state, loss)``.
    Floats agree with per-batch dispatch up to XLA reassociation (the scan
    body and the standalone step compile as different programs)."""
    base = step.__wrapped__ if hasattr(step, "__wrapped__") else step

    @jax.jit
    def chunk_scan(state, *xs):
        ones = jnp.ones((xs[0].shape[1],), jnp.float32)

        def call(st, sl):
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
