"""Fused Pallas conv block: 3x3 SAME conv + bias + ReLU + time-pool.

One CNN2D block (reference ``src/model.py:14-30``: Conv2d 3x3 -> BN -> ReLU
-> AvgPool (2,1)) as a single TPU kernel. At inference BN folds into the
conv (see :mod:`dfac_tpu.models.fast_infer`), so the fused block covers the
whole stage. The payoff is HBM traffic: XLA materializes the pre-pool
activation (the largest tensor in the network) between the conv and the
reduce_window; here a row-tile goes DMA -> 9 shifted MXU contractions ->
epilogue -> pooled write, and the pre-pool tensor never touches HBM —
halving the block's write traffic.

Decomposition: ``out[h, w, co] = sum_{dy,dx} x[h+dy, w+dx, :] @ K[dy, dx]``
— nine (TILE_H * W, C_in) x (C_in, C_out) MXU matmuls accumulated in f32,
on a halo'd input tile DMA'd from HBM (rows t*TH-1 .. t*TH+TH+1 of the
SAME-padded input).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 32  # output rows per grid step (pre-pool)


def _kernel(xp_ref, w_ref, b_ref, out_ref, scratch, sem, *, width, c_in, c_out, pool):
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)

    copy = pltpu.make_async_copy(
        xp_ref.at[b_idx, pl.ds(t_idx * TILE_H, TILE_H + 2)],
        scratch,
        sem,
    )
    copy.start()
    copy.wait()

    xin = scratch[:]  # (TILE_H + 2, width + 2, c_in)
    acc = jnp.zeros((TILE_H * width, c_out), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = xin[dy : dy + TILE_H, dx : dx + width, :].reshape(TILE_H * width, c_in)
            acc += jax.lax.dot_general(
                sl, w_ref[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    y = jnp.maximum(acc + b_ref[:], 0.0).reshape(TILE_H, width, c_out)
    if pool:
        y = y.reshape(TILE_H // 2, 2, width, c_out).mean(axis=1)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("pool",))
def fused_conv_block(x: jax.Array, w: jax.Array, b: jax.Array, pool: bool = True) -> jax.Array:
    """x (B, H, W, C_in), w (3, 3, C_in, C_out), b (C_out,) ->
    (B, H', W, C_out) with H' = floor(H/2) when pooling (floor-mode parity:
    an odd trailing row is dropped, torch AvgPool semantics)."""
    batch, h, width, c_in = x.shape
    c_out = w.shape[-1]
    dt = x.dtype

    h_eff = (h // 2) * 2 if pool else h  # floor-mode: drop the odd tail row
    h_tiles = -(-h_eff // TILE_H)
    h_pad = h_tiles * TILE_H
    # SAME padding + tile padding; halo rows live in the padded array
    xp = jnp.pad(x, ((0, 0), (1, 1 + h_pad - h), (1, 1), (0, 0)))

    out_rows_tile = TILE_H // 2 if pool else TILE_H

    out = pl.pallas_call(
        functools.partial(_kernel, width=width, c_in=c_in, c_out=c_out, pool=pool),
        grid=(batch, h_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # padded input stays in HBM
            pl.BlockSpec((3, 3, c_in, c_out), lambda bi, ti: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_out,), lambda bi, ti: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, out_rows_tile, width, c_out), lambda bi, ti: (bi, ti, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, h_tiles * out_rows_tile, width, c_out), dt),
        scratch_shapes=[
            pltpu.VMEM((TILE_H + 2, width + 2, c_in), dt),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * h_pad * width * c_in * c_out * 9,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=0,
        ),
    )(xp, w.astype(dt), b.astype(jnp.float32))

    real_out = h_eff // 2 if pool else h
    return out[:, :real_out]


def reference_conv_block(x, w, b, pool: bool = True):
    """XLA composition of the same block (for tests and as fallback)."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = jnp.maximum(y + b, 0.0).astype(x.dtype)
    if pool:
        from flax import linen as nn

        y = nn.avg_pool(y, (2, 1), (2, 1), "VALID")
    return y


def cnn2d_fused_scores(folded: dict, feats_swapped: jax.Array, apply_sigmoid: bool = True):
    """Full CNN2D inference on (B, T, F) input via fused conv blocks.

    ``folded`` comes from :func:`dfac_tpu.models.fast_infer.fold_cnn2d`.
    """
    h = feats_swapped.astype(jnp.bfloat16)[..., None]
    h = fused_conv_block(h, folded["w1"], folded["b1"], pool=True)
    h = fused_conv_block(h, folded["w2"], folded["b2"], pool=True)
    h = fused_conv_block(h, folded["w3"], folded["b3"], pool=False)
    hm = jnp.mean(h.astype(jnp.float32), axis=1)  # (B, F, C)
    emb = jnp.swapaxes(hm, 1, 2).reshape(hm.shape[0], -1)
    logits = emb.astype(jnp.bfloat16) @ folded["w_cls"].astype(jnp.bfloat16) + folded["b_cls"]
    logits = logits[:, 0].astype(jnp.float32)
    return jax.nn.sigmoid(logits) if apply_sigmoid else logits
