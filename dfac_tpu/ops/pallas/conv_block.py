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
— nine (TILE_H * Wp, C_in) x (C_in, C_out) MXU matmuls accumulated in f32
on a halo'd input tile DMA'd from HBM. Mosaic alignment dictates the
layout: the width axis sits on sublanes padded to 16 (so DMA slices are
tile-aligned), the dx shifts are ``pltpu.roll`` along the sublane axis
(zero padding makes the wrapped columns correct), and the dy shifts are
plain leading-axis slices. The valid 180 columns are sliced on the host.

STATUS (measured on one v5e):
* :func:`fused_conv_block` (manual-DMA variant) — numerically verified in
  interpret mode; hardware compile blocked by a Mosaic restriction (manual
  HBM DMA slices need a 128-multiple lane dim; channels here are 1/32/64).
* :func:`fused_conv_block_v2` (carried-halo BlockSpec pipeline) — compiles
  and is bit-exact on hardware (3e-5 max diff), but measures ~4x SLOWER
  than XLA's conv at these shapes (block2: 63 ms vs 16 ms at B=512): with
  C_in = 32 the nine K=32 contractions run the MXU at ~25% occupancy and
  the width-shift rolls cost f32<->bf16 VPU round trips, which outweighs
  the saved pool-stage HBM traffic. XLA's implicit-im2col conv lowering is
  simply better at small channel counts.

The XLA path (:func:`reference_conv_block` / the flax models) is therefore
the production route; these kernels are retained as verified infrastructure
for wide-channel variants where the fusion math flips.

Version scope: the negative result above (and the Mosaic manual-DMA
restriction) was measured on jax/jaxlib 0.9.0 + libtpu 0.0.34, last
rechecked 2026-08-19 (round 5). Re-run ``scripts/pool_kernel_probe.py`` /
the fused-block timing in ``scripts/cnn_stage_profile.py`` when the
toolchain moves past those versions — Mosaic lowering quality is exactly
the kind of thing a libtpu bump changes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 32  # output rows per grid step (pre-pool)


def _kernel(xp_ref, w_ref, b_ref, out_ref, scratch, sem, *, wp, c_in, c_out, pool):
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)

    copy = pltpu.make_async_copy(
        xp_ref.at[b_idx, pl.ds(t_idx * TILE_H, TILE_H + 2)],
        scratch,
        sem,
    )
    copy.start()
    copy.wait()

    xin = scratch[:]  # (TILE_H + 2, wp, c_in); data cols 1..w, zeros outside
    acc = jnp.zeros((TILE_H * wp, c_out), jnp.float32)
    for dy in range(3):
        xin_dy = xin[dy : dy + TILE_H]
        for dx in range(3):
            # circular shift by (1 - dx) mod wp; wrapped columns carry the
            # zero padding. Mosaic's rotate needs 32-bit data, so bf16
            # tiles take a VPU round-trip through f32 around the roll; the
            # MXU contraction stays in the input dtype.
            if dx == 1:
                shifted = xin_dy
            elif xin_dy.dtype == jnp.float32:
                shifted = pltpu.roll(xin_dy, (1 - dx) % wp, axis=1)
            else:
                shifted = pltpu.roll(
                    xin_dy.astype(jnp.float32), (1 - dx) % wp, axis=1
                ).astype(xin_dy.dtype)
            acc += jax.lax.dot_general(
                shifted.reshape(TILE_H * wp, c_in),
                w_ref[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    y = jnp.maximum(acc + b_ref[:], 0.0).reshape(TILE_H, wp, c_out)
    if pool:
        y = y.reshape(TILE_H // 2, 2, wp, c_out).mean(axis=1)
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
    wp = -(-(width + 2) // 16) * 16  # sublane-aligned padded width
    # SAME padding (1 col each side) + alignment padding + tile padding
    xp = jnp.pad(x, ((0, 0), (1, 1 + h_pad - h), (1, wp - width - 1), (0, 0)))

    out_rows_tile = TILE_H // 2 if pool else TILE_H

    out = pl.pallas_call(
        functools.partial(_kernel, wp=wp, c_in=c_in, c_out=c_out, pool=pool),
        grid=(batch, h_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # padded input stays in HBM
            pl.BlockSpec((3, 3, c_in, c_out), lambda bi, ti: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_out,), lambda bi, ti: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, out_rows_tile, wp, c_out), lambda bi, ti: (bi, ti, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, h_tiles * out_rows_tile, wp, c_out), dt),
        scratch_shapes=[
            pltpu.VMEM((TILE_H + 2, wp, c_in), dt),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * h_pad * wp * c_in * c_out * 9,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=0,
        ),
    )(xp, w.astype(dt), b.astype(jnp.float32))

    real_out = h_eff // 2 if pool else h
    return out[:, :real_out, 1 : width + 1]


def _kernel_v2(x_ref, w_ref, b_ref, out_ref, carry, *, wp, c_in, c_out, pool):
    """Carried-halo variant: pipelined BlockSpec input (no manual DMA, so no
    HBM lane-alignment constraints); 3 rows of the previous tile persist in
    VMEM scratch across the sequential grid, providing the conv halo and a
    2-row phase shift that keeps pooled pairs inside one tile."""
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)  # SAME top padding at batch start

    xin_new = x_ref[0]  # (TILE_H, wp, c_in)
    work = jnp.concatenate([carry[:], xin_new], axis=0)  # rows [t*TH-3, t*TH+TH)

    acc = jnp.zeros((TILE_H * wp, c_out), jnp.float32)
    for dy in range(3):
        # local out row j = true row t*TH-2+j uses x rows (.. -3+j+dy)
        wdy = work[dy : dy + TILE_H]
        for dx in range(3):
            if dx == 1:
                shifted = wdy
            elif wdy.dtype == jnp.float32:
                shifted = pltpu.roll(wdy, (1 - dx) % wp, axis=1)
            else:
                shifted = pltpu.roll(wdy.astype(jnp.float32), (1 - dx) % wp, axis=1).astype(wdy.dtype)
            acc += jax.lax.dot_general(
                shifted.reshape(TILE_H * wp, c_in),
                w_ref[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    y = jnp.maximum(acc + b_ref[:], 0.0).reshape(TILE_H, wp, c_out)
    if pool:
        y = y.reshape(TILE_H // 2, 2, wp, c_out).mean(axis=1)
    out_ref[0] = y.astype(out_ref.dtype)
    carry[:] = xin_new[TILE_H - 3 :]


@functools.partial(jax.jit, static_argnames=("pool",))
def fused_conv_block_v2(x: jax.Array, w: jax.Array, b: jax.Array, pool: bool = True) -> jax.Array:
    """Pipelined-halo fused conv block (see :func:`_kernel_v2`).

    Output semantics identical to :func:`fused_conv_block` /
    :func:`reference_conv_block`.
    """
    batch, h, width, c_in = x.shape
    c_out = w.shape[-1]
    dt = x.dtype

    h_eff = (h // 2) * 2 if pool else h  # floor-mode pooling drops odd tail
    n_tiles = -(-(h_eff + 2) // TILE_H)  # coverage for the +2 phase shift
    wp = -(-(width + 2) // 16) * 16
    xp = jnp.pad(x, ((0, 0), (0, n_tiles * TILE_H - h), (1, wp - width - 1), (0, 0)))

    out_rows_tile = TILE_H // 2 if pool else TILE_H

    out = pl.pallas_call(
        functools.partial(_kernel_v2, wp=wp, c_in=c_in, c_out=c_out, pool=pool),
        grid=(batch, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE_H, wp, c_in), lambda bi, ti: (bi, ti, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c_in, c_out), lambda bi, ti: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_out,), lambda bi, ti: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, out_rows_tile, wp, c_out), lambda bi, ti: (bi, ti, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, n_tiles * out_rows_tile, wp, c_out), dt),
        scratch_shapes=[pltpu.VMEM((3, wp, c_in), dt)],
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * n_tiles * TILE_H * wp * c_in * c_out * 9,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=0,
        ),
    )(xp, w.astype(dt), b.astype(jnp.float32))

    # pre-pool phase shift is 2 true rows; pooled rows shift by 1
    if pool:
        return out[:, 1 : 1 + h_eff // 2, 1 : width + 1]
    return out[:, 2 : 2 + h, 1 : width + 1]


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
    h = fused_conv_block_v2(h, folded["w1"], folded["b1"], pool=True)
    h = fused_conv_block_v2(h, folded["w2"], folded["b2"], pool=True)
    h = fused_conv_block_v2(h, folded["w3"], folded["b3"], pool=False)
    hm = jnp.mean(h.astype(jnp.float32), axis=1)  # (B, F, C)
    emb = jnp.swapaxes(hm, 1, 2).reshape(hm.shape[0], -1)
    logits = emb.astype(jnp.bfloat16) @ folded["w_cls"].astype(jnp.bfloat16) + folded["b_cls"]
    logits = logits[:, 0].astype(jnp.float32)
    return jax.nn.sigmoid(logits) if apply_sigmoid else logits
