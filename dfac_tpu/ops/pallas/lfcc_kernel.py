"""Fused Pallas TPU kernel: power spectrum -> filterbank -> log -> DCT.

The post-FFT chain of the LFCC front-end is two small matmuls with an
elementwise log between them. Composed naively, XLA materializes the
(rows, 120) log-energy intermediate in HBM between the two contractions;
this kernel keeps the whole chain resident in VMEM per row-tile:

    out[tile] = log(max(power[tile] @ FB, floor)) @ DCT

Geometry (zero-padded to MXU/VPU tile multiples):
  * rows   = B*T frames, tiled at 256 (grid dim 0)
  * K1     = 257 FFT bins   -> padded to 384 (3 x 128 lanes)
  * K2     = 120 filters    -> padded to 128 (zero-padded filter columns
             are masked inside the kernel so ``log(floor)`` garbage never
             reaches the DCT contraction)
  * n_ceps = 60 outputs     -> padded to 128, sliced by the caller

Matmuls hit the MXU with ``preferred_element_type=float32``; the log runs
on the VPU over registers. One HBM read of the power spectrum, one HBM
write of the cepstra — the log-energy intermediate never leaves VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dfac_tpu.features import lfcc as lfcc_mod

ROW_TILE = 256
K_BINS_PAD = 384  # 257 -> 3*128
K_FILT_PAD = 128  # 120 -> 128
OUT_PAD = 128  # 60 -> 128


def _fb_log_dct_kernel(power_ref, fb_ref, dct_ref, floor_ref, out_ref):
    power = power_ref[:]  # (ROW_TILE, K_BINS_PAD)
    fb = fb_ref[:]  # (K_BINS_PAD, K_FILT_PAD)
    energies = jnp.dot(power, fb, preferred_element_type=jnp.float32)
    floor = floor_ref[0]
    logE = jnp.log(jnp.maximum(energies, floor))
    # zero the padded filter columns so they don't feed log(floor) into DCT
    col = jax.lax.broadcasted_iota(jnp.int32, logE.shape, dimension=1)
    logE = jnp.where(col < floor_ref[1].astype(jnp.int32), logE, 0.0)
    out_ref[:] = jnp.dot(logE, dct_ref[:], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg",))
def fused_fb_log_dct(power: jax.Array, cfg: lfcc_mod.LFCCConfig) -> jax.Array:
    """(..., T, n_bins) power spectrum -> (..., T, n_ceps) cepstra."""
    n_bins = cfg.n_fft // 2 + 1
    lead = power.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    rows_pad = -(-rows // ROW_TILE) * ROW_TILE

    flat = power.reshape(rows, n_bins).astype(jnp.float32)
    flat = jnp.pad(flat, ((0, rows_pad - rows), (0, K_BINS_PAD - n_bins)))

    fb = np.zeros((K_BINS_PAD, K_FILT_PAD), np.float32)
    fb[:n_bins, : cfg.n_filters] = lfcc_mod.linear_filterbank(cfg)
    dct = np.zeros((K_FILT_PAD, OUT_PAD), np.float32)
    dct[: cfg.n_filters, : cfg.n_ceps] = lfcc_mod.dct_matrix(cfg.n_filters, cfg.n_ceps)
    scalars = jnp.asarray([cfg.log_floor, float(cfg.n_filters)], jnp.float32)

    out = pl.pallas_call(
        _fb_log_dct_kernel,
        grid=(rows_pad // ROW_TILE,),
        in_specs=[
            pl.BlockSpec((ROW_TILE, K_BINS_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K_BINS_PAD, K_FILT_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K_FILT_PAD, OUT_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, OUT_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, OUT_PAD), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * (K_BINS_PAD * K_FILT_PAD + K_FILT_PAD * OUT_PAD),
            bytes_accessed=4 * rows_pad * (K_BINS_PAD + OUT_PAD),
            transcendentals=rows_pad * K_FILT_PAD,
        ),
    )(flat, jnp.asarray(fb), jnp.asarray(dct), scalars)

    return out[:rows, : cfg.n_ceps].reshape(*lead, cfg.n_ceps)
