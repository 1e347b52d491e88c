"""GEMM-native LFCC front-end: the whole chain as one Pallas TPU kernel.

TPU FFTs map poorly onto the MXU; a direct DFT expressed as two matmuls
maps perfectly (the GEMM-native NDFT idea, cf. PAPERS.md "MelT"). With the
Hamming window folded into the DFT basis, the complete front-end becomes:

    re   = frames @ (diag(w) @ C)        # cos basis, (320, 257)
    im   = frames @ (diag(w) @ S)        # sin basis
    P    = re^2 + im^2                   # power spectrum (VPU)
    ceps = log(max(P @ FB, floor)) @ DCT # filterbank + cepstrum

— five ops, three MXU contractions (K = 320/384/128, all >= lane width, so
MXU utilization is high unlike the 9-tap convs), one elementwise block, and
**zero HBM round-trips between stages**: a 256-frame tile stays in VMEM
from windowed samples to cepstra. The DFT costs ~14x the FLOPs of an FFT
but runs on hardware ~50x better suited, and fusion removes the dominant
memory traffic of the XLA composition.

Framing itself is free: with hop = win/2, frames are two consecutive
160-sample blocks — a reshape plus two slices, no gather
(:func:`frames_by_reshape`).

Geometry (zero-padded to lane multiples):
  rows = B*T frame tiles of 256;  K_in 320 -> 384;
  cos/sin packed side by side into one (384, 768) basis (re cols 0..256,
  im cols 384..640); bins 257 -> 384; filters 120 -> 128; ceps 60 -> 128.
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
K_IN_PAD = 384  # 320 -> 3*128
HALF = 384  # each of re/im occupies a 384-wide padded half
K_FILT_PAD = 128
OUT_PAD = 128


@functools.lru_cache(maxsize=8)
def _host_constants(cfg: lfcc_mod.LFCCConfig):
    n_bins = cfg.n_fft // 2 + 1
    win = lfcc_mod.hamming_window(cfg.win_length)  # (320,)
    n = np.arange(cfg.win_length)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * n * k / cfg.n_fft
    cos_b = win[:, None] * np.cos(ang)  # (320, 257)
    sin_b = -win[:, None] * np.sin(ang)

    basis = np.zeros((K_IN_PAD, 2 * HALF), np.float32)
    basis[: cfg.win_length, :n_bins] = cos_b
    basis[: cfg.win_length, HALF : HALF + n_bins] = sin_b

    fb = np.zeros((HALF, K_FILT_PAD), np.float32)
    fb[:n_bins, : cfg.n_filters] = lfcc_mod.linear_filterbank(cfg)
    dct = np.zeros((K_FILT_PAD, OUT_PAD), np.float32)
    dct[: cfg.n_filters, : cfg.n_ceps] = lfcc_mod.dct_matrix(cfg.n_filters, cfg.n_ceps)
    # cache host numpy only — jnp conversion must happen per-trace (a cached
    # device constant created under one trace leaks into the next)
    return basis, fb, dct


def _frontend_kernel(frames_ref, basis_ref, fb_ref, dct_ref, scal_ref, out_ref):
    frames = frames_ref[:]  # (ROW_TILE, K_IN_PAD)
    y = jnp.dot(frames, basis_ref[:], preferred_element_type=jnp.float32)  # (T, 768)
    power = jnp.square(y[:, :HALF]) + jnp.square(y[:, HALF:])  # (T, 384)
    energies = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32)
    logE = jnp.log(jnp.maximum(energies, scal_ref[0]))
    col = jax.lax.broadcasted_iota(jnp.int32, logE.shape, dimension=1)
    logE = jnp.where(col < scal_ref[1].astype(jnp.int32), logE, 0.0)
    out_ref[:] = jnp.dot(logE, dct_ref[:], preferred_element_type=jnp.float32)


def frames_by_reshape(waveform: jax.Array, cfg: lfcc_mod.LFCCConfig) -> jax.Array:
    """(..., N) -> (..., T, win) framing as reshape+slice (hop = win/2)."""
    if cfg.hop_length * 2 != cfg.win_length:
        return lfcc_mod._frames(waveform, cfg)
    t = cfg.num_frames(waveform.shape[-1])
    usable = (t + 1) * cfg.hop_length
    blocks = waveform[..., :usable].reshape(*waveform.shape[:-1], t + 1, cfg.hop_length)
    return jnp.concatenate([blocks[..., :-1, :], blocks[..., 1:, :]], axis=-1)


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def gemm_lfcc_cepstra(
    waveform: jax.Array, cfg: lfcc_mod.LFCCConfig, compute_dtype=jnp.float32
) -> jax.Array:
    """(..., N) waveform -> (..., T, n_ceps) static cepstra, fully fused.

    ``compute_dtype=bfloat16`` feeds the DFT matmul bf16 frames/basis (f32
    accumulation): ~20% faster on v5e with cepstra differing at the bf16
    mantissa level (the accuracy-critical log/filterbank/DCT stages stay
    f32).
    """
    frames = frames_by_reshape(waveform.astype(jnp.float32), cfg)
    lead = frames.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    rows_pad = -(-rows // ROW_TILE) * ROW_TILE
    flat = frames.reshape(rows, cfg.win_length)
    flat = jnp.pad(flat, ((0, rows_pad - rows), (0, K_IN_PAD - cfg.win_length)))
    flat = flat.astype(compute_dtype)

    basis_np, fb_np, dct_np = _host_constants(cfg)
    basis = jnp.asarray(basis_np).astype(compute_dtype)
    fb, dct = jnp.asarray(fb_np), jnp.asarray(dct_np)
    scalars = jnp.asarray([cfg.log_floor, float(cfg.n_filters)], jnp.float32)

    out = pl.pallas_call(
        _frontend_kernel,
        grid=(rows_pad // ROW_TILE,),
        in_specs=[
            pl.BlockSpec((ROW_TILE, K_IN_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K_IN_PAD, 2 * HALF), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((HALF, K_FILT_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K_FILT_PAD, OUT_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, OUT_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, OUT_PAD), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * (K_IN_PAD * 2 * HALF + HALF * K_FILT_PAD + K_FILT_PAD * OUT_PAD),
            bytes_accessed=4 * rows_pad * (K_IN_PAD + OUT_PAD),
            transcendentals=rows_pad * K_FILT_PAD,
        ),
    )(flat, basis, fb, dct, scalars)

    return out[:rows, : cfg.n_ceps].reshape(*lead, cfg.n_ceps)


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def gemm_lfcc_features_tf(
    waveform: jax.Array,
    cfg: lfcc_mod.LFCCConfig = lfcc_mod.LFCCConfig(),
    compute_dtype=jnp.float32,
) -> jax.Array:
    """(..., N) waveform -> (..., T, 180) swapped-orientation features — the
    front-end's NATURAL layout (frames are rows). Feeds the CNN2D-native
    grid (``cnn2d_fast_scores_tf``) with zero transposes in the whole
    serving chain; ``gemm_lfcc_features`` adds the swap for the stored
    corpus contract."""
    ceps = gemm_lfcc_cepstra(waveform, cfg, compute_dtype=compute_dtype)
    d1 = lfcc_mod.compute_deltas(ceps, cfg.delta_window)
    d2 = lfcc_mod.compute_deltas(d1, cfg.delta_window)
    return jnp.concatenate([ceps, d1, d2], axis=-1)


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def gemm_lfcc_features(
    waveform: jax.Array,
    cfg: lfcc_mod.LFCCConfig = lfcc_mod.LFCCConfig(),
    compute_dtype=jnp.float32,
) -> jax.Array:
    """(..., N) waveform -> (..., 180, T) stored-orientation features via the
    fully-fused GEMM front-end (drop-in for :func:`lfcc_features`)."""
    feats = gemm_lfcc_features_tf(waveform, cfg, compute_dtype=compute_dtype)
    return jnp.swapaxes(feats, -1, -2)
