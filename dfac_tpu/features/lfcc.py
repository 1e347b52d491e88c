"""Raw-waveform -> LFCC + delta + delta-delta front-end (TPU, jit).

The reference project ships *precomputed* features (``README.md:23``) — the
extractor itself exists nowhere in its tree. This module defines the
documented feature contract (``results/why_2dcnn_works_on_audio.md:8-12``:
rows 1-60 LFCC, 61-120 delta, 121-180 delta-delta, ~10 ms frames, 321
frames/utterance) as an explicit, reproducible spec:

* 16 kHz audio; 20 ms Hamming window (320 samples), 10 ms hop (160), 512-pt
  rFFT power spectrum;
* 120 triangular filters linearly spaced 0..Nyquist (LFCC = linear-frequency
  cepstral coefficients — the linear filterbank is what distinguishes it
  from MFCC);
* log energies (floor 1e-10) -> orthonormal DCT-II -> first 60 coefficients;
* delta/delta-delta by +-2-frame regression with edge replication
  (the standard HTK/librosa formula).

Everything after the rFFT — power -> filterbank matmul -> log -> DCT matmul
-> delta regression — is fusable; :mod:`dfac_tpu.ops.pallas.lfcc_kernel`
provides the fused TPU kernel, and this module the jit-able XLA composition
(also the fallback on CPU).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LFCCConfig:
    sample_rate: int = 16_000
    win_length: int = 320  # 20 ms
    hop_length: int = 160  # 10 ms
    n_fft: int = 512
    n_filters: int = 120
    n_ceps: int = 60
    delta_window: int = 2
    log_floor: float = 1e-10

    @property
    def feature_dim(self) -> int:
        return 3 * self.n_ceps

    def num_frames(self, n_samples: int) -> int:
        return 1 + (n_samples - self.win_length) // self.hop_length

    def num_samples(self, n_frames: int) -> int:
        """Samples needed for n_frames (321 frames -> 51,520 = 3.22 s)."""
        return self.win_length + (n_frames - 1) * self.hop_length


def hamming_window(n: int) -> np.ndarray:
    return 0.54 - 0.46 * np.cos(2 * np.pi * np.arange(n) / (n - 1))


def linear_filterbank(cfg: LFCCConfig) -> np.ndarray:
    """(n_fft//2 + 1, n_filters) triangular filters, linear center spacing.

    Centers at ``linspace(0, nyquist, n_filters + 2)`` in Hz mapped to FFT
    bin frequencies; each filter rises from its left neighbor's center and
    falls to its right neighbor's (the MFCC construction minus the mel warp).
    """
    n_bins = cfg.n_fft // 2 + 1
    freqs = np.linspace(0, cfg.sample_rate / 2, n_bins)
    centers = np.linspace(0, cfg.sample_rate / 2, cfg.n_filters + 2)
    fb = np.zeros((n_bins, cfg.n_filters), np.float64)
    for m in range(cfg.n_filters):
        left, center, right = centers[m], centers[m + 1], centers[m + 2]
        up = (freqs - left) / max(center - left, 1e-12)
        down = (right - freqs) / max(right - center, 1e-12)
        fb[:, m] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


def dct_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_in, n_out) orthonormal DCT-II basis (scipy.fft.dct norm='ortho')."""
    k = np.arange(n_out)[None, :]
    n = np.arange(n_in)[:, None]
    mat = np.cos(np.pi * k * (2 * n + 1) / (2 * n_in)) * np.sqrt(2.0 / n_in)
    mat[:, 0] *= 1.0 / np.sqrt(2.0)
    return mat


def delta_kernel(window: int) -> np.ndarray:
    """Regression coefficients [-N..N] / (2 * sum n^2)."""
    n = np.arange(-window, window + 1, dtype=np.float64)
    return n / (2.0 * np.sum(np.arange(1, window + 1) ** 2.0))


def _frames(waveform: jax.Array, cfg: LFCCConfig) -> jax.Array:
    """(..., N) -> (..., T, win) strided framing via gather (XLA-friendly)."""
    t = cfg.num_frames(waveform.shape[-1])
    idx = jnp.arange(t)[:, None] * cfg.hop_length + jnp.arange(cfg.win_length)[None, :]
    return waveform[..., idx]


def compute_deltas(ceps: jax.Array, window: int = 2) -> jax.Array:
    """(..., T, C) -> regression deltas with edge replication over T."""
    kern = jnp.asarray(delta_kernel(window), ceps.dtype)
    pad = [(0, 0)] * (ceps.ndim - 2) + [(window, window), (0, 0)]
    padded = jnp.pad(ceps, pad, mode="edge")
    # correlation along T: out_t = sum_n kern[n+w] * ceps[t+n]
    return sum(
        kern[i] * jax.lax.dynamic_slice_in_dim(padded, i, ceps.shape[-2], axis=ceps.ndim - 2)
        for i in range(2 * window + 1)
    )


def log_filterbank_energies(power: jax.Array, cfg: LFCCConfig) -> jax.Array:
    fb = jnp.asarray(linear_filterbank(cfg), power.dtype)
    energies = jnp.maximum(power @ fb, cfg.log_floor)
    return jnp.log(energies)


@functools.partial(jax.jit, static_argnames=("cfg", "use_pallas"))
def lfcc_features(waveform: jax.Array, cfg: LFCCConfig = LFCCConfig(), use_pallas: bool = False) -> jax.Array:
    """(..., N) float waveform -> (..., 180, T) stored-orientation features.

    The output matches the corpus contract: feature-major [3*n_ceps, T] with
    blocks [lfcc; delta; delta-delta].
    """
    window = jnp.asarray(hamming_window(cfg.win_length), waveform.dtype)
    frames = _frames(waveform, cfg) * window  # (..., T, win)
    spec = jnp.fft.rfft(frames, n=cfg.n_fft, axis=-1)
    power = jnp.square(spec.real) + jnp.square(spec.imag)  # (..., T, bins)

    if use_pallas:
        from dfac_tpu.ops.pallas.lfcc_kernel import fused_fb_log_dct

        ceps = fused_fb_log_dct(power, cfg)  # (..., T, n_ceps)
    else:
        logE = log_filterbank_energies(power, cfg)
        dct = jnp.asarray(dct_matrix(cfg.n_filters, cfg.n_ceps), waveform.dtype)
        ceps = logE @ dct  # (..., T, n_ceps)

    d1 = compute_deltas(ceps, cfg.delta_window)
    d2 = compute_deltas(d1, cfg.delta_window)
    feats = jnp.concatenate([ceps, d1, d2], axis=-1)  # (..., T, 180)
    return jnp.swapaxes(feats, -1, -2)  # stored orientation (..., 180, T)


def lfcc_features_batch(
    waveforms: np.ndarray,
    cfg: LFCCConfig = LFCCConfig(),
    batch_size: int = 64,
    method: str = "gemm",
    use_pallas: bool | None = None,
) -> np.ndarray:
    """Host driver: (N, samples) -> (N, 180, T) in device batches.

    ``method``: 'gemm' (fully-fused GEMM-native Pallas kernel — ~2x the FFT
    path on TPU), 'fft-pallas' (XLA rFFT + fused post-FFT kernel), or 'fft'
    (pure XLA composition, the CPU-safe fallback).
    """
    if use_pallas is not None:  # backwards-compatible boolean knob
        method = "fft-pallas" if use_pallas else "fft"

    def one_chunk(chunk):
        if method == "gemm":
            from dfac_tpu.ops.pallas.gemm_frontend import gemm_lfcc_features

            return gemm_lfcc_features(chunk, cfg)
        return lfcc_features(chunk, cfg, use_pallas=(method == "fft-pallas"))

    if method != "fft" and len(waveforms):
        # Probe Pallas availability on the FIRST batch only: falling back
        # for any mid-corpus exception would silently restart the whole
        # corpus on the slower fft path and mask real errors (OOM on batch
        # k, a corrupt waveform row, a kernel bug).
        try:
            first = np.asarray(one_chunk(jnp.asarray(waveforms[:batch_size])))
        except Exception as e:  # noqa: BLE001 — warned below, never silent
            # Pallas unavailable (e.g. CPU backend): XLA composition
            # fallback — but LOUDLY, so a genuine first-batch failure (OOM,
            # corrupt row, kernel bug) is not mistaken for "no Pallas"
            import logging

            logging.getLogger(__name__).warning(
                "Pallas front-end '%s' failed on the first batch; falling "
                "back to the ~2x slower XLA fft composition for the whole "
                "corpus. Cause: %s: %s", method, type(e).__name__, e,
            )
            return lfcc_features_batch(waveforms, cfg, batch_size, method="fft")
        out = [first]
        start = batch_size
    else:
        out = []
        start = 0
    for s in range(start, len(waveforms), batch_size):
        chunk = jnp.asarray(waveforms[s : s + batch_size])
        out.append(np.asarray(one_chunk(chunk)))
    return np.concatenate(out) if out else np.zeros((0, cfg.feature_dim, 0), np.float32)
