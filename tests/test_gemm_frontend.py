"""GEMM-native fused LFCC front-end: equivalence with the FFT composition."""

import numpy as np
import pytest

from dfac_tpu.features.lfcc import LFCCConfig, lfcc_features
from dfac_tpu.ops.pallas.gemm_frontend import (
    frames_by_reshape,
    gemm_lfcc_features,
)

CFG = LFCCConfig()


def _wave(frames=33, seed=0):
    rng = np.random.default_rng(seed)
    n = CFG.num_samples(frames)
    t = np.arange(n) / CFG.sample_rate
    return (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 3333 * t)
        + 0.05 * rng.normal(size=n)
    ).astype(np.float32)


def test_frames_by_reshape_matches_gather():
    import jax.numpy as jnp

    from dfac_tpu.features.lfcc import _frames

    w = _wave(17)
    a = np.asarray(frames_by_reshape(jnp.asarray(w), CFG))
    b = np.asarray(_frames(jnp.asarray(w), CFG))
    np.testing.assert_array_equal(a, b)


def test_gemm_frontend_matches_fft_path():
    from jax.experimental.pallas import tpu as pltpu

    w = _wave(33)
    ref = np.asarray(lfcc_features(w, CFG))  # FFT composition
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(gemm_lfcc_features(w, CFG))
    assert got.shape == ref.shape == (180, 33)
    # direct-DFT vs FFT: identical math, different summation order; log
    # compresses, deltas amplify slightly
    np.testing.assert_allclose(got, ref, atol=5e-3, rtol=1e-3)


def test_gemm_frontend_batched():
    from jax.experimental.pallas import tpu as pltpu

    waves = np.stack([_wave(17, s) for s in range(3)])
    with pltpu.force_tpu_interpret_mode():
        feats = np.asarray(gemm_lfcc_features(waves, CFG))
    assert feats.shape == (3, 180, 17)
    ref = np.asarray(lfcc_features(waves[1], CFG))
    np.testing.assert_allclose(feats[1], ref, atol=5e-3, rtol=1e-3)


def test_gemm_frontend_bf16_close_to_f32():
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    w = _wave(17)
    with pltpu.force_tpu_interpret_mode():
        f32 = np.asarray(gemm_lfcc_features(w, CFG))
        b16 = np.asarray(gemm_lfcc_features(w, CFG, compute_dtype=jnp.bfloat16))
    # bf16 DFT inputs: cepstra agree to bf16 mantissa scale; downstream
    # consumers (CNN in bf16) are insensitive at this level
    np.testing.assert_allclose(b16, f32, atol=0.2, rtol=0.05)
