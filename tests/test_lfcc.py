"""LFCC front-end tests: independent numpy/scipy reference vs the XLA
composition vs the fused Pallas kernel (interpret path on CPU)."""

import numpy as np
import pytest

from dfac_tpu.features.lfcc import (
    LFCCConfig,
    compute_deltas,
    dct_matrix,
    delta_kernel,
    hamming_window,
    lfcc_features,
    lfcc_features_batch,
    linear_filterbank,
)

CFG = LFCCConfig()


def numpy_lfcc_reference(wave: np.ndarray, cfg: LFCCConfig = CFG) -> np.ndarray:
    """Fully independent host implementation of the documented spec."""
    import scipy.fft

    t = cfg.num_frames(len(wave))
    frames = np.stack(
        [wave[i * cfg.hop_length : i * cfg.hop_length + cfg.win_length] for i in range(t)]
    )
    frames = frames * hamming_window(cfg.win_length)
    spec = np.fft.rfft(frames, n=cfg.n_fft, axis=-1)
    power = np.abs(spec) ** 2
    fb = linear_filterbank(cfg)
    logE = np.log(np.maximum(power @ fb, cfg.log_floor))
    ceps = scipy.fft.dct(logE, type=2, norm="ortho", axis=-1)[:, : cfg.n_ceps]

    def deltas(x):
        k = delta_kernel(cfg.delta_window)
        padded = np.pad(x, ((cfg.delta_window, cfg.delta_window), (0, 0)), mode="edge")
        out = np.zeros_like(x)
        for t_i in range(x.shape[0]):
            for j, c in enumerate(k):
                out[t_i] += c * padded[t_i + j]
        return out

    d1 = deltas(ceps)
    d2 = deltas(d1)
    return np.concatenate([ceps, d1, d2], axis=1).T  # (180, T)


@pytest.fixture(scope="module")
def wave():
    rng = np.random.default_rng(0)
    n = CFG.num_samples(33)  # 33 frames for speed
    t_axis = np.arange(n) / CFG.sample_rate
    return (
        0.5 * np.sin(2 * np.pi * 440 * t_axis)
        + 0.2 * np.sin(2 * np.pi * 3333 * t_axis)
        + 0.05 * rng.normal(size=n)
    ).astype(np.float32)


def test_shape_contract():
    assert CFG.feature_dim == 180
    assert CFG.num_samples(321) == 51_520
    assert CFG.num_frames(51_520) == 321


def test_dct_matrix_matches_scipy():
    scipy_fft = pytest.importorskip("scipy.fft")
    x = np.random.default_rng(1).normal(size=(5, 120))
    ref = scipy_fft.dct(x, type=2, norm="ortho", axis=-1)[:, :60]
    got = x @ dct_matrix(120, 60)
    np.testing.assert_allclose(got, ref, atol=1e-10)


def test_filterbank_properties():
    fb = linear_filterbank(CFG)
    assert fb.shape == (257, 120)
    assert np.all(fb >= 0)
    # every filter has support; peaks near 1 (triangles sampled on bins)
    assert np.all(fb.sum(axis=0) > 0)
    assert 0.5 <= fb.max() <= 1.0 + 1e-9
    # centers increase linearly
    peaks = fb.argmax(axis=0)
    assert np.all(np.diff(peaks) >= 1)


def test_deltas_match_manual():
    x = np.random.default_rng(2).normal(size=(7, 33, 60)).astype(np.float32)
    got = np.asarray(compute_deltas(x))
    k = delta_kernel(2)
    padded = np.pad(x, ((0, 0), (2, 2), (0, 0)), mode="edge")
    ref = sum(k[j] * padded[:, j : j + 33] for j in range(5))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_xla_matches_numpy_reference(wave):
    ref = numpy_lfcc_reference(wave)
    got = np.asarray(lfcc_features(wave, CFG))
    assert got.shape == ref.shape == (180, 33)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-4)


def test_pallas_interpret_matches_xla(wave, monkeypatch):
    """Fused kernel (interpreter mode on CPU) == XLA composition."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    ref = np.asarray(lfcc_features(wave, CFG, use_pallas=False))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(lfcc_features(wave, CFG, use_pallas=True))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_batch_driver_and_batched_shapes(wave):
    waves = np.stack([wave, wave * 0.5, -wave])
    feats = lfcc_features_batch(waves, CFG, batch_size=2, use_pallas=False)
    assert feats.shape == (3, 180, 33)
    single = np.asarray(lfcc_features(wave, CFG))
    np.testing.assert_allclose(feats[0], single, atol=1e-5)
    assert np.isfinite(feats).all()


def test_full_contract_321_frames():
    rng = np.random.default_rng(3)
    w = rng.normal(size=CFG.num_samples(321)).astype(np.float32)
    feats = np.asarray(lfcc_features(w, CFG))
    assert feats.shape == (180, 321)
    assert np.isfinite(feats).all()
