"""Golden-value tests for the EER numeric contract.

Golden numbers were produced by executing the reference implementation
(``scripts/evaluation.py:7-56``) on the fixed inputs below; they are baked in
as literals so the suite never needs the reference checkout.
"""

import numpy as np
import pytest

from dfac_tpu.ops.eer import (
    calculate_eer,
    confusion_at_threshold,
    confusion_at_threshold_jax,
    eer_device,
    eer_jax,
)


def _random200():
    rng = np.random.default_rng(42)
    labels = (rng.random(200) > 0.5).astype(int)
    scores = rng.normal(size=200) + labels * 1.5
    return scores, labels


GOLDEN = [
    # (scores, labels, expected_eer, expected_threshold)
    (np.array([0.1, 0.2, 0.3, 0.8, 0.9, 0.95]), np.array([0, 0, 0, 1, 1, 1]), 0.0, 0.3),
    (
        np.array([0.1, 0.85, 0.3, 0.8, 0.2, 0.95]),
        np.array([0, 0, 0, 1, 1, 1]),
        0.3333333333333333,
        0.3,
    ),
    (*_random200(), 0.16506410256410256, 0.7823503424176613),
    (1 - _random200()[0], _random200()[1], 0.8349358974358975, 0.19893042857874632),
    (np.array([0.1, 0.2]), np.array([1, 1]), 0.0, 0.0),  # degenerate single-class
    (np.array([0.5, 0.5, 0.5, 0.5, 0.7, 0.7]), np.array([0, 1, 0, 1, 0, 1]), 0.3333333333333333, 0.5),
]


@pytest.mark.parametrize("scores,labels,exp_eer,exp_thr", GOLDEN)
def test_numpy_eer_matches_reference(scores, labels, exp_eer, exp_thr):
    eer, thr = calculate_eer(scores, labels)
    assert eer == pytest.approx(exp_eer, abs=0)
    assert thr == pytest.approx(exp_thr, abs=1e-12)


@pytest.mark.parametrize("scores,labels,exp_eer,exp_thr", GOLDEN)
def test_jax_eer_matches_reference(scores, labels, exp_eer, exp_thr):
    # eer_jax divides in f32 on device: ~1e-7 tolerance on the value; the
    # crossing index itself is exact (integer arithmetic).
    eer, thr = eer_jax(scores.astype(np.float32), labels)
    assert float(eer) == pytest.approx(exp_eer, abs=1e-6)
    assert float(thr) == pytest.approx(exp_thr, abs=1e-6)


@pytest.mark.parametrize("scores,labels,exp_eer,exp_thr", GOLDEN)
def test_eer_device_bit_exact(scores, labels, exp_eer, exp_thr):
    # eer_device finalizes the division in f64 on host: bit-exact EER.
    eer, thr = eer_device(scores.astype(np.float64), labels)
    assert eer == pytest.approx(exp_eer, abs=0)
    assert thr == pytest.approx(exp_thr, abs=1e-6)


def test_confusion_golden():
    scores, labels = _random200()
    # Golden from reference confusion_at_threshold at the golden threshold.
    tp, fp, tn, fn, far, frr = confusion_at_threshold(scores, labels, 0.7823503424176613)
    assert (tp, fp, tn, fn) == (80, 17, 87, 16)
    assert far == pytest.approx(0.16346153846153846)
    assert frr == pytest.approx(0.16666666666666666)
    res = confusion_at_threshold_jax(
        np.asarray(scores, np.float32), np.asarray(labels), 0.7823503424176613
    )
    assert tuple(int(x) for x in res[:4]) == (80, 17, 87, 16)


def test_numpy_jax_agree_on_many_random_cases():
    rng = np.random.default_rng(7)
    for n in [3, 10, 64, 257, 1000]:
        labels = (rng.random(n) > 0.4).astype(int)
        scores = rng.normal(size=n)
        eer_np, thr_np = calculate_eer(scores, labels)
        eer_d, thr_d = eer_device(scores, labels)
        assert eer_d == pytest.approx(eer_np, abs=0)
        assert thr_d == pytest.approx(thr_np, abs=1e-6)


def test_eer_invariance_monotone_transform():
    scores, labels = _random200()
    eer1, _ = calculate_eer(scores, labels)
    eer2, _ = calculate_eer(1 / (1 + np.exp(-scores)), labels)
    assert eer1 == pytest.approx(eer2)


def test_eer_large_scale_device():
    """100k-score EER: device sort+cumsum path at production scale."""
    rng = np.random.default_rng(0)
    labels = (rng.random(100_000) > 0.4).astype(int)
    scores = rng.normal(size=100_000) + labels * 0.8
    eer_np, thr_np = calculate_eer(scores, labels)
    eer_d, thr_d = eer_device(scores, labels)
    assert eer_d == pytest.approx(eer_np, abs=0)
    assert thr_d == pytest.approx(thr_np, abs=1e-6)
    assert 0.2 < eer_d < 0.4  # sanity for this separation


def test_eer_device_large_split_overflow_safe(rng):
    """Splits beyond INT32_EXACT_MAX_N route around the int32 crossing
    products (which could overflow at ns*nb >= 2**31) to the exact host
    algorithm."""
    from dfac_tpu.ops.eer import INT32_EXACT_MAX_N, calculate_eer, eer_device

    n = INT32_EXACT_MAX_N + 20_000  # ns*nb ~ (n/2)^2 > 2**31
    labels = (np.arange(n) % 2).astype(np.int32)
    scores = rng.normal(size=n).astype(np.float32) + 0.8 * labels
    eer_d, thr_d = eer_device(scores, labels)
    eer_h, thr_h = calculate_eer(scores, labels)
    assert eer_d == eer_h and thr_d == thr_h
