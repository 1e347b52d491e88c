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


def test_eer_device_large_split_exact_on_device(rng):
    """Beyond the old 92,680-row int32 cap the device crossing search now
    runs in exact emulated u64 (VERDICT r2 item 5): the DEVICE result —
    not a host fallback — must match host float64 exactly. ns*nb here is
    ~(n/2)^2 > 2**31, where int32 products would wrap."""
    from dfac_tpu.ops.eer import calculate_eer, eer_counts_jax, eer_device

    n = 92_680 + 20_000
    labels = (np.arange(n) % 2).astype(np.int32)
    # f32 throughout: host and device must see bit-identical scores
    scores = (rng.normal(size=n) + 0.8 * labels).astype(np.float32)
    # device path explicitly (no routing): counts fetched from the device
    fa, fr, ns, nb, thr = map(
        lambda a: np.asarray(a).item(), eer_counts_jax(scores, labels)
    )
    eer_dev = (fa / ns + fr / nb) / 2.0
    eer_h, thr_h = calculate_eer(scores, labels)
    assert eer_dev == eer_h and thr == pytest.approx(thr_h, abs=0)
    eer_d, thr_d = eer_device(scores, labels)
    assert eer_d == eer_h and thr_d == thr_h


def test_wideint_u64_primitives(rng):
    """Exact-u64 emulation vs Python arbitrary-precision ints."""
    import jax.numpy as jnp

    from dfac_tpu.ops import wideint as wi

    a = rng.integers(0, 2**31, size=512, dtype=np.int64)
    b = rng.integers(0, 2**31, size=512, dtype=np.int64)
    # include the extremes
    a[:4] = [0, 1, 2**31 - 1, 2**31 - 1]
    b[:4] = [0, 2**31 - 1, 2**31 - 1, 1]
    aj = jnp.asarray(a.astype(np.uint32))
    bj = jnp.asarray(b.astype(np.uint32))
    hi, lo = wi.mul_u32(aj, bj)
    got = (np.asarray(hi).astype(np.uint64) << np.uint64(32)) | np.asarray(lo).astype(np.uint64)
    np.testing.assert_array_equal(got, (a * b).astype(np.uint64))

    # add / abs-diff / compare on the products of random pairs
    h2, l2 = wi.mul_u32(bj, aj)
    s_hi, s_lo = wi.add_u64(hi, lo, h2, l2)
    got_sum = (np.asarray(s_hi).astype(np.uint64) << np.uint64(32)) | np.asarray(s_lo).astype(np.uint64)
    np.testing.assert_array_equal(got_sum, (2 * a * b).astype(np.uint64))

    c_hi, c_lo = wi.mul_u32(aj, aj)
    d_hi, d_lo = wi.abs_diff_u64(hi, lo, c_hi, c_lo)
    want = np.abs(a * b - a * a).astype(np.uint64)
    got_d = (np.asarray(d_hi).astype(np.uint64) << np.uint64(32)) | np.asarray(d_lo).astype(np.uint64)
    np.testing.assert_array_equal(got_d, want)
    np.testing.assert_array_equal(np.asarray(wi.lt_u64(hi, lo, c_hi, c_lo)), a * b < a * a)

    # argmin first-occurrence rule (ties must resolve to the first index)
    vals = np.array([7, 3, 9, 3, 1, 1, 8], dtype=np.uint64) + np.uint64(2**33)
    v_hi = jnp.asarray((vals >> np.uint64(32)).astype(np.uint32))
    v_lo = jnp.asarray((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    assert int(wi.argmin_u64_first(v_hi, v_lo)) == 4


def test_eer_counts_masked_u64_exact_large_split():
    """The resident evaluator's masked crossing search must stay exact
    when ns*nb >= 2^31 (int32 products would wrap): 100k-row split checked
    against the host float64 reference."""
    import jax
    import jax.numpy as jnp

    from dfac_tpu.ops.eer import calculate_eer
    from dfac_tpu.train.evaluate import eer_counts_masked

    rng = np.random.default_rng(11)
    n = 100_000
    labels = (rng.random(n) > 0.5).astype(np.float32)
    # overlapping score distributions -> EER well inside (0, 0.5)
    scores = (rng.normal(size=n) + labels * 1.2).astype(np.float32)
    pad = 128
    w = np.concatenate([np.ones(n), np.zeros(pad)]).astype(np.float32)
    s = np.concatenate([scores, rng.normal(size=pad).astype(np.float32)])
    l = np.concatenate([labels, np.ones(pad, np.float32)])

    far, frr, ns, nb, thr = jax.tree.map(
        np.asarray,
        eer_counts_masked(jnp.asarray(s), jnp.asarray(l), jnp.asarray(w)),
    )
    assert int(ns) * int(nb) >= 2**31, "split too small to exercise the overflow"
    got = (float(far) / int(ns) + float(frr) / int(nb)) / 2.0

    ref_eer, ref_thr = calculate_eer(scores, labels)
    np.testing.assert_allclose(got, ref_eer, atol=1e-12)
    np.testing.assert_allclose(float(thr), ref_thr, rtol=1e-6)


def test_eer_jax_empty_input_matches_host():
    """Degenerate EMPTY split: host calculate_eer returns (0, 0); the
    device path must not IndexError on the length-0 curve arrays."""
    import jax.numpy as jnp

    from dfac_tpu.ops.eer import calculate_eer, eer_jax

    host = calculate_eer(np.zeros((0,), np.float32), np.zeros((0,), np.int32))
    dev = eer_jax(jnp.zeros((0,), jnp.float32), jnp.zeros((0,), jnp.int32))
    assert host == (0.0, 0.0)
    assert (float(dev[0]), float(dev[1])) == (0.0, 0.0)
