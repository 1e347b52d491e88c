"""Native host-ingest kernels: bit-exactness, fallbacks, prefetch pipeline.

The native cast must be indistinguishable from ml_dtypes' astype (the
serving chains' first device op) — any bit drift would silently change
scores. Reference serving ingest analogue: torch DataLoader workers,
``/root/reference/src/predict.py:60-111``.
"""

import numpy as np
import ml_dtypes
import pytest

from dfac_tpu.io import fastcast as fc
from dfac_tpu.io.prefetch import prefetched


def _ref_bf16(a):
    return a.astype(ml_dtypes.bfloat16).view(np.uint16)


class TestCastBf16:
    def test_native_builds(self):
        # g++ is baked into the image; the native path must actually engage
        assert fc.native_available()

    def test_random_values_bit_exact(self, rng):
        a = (rng.normal(size=(333, 257)) * 10.0 ** rng.integers(-20, 20, (333, 257))).astype(np.float32)
        out = fc.cast_bf16(a)
        assert out.dtype == ml_dtypes.bfloat16
        np.testing.assert_array_equal(out.view(np.uint16), _ref_bf16(a))

    def test_all_bit_patterns_sampled(self, rng):
        # every float32 bit pattern class: sweep random uint32 payloads
        # (includes NaNs with payloads, denormals, infinities)
        bits = rng.integers(0, 2**32, size=200_000, dtype=np.uint64).astype(np.uint32)
        a = bits.view(np.float32)
        with np.errstate(invalid="ignore"):
            ref = _ref_bf16(a)
        np.testing.assert_array_equal(fc.cast_bf16(a).view(np.uint16), ref)

    def test_specials(self):
        a = np.array(
            [np.nan, -np.nan, np.inf, -np.inf, 0.0, -0.0, 1e-40, -1e-45,
             3.0, 3.00390625, 3.0078125, 65535.0, 1.0 + 2**-9, 1.0 + 2**-8,
             3.3895314e38],  # rounds up to inf in bf16
            np.float32,
        )
        with np.errstate(invalid="ignore", over="ignore"):
            ref = _ref_bf16(a)
        np.testing.assert_array_equal(fc.cast_bf16(a).view(np.uint16), ref)

    def test_empty_and_single_thread(self, rng):
        assert fc.cast_bf16(np.zeros((0, 7), np.float32)).shape == (0, 7)
        a = rng.normal(size=(130_000,)).astype(np.float32)  # > threading cutoff
        np.testing.assert_array_equal(
            fc.cast_bf16(a, threads=1).view(np.uint16),
            fc.cast_bf16(a, threads=7).view(np.uint16),
        )

    def test_numpy_fallback_identical(self, rng, monkeypatch):
        a = rng.normal(size=(64, 64)).astype(np.float32)
        want = fc.cast_bf16(a).view(np.uint16)
        monkeypatch.setattr(fc, "load", lambda: None)
        np.testing.assert_array_equal(fc.cast_bf16(a).view(np.uint16), want)

    def test_non_f32_falls_back(self):
        a = np.arange(8, dtype=np.float64)
        np.testing.assert_array_equal(
            fc.cast_bf16(a).view(np.uint16), _ref_bf16(a.astype(np.float64))
        )


class TestGather:
    def test_gather_cast_matches_fancy_index(self, rng):
        src = rng.normal(size=(200, 18, 32)).astype(np.float32)
        idx = rng.permutation(200)[:64]
        out = fc.gather_cast_bf16(src, idx)
        np.testing.assert_array_equal(
            out.view(np.uint16), _ref_bf16(src[idx])
        )

    def test_gather_f32(self, rng):
        src = rng.normal(size=(100, 50)).astype(np.float32)
        idx = rng.integers(0, 100, size=33)
        np.testing.assert_array_equal(fc.gather_f32(src, idx), src[idx])

    def test_gather_from_memmap(self, rng, tmp_path):
        src = rng.normal(size=(64, 9, 11)).astype(np.float32)
        p = tmp_path / "feats.npy"
        np.save(p, src)
        mm = np.load(p, mmap_mode="r")
        idx = rng.permutation(64)
        np.testing.assert_array_equal(
            fc.gather_cast_bf16(mm, idx).view(np.uint16), _ref_bf16(src[idx])
        )


class TestPrefetched:
    def test_order_preserved(self):
        assert list(prefetched(iter(range(100)), depth=3)) == list(range(100))

    def test_depth_zero_passthrough(self):
        assert list(prefetched(iter(range(5)), depth=0)) == [0, 1, 2, 3, 4]

    def test_producer_exception_propagates(self):
        def gen():
            yield 1
            raise ValueError("boom")

        it = prefetched(gen(), depth=2)
        assert next(it) == 1
        with pytest.raises(ValueError, match="boom"):
            list(it)

    def test_early_close_does_not_hang(self):
        produced = []

        def gen():
            for i in range(1000):
                produced.append(i)
                yield i

        it = prefetched(gen(), depth=1)
        assert next(it) == 0
        it.close()  # must not deadlock; producer unblocks via stop event
        assert len(produced) < 1000

    def test_stats_slow_producer_is_host_bound(self):
        import time

        from dfac_tpu.io.prefetch import PrefetchStats

        def slow_gen():
            for i in range(5):
                time.sleep(0.05)  # host assembly is the bottleneck
                yield i

        stats = PrefetchStats()
        assert list(prefetched(slow_gen(), depth=2, stats=stats)) == list(range(5))
        assert stats.items == 5
        assert stats.host_wait_s > stats.device_wait_s
        # the predicate itself, independent of wall-clock noise
        assert PrefetchStats(host_wait_s=2.0, device_wait_s=0.5).host_bound()
        assert not PrefetchStats(host_wait_s=0.1, device_wait_s=0.0).host_bound()
        assert not PrefetchStats(host_wait_s=2.0, device_wait_s=1.5).host_bound()

    def test_stats_slow_consumer_is_device_bound(self):
        import time

        from dfac_tpu.io.prefetch import PrefetchStats

        stats = PrefetchStats()
        out = []
        for item in prefetched(iter(range(5)), depth=1, stats=stats):
            time.sleep(0.05)  # consumer (device) is the bottleneck
            out.append(item)
        assert out == list(range(5))
        assert stats.device_wait_s > stats.host_wait_s
        assert not stats.host_bound()


class TestIngestIntegration:
    def test_collect_masked_scores_prepare_parity(self, rng):
        import jax.numpy as jnp

        from dfac_tpu.data.pipeline import ArrayDataset
        from dfac_tpu.train.evaluate import collect_masked_scores

        feats = rng.normal(size=(37, 6, 10)).astype(np.float32)
        ds = ArrayDataset(
            uttids=[f"u{i}" for i in range(37)], features=feats, labels=None
        )
        plain = collect_masked_scores(
            lambda b: jnp.asarray(b.features).sum(axis=(1, 2)), ds, 8,
        )
        prepared = collect_masked_scores(
            lambda f: f.sum(axis=(1, 2)), ds, 8,
            prepare_batch=lambda b: jnp.asarray(b.features),
        )
        np.testing.assert_allclose(plain, prepared, rtol=1e-6)

    def test_unshuffled_batches_are_views(self, rng):
        from dfac_tpu.data.pipeline import ArrayDataset, batch_iterator

        feats = rng.normal(size=(32, 4, 5)).astype(np.float32)
        ds = ArrayDataset(
            uttids=[f"u{i}" for i in range(32)], features=feats, labels=None
        )
        batches = list(batch_iterator(ds, 8, pad_tail=False))
        # full unshuffled batches alias the corpus array (zero copy)
        assert batches[0].features.base is feats
        np.testing.assert_array_equal(batches[1].features, feats[8:16])
        # shuffled batches still gather correctly
        sh = list(batch_iterator(ds, 8, shuffle=True, seed=0, pad_tail=False))
        total = np.sort(np.concatenate([b.features.reshape(8, -1)[:, 0] for b in sh]))
        np.testing.assert_array_equal(total, np.sort(feats.reshape(32, -1)[:, 0]))


def test_gather_bounds_checked(rng):
    src = rng.normal(size=(10, 4)).astype(np.float32)
    with pytest.raises(IndexError, match="out of bounds"):
        fc.gather_f32(src, np.array([0, 10]))
    with pytest.raises(IndexError, match="out of bounds"):
        fc.gather_cast_bf16(src, np.array([-1, 2]))


class TestQuantI8:
    """int8 quantized ingest: native/numpy bit-exactness + the
    dequantization error bound that the q8 serving chains rely on."""

    def test_native_matches_numpy_fallback(self, rng):
        a = (rng.normal(size=(37, 18, 321)) * 10.0 ** rng.integers(-8, 8, (37, 18, 321))).astype(np.float32)
        qn, sn = fc.quant_i8(a)
        qf, sf = fc._quant_i8_numpy(a)
        np.testing.assert_array_equal(qn, qf)
        np.testing.assert_array_equal(sn.view(np.uint32), sf.view(np.uint32))

    def test_roundtrip_error_bound(self, rng):
        a = rng.normal(size=(16, 20, 33)).astype(np.float32)
        q, s = fc.quant_i8(a)
        assert q.dtype == np.int8 and s.dtype == np.float32
        assert q.shape == a.shape and s.shape == a.shape[:-1]
        recon = q.astype(np.float32) * s[..., None]
        # per-group step is scale = amax/127; round-to-nearest error is
        # step/2, plus the f32 rounding of the divide and the dequant
        # multiply (hence the 1% slack on the half-step)
        np.testing.assert_array_less(
            np.abs(recon - a),
            np.broadcast_to(s[..., None] * 0.505 + 1e-12, a.shape),
        )

    def test_zero_and_constant_groups(self):
        a = np.zeros((2, 3, 5), np.float32)
        a[1, 1] = -4.0  # constant-negative group
        q, s = fc.quant_i8(a)
        assert np.all(q[0] == 0) and np.all(s[0] == 1.0)
        np.testing.assert_array_equal(q[1, 1], np.full(5, -127, np.int8))
        np.testing.assert_allclose(q[1, 1] * s[1, 1], a[1, 1], rtol=1e-6)

    def test_gather_quant_matches_contiguous(self, rng):
        src = rng.normal(size=(50, 6, 17)).astype(np.float32)
        idx = rng.permutation(50)[:20]
        qg, sg = fc.gather_quant_i8(src, idx)
        qc, sc = fc.quant_i8(np.ascontiguousarray(src[idx]))
        np.testing.assert_array_equal(qg, qc)
        np.testing.assert_array_equal(sg.view(np.uint32), sc.view(np.uint32))

    def test_gather_quant_from_memmap(self, rng, tmp_path):
        src = rng.normal(size=(24, 5, 9)).astype(np.float32)
        p = tmp_path / "feats.npy"
        np.save(p, src)
        mm = np.load(p, mmap_mode="r")
        idx = rng.permutation(24)
        qg, sg = fc.gather_quant_i8(mm, idx)
        qc, sc = fc._quant_i8_numpy(src[idx])
        np.testing.assert_array_equal(qg, qc)
        np.testing.assert_array_equal(sg.view(np.uint32), sc.view(np.uint32))

    def test_gather_quant_bounds_checked(self, rng):
        src = rng.normal(size=(10, 4, 4)).astype(np.float32)
        with pytest.raises(IndexError, match="out of bounds"):
            fc.gather_quant_i8(src, np.array([0, 10]))

    def test_threads_agree(self, rng):
        a = rng.normal(size=(64, 32, 64)).astype(np.float32)  # > cutoff
        q1, s1 = fc.quant_i8(a, threads=1)
        q7, s7 = fc.quant_i8(a, threads=7)
        np.testing.assert_array_equal(q1, q7)
        np.testing.assert_array_equal(s1.view(np.uint32), s7.view(np.uint32))
