"""Chunked streaming training (corpora larger than HBM).

``resident_chunk_batches=G`` runs the SAME semantics as the default
per-batch host loop — same shuffle permutation, same batch partition
(incl. the true-size tail), same ``state.key`` split chain — with one
``lax.scan`` dispatch per G batches and the chunk upload overlapped by a
prefetch thread. Floats agree up to XLA reassociation (the scan body and
the standalone step are different compiled programs); a single step's
loss is tested equal and params tested close, the key chain tested
identical. Reference analogue: DataLoader worker streaming,
``/root/reference/src/train.py:31-62``.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfac_tpu.data.pipeline import ArrayDataset
from dfac_tpu.train.loop import TrainConfig, Trainer, make_chunk_scan


def _ds(seed, n=26, f=16, t=20):
    rng = np.random.default_rng(seed)
    labels = (np.arange(n) % 2).astype(np.int32)
    feats = rng.normal(size=(n, f, t)).astype(np.float32)
    feats[labels == 1, : f // 2] += 2.0
    return ArrayDataset([f"u{seed}_{i}" for i in range(n)], feats, labels)


@pytest.mark.parametrize("model", ["cnn2d", "cnn1d"])
def test_chunk_scan_step_matches_host_step(model):
    """One chunk_scan step == one host-loop step: identical loss and key
    chain; params within compiler-reassociation distance."""
    ds = _ds(0, n=8)
    cfg = TrainConfig(model=model, batch_size=8, epochs=1, in_features=16, dropout=0.3)
    tr = Trainer(cfg)
    tr.state = tr.init_state(ds.features)
    feats = jnp.asarray(ds.features)
    labels = jnp.asarray(ds.labels.astype(np.float32))

    s_host, l_host, c_host = tr._train_step(
        tr.state, feats, labels, jnp.ones((8,), jnp.float32)
    )
    chunk_scan = make_chunk_scan(
        tr.model, tr.tx, cfg.swap_tf, cfg.label_smoothing, tr.augment_fn
    )
    s_chunk, l_chunk, c_chunk = chunk_scan(tr.state, feats[None], labels[None])

    assert float(l_host) == pytest.approx(float(l_chunk), rel=1e-6)
    assert int(c_host) == int(c_chunk) == 8
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(s_host.key)),
        np.asarray(jax.random.key_data(s_chunk.key)),
    )
    for h, c in zip(jax.tree.leaves(s_host.params), jax.tree.leaves(s_chunk.params)):
        # Adam turns 1e-8 grad reassociation noise into at most ~lr-sized
        # parameter differences where a near-zero grad flips sign
        np.testing.assert_allclose(
            np.asarray(h, np.float64), np.asarray(c, np.float64), atol=3 * cfg.lr
        )


def test_chunked_epoch_same_semantics_as_host_loop():
    """Whole-epoch run: loss trajectory and dev metrics track the host
    loop closely (same batches/PRNG; float drift only)."""
    train_ds, dev_ds = _ds(0), _ds(1, 16)
    # n=26, B=8 -> 3 full batches + tail of 2; G=2 -> chunks of 2, 1+tail
    base_cfg = TrainConfig(
        model="cnn1d", batch_size=8, epochs=2, in_features=16,
        dropout=0.0, lr=1e-4,
    )
    t_host = Trainer(base_cfg)
    r_host = t_host.fit(train_ds, dev_ds)
    t_chunk = Trainer(dataclasses.replace(base_cfg, resident_chunk_batches=2))
    r_chunk = t_chunk.fit(train_ds, dev_ds)

    for mh, mc in zip(r_host["history"], r_chunk["history"]):
        assert mh.train_loss == pytest.approx(mc.train_loss, rel=1e-4)
        assert mh.dev_loss == pytest.approx(mc.dev_loss, rel=1e-4)
    for h, c in zip(
        jax.tree.leaves(t_host.state.params), jax.tree.leaves(t_chunk.state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(h, np.float64), np.asarray(c, np.float64),
            atol=20 * base_cfg.lr,
        )


def test_chunked_with_augmentation_runs_and_counts_all_rows():
    from dfac_tpu.data.augment import AugmentConfig

    train_ds, dev_ds = _ds(2), _ds(3, 16)
    cfg = TrainConfig(
        model="cnn1d", batch_size=8, epochs=1, in_features=16,
        augment=AugmentConfig(spec_augment=True, gaussian_jitter=True),
        resident_chunk_batches=3,
    )
    tr = Trainer(cfg)
    result = tr.fit(train_ds, dev_ds)
    m = result["history"][0]
    assert np.isfinite(m.train_loss)
    # train_loss is sum/count — count must cover every row exactly once
    assert m.throughput_utt_s is None or m.throughput_utt_s > 0


def test_chunked_streams_from_npy_store(tmp_path):
    from dfac_tpu.data.pipeline import load_dataset
    from dfac_tpu.io.npy_store import save_npy_dataset

    full = _ds(4, n=40)
    store = tmp_path / "store"
    save_npy_dataset(full, str(store))
    ds = load_dataset(str(store))  # features stay memory-mapped
    labeled = dataclasses.replace(ds, labels=full.labels)

    cfg = TrainConfig(
        model="cnn1d", batch_size=8, epochs=1, in_features=16,
        resident_chunk_batches=2,
    )
    tr = Trainer(cfg)
    result = tr.fit(labeled, _ds(5, 16))
    assert np.isfinite(result["history"][-1].train_loss)


def test_chunked_composes_with_data_parallel():
    """Chunked streaming over the shard_map DP step: same semantics as the
    per-batch DP loop (same batches, same per-shard PRNG fold-ins)."""
    train_ds, dev_ds = _ds(10, n=28), _ds(11, 16)
    # n=28, B=8 -> 3 full batches + tail of 4; tail % dp(4) == 0
    base_cfg = TrainConfig(
        model="cnn2d", batch_size=8, epochs=2, in_features=16,
        dropout=0.2, lr=1e-4, data_parallel=4,
    )
    t_host = Trainer(base_cfg)
    r_host = t_host.fit(train_ds, dev_ds)
    t_chunk = Trainer(dataclasses.replace(base_cfg, resident_chunk_batches=2))
    r_chunk = t_chunk.fit(train_ds, dev_ds)

    for mh, mc in zip(r_host["history"], r_chunk["history"]):
        assert mh.train_loss == pytest.approx(mc.train_loss, rel=1e-4)
    for h, c in zip(
        jax.tree.leaves(t_host.state.params), jax.tree.leaves(t_chunk.state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(h, np.float64), np.asarray(c, np.float64),
            atol=20 * base_cfg.lr,
        )


def test_chunked_dp_tail_divisibility_error():
    train_ds, dev_ds = _ds(12, n=26), _ds(13, 16)  # tail 2, dp 4 -> error
    cfg = TrainConfig(
        model="cnn1d", batch_size=8, epochs=1, in_features=16,
        data_parallel=4, resident_chunk_batches=2,
    )
    tr = Trainer(cfg)
    with pytest.raises(ValueError, match="divide over"):
        tr.fit(train_ds, dev_ds)


def test_cae_chunked_matches_host_loop():
    from dfac_tpu.train.cae_loop import CAEConfig, CAETrainer

    train_ds, dev_ds = _ds(6, n=30), _ds(7, 16)
    base_cfg = CAEConfig(batch_size=8, epochs=2, base_channels=4, lr=1e-4)
    t_host = CAETrainer(base_cfg)
    r_host = t_host.fit(train_ds, dev_ds)
    t_chunk = CAETrainer(dataclasses.replace(base_cfg, resident_chunk_batches=2))
    r_chunk = t_chunk.fit(train_ds, dev_ds)

    # bonafide-only filter leaves 15 rows -> 1 full batch + tail of 7 per
    # chunk partition; same batches/PRNG -> same loss up to reassociation
    for mh, mc in zip(r_host["history"], r_chunk["history"]):
        assert mh.train_loss == pytest.approx(mc.train_loss, rel=1e-4)
    for h, c in zip(
        jax.tree.leaves(t_host.state.params), jax.tree.leaves(t_chunk.state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(h, np.float64), np.asarray(c, np.float64),
            atol=20 * base_cfg.lr,
        )


def test_detector_chunked_matches_host_loop():
    from dfac_tpu.train.detector_loop import DetectorConfig, DetectorTrainer

    train_ds, dev_ds = _ds(8, n=26), _ds(9, 16)
    base_cfg = DetectorConfig(
        batch_size=8, epochs=2, hidden=16, dropout=0.0, lr=1e-4, seed=3,
    )
    t_host = DetectorTrainer(base_cfg, in_channels=16)
    r_host = t_host.fit(train_ds, dev_ds)
    t_chunk = DetectorTrainer(
        dataclasses.replace(base_cfg, resident_chunk_batches=2), in_channels=16
    )
    r_chunk = t_chunk.fit(train_ds, dev_ds)

    for mh, mc in zip(r_host["history"], r_chunk["history"]):
        assert mh["train_loss"] == pytest.approx(mc["train_loss"], rel=1e-4)
        assert mh["dev_eer"] == pytest.approx(mc["dev_eer"], abs=1e-6)
    for h, c in zip(
        jax.tree.leaves(t_host.state.params), jax.tree.leaves(t_chunk.state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(h, np.float64), np.asarray(c, np.float64),
            atol=20 * base_cfg.lr,
        )


def test_cae_chunked_composes_with_data_parallel():
    from dfac_tpu.train.cae_loop import CAEConfig, CAETrainer

    train_ds, dev_ds = _ds(14, n=32), _ds(15, 16)
    # bonafide rows: 16 -> 2 full batches of 8, no tail (divides over dp=4)
    base_cfg = CAEConfig(
        batch_size=8, epochs=2, base_channels=4, lr=1e-4, data_parallel=4,
    )
    t_host = CAETrainer(base_cfg)
    r_host = t_host.fit(train_ds, dev_ds)
    t_chunk = CAETrainer(dataclasses.replace(base_cfg, resident_chunk_batches=2))
    r_chunk = t_chunk.fit(train_ds, dev_ds)

    for mh, mc in zip(r_host["history"], r_chunk["history"]):
        assert mh.train_loss == pytest.approx(mc.train_loss, rel=1e-4)
    for h, c in zip(
        jax.tree.leaves(t_host.state.params), jax.tree.leaves(t_chunk.state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(h, np.float64), np.asarray(c, np.float64),
            atol=20 * base_cfg.lr,
        )


def test_detector_chunked_composes_with_data_parallel():
    from dfac_tpu.train.detector_loop import DetectorConfig, DetectorTrainer

    train_ds, dev_ds = _ds(16, n=28), _ds(17, 16)
    # n=28, B=8 -> tail of 4, divides over dp=4
    base_cfg = DetectorConfig(
        batch_size=8, epochs=2, hidden=16, dropout=0.0, lr=1e-4, seed=5,
        data_parallel=4,
    )
    t_host = DetectorTrainer(base_cfg, in_channels=16)
    r_host = t_host.fit(train_ds, dev_ds)
    t_chunk = DetectorTrainer(
        dataclasses.replace(base_cfg, resident_chunk_batches=2), in_channels=16
    )
    r_chunk = t_chunk.fit(train_ds, dev_ds)

    for mh, mc in zip(r_host["history"], r_chunk["history"]):
        assert mh["train_loss"] == pytest.approx(mc["train_loss"], rel=1e-4)
    for h, c in zip(
        jax.tree.leaves(t_host.state.params), jax.tree.leaves(t_chunk.state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(h, np.float64), np.asarray(c, np.float64),
            atol=20 * base_cfg.lr,
        )


def test_config_validation():
    with pytest.raises(ValueError, match="alternative to device_resident"):
        TrainConfig(resident_chunk_batches=2, device_resident=True)
    # chunked + data_parallel composes for the supervised trainer (the
    # tail-divisibility check happens at fit time with the corpus length)
    TrainConfig(resident_chunk_batches=2, data_parallel=2, batch_size=8)
    with pytest.raises(ValueError, match=">= 0"):
        TrainConfig(resident_chunk_batches=-1)


def test_cae_chunked_second_fit_uses_new_normalizer():
    """Regression: the chunk scan must be fit-local — a second fit() on the
    same trainer rebuilds the normalizer, and a cached scan closing over
    the FIRST fit's mean/std would silently train with wrong statistics."""
    from dfac_tpu.train.cae_loop import CAEConfig, CAETrainer

    ds_a, dev = _ds(20, n=24), _ds(21, 16)
    ds_b = _ds(22, n=24)
    ds_b = dataclasses.replace(ds_b, features=ds_b.features * 5.0 + 3.0)

    cfg = CAEConfig(batch_size=8, epochs=1, base_channels=4, lr=1e-4,
                    resident_chunk_batches=2)
    reused = CAETrainer(cfg)
    reused.fit(ds_a, dev)
    r_reused = reused.fit(ds_b, dev)

    fresh = CAETrainer(cfg)
    r_fresh = fresh.fit(ds_b, dev)

    # same seed + same corpus -> identical run IF the second fit's chunk
    # scan picked up ds_b's normalizer (params differ: reused continued
    # from trained weights, so compare the normalizers and val loss path)
    np.testing.assert_allclose(reused.normalizer.mean, fresh.normalizer.mean)
    np.testing.assert_allclose(reused.normalizer.std, fresh.normalizer.std)
    assert np.isfinite(r_reused["history"][0].train_loss)
    assert np.isfinite(r_fresh["history"][0].train_loss)


def test_chunked_ingest_bf16_tracks_f32():
    """--chunk-ingest bf16: same batches/PRNG, features bf16-rounded before
    the exact-f32 step — loss trajectory tracks f32 chunked closely and the
    converged dev EER meets the 0.1%-absolute contract."""
    train_ds, dev_ds = _ds(0), _ds(1, 16)
    base_cfg = TrainConfig(
        model="cnn1d", batch_size=8, epochs=2, in_features=16,
        dropout=0.0, lr=1e-4, resident_chunk_batches=2,
    )
    t_f32 = Trainer(base_cfg)
    r_f32 = t_f32.fit(train_ds, dev_ds)
    t_bf16 = Trainer(dataclasses.replace(base_cfg, chunk_ingest="bf16"))
    r_bf16 = t_bf16.fit(train_ds, dev_ds)
    for mf, mb in zip(r_f32["history"], r_bf16["history"]):
        assert mf.train_loss == pytest.approx(mb.train_loss, rel=5e-3)
    assert abs(r_bf16["best_eer"] - r_f32["best_eer"]) <= 0.001


def test_chunked_ingest_int8_preserves_eer():
    """--chunk-ingest int8: quantized upload + fused dequant — the trained
    model's dev EER stays within the 0.1%-absolute contract of f32 chunked
    training on a separable corpus (the gate certifying the flag)."""
    train_ds, dev_ds = _ds(4, n=48), _ds(5, 32)
    base_cfg = TrainConfig(
        model="cnn2d", batch_size=8, epochs=2, in_features=16,
        dropout=0.0, lr=2e-3, resident_chunk_batches=2,
    )
    r_f32 = Trainer(base_cfg).fit(train_ds, dev_ds)
    r_q8 = Trainer(
        dataclasses.replace(base_cfg, chunk_ingest="int8")
    ).fit(train_ds, dev_ds)
    assert np.isfinite(r_q8["history"][0].train_loss)
    assert abs(r_q8["best_eer"] - r_f32["best_eer"]) <= 0.001


def test_chunked_ingest_int8_step_math():
    """The int8 chunk scan's dequantized step == the f32 step on the
    dequantized features exactly (the wrapper adds only q * scales)."""
    from dfac_tpu.io.fastcast import quant_i8
    from dfac_tpu.train.chunked import chunk_scan_over

    ds = _ds(6, n=8)
    cfg = TrainConfig(model="cnn1d", batch_size=8, epochs=1, in_features=16, dropout=0.0)
    tr = Trainer(cfg)
    tr.state = tr.init_state(ds.features)
    q, scales = quant_i8(ds.features)
    deq = q.astype(np.float32) * scales[..., None]
    labels = jnp.asarray(ds.labels.astype(np.float32))

    s_ref, l_ref, c_ref = tr._train_step(
        tr.state, jnp.asarray(deq), labels, jnp.ones((8,), jnp.float32)
    )
    scan_q8 = chunk_scan_over(
        tr._train_step, append_ones=True, track_count=True, ingest="int8"
    )
    s_q8, l_q8, c_q8 = scan_q8(
        tr.state, jnp.asarray(q)[None], jnp.asarray(scales)[None], labels[None]
    )
    assert float(l_ref) == pytest.approx(float(l_q8), rel=1e-6)
    assert int(c_ref) == int(c_q8) == 8
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(s_ref.key)),
        np.asarray(jax.random.key_data(s_q8.key)),
    )


def test_chunked_ingest_composes_with_dp_and_trainers():
    """int8 chunked ingest runs on the CAE and detector trainers and under
    shard_map DP on the supervised trainer (8-device virtual mesh)."""
    from dfac_tpu.train.cae_loop import CAEConfig, CAETrainer
    from dfac_tpu.train.detector_loop import DetectorConfig, DetectorTrainer

    train_ds, dev_ds = _ds(7, n=24), _ds(8, 16)

    r_dp = Trainer(
        TrainConfig(
            model="cnn1d", batch_size=8, epochs=1, in_features=16,
            resident_chunk_batches=2, chunk_ingest="int8", data_parallel=4,
        )
    ).fit(train_ds, dev_ds)
    assert np.isfinite(r_dp["history"][0].train_loss)

    cae_cfg = CAEConfig(
        batch_size=8, epochs=1, base_channels=4,
        resident_chunk_batches=2, chunk_ingest="int8",
    )
    cae_tr = CAETrainer(cae_cfg)
    r_cae = cae_tr.fit(train_ds, dev_ds)
    assert np.isfinite(r_cae["history"][0].train_loss)

    det_cfg = DetectorConfig(
        batch_size=8, epochs=1, hidden=16,
        resident_chunk_batches=2, chunk_ingest="int8",
    )
    det_tr = DetectorTrainer(det_cfg, in_channels=16)
    r_det = det_tr.fit(train_ds, dev_ds)
    assert np.isfinite(r_det["history"][0]["train_loss"])


def test_chunk_ingest_config_validation():
    with pytest.raises(ValueError, match="chunk_ingest"):
        TrainConfig(model="cnn2d", chunk_ingest="fp8", resident_chunk_batches=2)
    with pytest.raises(ValueError, match="resident_chunk_batches"):
        TrainConfig(model="cnn2d", chunk_ingest="int8")
