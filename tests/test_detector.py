"""DeepfakeDetector (dlqueen) trainer tests: weighted sampling, pos_weight
BCE, EMA, per-sample SpecAugment, variable-length scoring, CLI."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfac_tpu.data.augment import dlqueen_spec_augment
from dfac_tpu.data.pipeline import ArrayDataset
from dfac_tpu.train.detector_loop import (
    DetectorConfig,
    DetectorTrainer,
    compute_class_weights,
    detector_scores,
    pos_weight_bce,
)

F_, T_ = 16, 24


def _ds(rng, n=24, imbalanced=False):
    if imbalanced:
        labels = (np.arange(n) % 4 == 0).astype(np.int32)  # 25% positive
    else:
        labels = (np.arange(n) % 2).astype(np.int32)
    feats = rng.normal(size=(n, F_, T_)).astype(np.float32)
    feats[labels == 1, : F_ // 2] += 2.0
    lengths = rng.integers(T_ // 2, T_ + 1, size=n).astype(np.int32)
    for i, ln in enumerate(lengths):
        feats[i, :, ln:] = 0.0
    return ArrayDataset([f"u{i}" for i in range(n)], feats, labels, lengths=lengths)


def test_compute_class_weights():
    labels = np.array([1, 0, 0, 0])
    pw, w0, w1 = compute_class_weights(labels)
    assert pw == pytest.approx(3.0)
    assert w0 == pytest.approx(1 / 3)
    assert w1 == pytest.approx(1.0)


def test_pos_weight_bce_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.normal(size=16).astype(np.float32)
    labels = (rng.random(16) > 0.7).astype(np.float32)
    ref = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor([2.5]))(
        torch.from_numpy(logits), torch.from_numpy(labels)
    ).item()
    got = float(pos_weight_bce(jnp.asarray(logits), jnp.asarray(labels), 2.5))
    assert got == pytest.approx(ref, rel=1e-5)


def test_dlqueen_spec_augment_per_sample(rng):
    x = jnp.ones((6, T_, F_))
    y = np.asarray(dlqueen_spec_augment(jax.random.key(0), x, 8, 2, 6, 2))
    assert y.shape == x.shape
    # masks differ across samples (overwhelmingly likely)
    assert not all(np.array_equal(y[0], y[i]) for i in range(1, 6))
    # masked entries are zero, everything else one
    assert set(np.unique(y)) <= {0.0, 1.0}


def test_detector_trainer_converges_and_ema(rng, tmp_path):
    train_ds = _ds(rng, 32, imbalanced=True)
    dev_ds = _ds(np.random.default_rng(1), 16)
    # ema_decay 0.5: with only ~12 steps the reference's 0.999 would keep
    # the eval weights at init — the decay is a knob, the mechanism is what
    # is under test.
    cfg = DetectorConfig(
        epochs=3, batch_size=8, hidden=16, ema=True, ema_decay=0.5,
        specaug=True, time_mask_max=4, freq_mask_max=4, seed=0,
    )
    trainer = DetectorTrainer(cfg, in_channels=F_)
    ckpt = str(tmp_path / "det.ckpt")
    result = trainer.fit(train_ds, dev_ds, ckpt_path=ckpt)
    assert result["best_eer"] < 0.5
    assert len(result["history"]) == 3
    assert os.path.exists(ckpt)
    # EMA params differ from raw params after updates
    diff = max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree.leaves(trainer.state.params), jax.tree.leaves(trainer.state.ema_params))
    )
    assert diff > 0

    # scoring respects dataset order and length masking
    scores = trainer.scores(dev_ds)
    assert scores.shape == (len(dev_ds),)
    s2 = detector_scores(trainer.model, trainer.eval_variables(), dev_ds, dev_ds.lengths, 8)
    np.testing.assert_allclose(scores, s2, atol=1e-6)


def test_detector_cli_roundtrip(rng, tmp_path):
    torch = pytest.importorskip("torch")
    import pandas as pd

    data_dir = tmp_path / "data"
    for split, n in (("train", 24), ("dev", 12), ("test2", 10)):
        # stable per-split seed (hash() is randomized per process)
        ds = _ds(np.random.default_rng(sum(map(ord, split))), n)
        d = data_dir / split
        d.mkdir(parents=True)
        pd.DataFrame({
            "uttid": ds.uttids,
            "features": [torch.from_numpy(ds.features[i][:, : ds.lengths[i]].copy()) for i in range(n)],
        }).to_pickle(d / "features.pkl")
        if split != "test2":
            pd.DataFrame({"uttid": ds.uttids, "label": ds.labels}).to_pickle(d / "labels.pkl")

    from dfac_tpu.cli import train_detector

    ckpt = str(tmp_path / "best_model.ckpt")
    pred = str(tmp_path / "prediction.pkl")
    train_detector.main([
        "--data-dir", str(data_dir), "--epochs", "1", "--batch-size", "8",
        "--hidden", "8", "--ckpt-path", ckpt, "--prediction-pkl", pred,
        "--ema", "--use-prob",
    ])
    df = pd.read_pickle(pred)
    assert len(df) == 10
    assert df["predictions"].between(0, 1).all()


def test_detector_device_resident_matches_stepwise(rng):
    """The one-dispatch detector epoch scan trains identically to the
    host-fed stepwise loop: same host-sampled order, same key chain, same
    true-size tail handling (N=13, bs=4)."""
    import optax

    from dfac_tpu.models import build_model
    from dfac_tpu.train.detector_loop import (
        DetectorConfig,
        DetectorState,
        make_detector_epoch_scan,
        make_detector_train_step,
    )
    from dfac_tpu.utils.rng import train_key

    n, bs, c, t = 13, 4, 12, 20
    feats = rng.normal(size=(n, c, t)).astype(np.float32)
    lengths = np.full(n, t, np.int32)
    labels = (np.arange(n) % 2).astype(np.float32)
    cfg = DetectorConfig(batch_size=bs, hidden=8, dropout=0.0, ema=True, grad_clip=5.0)
    model = build_model("detector", in_channels=c, hidden=cfg.hidden, dropout=cfg.dropout)
    # SGD for cross-compilation bit-parity (see test_tail_batches.py: Adam
    # amplifies f32 noise in the zero-gradient conv biases feeding BN)
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), optax.sgd(1e-2))

    def fresh_state():
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(0)},
            jnp.zeros((1, t, c)),
        )
        return DetectorState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            ema_params=variables["params"],
            opt_state=tx.init(variables["params"]),
            key=train_key(7),
        )

    order = np.random.default_rng(3).choice(n, size=n, replace=True)

    step = make_detector_train_step(model, tx, cfg, pos_weight=1.4)
    st = fresh_state()
    total = 0.0
    for start in range(0, n, bs):
        idx = order[start : start + bs]
        st, loss = step(
            st, jnp.asarray(feats[idx]), jnp.asarray(lengths[idx]), jnp.asarray(labels[idx])
        )
        total += float(loss)

    scan = make_detector_epoch_scan(model, tx, cfg, pos_weight=1.4, n_examples=n, batch_size=bs)
    s_scan, loss_scan = scan(
        fresh_state(), jnp.asarray(feats), jnp.asarray(lengths), jnp.asarray(labels),
        jnp.asarray(order.astype(np.int32)),
    )
    np.testing.assert_allclose(float(loss_scan), total, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_scan.params), jax.tree.leaves(st.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree.leaves(s_scan.ema_params), jax.tree.leaves(st.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree.leaves(s_scan.batch_stats), jax.tree.leaves(st.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_detector_trainer_device_resident_fit(rng):
    """End-to-end resident fit converges and returns history like host-fed."""
    from dfac_tpu.train.detector_loop import DetectorConfig, DetectorTrainer

    n, c, t = 20, 12, 20
    feats = rng.normal(size=(n, c, t)).astype(np.float32)
    labels = (np.arange(n) % 2).astype(np.int32)
    feats[labels == 1, :4] += 2.0
    ds = ArrayDataset([f"u{i}" for i in range(n)], feats, labels)
    cfg = DetectorConfig(
        epochs=2, batch_size=8, hidden=8, dropout=0.0, device_resident=True, seed=0
    )
    trainer = DetectorTrainer(cfg, in_channels=c)
    result = trainer.fit(ds, ds)
    assert len(result["history"]) == 2
    assert np.isfinite(result["history"][-1]["train_loss"])
    assert 0.0 <= result["best_eer"] <= 1.0


def test_detector_fused_fit_matches_stepwise_fit(rng, tmp_path):
    """The one-dispatch detector run matches fit() epoch-for-epoch: same
    weighted-sampling stream, same dev EERs, same best epoch/checkpoint
    (EMA on, so the eval-variables path is exercised)."""
    import os

    n, c, t = 24, 12, 20
    feats = rng.normal(size=(n, c, t)).astype(np.float32)
    labels = (np.arange(n) % 2).astype(np.int32)
    feats[labels == 1, :4] += 2.0
    train = ArrayDataset([f"u{i}" for i in range(n)], feats, labels)
    dev_f = rng.normal(size=(14, c, t)).astype(np.float32)
    dev_l = (np.arange(14) % 2).astype(np.int32)
    dev_f[dev_l == 1, :4] += 2.0
    dev = ArrayDataset([f"d{i}" for i in range(14)], dev_f, dev_l)

    # device_resident=True so fit() drives the SAME epoch-scan program the
    # fused run inlines (maximizes cross-compilation numeric agreement;
    # Adam amplifies f32 noise in zero-gradient params otherwise)
    cfg = DetectorConfig(epochs=3, batch_size=8, hidden=8, dropout=0.0,
                         ema=True, seed=3, patience=10, device_resident=True)

    ref_tr = DetectorTrainer(cfg, in_channels=c)
    ref = ref_tr.fit(train, dev, ckpt_path=str(tmp_path / "ref.ckpt"))

    fused_tr = DetectorTrainer(cfg, in_channels=c)
    got = fused_tr.fit_fused(train, dev, ckpt_path=str(tmp_path / "fused.ckpt"))

    assert len(got["history"]) == len(ref["history"])
    for a, b in zip(ref["history"], got["history"]):
        assert b["epoch"] == a["epoch"]
        assert b["dev_eer"] == pytest.approx(a["dev_eer"], abs=1e-6)
        assert b["train_loss"] == pytest.approx(a["train_loss"], rel=1e-4)
    assert got["best_eer"] == pytest.approx(ref["best_eer"], abs=1e-6)
    assert os.path.exists(tmp_path / "fused.ckpt")

    # the final states score identically (same key chain, same updates)
    s_ref = ref_tr.scores(dev)
    s_got = fused_tr.scores(dev)
    np.testing.assert_allclose(s_got, s_ref, rtol=1e-4, atol=1e-5)


def test_detector_orbax_checkpoint_format(rng, tmp_path):
    """Detector checkpoints honor checkpoint_format='orbax' (directory
    layout, auto-detected by the loaders the CLI scoring stage uses)."""
    from dfac_tpu.train.checkpoint import load_model_variables

    cfg = DetectorConfig(epochs=1, batch_size=8, hidden=8, dropout=0.0,
                         seed=0, checkpoint_format="orbax")
    trainer = DetectorTrainer(cfg, in_channels=F_)
    ckpt = str(tmp_path / "det_orbax.ckpt")
    trainer.fit(_ds(rng, 16), _ds(np.random.default_rng(1), 8), ckpt_path=ckpt)
    assert os.path.isdir(ckpt)
    variables = load_model_variables(ckpt, model_name="detector")
    for g, w in zip(
        jax.tree.leaves(variables["params"]),
        jax.tree.leaves(jax.device_get(trainer.eval_variables()["params"])),
    ):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
