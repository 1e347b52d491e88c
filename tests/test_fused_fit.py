"""Whole-run-in-one-program training: trajectory parity with the per-epoch
resident trainer (identical device-side shuffle seeds => identical math)."""

import numpy as np
import pytest

from dfac_tpu.data.pipeline import ArrayDataset
from dfac_tpu.train.loop import TrainConfig, Trainer


def _ds(seed, n=48, f=16, t=24):
    rng = np.random.default_rng(seed)
    labels = (np.arange(n) % 2).astype(np.int32)
    feats = rng.normal(size=(n, f, t)).astype(np.float32)
    feats[labels == 1, : f // 2] += 2.0
    return ArrayDataset([f"u{seed}_{i}" for i in range(n)], feats, labels)


def _cfg(**kw):
    base = dict(
        model="cnn1d", batch_size=16, epochs=3, lr=2e-3, seed=4,
        in_features=16, device_resident=True, label_smoothing=0.05,
        lr_scheduler="plateau", lr_scheduler_patience=0,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_fused_fit_matches_per_epoch_trainer():
    train_ds, dev_ds = _ds(0), _ds(1, n=22)  # ragged dev tail

    ref = Trainer(_cfg()).fit(train_ds, dev_ds)
    fused_trainer = Trainer(_cfg())
    got = fused_trainer.fit_fused(train_ds, dev_ds)

    assert len(ref["history"]) == len(got["history"])
    for a, b in zip(ref["history"], got["history"]):
        assert b.train_loss == pytest.approx(a.train_loss, rel=1e-5)
        assert b.dev_loss == pytest.approx(a.dev_loss, rel=1e-5)
        assert b.dev_eer == pytest.approx(a.dev_eer, abs=1e-9)
        assert b.is_best == a.is_best
        assert b.learning_rate == pytest.approx(a.learning_rate, rel=1e-6)
    assert got["best_eer"] == pytest.approx(ref["best_eer"], abs=1e-9)


def test_fused_fit_early_stop():
    train_ds, dev_ds = _ds(2, n=16), _ds(3, n=16)
    cfg = _cfg(epochs=20, lr=0.0, early_stop=2, lr_scheduler="none")
    trainer = Trainer(cfg)
    got = trainer.fit_fused(train_ds, dev_ds)
    # lr=0: epoch 1 sets best, then 2 bad epochs trigger the stop; the scan
    # pads the rest with no-ops that the host strips
    assert len(got["history"]) <= 4


def test_fused_fit_best_params_snapshot():
    import jax

    train_ds, dev_ds = _ds(5), _ds(6, n=24)
    trainer = Trainer(_cfg(epochs=2, lr_scheduler="none"))
    got = trainer.fit_fused(train_ds, dev_ds)
    best = trainer.best_variables()
    assert "params" in best
    # best params are a real snapshot (finite, same structure as current)
    for a, b in zip(jax.tree.leaves(best["params"]), jax.tree.leaves(trainer.state.params)):
        assert np.isfinite(np.asarray(a)).all()
        assert a.shape == b.shape
    # scoring with best params works end to end
    from dfac_tpu.train.evaluate import evaluate_classifier

    metrics, _, _ = evaluate_classifier(trainer.model, best, dev_ds, batch_size=16)
    assert metrics["eer"] == pytest.approx(got["best_eer"], abs=1e-9)
