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


def test_fused_best_snapshot_matches_per_epoch_best_checkpoint(tmp_path):
    """The fused best snapshot carries params AND batch_stats from the best
    epoch — identical to the per-epoch trainer's best checkpoint on disk.
    The data is barely separable so dev EER worsens after epoch 1: the best
    epoch precedes the final one, and a mixed best-params/final-stats
    snapshot would fail this test."""
    import jax

    from dfac_tpu.train.checkpoint import load_model_variables

    def noisy(seed, n=48, f=16, t=24):
        rng = np.random.default_rng(seed)
        labels = (np.arange(n) % 2).astype(np.int32)
        feats = rng.normal(size=(n, f, t)).astype(np.float32)
        # 0.08: weak enough that dev EER worsens after epoch 1 under the
        # byte-threshold dropout trajectory (0.15 stopped producing the
        # best-before-last scenario when dropout switched to u8 masks)
        feats[labels == 1, : f // 2] += 0.08
        return ArrayDataset([f"u{seed}_{i}" for i in range(n)], feats, labels)

    train_ds, dev_ds = noisy(24), noisy(44, n=22)
    cfg = _cfg(epochs=3, seed=4, lr_scheduler="none")

    ref = Trainer(cfg)
    ref_result = ref.fit(train_ds, dev_ds, checkpoint_dir=str(tmp_path))
    ref_best = load_model_variables(str(tmp_path / "cnn1d_best.ckpt"))
    ref_best_epoch = max(m.epoch for m in ref_result["history"] if m.is_best)

    fused = Trainer(cfg)
    got = fused.fit_fused(train_ds, dev_ds)
    best = fused.best_variables()

    assert ref_best_epoch < ref_result["history"][-1].epoch  # scenario holds
    assert got["best_epoch"] == ref_best_epoch
    assert got["best_train_loss"] == pytest.approx(ref_result["best_train_loss"], rel=1e-5)
    assert got["best_dev_loss"] == pytest.approx(ref_result["best_dev_loss"], rel=1e-5)
    for a, b in zip(jax.tree.leaves(best), jax.tree.leaves(ref_best)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6)
    # BN stats moved after the best epoch: snapshot must differ from final
    final_stats = jax.tree.leaves(fused.state.batch_stats)
    best_stats = jax.tree.leaves(best["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(best_stats, final_stats)
    )


def test_fused_resume_continues_run(tmp_path):
    """Resume-into-fused: 2 epochs + save + resume for 2 more == one
    continuous 4-epoch fused run (dropout=0: the PRNG key is not part of
    the checkpoint, so only dropout/augment would diverge)."""
    train_ds, dev_ds = _ds(9), _ds(10, n=22)
    ckpt = str(tmp_path / "resume.ckpt")

    t1 = Trainer(_cfg(epochs=2, dropout=0.0))
    r1 = t1.fit_fused(train_ds, dev_ds)
    t1._save(
        ckpt, epoch=r1["history"][-1].epoch, config_snapshot=None,
        trainer_state={
            "best_eer": r1["best_eer"], "best_train_loss": r1["best_train_loss"],
            "best_dev_loss": r1["best_dev_loss"],
            "epochs_no_improve": r1["epochs_no_improve"], "lr": t1._lr,
        },
    )

    t2 = Trainer(_cfg(epochs=4, dropout=0.0))
    r2 = t2.fit_fused(train_ds, dev_ds, resume_from=ckpt)
    tc = Trainer(_cfg(epochs=4, dropout=0.0))
    rc = tc.fit_fused(train_ds, dev_ds)

    assert [m.epoch for m in r2["history"]] == [3, 4]
    for a, b in zip(r2["history"], rc["history"][2:]):
        assert a.train_loss == pytest.approx(b.train_loss, rel=1e-4)
        assert a.dev_loss == pytest.approx(b.dev_loss, rel=1e-4)
        assert a.dev_eer == pytest.approx(b.dev_eer, abs=1e-9)
    import jax

    for a, b in zip(jax.tree.leaves(t2.state.params), jax.tree.leaves(tc.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)
    assert r2["best_eer"] == pytest.approx(rc["best_eer"], abs=1e-9)


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


def test_fused_resume_already_complete_is_noop(tmp_path):
    """Resuming a fused run whose checkpoint epoch already reached --epochs
    trains zero epochs and must NOT report any best/history artifacts that
    a caller would use to clobber the resume point (the CLI skips both
    checkpoint writes when history is empty)."""
    import os

    from dfac_tpu.cli import train as train_cli
    from dfac_tpu.train.checkpoint import load_checkpoint

    train_ds, dev_ds = _ds(10), _ds(11, n=22)
    cfg = _cfg(epochs=2)
    t1 = Trainer(cfg)
    r1 = t1.fit_fused(train_ds, dev_ds)
    ckpt = str(tmp_path / "done.ckpt")
    t1._save(ckpt, epoch=r1["history"][-1].epoch, config_snapshot=None,
             trainer_state={"best_eer": r1["best_eer"],
                            "best_train_loss": r1["best_train_loss"],
                            "best_dev_loss": r1["best_dev_loss"],
                            "epochs_no_improve": r1["epochs_no_improve"],
                            "lr": t1._lr})

    t2 = Trainer(cfg)  # same epochs target: nothing left to train
    r2 = t2.fit_fused(train_ds, dev_ds, resume_from=ckpt)
    assert r2["history"] == []
    assert r2["best_variables"] is None
    # no new best: trainer must not label the carried last-epoch weights best
    assert getattr(t2, "_best_params", None) is None


def test_fused_resume_no_improvement_keeps_best_unset(tmp_path):
    """A resumed fused run where no epoch improves must not pair the prior
    run's best EER with this run's last-epoch weights."""
    train_ds, dev_ds = _ds(12), _ds(13, n=22)
    t1 = Trainer(_cfg(epochs=3))
    r1 = t1.fit_fused(train_ds, dev_ds)
    ckpt = str(tmp_path / "r1.ckpt")
    t1._save(ckpt, epoch=3, config_snapshot=None,
             trainer_state={"best_eer": r1["best_eer"],
                            "best_train_loss": r1["best_train_loss"],
                            "best_dev_loss": r1["best_dev_loss"],
                            "epochs_no_improve": 3,  # pretend already plateaued
                            "lr": 0.0})

    # lr=0: the resumed epochs cannot improve anything
    t2 = Trainer(_cfg(epochs=5, lr=0.0))
    r2 = t2.fit_fused(train_ds, dev_ds, resume_from=ckpt)
    if not any(m.is_best for m in r2["history"]):
        assert r2["best_variables"] is None
        assert getattr(t2, "_best_params", None) is None
