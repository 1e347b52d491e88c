"""Checkpoint auto-resume + profiling observability tests."""

import numpy as np
import pytest

from dfac_tpu.data.pipeline import ArrayDataset
from dfac_tpu.obs.profiling import ThroughputMeter, trace
from dfac_tpu.train.loop import TrainConfig, Trainer


def _ds(seed, n=24, f=16, t=20):
    rng = np.random.default_rng(seed)
    labels = (np.arange(n) % 2).astype(np.int32)
    feats = rng.normal(size=(n, f, t)).astype(np.float32)
    feats[labels == 1, : f // 2] += 2.0
    return ArrayDataset([f"u{seed}_{i}" for i in range(n)], feats, labels)


@pytest.mark.parametrize("fmt", ["pickle", "orbax"])
def test_resume_continues_from_checkpoint(tmp_path, fmt):
    train_ds, dev_ds = _ds(0), _ds(1, 16)
    cfg = TrainConfig(model="cnn1d", batch_size=8, epochs=2, in_features=16,
                      lr=2e-3, lr_scheduler="plateau", checkpoint_format=fmt)
    t1 = Trainer(cfg)
    t1.fit(train_ds, dev_ds, checkpoint_dir=str(tmp_path))

    # resume for 2 more epochs
    cfg2 = TrainConfig(model="cnn1d", batch_size=8, epochs=4, in_features=16,
                       lr=2e-3, lr_scheduler="plateau", checkpoint_format=fmt)
    t2 = Trainer(cfg2)
    result = t2.fit(
        train_ds, dev_ds, checkpoint_dir=str(tmp_path),
        resume_from=str(tmp_path / "cnn1d_last.ckpt"),
    )
    epochs = [m.epoch for m in result["history"]]
    assert epochs == [3, 4]  # continued, not restarted

    # resumed params actually load: scores from t2's restored-then-trained
    # model should be finite and the run should carry best tracking forward
    assert result["best_eer"] is not None


def test_resume_restores_scheduler_and_lr(tmp_path):
    train_ds, dev_ds = _ds(2), _ds(3, 16)
    cfg = TrainConfig(model="cnn1d", batch_size=8, epochs=1, in_features=16,
                      lr=1e-3, lr_scheduler="plateau", lr_scheduler_patience=0)
    t1 = Trainer(cfg)
    t1.fit(train_ds, dev_ds, checkpoint_dir=str(tmp_path))
    sched_best = t1.scheduler.best

    t2 = Trainer(cfg)
    restored = t2.restore(str(tmp_path / "cnn1d_last.ckpt"))
    assert restored["epoch"] == 1
    assert t2.scheduler.best == sched_best
    assert restored["trainer_state"]["best_eer"] is not None


def test_throughput_meter():
    m = ThroughputMeter(window=4)
    for _ in range(6):
        m.update(10)
    assert m.total_utt_s > 0
    assert m.window_utt_s > 0


def test_trace_noop_without_dir():
    with trace(None):
        pass  # must not require jax.profiler


def test_trace_writes_profile(tmp_path):
    import glob

    import jax
    import jax.numpy as jnp

    with trace(str(tmp_path / "prof")):
        jnp.sum(jnp.ones((8, 8))).block_until_ready()
    assert glob.glob(str(tmp_path / "prof" / "**" / "*"), recursive=True)


def test_orbax_full_state_roundtrip(tmp_path):
    """Orbax checkpoints carry the FULL train state: optimizer state
    (structure and moments), scheduler state, trainer counters — a resume
    through the orbax path continues with the same optimizer moments as the
    pickle path."""
    import jax
    import numpy as np

    from dfac_tpu.train.checkpoint import load_checkpoint

    train_ds, dev_ds = _ds(4), _ds(5, 16)
    cfg = TrainConfig(model="cnn1d", batch_size=8, epochs=1, in_features=16,
                      lr=2e-3, lr_scheduler="plateau", checkpoint_format="orbax")
    t1 = Trainer(cfg)
    t1.fit(train_ds, dev_ds, checkpoint_dir=str(tmp_path))

    ck = load_checkpoint(str(tmp_path / "cnn1d_last.ckpt"))
    assert ck["epoch"] == 1
    assert ck["optimizer_state"] is not None
    assert ck.get("scheduler_state") is not None
    assert ck["config"]["_trainer_state"]["best_eer"] is not None
    # optimizer state round-trips structurally AND numerically
    ref_leaves = jax.tree.leaves(t1.state.opt_state)
    got_leaves = jax.tree.leaves(ck["optimizer_state"])
    assert len(ref_leaves) == len(got_leaves)
    for a, b in zip(ref_leaves, got_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    # restored optimizer state drives a real update step
    t2 = Trainer(cfg)
    t2.restore(str(tmp_path / "cnn1d_last.ckpt"))
    assert t2.scheduler.best == t1.scheduler.best
    t2.train_epoch(train_ds, epoch=2)
