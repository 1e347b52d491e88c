"""Fast-numerics recipes on the detector and CAE trainers (VERDICT r4
item 5): BN freeze tail (+ dropout-free on the detector), through the
per-epoch, resident, chunked, and fused paths. Mirrors the supervised
trainer's tests/test_train.py BN-freeze suite."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfac_tpu.data.pipeline import ArrayDataset
from dfac_tpu.train.cae_loop import CAEConfig, CAETrainer
from dfac_tpu.train.detector_loop import (
    DetectorConfig,
    DetectorTrainer,
    make_detector_train_step,
)

C_, T_ = 12, 20


def _ds(seed, n=24, f=C_, t=T_):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(n, f, t)).astype(np.float32)
    labels = (np.arange(n) % 2).astype(np.int32)
    feats[labels == 1, :4] += 2.0
    return ArrayDataset([f"u{seed}_{i}" for i in range(n)], feats, labels)


def _cae_ds(seed, n=24):
    # the CAE's 4-stage floor-pool chain needs T >= 16 AND F >= 16
    return _ds(seed, n, f=16, t=20)


def test_detector_frozen_step_freezes_stats_keeps_params_and_ema():
    """bn_frozen=True: batch_stats bit-identical through the step; params
    and the EMA keep updating (the freeze x EMA interaction is the point —
    EMA averages params over FIXED stats, a self-consistent eval pairing)."""
    import optax

    from dfac_tpu.models import build_model
    from dfac_tpu.train.detector_loop import DetectorState
    from dfac_tpu.utils.rng import train_key

    cfg = DetectorConfig(epochs=1, batch_size=8, hidden=8, dropout=0.0, ema=True)
    model = build_model("detector", in_channels=C_, hidden=8, dropout=0.0)
    tx = optax.adamw(1e-3)
    x0 = jnp.zeros((1, T_, C_))
    variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(0)}, x0)
    state = DetectorState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        ema_params=variables["params"],
        opt_state=tx.init(variables["params"]),
        key=train_key(0),
    )
    ds = _ds(0, n=8)
    feats = jnp.asarray(ds.features)
    lens = jnp.full((8,), T_, jnp.int32)
    labels = jnp.asarray(ds.labels.astype(np.float32))

    frozen_step = make_detector_train_step(model, tx, cfg, 1.0, bn_frozen=True)
    s1, loss = frozen_step(state, feats, lens, labels)
    assert np.isfinite(float(loss))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(state.batch_stats), jax.device_get(s1.batch_stats),
    )
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        jax.device_get(state.params), jax.device_get(s1.params),
    )
    assert max(jax.tree.leaves(moved)) > 0.0
    ema_moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        jax.device_get(state.ema_params), jax.device_get(s1.ema_params),
    )
    assert max(jax.tree.leaves(ema_moved)) > 0.0

    # the unfrozen step DOES move the stats on the same batch
    plain_step = make_detector_train_step(model, tx, cfg, 1.0)
    s2, _ = plain_step(state, feats, lens, labels)
    stat_moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        jax.device_get(state.batch_stats), jax.device_get(s2.batch_stats),
    )
    assert max(jax.tree.leaves(stat_moved)) > 0.0


@pytest.mark.parametrize("mode", ["host", "resident", "chunked"])
def test_detector_fit_freeze_tail_boundary(mode):
    """bn_freeze_after_frac: with the boundary at epoch 0 every epoch is
    frozen, so the running stats end exactly at their init (mean 0, var 1)
    on every training path; with 0 they move."""
    extra = {}
    if mode == "resident":
        extra["device_resident"] = True
    if mode == "chunked":
        extra["resident_chunk_batches"] = 2
    cfg = DetectorConfig(
        epochs=2, batch_size=8, hidden=8, dropout=0.0, seed=1,
        bn_freeze_after_frac=1e-9, **extra,
    )
    tr = DetectorTrainer(cfg, in_channels=C_)
    tr.fit(_ds(1), _ds(2, 16))
    for name, d in jax.device_get(tr.state.batch_stats).items():
        np.testing.assert_array_equal(np.asarray(d["mean"]), 0.0)
        np.testing.assert_array_equal(np.asarray(d["var"]), 1.0)

    tr2 = DetectorTrainer(
        DetectorConfig(epochs=2, batch_size=8, hidden=8, dropout=0.0, seed=1, **extra),
        in_channels=C_,
    )
    tr2.fit(_ds(1), _ds(2, 16))
    moved = jax.tree.map(
        lambda d: float(np.abs(np.asarray(d)).max()),
        jax.device_get(tr2.state.batch_stats),
    )
    assert max(jax.tree.leaves(moved)) > 0.0


def test_detector_fused_freeze_matches_per_epoch(tmp_path):
    """--train-fast x --fused-fit on the detector: the fused program's
    lax.cond freeze boundary walks the same trajectory as fit()'s
    per-epoch switch (device_resident so both drive the same epoch scan)."""
    cfg = DetectorConfig(
        epochs=4, batch_size=8, hidden=8, dropout=0.0, ema=True, seed=3,
        patience=10, device_resident=True, bn_freeze_after_frac=0.5,
    )
    train, dev = _ds(3), _ds(4, 16)
    ref = DetectorTrainer(cfg, in_channels=C_).fit(train, dev)
    got = DetectorTrainer(cfg, in_channels=C_).fit_fused(train, dev)
    assert len(got["history"]) == len(ref["history"])
    for a, b in zip(ref["history"], got["history"]):
        assert b["dev_eer"] == pytest.approx(a["dev_eer"], abs=1e-6)
        assert b["train_loss"] == pytest.approx(a["train_loss"], rel=1e-4)
    assert got["best_eer"] == pytest.approx(ref["best_eer"], abs=1e-6)


def test_cae_fit_freeze_tail_boundary():
    """CAE freeze tail: boundary at 0 leaves every (encoder + decoder)
    BatchNorm's running stats at init through a whole fit."""
    cfg = CAEConfig(
        epochs=2, batch_size=8, base_channels=4, seed=0,
        bn_freeze_after_frac=1e-9,
    )
    tr = CAETrainer(cfg)
    tr.fit(_cae_ds(5, n=30), _cae_ds(6, 16))
    stats = jax.device_get(tr.state.batch_stats)
    assert any(k.startswith("dec_bn") for k in stats)  # decoder BNs covered
    for name, d in stats.items():
        np.testing.assert_array_equal(np.asarray(d["mean"]), 0.0)
        np.testing.assert_array_equal(np.asarray(d["var"]), 1.0)


def test_cae_fused_freeze_matches_per_epoch(tmp_path):
    """--train-fast x --fused-fit on the CAE: fused lax.cond boundary ==
    fit()'s per-epoch switch."""
    cfg = CAEConfig(
        epochs=4, batch_size=8, base_channels=4, seed=2, lr=1e-3,
        device_resident=True, bn_freeze_after_frac=0.5, early_stop=10,
    )
    train, dev = _cae_ds(7, n=30), _cae_ds(8, 16)
    ref_tr = CAETrainer(cfg)
    ref = ref_tr.fit(train, dev)
    got_tr = CAETrainer(cfg)
    got = got_tr.fit_fused(train, dev)
    assert len(got["history"]) == len(ref["history"])
    for a, b in zip(ref["history"], got["history"]):
        assert b.train_loss == pytest.approx(a.train_loss, rel=1e-4)
    assert got["best_val_mse"] == pytest.approx(ref["best_val_mse"], rel=1e-4)


def test_cli_fast_recipes():
    """--train-fast expands to the gated recipe on both alt CLIs."""
    from dfac_tpu.cli.train_cae import parse_args as cae_args
    from dfac_tpu.cli.train_detector import parse_args as det_args

    a = det_args(["--train-fast"])
    assert a.dropout == 0.0 and a.encoder_dropout == 0.0
    assert a.bn_freeze_after == 0.5
    a = det_args(["--train-fast", "--bn-freeze-after", "0.8"])
    assert a.bn_freeze_after == 0.8

    base = [
        "--train-features", "x", "--train-labels", "y",
        "--dev-features", "x", "--dev-labels", "y",
    ]
    a = cae_args(base + ["--train-fast"])
    assert a.bn_freeze_after == 0.5
