"""Training runtime tests: optimizer policy, plateau scheduler (golden vs
torch), end-to-end convergence on separable synthetic data, checkpoints."""

import dataclasses

import numpy as np
import pytest

from dfac_tpu.data.pipeline import ArrayDataset
from dfac_tpu.train.checkpoint import load_checkpoint, load_model_variables, save_checkpoint
from dfac_tpu.train.evaluate import evaluate_classifier, predict_scores
from dfac_tpu.train.loop import TrainConfig, Trainer
from dfac_tpu.train.optim import PlateauScheduler, build_optimizer


def _separable_dataset(rng, n=48, t=40, f=16):
    """Bonafide has +mu on half the feature dims: linearly separable."""
    labels = (np.arange(n) % 2).astype(np.int32)
    feats = rng.normal(size=(n, f, t)).astype(np.float32)
    feats[labels == 1, : f // 2, :] += 2.0
    return ArrayDataset(
        uttids=[f"u{i}" for i in range(n)], features=feats, labels=labels
    )


def test_optimizer_policy():
    import optax

    assert isinstance(build_optimizer("cnn2d", 1e-3), optax.GradientTransformation)
    # cnn* default to AdamW(0.01): hyperparams include weight_decay
    state = build_optimizer("cnn2d", 1e-3).init({"w": np.zeros(2, np.float32)})
    assert float(state.hyperparams["weight_decay"]) == pytest.approx(0.01)
    state = build_optimizer("meanpool_mlp", 1e-3).init({"w": np.zeros(2, np.float32)})
    assert "weight_decay" not in state.hyperparams
    state = build_optimizer("meanpool_mlp", 1e-3, weight_decay=0.05).init({"w": np.zeros(2, np.float32)})
    assert float(state.hyperparams["weight_decay"]) == pytest.approx(0.05)


def test_plateau_scheduler_matches_torch():
    torch = pytest.importorskip("torch")
    metrics = [1.0, 0.9, 0.89, 0.895, 0.894, 0.893, 0.40, 0.41, 0.42, 0.43, 0.39, 0.39, 0.39]
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=1e-3)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.5, patience=2, threshold=1e-4, min_lr=1e-6
    )
    ours = PlateauScheduler(factor=0.5, patience=2, threshold=1e-4, min_lr=1e-6)
    lr = 1e-3
    for m in metrics:
        tsched.step(m)
        lr = ours.step(m, lr)
        assert lr == pytest.approx(opt.param_groups[0]["lr"], rel=1e-12), m


def test_plateau_state_roundtrip():
    s = PlateauScheduler(factor=0.3, patience=1)
    s.step(1.0, 1e-3)
    s.step(1.1, 1e-3)
    s2 = PlateauScheduler.from_state_dict(s.state_dict())
    assert s2.best == s.best and s2.num_bad_epochs == s.num_bad_epochs


@pytest.mark.parametrize("model_name", ["cnn2d", "cnn1d"])
def test_training_converges_on_separable_data(rng, model_name, tmp_path):
    train_ds = _separable_dataset(rng)
    dev_ds = _separable_dataset(np.random.default_rng(1), n=24)
    cfg = TrainConfig(
        model=model_name, batch_size=16, epochs=4, lr=2e-3, seed=0,
        in_features=16, early_stop=0, lr_scheduler="plateau",
        label_smoothing=0.05,
    )
    trainer = Trainer(cfg)
    result = trainer.fit(train_ds, dev_ds, checkpoint_dir=str(tmp_path))
    assert result["best_eer"] is not None
    assert result["best_eer"] <= 0.1  # separable -> near-zero EER
    assert (tmp_path / f"{model_name}_best.ckpt").exists()
    assert (tmp_path / f"{model_name}_last.ckpt").exists()

    # reload best checkpoint and re-evaluate: same EER
    variables = load_model_variables(str(tmp_path / f"{model_name}_best.ckpt"))
    metrics, scores, labels = evaluate_classifier(
        trainer.model, variables, dev_ds, batch_size=16, swap_tf=True
    )
    assert metrics["eer"] <= 0.1
    assert len(scores) == len(dev_ds)

    ckpt = load_checkpoint(str(tmp_path / f"{model_name}_best.ckpt"))
    assert ckpt["config"]["model"] == model_name
    assert ckpt["epoch"] >= 1


def test_training_with_augmentation_still_learns(rng):
    from dfac_tpu.data.augment import AugmentConfig

    train_ds = _separable_dataset(rng)
    dev_ds = _separable_dataset(np.random.default_rng(2), n=24)
    cfg = TrainConfig(
        model="cnn1d", batch_size=16, epochs=3, lr=2e-3, in_features=16,
        augment=AugmentConfig(spec_augment=True, time_shift=True, gaussian_jitter=True),
    )
    result = Trainer(cfg).fit(train_ds, dev_ds)
    assert result["best_eer"] is not None and result["best_eer"] <= 0.25


def test_early_stopping_triggers(rng):
    # lr=0 -> nothing improves after epoch 1 -> early stop at patience
    train_ds = _separable_dataset(rng, n=16)
    dev_ds = _separable_dataset(np.random.default_rng(3), n=16)
    cfg = TrainConfig(model="cnn1d", batch_size=16, epochs=50, lr=0.0, in_features=16, early_stop=2)
    trainer = Trainer(cfg)
    result = trainer.fit(train_ds, dev_ds)
    assert len(result["history"]) <= 4  # 1 best + 2 patience (+ slack for ties)


def test_predict_scores_order_and_sigmoid(rng):
    ds = _separable_dataset(rng, n=10)
    cfg = TrainConfig(model="cnn1d", batch_size=4, epochs=1, in_features=16)
    trainer = Trainer(cfg)
    trainer.init_state(ds.features[:4])
    logits = predict_scores(trainer.model, trainer.variables(), ds, batch_size=4)
    probs = predict_scores(trainer.model, trainer.variables(), ds, batch_size=4, apply_sigmoid=True)
    assert logits.shape == probs.shape == (10,)
    np.testing.assert_allclose(probs, 1 / (1 + np.exp(-logits)), atol=1e-6)


def test_checkpoint_raw_state_tolerance(tmp_path, rng):
    """Consumers accept raw variable pytrees (reference src/evaluation.py:197-200)."""
    import pickle

    variables = {"params": {"w": rng.normal(size=(3, 3)).astype(np.float32)}}
    p = str(tmp_path / "raw.ckpt")
    with open(p, "wb") as f:
        pickle.dump(variables, f)
    out = load_model_variables(p)
    np.testing.assert_array_equal(out["params"]["w"], variables["params"]["w"])


def test_label_smoothing_validation():
    with pytest.raises(ValueError):
        TrainConfig(label_smoothing=0.6)


def test_device_resident_training_matches_host_fed(rng):
    """Device-resident training (whole epoch as one scan program with a
    device-side shuffle) learns equivalently to the host-fed path; losses
    are finite and EERs converge on separable data. Exact per-step equality
    is not expected: the shuffle permutation is drawn on device."""
    train_ds = _separable_dataset(rng)
    dev_ds = _separable_dataset(np.random.default_rng(9), n=24)
    results = []
    for resident in (False, True):
        cfg = TrainConfig(
            model="cnn1d", batch_size=16, epochs=3, lr=2e-3, seed=3,
            in_features=16, device_resident=resident,
        )
        results.append(Trainer(cfg).fit(train_ds, dev_ds))
    a, b = results
    assert a["best_eer"] <= 0.1 and b["best_eer"] <= 0.1
    for mb in b["history"]:
        assert np.isfinite(mb.train_loss) and mb.dev_eer is not None
    # epoch batch accounting identical (padding/weights correct)
    assert len(a["history"]) == len(b["history"])


def test_resident_evaluator_matches_host_eval(rng):
    """One-dispatch resident dev eval == host-fed evaluate_classifier
    (loss, EER, threshold) including the padded-tail batch."""
    train_ds = _separable_dataset(rng)
    dev_ds = _separable_dataset(np.random.default_rng(11), n=22)  # ragged tail
    cfg = TrainConfig(model="cnn1d", batch_size=8, epochs=1, lr=2e-3, seed=5,
                      in_features=16, device_resident=True, label_smoothing=0.05)
    trainer = Trainer(cfg)
    trainer.fit(train_ds, dev_ds)

    host_metrics, _, _ = evaluate_classifier(
        trainer.model, trainer.variables(), dev_ds, batch_size=8,
        swap_tf=True, label_smoothing=0.05,
    )
    res_metrics = trainer._resident_dev_metrics(dev_ds)
    assert res_metrics["eer"] == pytest.approx(host_metrics["eer"], abs=1e-12)
    assert res_metrics["threshold"] == pytest.approx(host_metrics["threshold"], abs=1e-5)
    assert res_metrics["avg_loss"] == pytest.approx(host_metrics["avg_loss"], rel=1e-5)


def test_orbax_checkpoint_roundtrip(tmp_path, rng):
    from dfac_tpu.train.checkpoint import (
        load_checkpoint_orbax,
        load_model_variables,
        save_checkpoint_orbax,
    )

    variables = {
        "params": {"w": rng.normal(size=(4, 4)).astype(np.float32)},
        "batch_stats": {"bn": {"mean": np.zeros(4, np.float32)}},
    }
    path = str(tmp_path / "orbax_ck")
    save_checkpoint_orbax(path, variables, epoch=5, config={"model": "cnn2d"})
    ck = load_checkpoint_orbax(path)
    assert ck["epoch"] == 5 and ck["config"]["model"] == "cnn2d"
    np.testing.assert_array_equal(ck["model_state"]["params"]["w"], variables["params"]["w"])
    # directory auto-detection in the unified loader
    out = load_model_variables(path)
    np.testing.assert_array_equal(out["params"]["w"], variables["params"]["w"])


def test_resident_live_ui_warns_once(rng, caplog):
    """device_resident + a live batch UI silently forfeits the one-dispatch
    epoch scan; the trainer must say so (VERDICT r2 weak item 5)."""
    import logging

    ds = _separable_dataset(rng, n=12)
    cfg = TrainConfig(model="cnn2d", batch_size=4, epochs=1, in_features=16,
                      device_resident=True, seed=0)
    trainer = Trainer(cfg)
    trainer.init_state(ds.features[:4])

    class _Ctx:
        wants_updates = True

        def update_batch(self, m):
            pass

    with caplog.at_level(logging.WARNING, logger="dfac_tpu.train.loop"):
        trainer.train_epoch(ds, 1, _Ctx())
        trainer.train_epoch(ds, 2, _Ctx())
    warnings = [r for r in caplog.records if "per-batch dispatch" in r.message]
    assert len(warnings) == 1  # once per trainer, not per epoch

    caplog.clear()
    trainer2 = Trainer(dataclasses.replace(cfg))
    trainer2.init_state(ds.features[:4])
    with caplog.at_level(logging.WARNING, logger="dfac_tpu.train.loop"):
        trainer2.train_epoch(ds, 1, None)  # no live UI: no warning
    assert not [r for r in caplog.records if "per-batch dispatch" in r.message]


@pytest.mark.parametrize("model_name", ["cnn2d", "cnn1d"])
def test_bf16_training_step_compiles_and_is_finite(rng, model_name):
    """One bf16 train step end to end (fwd+bwd+update). Guards the VJP
    dtype contract of every op in the chain — e.g. a preferred_element_type
    mismatch in the depthwise-conv pool only surfaces under bf16 AD."""
    ds = _separable_dataset(rng, n=8)
    cfg = TrainConfig(
        model=model_name, batch_size=4, epochs=1, in_features=16,
        compute_dtype="bfloat16", seed=0,
    )
    trainer = Trainer(cfg)
    trainer.init_state(ds.features[:4])
    loss = trainer.train_epoch(ds, 1, None)
    assert loss is not None and np.isfinite(loss)


def test_bn_freeze_tail_recipe(rng):
    """--bn-freeze-after: epochs after round(epochs*frac) train with BN on
    running stats and stop updating them (the fast-numerics freeze-tail
    recipe, results/train_fast_ab.md); params keep training."""
    import jax

    ds = _separable_dataset(rng, n=48)
    cfg = TrainConfig(
        model="cnn2d", batch_size=16, epochs=4, in_features=16, seed=0,
        dropout=0.2, bn_freeze_after_frac=0.5,
    )
    trainer = Trainer(cfg)
    trainer.init_state(ds.features[:16])
    assert [trainer._bn_frozen_at(e) for e in range(1, 5)] == [
        False, False, True, True,
    ]

    # warmup epochs update running stats
    stats0 = jax.device_get(trainer.state.batch_stats)
    trainer.train_epoch(ds, 1, None)
    trainer.train_epoch(ds, 2, None)
    stats_warm = jax.device_get(trainer.state.batch_stats)
    moved = jax.tree.map(
        lambda a, b: float(np.abs(a - b).max()), stats0, stats_warm
    )
    assert max(jax.tree.leaves(moved)) > 0.0

    # frozen epochs: stats bit-identical, params still moving
    params_before = jax.device_get(trainer.state.params)
    loss3 = trainer.train_epoch(ds, 3, None)
    loss4 = trainer.train_epoch(ds, 4, None)
    assert np.isfinite(loss3) and np.isfinite(loss4)
    stats_frozen = jax.device_get(trainer.state.batch_stats)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b), stats_warm, stats_frozen
    )
    params_after = jax.device_get(trainer.state.params)
    deltas = jax.tree.map(
        lambda a, b: float(np.abs(a - b).max()), params_before, params_after
    )
    assert max(jax.tree.leaves(deltas)) > 0.0


def test_bn_freeze_paths_agree(rng):
    """The freeze-tail recipe walks the same trajectory through the plain
    host loop, the device-resident epoch scan, and chunked streaming
    (identical batches + PRNG chain; floats agree up to XLA reassociation
    across the differently compiled programs)."""
    ds = _separable_dataset(rng, n=40)
    base = dict(
        model="cnn2d", batch_size=16, epochs=4, in_features=16, seed=0,
        dropout=0.0, bn_freeze_after_frac=0.5,
    )
    import jax

    losses = {}
    for tag, extra in (
        ("host", {}),
        ("resident", {"device_resident": True}),
        ("chunked", {"resident_chunk_batches": 2}),
    ):
        trainer = Trainer(TrainConfig(**base, **extra))
        trainer.init_state(ds.features[:16])
        losses[tag] = [trainer.train_epoch(ds, e, None) for e in (1, 2)]
        stats_warm = jax.device_get(trainer.state.batch_stats)
        losses[tag] += [trainer.train_epoch(ds, e, None) for e in (3, 4)]
        # the freeze boundary must hold in EVERY path: epochs 3-4 leave the
        # running stats bit-identical
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(a, b),
            stats_warm, jax.device_get(trainer.state.batch_stats),
        )
    # host loop and chunked share the SAME host-side shuffle and key chain;
    # the scan body and the standalone step compile as different programs,
    # so floats drift through Adam — the established chunked-parity band
    # is atol = 20*lr (tests/test_chunked.py). The resident scan shuffles
    # on device, so compare its convergence only.
    np.testing.assert_allclose(
        losses["host"], losses["chunked"], atol=20 * 1e-3
    )
    assert np.isfinite(losses["resident"]).all()
    assert losses["resident"][-1] < losses["resident"][0]


def test_bn_freeze_config_validation():
    with pytest.raises(ValueError, match="bn_freeze_after_frac"):
        TrainConfig(bn_freeze_after_frac=1.5)
    # composes with the DP/multihost per-epoch paths (frozen shard_map step)
    TrainConfig(bn_freeze_after_frac=0.5, data_parallel=8)


def test_bn_freeze_fused_matches_per_epoch(rng):
    """--train-fast composes with --fused-fit: the fused program switches
    epoch bodies with lax.cond at the freeze boundary and must walk the
    EXACT per-epoch device-resident trajectory (same epoch-scan shuffle
    seeds, same resident eval)."""
    ds = _separable_dataset(rng, n=40)
    dev = _separable_dataset(rng, n=24)
    cfg = TrainConfig(
        model="cnn2d", batch_size=16, epochs=4, in_features=16, seed=0,
        dropout=0.0, bn_freeze_after_frac=0.5, device_resident=True,
    )
    per_epoch = Trainer(cfg)
    res_pe = per_epoch.fit(ds, dev)
    fused = Trainer(cfg)
    res_f = fused.fit_fused(ds, dev)
    assert res_f["best_eer"] == res_pe["best_eer"], (
        res_f["best_eer"], res_pe["best_eer"],
    )
    # the cond-wrapped frozen epoch body compiles differently from the
    # standalone frozen scan: reassociation drift ~2e-5 rel appears at the
    # first frozen epoch (a boundary bug — wrong epoch frozen — moves
    # losses by 1e-2+ and changes the running stats)
    np.testing.assert_allclose(
        [m.train_loss for m in res_f["history"]],
        [m.train_loss for m in res_pe["history"]], rtol=2e-4,
    )


def test_bn_freeze_dp_step_matches_single_device(rng):
    """The frozen shard_map DP step (--train-fast --data-parallel) must
    match the single-device frozen step on the same global batch, and
    leave the replicated running stats bit-identical."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from dfac_tpu.parallel.data_parallel import make_shard_map_train_step
    from dfac_tpu.parallel.mesh import make_mesh

    ds = _separable_dataset(rng, n=16)
    dp_cfg = TrainConfig(
        model="cnn2d", batch_size=16, epochs=1, in_features=16, seed=0,
        dropout=0.0, data_parallel=8, bn_freeze_after_frac=0.5,
    )
    dp_trainer = Trainer(dp_cfg)
    dp_trainer.init_state(ds.features[:16])
    # prime running stats so frozen-BN normalization is non-trivial
    dp_trainer.train_epoch(ds, 1, None)
    stats_before = jax.device_get(dp_trainer.state.batch_stats)

    frozen_dp = dp_trainer._frozen_train_step()
    import jax.numpy as jnp

    feats = jnp.asarray(ds.features)
    labels = jnp.asarray(np.asarray(ds.labels, np.float32))
    w = jnp.ones((16,), jnp.float32)
    new_state, dp_loss, count = frozen_dp(dp_trainer.state, feats, labels, w)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        stats_before, jax.device_get(new_state.batch_stats),
    )
    assert int(count) == 16

    from dfac_tpu.train.loop import make_train_step
    from dfac_tpu.models import build_model

    sd_model = build_model("cnn2d", in_features=16, dropout=0.0)
    sd_step = make_train_step(
        sd_model, dp_trainer.tx, swap_tf=True, label_smoothing=0.0,
        augment_fn=None, bn_frozen=True,
    )
    _, sd_loss, _ = sd_step(dp_trainer.state, feats, labels, w)
    np.testing.assert_allclose(
        float(dp_loss), float(sd_loss), rtol=1e-5,
        err_msg="frozen DP loss must match single-device frozen step",
    )
