"""Folded-BN / no-transpose fast inference path: equivalence tests."""

import jax
import jax.numpy as jnp
import numpy as np

from dfac_tpu.models import build_model
from dfac_tpu.models.fast_infer import cnn2d_fast_scores, fold_cnn2d

F_, T_, B_ = 20, 33, 4


def _trained_like_variables(rng):
    """Variables with non-trivial BN running stats (as after training)."""
    model = build_model("cnn2d", in_features=F_, base_channels=8)
    variables = model.init({"params": jax.random.key(0)}, jnp.zeros((1, T_, F_)))
    variables = jax.tree.map(lambda a: a, variables)  # shallow copy
    bs = variables["batch_stats"]
    for name, d in bs.items():
        d["mean"] = jnp.asarray(rng.normal(size=d["mean"].shape) * 0.3, jnp.float32)
        d["var"] = jnp.asarray(rng.random(d["var"].shape) + 0.5, jnp.float32)
    return model, variables


def test_fast_path_matches_reference_path(rng):
    model, variables = _trained_like_variables(rng)
    feats_stored = rng.normal(size=(B_, F_, T_)).astype(np.float32)

    ref_logits = model.apply(variables, jnp.transpose(jnp.asarray(feats_stored), (0, 2, 1)))
    ref = np.asarray(jax.nn.sigmoid(ref_logits[:, 0]))

    folded = fold_cnn2d(variables)
    got = np.asarray(cnn2d_fast_scores(folded, jnp.asarray(feats_stored)))
    # bf16 activations: scores agree to ~1e-2 absolute on sigmoid scale
    np.testing.assert_allclose(got, ref, atol=2e-2)

    # f32 compute: tight agreement
    got32 = np.asarray(
        cnn2d_fast_scores(folded, jnp.asarray(feats_stored), compute_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got32, ref, atol=1e-5)


def test_fast_path_preserves_score_ordering(rng):
    """EER only depends on score order — bf16 must preserve it on
    well-separated inputs."""
    model, variables = _trained_like_variables(rng)
    feats = rng.normal(size=(32, F_, T_)).astype(np.float32)
    feats[::2, : F_ // 2] += 2.0  # spread the logit distribution
    ref_logits = np.asarray(
        model.apply(variables, jnp.transpose(jnp.asarray(feats), (0, 2, 1)))
    )[:, 0]
    folded = fold_cnn2d(variables)
    fast = np.asarray(cnn2d_fast_scores(folded, jnp.asarray(feats), apply_sigmoid=False))
    # high rank correlation (bf16 noise may swap near-ties; an untrained
    # random model produces tightly clustered logits, hence Spearman not
    # exact-rank equality)
    ref_rank = np.argsort(np.argsort(ref_logits)).astype(np.float64)
    fast_rank = np.argsort(np.argsort(fast)).astype(np.float64)
    rho = np.corrcoef(ref_rank, fast_rank)[0, 1]
    assert rho > 0.97


def test_bf16_inference_preserves_eer(rng):
    """BASELINE requirement: dev EER within 0.1% absolute of the f32 path."""
    from dfac_tpu.data.pipeline import ArrayDataset
    from dfac_tpu.ops.eer import calculate_eer
    from dfac_tpu.train.loop import TrainConfig, Trainer

    n = 48
    labels = (np.arange(n) % 2).astype(np.int32)
    feats = rng.normal(size=(n, 16, 24)).astype(np.float32)
    feats[labels == 1, :8] += 1.5
    train_ds = ArrayDataset([f"t{i}" for i in range(n)], feats, labels)
    cfg = TrainConfig(model="cnn2d", in_features=16, batch_size=16, epochs=2, lr=2e-3)
    trainer = Trainer(cfg)
    trainer.fit(train_ds, train_ds)

    from dfac_tpu.train.evaluate import predict_scores

    f32_scores = predict_scores(trainer.model, trainer.variables(), train_ds, 16)
    bf16_model = build_model("cnn2d", in_features=16, compute_dtype=jnp.bfloat16)
    bf16_scores = predict_scores(bf16_model, trainer.variables(), train_ds, 16)
    eer32, _ = calculate_eer(f32_scores, labels)
    eer16, _ = calculate_eer(bf16_scores, labels)
    assert abs(eer16 - eer32) <= 0.001


def test_fast_tf_path_matches_reference_path(rng):
    """(B, T, F)-native fast path == CNN2D.apply on the same grid (no input
    transpose anywhere)."""
    from dfac_tpu.models.fast_infer import cnn2d_fast_scores_tf

    model, variables = _trained_like_variables(rng)
    feats_tf = rng.normal(size=(B_, T_, F_)).astype(np.float32)

    ref_logits = model.apply(variables, jnp.asarray(feats_tf))
    ref = np.asarray(jax.nn.sigmoid(ref_logits[:, 0]))

    folded = fold_cnn2d(variables)
    got32 = np.asarray(
        cnn2d_fast_scores_tf(folded, jnp.asarray(feats_tf), compute_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got32, ref, atol=1e-5)
    # and identical to the stored-orientation fast path on the same data
    got_stored = np.asarray(
        cnn2d_fast_scores(
            folded, jnp.transpose(jnp.asarray(feats_tf), (0, 2, 1)),
            compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(got32, got_stored, atol=1e-6)


def test_e2e_transpose_free_serving_chain(rng):
    """gemm_lfcc_features_tf -> cnn2d_fast_scores_tf (zero transposes) ==
    stored-orientation frontend -> swap -> CNN2D.apply."""
    from jax.experimental.pallas import tpu as pltpu

    from dfac_tpu.features.lfcc import LFCCConfig
    from dfac_tpu.models.fast_infer import cnn2d_fast_scores_tf
    from dfac_tpu.ops.pallas.gemm_frontend import gemm_lfcc_features, gemm_lfcc_features_tf

    cfg = LFCCConfig()
    n_frames = 17
    waves = rng.normal(size=(2, cfg.num_samples(n_frames))).astype(np.float32)

    model = build_model("cnn2d", in_features=cfg.feature_dim, base_channels=8)
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, n_frames, cfg.feature_dim))
    )
    folded = fold_cnn2d(variables)

    with pltpu.force_tpu_interpret_mode():
        feats_tf = gemm_lfcc_features_tf(jnp.asarray(waves), cfg)
        feats_stored = gemm_lfcc_features(jnp.asarray(waves), cfg)
        got = np.asarray(
            cnn2d_fast_scores_tf(folded, feats_tf, compute_dtype=jnp.float32)
        )
    np.testing.assert_array_equal(
        np.asarray(feats_tf), np.asarray(feats_stored).transpose(0, 2, 1)
    )
    ref = np.asarray(
        jax.nn.sigmoid(
            model.apply(variables, jnp.transpose(feats_stored, (0, 2, 1)))[:, 0]
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


def _randomize_bn(variables, rng):
    bs = variables.get("batch_stats", {})
    for name, d in bs.items():
        d["mean"] = jnp.asarray(rng.normal(size=d["mean"].shape) * 0.3, jnp.float32)
        d["var"] = jnp.asarray(rng.random(d["var"].shape) + 0.5, jnp.float32)
    return variables


def test_cnn1d_fast_path_matches_reference_path(rng):
    from dfac_tpu.models.fast_infer import cnn1d_fast_scores, fold_cnn1d

    model = build_model("cnn1d", in_channels=F_, base_channels=8)
    variables = _randomize_bn(
        model.init({"params": jax.random.key(0)}, jnp.zeros((1, T_, F_))), rng
    )
    feats_stored = rng.normal(size=(B_, F_, T_)).astype(np.float32)

    ref_logits = model.apply(variables, jnp.transpose(jnp.asarray(feats_stored), (0, 2, 1)))
    ref = np.asarray(jax.nn.sigmoid(ref_logits[:, 0]))

    folded = fold_cnn1d(variables)
    got32 = np.asarray(
        cnn1d_fast_scores(folded, jnp.asarray(feats_stored), compute_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got32, ref, atol=1e-5)
    got16 = np.asarray(cnn1d_fast_scores(folded, jnp.asarray(feats_stored)))
    np.testing.assert_allclose(got16, ref, atol=2e-2)


def test_cae_fast_mse_matches_reference_path(rng):
    """Folded CAE chain == normalize -> model.apply -> per-sample MSE
    (the hybrid submission path's CAE leg), both at the production-like
    geometry rule (odd T) and in both dtypes."""
    from dfac_tpu.models.cae import reconstruction_mse
    from dfac_tpu.models.fast_infer import cae_fast_mse, fold_cae

    t_dim, f_dim = 37, 20  # odd T exercises the output_padding trace
    model = build_model("cae", base_channels=8)
    variables = _randomize_bn(
        model.init({"params": jax.random.key(0)}, jnp.zeros((1, t_dim, f_dim))), rng
    )
    feats_stored = rng.normal(size=(B_, f_dim, t_dim)).astype(np.float32)
    mean = jnp.asarray(rng.normal(size=(f_dim,)).astype(np.float32) * 0.2)
    std = jnp.asarray((rng.random(f_dim) + 0.5).astype(np.float32))

    x = (jnp.transpose(jnp.asarray(feats_stored), (0, 2, 1)) - mean) / std
    recon, _ = model.apply(variables, x)
    ref = np.asarray(reconstruction_mse(recon, x))

    folded = fold_cae(variables)
    got32 = np.asarray(
        cae_fast_mse(folded, jnp.asarray(feats_stored), mean, std, compute_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got32, ref, rtol=1e-4)
    got16 = np.asarray(cae_fast_mse(folded, jnp.asarray(feats_stored), mean, std))
    np.testing.assert_allclose(got16, ref, rtol=0.1)  # bf16 activations


def test_fast_path_streams_from_npy_store(rng, tmp_path):
    """The production disk -> scores composition: a memory-mapped npy store
    fed through the folded-BN fast chain (host bf16 cast + async
    device_put per batch, ``models/fast_infer._ingest``) must match
    scoring the same corpus from memory."""
    from dfac_tpu.data.pipeline import ArrayDataset, load_dataset
    from dfac_tpu.io.npy_store import save_npy_dataset
    from dfac_tpu.models.fast_infer import predict_scores_fast

    model, variables = _trained_like_variables(rng)
    n = 11  # deliberately not a multiple of the batch size (tail masking)
    feats = rng.normal(size=(n, F_, T_)).astype(np.float32)
    ds_mem = ArrayDataset(
        uttids=[f"u{i}" for i in range(n)], features=feats, labels=None
    )
    store = str(tmp_path / "store")
    save_npy_dataset(ds_mem, store)
    ds_disk = load_dataset(store)  # memmapped features

    kw = dict(batch_size=4, swap_tf=True, apply_sigmoid=True,
              compute_dtype=jnp.float32)
    from_mem = predict_scores_fast(variables, ds_mem, **kw)
    from_disk = predict_scores_fast(variables, ds_disk, **kw)
    assert from_disk.shape == (n,)
    np.testing.assert_allclose(from_disk, from_mem, atol=1e-6)

    # bf16 ingest (the production default): same path, host-side cast
    kw["compute_dtype"] = jnp.bfloat16
    bf16_disk = predict_scores_fast(variables, ds_disk, **kw)
    np.testing.assert_allclose(bf16_disk, from_mem, atol=2e-2)


def test_detector_fast_path_matches_reference_path(rng):
    """Folded detector chain == DeepfakeDetector.apply in eval mode, with
    a real length mask (variable-length rows) and randomized BN stats."""
    from dfac_tpu.models.fast_infer import detector_fast_scores, fold_detector

    model = build_model("detector", in_channels=F_, hidden=24, dropout=0.3)
    variables = _randomize_bn(
        model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            jnp.zeros((1, T_, F_)),
        ),
        rng,
    )
    feats_stored = rng.normal(size=(B_, F_, T_)).astype(np.float32)
    lengths = rng.integers(3, T_ + 1, size=(B_,)).astype(np.int32)

    ref = np.asarray(
        model.apply(
            variables, jnp.transpose(jnp.asarray(feats_stored), (0, 2, 1)),
            lengths=jnp.asarray(lengths),
        )
    )

    folded = fold_detector(variables)
    got32 = np.asarray(
        detector_fast_scores(
            folded, jnp.asarray(feats_stored), jnp.asarray(lengths),
            compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(got32, ref, atol=1e-4)
    got16 = np.asarray(
        detector_fast_scores(folded, jnp.asarray(feats_stored), jnp.asarray(lengths))
    )
    np.testing.assert_allclose(got16, ref, atol=0.15)  # bf16 activations


def test_detector_scores_fast_corpus(rng):
    """Whole-corpus folded scorer: dataset order, tail handling, parity
    with the per-batch slow scorer."""
    from dfac_tpu.data.pipeline import ArrayDataset
    from dfac_tpu.models.fast_infer import detector_scores_fast
    from dfac_tpu.train.detector_loop import detector_scores

    n = 21  # forces a padded tail at batch_size 8
    model = build_model("detector", in_channels=F_, hidden=16, dropout=0.0)
    variables = _randomize_bn(
        model.init(
            {"params": jax.random.key(2), "dropout": jax.random.key(3)},
            jnp.zeros((1, T_, F_)),
        ),
        rng,
    )
    feats = rng.normal(size=(n, F_, T_)).astype(np.float32)
    lengths = rng.integers(3, T_ + 1, size=(n,)).astype(np.int32)
    ds = ArrayDataset([f"u{i}" for i in range(n)], feats, None)

    slow = detector_scores(model, variables, ds, lengths, batch_size=8)
    fast = detector_scores_fast(
        variables, ds, lengths, batch_size=8, compute_dtype=jnp.float32
    )
    assert fast.shape == (n,)
    np.testing.assert_allclose(fast, slow, atol=1e-4)


def test_cae_corpus_scorer_does_not_prequantize_input(rng):
    """Regression: cae_mse_scores_fast must upload f32 features — the MSE
    TARGET is formed in f32 from the raw input inside cae_fast_mse, so a
    host bf16 pre-cast (valid for the classifier chains whose first op IS
    the bf16 cast) would silently shift every CAE score."""
    from dfac_tpu.data.normalizer import FeatureNormalizer
    from dfac_tpu.data.pipeline import ArrayDataset
    from dfac_tpu.models.fast_infer import cae_fast_mse, cae_mse_scores_fast, fold_cae

    t_dim, f_dim, n = 24, 16, 10
    model = build_model("cae", base_channels=4)
    variables = model.init({"params": jax.random.key(5)}, jnp.zeros((1, t_dim, f_dim)))
    feats = rng.normal(size=(n, f_dim, t_dim)).astype(np.float32)
    ds = ArrayDataset([f"u{i}" for i in range(n)], feats, None)
    normalizer = FeatureNormalizer(
        mean=rng.normal(size=(f_dim,)).astype(np.float32) * 0.2,
        std=(rng.random(f_dim) + 0.5).astype(np.float32),
    )

    got = cae_mse_scores_fast(variables, ds, normalizer, batch_size=4)  # bf16 chain
    folded = fold_cae(variables)
    want = np.asarray(
        cae_fast_mse(
            folded, jnp.asarray(feats),  # raw f32 input, same bf16 chain
            jnp.asarray(normalizer.mean), jnp.asarray(normalizer.std),
        )
    )
    np.testing.assert_array_equal(got, want)


def test_q8_chain_matches_f32_chain(rng):
    """int8-quantized ingest: scores through cnn2d_fast_scores_q8 must sit
    within the quantization step of the unquantized chain, in both
    orientations (q8 is a transfer-format change, not a model change)."""
    from dfac_tpu.io.fastcast import quant_i8
    from dfac_tpu.models.fast_infer import cnn2d_fast_scores_q8, fold_cnn2d

    model, variables = _trained_like_variables(rng)
    feats_stored = rng.normal(size=(B_, F_, T_)).astype(np.float32)
    folded = fold_cnn2d(variables)

    ref = np.asarray(
        cnn2d_fast_scores(folded, jnp.asarray(feats_stored), compute_dtype=jnp.float32)
    )
    q, s = quant_i8(feats_stored)
    got = np.asarray(
        cnn2d_fast_scores_q8(
            folded, jnp.asarray(q), jnp.asarray(s), compute_dtype=jnp.float32
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-2)

    # tf orientation: quantize the (B, T, F) rows, same contract
    from dfac_tpu.models.fast_infer import cnn2d_fast_scores_tf

    feats_tf = np.ascontiguousarray(feats_stored.transpose(0, 2, 1))
    ref_tf = np.asarray(
        cnn2d_fast_scores_tf(folded, jnp.asarray(feats_tf), compute_dtype=jnp.float32)
    )
    qt, st = quant_i8(feats_tf)
    got_tf = np.asarray(
        cnn2d_fast_scores_q8(
            folded, jnp.asarray(qt), jnp.asarray(st), swap_tf=False,
            compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(got_tf, ref_tf, atol=2e-2)


def test_q8_cnn1d_chain_matches_f32_chain(rng):
    from dfac_tpu.io.fastcast import quant_i8
    from dfac_tpu.models.fast_infer import (
        cnn1d_fast_scores,
        cnn1d_fast_scores_q8,
        fold_cnn1d,
    )

    model = build_model("cnn1d", in_channels=F_, base_channels=8)
    variables = _randomize_bn(
        model.init({"params": jax.random.key(0)}, jnp.zeros((1, T_, F_))), rng
    )
    feats_stored = rng.normal(size=(B_, F_, T_)).astype(np.float32)
    folded = fold_cnn1d(variables)
    ref = np.asarray(
        cnn1d_fast_scores(folded, jnp.asarray(feats_stored), compute_dtype=jnp.float32)
    )
    q, s = quant_i8(feats_stored)
    got = np.asarray(
        cnn1d_fast_scores_q8(
            folded, jnp.asarray(q), jnp.asarray(s), compute_dtype=jnp.float32
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-2)


def test_q8_ingest_preserves_eer(rng):
    """BASELINE contract check for --ingest-int8: EER on a separable corpus
    must match the f32 fast chain exactly (scores shift by the quantization
    step; the ranking of well-separated scores must not)."""
    from dfac_tpu.data.pipeline import ArrayDataset
    from dfac_tpu.models.fast_infer import predict_scores_fast
    from dfac_tpu.ops.eer import calculate_eer

    model, variables = _trained_like_variables(rng)
    n = 64
    labels = (np.arange(n) % 2).astype(np.float32)
    feats = rng.normal(size=(n, F_, T_)).astype(np.float32)
    feats[labels == 1, : F_ // 2] += 2.0  # separable classes
    ds = ArrayDataset(uttids=[f"u{i}" for i in range(n)], features=feats, labels=None)

    kw = dict(batch_size=16, swap_tf=True, apply_sigmoid=True)
    ref = predict_scores_fast(variables, ds, compute_dtype=jnp.float32, **kw)
    q8 = predict_scores_fast(
        variables, ds, compute_dtype=jnp.bfloat16, ingest_int8=True, **kw
    )
    assert q8.shape == (n,)
    np.testing.assert_allclose(q8, ref, atol=3e-2)
    eer_ref, _ = calculate_eer(ref, labels)
    eer_q8, _ = calculate_eer(q8, labels)
    assert abs(eer_q8 - eer_ref) <= 1e-3

    # cnn1d whole-dataset q8 path
    from dfac_tpu.models.fast_infer import predict_scores_fast_cnn1d

    m1 = build_model("cnn1d", in_channels=F_, base_channels=8)
    v1 = _randomize_bn(
        m1.init({"params": jax.random.key(0)}, jnp.zeros((1, T_, F_))), rng
    )
    ref1 = predict_scores_fast_cnn1d(v1, ds, compute_dtype=jnp.float32, **kw)
    q81 = predict_scores_fast_cnn1d(
        v1, ds, compute_dtype=jnp.bfloat16, ingest_int8=True, **kw
    )
    np.testing.assert_allclose(q81, ref1, atol=3e-2)
