"""w8a8 int8 serving chain: equivalence + EER-parity gates.

Mirrors tests/test_fast_infer.py's bf16 gates for the int8-compute chain
(BASELINE.md: dev EER within 0.1% absolute of the f32 path)."""

import jax
import jax.numpy as jnp
import numpy as np

from dfac_tpu.models import build_model
from dfac_tpu.models.fast_infer import cnn2d_fast_scores, fold_cnn2d
from dfac_tpu.models.fast_infer_int8 import (
    cnn2d_w8a8_scores,
    cnn2d_w8a8_scores_q8,
    cnn2d_w8a8_scores_tf,
    fold_cnn2d_w8a8,
    predict_scores_w8a8,
)

F_, T_, B_ = 20, 33, 16


def _trained_like_variables(rng):
    model = build_model("cnn2d", in_features=F_, base_channels=8)
    variables = model.init({"params": jax.random.key(0)}, jnp.zeros((1, T_, F_)))
    bs = variables["batch_stats"]
    for name, d in bs.items():
        d["mean"] = jnp.asarray(rng.normal(size=d["mean"].shape) * 0.3, jnp.float32)
        d["var"] = jnp.asarray(rng.random(d["var"].shape) + 0.5, jnp.float32)
    return model, variables


def test_w8a8_matches_f32_chain(rng):
    """w8a8 scores track the f32 folded chain to quantization tolerance on
    calibrated-range inputs, in both orientations."""
    model, variables = _trained_like_variables(rng)
    feats_stored = rng.normal(size=(B_, F_, T_)).astype(np.float32)

    folded = fold_cnn2d(variables)
    ref = np.asarray(
        cnn2d_fast_scores(folded, jnp.asarray(feats_stored), compute_dtype=jnp.float32)
    )

    f8 = fold_cnn2d_w8a8(variables, feats_stored, swap_tf=True)
    got = np.asarray(
        cnn2d_w8a8_scores(f8, jnp.asarray(feats_stored), compute_dtype=jnp.float32)
    )
    # int8 activations/weights: sigmoid-scale agreement within a few percent
    np.testing.assert_allclose(got, ref, atol=5e-2)

    # TF orientation on the SAME data agrees with the stored-orientation
    # w8a8 chain bit-for-bit in f32 (identical math, swapped grid)
    f8_tf = fold_cnn2d_w8a8(
        variables, np.swapaxes(feats_stored, 1, 2), swap_tf=False
    )
    got_tf = np.asarray(
        cnn2d_w8a8_scores_tf(
            f8_tf, jnp.asarray(np.swapaxes(feats_stored, 1, 2)),
            compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(got_tf, got, atol=1e-6)


def test_w8a8_preserves_score_ordering(rng):
    model, variables = _trained_like_variables(rng)
    feats = rng.normal(size=(48, F_, T_)).astype(np.float32)
    feats[::2, : F_ // 2] += 2.0
    folded = fold_cnn2d(variables)
    ref = np.asarray(
        cnn2d_fast_scores(
            folded, jnp.asarray(feats), apply_sigmoid=False,
            compute_dtype=jnp.float32,
        )
    )
    f8 = fold_cnn2d_w8a8(variables, feats, swap_tf=True)
    got = np.asarray(
        cnn2d_w8a8_scores(f8, jnp.asarray(feats), apply_sigmoid=False)
    )
    ref_rank = np.argsort(np.argsort(ref)).astype(np.float64)
    got_rank = np.argsort(np.argsort(got)).astype(np.float64)
    assert np.corrcoef(ref_rank, got_rank)[0, 1] > 0.97


def test_w8a8_preserves_eer(rng):
    """BASELINE contract: EER within 0.1% absolute of the f32 path, on a
    trained model over a separable corpus (the gate that certifies
    ``dfac-predict --fast --int8``)."""
    from dfac_tpu.data.pipeline import ArrayDataset
    from dfac_tpu.ops.eer import calculate_eer
    from dfac_tpu.train.evaluate import predict_scores
    from dfac_tpu.train.loop import TrainConfig, Trainer

    n = 64
    labels = (np.arange(n) % 2).astype(np.int32)
    feats = rng.normal(size=(n, 16, 24)).astype(np.float32)
    feats[labels == 1, :8] += 1.5
    ds = ArrayDataset([f"t{i}" for i in range(n)], feats, labels)
    cfg = TrainConfig(model="cnn2d", in_features=16, batch_size=16, epochs=2, lr=2e-3)
    trainer = Trainer(cfg)
    trainer.fit(ds, ds)

    f32_scores = predict_scores(trainer.model, trainer.variables(), ds, 16)
    w8a8_scores = predict_scores_w8a8(trainer.variables(), ds, batch_size=16)
    eer32, _ = calculate_eer(f32_scores, labels)
    eer8, _ = calculate_eer(w8a8_scores, labels)
    assert abs(eer8 - eer32) <= 0.001

    # and composed with int8 ingest (quantized transfer + quantized compute)
    w8a8_q8 = predict_scores_w8a8(
        trainer.variables(), ds, batch_size=16, ingest_int8=True
    )
    eer8q, _ = calculate_eer(w8a8_q8, labels)
    assert abs(eer8q - eer32) <= 0.001


def test_w8a8_q8_ingest_matches_plain_w8a8(rng):
    """The q8-ingest w8a8 chain == the plain w8a8 chain up to the transfer
    quantization step (both orientations' scale bookkeeping)."""
    from dfac_tpu.io.fastcast import quant_i8

    model, variables = _trained_like_variables(rng)
    feats = rng.normal(size=(B_, F_, T_)).astype(np.float32)
    f8 = fold_cnn2d_w8a8(variables, feats, swap_tf=True)
    plain = np.asarray(cnn2d_w8a8_scores(f8, jnp.asarray(feats)))
    q, scales = quant_i8(feats)
    viaq8 = np.asarray(
        cnn2d_w8a8_scores_q8(f8, jnp.asarray(q), jnp.asarray(scales))
    )
    np.testing.assert_allclose(viaq8, plain, atol=5e-2)


def test_w8a8_saturation_is_graceful(rng):
    """Inputs 3x beyond the calibration range saturate (clip at 127) but
    must not wrap, NaN, or invert score ordering of extreme vs normal."""
    model, variables = _trained_like_variables(rng)
    calib = rng.normal(size=(B_, F_, T_)).astype(np.float32)
    f8 = fold_cnn2d_w8a8(variables, calib, swap_tf=True)
    wild = (calib * 3.0).astype(np.float32)
    got = np.asarray(cnn2d_w8a8_scores(f8, jnp.asarray(wild)))
    assert np.all(np.isfinite(got))
    assert np.all((got >= 0.0) & (got <= 1.0))
