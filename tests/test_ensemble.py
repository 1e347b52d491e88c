"""Ensemble / hybrid-fusion / anomaly tests."""

import numpy as np
import pytest

from dfac_tpu.ensemble.hybrid import (
    compare_with_submission,
    fuse_scores,
    min_max_normalize,
    score_distribution_report,
    sweep_alpha,
)
from dfac_tpu.ensemble.mean import ensemble_scores
from dfac_tpu.ops.eer import calculate_eer


def test_min_max_normalize():
    s = np.array([2.0, 4.0, 3.0])
    np.testing.assert_allclose(min_max_normalize(s), [0.0, 1.0, 0.5])
    np.testing.assert_allclose(min_max_normalize(np.ones(4)), np.zeros(4))


def test_fuse_scores_alpha_extremes(rng):
    sup = rng.normal(size=50)
    cae = rng.normal(size=50)
    np.testing.assert_allclose(fuse_scores(sup, cae, 1.0), min_max_normalize(sup))
    np.testing.assert_allclose(fuse_scores(sup, cae, 0.0), min_max_normalize(cae))


def test_sweep_alpha_finds_better_mix(rng):
    n = 200
    labels = (rng.random(n) > 0.5).astype(int)
    # two weak complementary scorers
    sup = labels * 1.0 + rng.normal(size=n) * 0.8
    cae = labels * 1.0 + rng.normal(size=n) * 0.8
    res = sweep_alpha(sup, cae, labels)
    assert len(res["sweep"]) == 21
    eer_sup = calculate_eer(min_max_normalize(sup), labels)[0]
    eer_cae = calculate_eer(min_max_normalize(cae), labels)[0]
    assert res["best_eer"] <= min(eer_sup, eer_cae) + 1e-9
    # endpoints of the sweep equal the individual EERs
    assert res["sweep"][-1]["eer"] == pytest.approx(eer_sup)
    assert res["sweep"][0]["eer"] == pytest.approx(eer_cae)


def test_ensemble_scores_mean():
    a, b = np.array([0.0, 1.0]), np.array([1.0, 0.0])
    np.testing.assert_allclose(ensemble_scores({"m1": a, "m2": b}), [0.5, 0.5])
    with pytest.raises(ValueError):
        ensemble_scores([])


def test_distribution_report(rng):
    s = rng.random(1000)
    rep = score_distribution_report(s)
    assert rep["n"] == 1000
    assert rep["min"] <= rep["p01"] <= rep["median"] <= rep["p99"] <= rep["max"]
    assert rep["n_class1_at_0.5"] + rep["n_class0_at_0.5"] == 1000


def test_compare_with_submission():
    res = compare_with_submission(
        ["a", "b", "c"], np.array([0.9, 0.1, 0.6]),
        ["b", "a", "z"], np.array([0.2, 0.8, 0.5]),
    )
    assert res["n_common"] == 2
    assert res["class_agreement"] == 1.0
    assert res["mean_abs_diff"] == pytest.approx(0.1)
    assert res["n_flipped"] == 0


def test_embedding_anomaly_pipeline(rng):
    pytest.importorskip("sklearn")
    from dfac_tpu.data.pipeline import ArrayDataset
    from dfac_tpu.ensemble.anomaly import embedding_anomaly_report, extract_embeddings
    from dfac_tpu.models import build_model
    import jax

    f_, t_ = 12, 20
    n = 24
    labels = (np.arange(n) % 2).astype(np.int32)
    feats = rng.normal(size=(n, f_, t_)).astype(np.float32)
    feats[labels == 0] += 1.5  # spoof shifted -> separable in embedding space
    ds = ArrayDataset([f"u{i}" for i in range(n)], feats, labels)

    model = build_model("cnn2d", in_features=f_, base_channels=4)
    variables = model.init({"params": jax.random.key(0)}, np.zeros((1, t_, f_), np.float32))

    emb = extract_embeddings(model, variables, ds, batch_size=8)
    assert emb.shape == (n, 4 * 4 * f_)

    report = embedding_anomaly_report(
        model, variables, ds, ds, batch_size=8, pca_dims=4, gmm_components=1,
        reg_covar=1e-2,
    )
    assert 0.0 <= report["ocsvm"]["eer"] <= 1.0
    assert 0.0 <= report["gmm"]["eer"] <= 1.0
    assert report["embedding_dim"] == 4 * 4 * f_
