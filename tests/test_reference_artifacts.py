"""Cross-compatibility against REAL reference artifacts (skipped when the
reference checkout isn't mounted): our torch-free loaders, score tooling,
and EER run directly on files the PyTorch project produced."""

import os

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not mounted"
)


def test_load_reference_prediction_files():
    from dfac_tpu.io.pickle_io import load_predictions

    uttids, scores = load_predictions(f"{REF}/results/prediction_final_test.pkl")
    assert len(uttids) == len(scores) == 1000
    assert scores.dtype == np.float64
    assert np.isfinite(scores).all()
    # published class split (results/final_submission_report.md §3):
    # 418 real / 582 fake at threshold 0.5
    assert int((scores > 0.5).sum()) == 418
    assert int((scores <= 0.5).sum()) == 582


def test_score_distribution_report_on_reference_scores():
    from dfac_tpu.ensemble.hybrid import score_distribution_report
    from dfac_tpu.io.pickle_io import load_predictions

    _, scores = load_predictions(f"{REF}/results/prediction_hybrid_final.pkl")
    rep = score_distribution_report(scores)
    assert rep["n"] == 1000
    assert 0.0 <= rep["min"] <= rep["median"] <= rep["max"] <= 1.0
    assert rep["n_class1_at_0.5"] + rep["n_class0_at_0.5"] == 1000


def test_dlqueen_vs_verify_predictions_comparable():
    from dfac_tpu.ensemble.hybrid import compare_with_submission
    from dfac_tpu.io.pickle_io import load_predictions

    u1, s1 = load_predictions(f"{REF}/results/prediction_dlqueen_test1.pkl")
    u2, s2 = load_predictions(f"{REF}/results/verify_test1.pkl")
    res = compare_with_submission(u1, s1, u2, s2)
    assert res["n_common"] == 500


def test_reference_submission_file_parses():
    from dfac_tpu.io.submission import submission_class_counts

    n1, n0 = submission_class_counts(f"{REF}/st199007-Jason-Holt-WhatAreLogits.pkl")
    assert n1 + n0 == 1000


def test_pickle_forensics_on_reference_files():
    from dfac_tpu.cli.data_tools import analyze_pickle_bytecode

    stats = analyze_pickle_bytecode(f"{REF}/results/prediction_hybrid_final.pkl")
    assert "error" not in stats
    assert any("pandas" in g for g in stats["globals"])
