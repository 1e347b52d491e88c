"""pkl DataFrame I/O contract tests (SURVEY.md §4 item a)."""

import numpy as np
import pandas as pd
import pytest

from dfac_tpu.io import pickle_io, submission


def test_torchfree_read_matches_torch(synthetic_corpus):
    uttids, feats = pickle_io.load_features(synthetic_corpus["features_path"])
    assert uttids == synthetic_corpus["uttids"]
    assert feats.shape == synthetic_corpus["features"].shape
    np.testing.assert_array_equal(feats, synthetic_corpus["features"])
    assert feats.dtype == np.float32


def test_torchfree_unpickler_no_torch_needed(synthetic_corpus):
    df = pickle_io.read_pickle_torchfree(synthetic_corpus["features_path"])
    cell = df["features"].iloc[0]
    assert isinstance(cell, np.ndarray)
    np.testing.assert_array_equal(cell, synthetic_corpus["features"][0])


def test_torchfree_handles_noncontiguous_and_dtypes(tmp_path):
    torch = pytest.importorskip("torch")
    base = torch.arange(24, dtype=torch.float64).reshape(4, 6)
    cells = [base.t(), base[::2], base.to(torch.int64), base.to(torch.float16)]
    pd.DataFrame({"uttid": [f"u{i}" for i in range(4)], "features": cells}).to_pickle(
        tmp_path / "f.pkl"
    )
    df = pickle_io.read_pickle_torchfree(str(tmp_path / "f.pkl"))
    for cell, t in zip(df["features"], cells):
        np.testing.assert_array_equal(cell, t.numpy())
        assert cell.dtype == t.numpy().dtype


def test_labels_and_alignment(synthetic_corpus):
    luttids, labels = pickle_io.load_labels(synthetic_corpus["labels_path"])
    np.testing.assert_array_equal(labels, synthetic_corpus["labels"])
    # shuffled labels realign to feature order
    perm = np.random.default_rng(1).permutation(len(luttids))
    aligned = pickle_io.align_labels(
        synthetic_corpus["uttids"], [luttids[i] for i in perm], labels[perm]
    )
    np.testing.assert_array_equal(aligned, synthetic_corpus["labels"])


def test_alignment_strict_raises(synthetic_corpus):
    with pytest.raises(ValueError, match="uttid mismatch"):
        pickle_io.align_labels(
            synthetic_corpus["uttids"], synthetic_corpus["uttids"][:-1],
            synthetic_corpus["labels"][:-1],
        )


def test_prediction_roundtrip(tmp_path):
    uttids = ["a", "b", "c"]
    path = str(tmp_path / "prediction.pkl")
    df = pickle_io.write_predictions(path, uttids, [0.1, 0.9, 0.5])
    assert list(df.columns) == ["uttid", "predictions"]
    ru, rs = pickle_io.load_predictions(path)
    assert ru == uttids
    np.testing.assert_allclose(rs, [0.1, 0.9, 0.5])
    assert rs.dtype == np.float64
    # and pandas can read it directly (reference consumer path)
    df2 = pd.read_pickle(path)
    np.testing.assert_allclose(df2["predictions"].values, [0.1, 0.9, 0.5])


def test_prediction_length_mismatch_raises(tmp_path):
    with pytest.raises(ValueError):
        pickle_io.write_predictions(str(tmp_path / "p.pkl"), ["a", "b"], [0.1])


def test_variable_length_padding(tmp_path):
    torch = pytest.importorskip("torch")
    cells = [torch.randn(180, t) for t in (100, 321, 50)]
    pd.DataFrame({"uttid": ["a", "b", "c"], "features": cells}).to_pickle(tmp_path / "f.pkl")
    _, feats = pickle_io.load_features(str(tmp_path / "f.pkl"))
    assert feats.shape == (3, 180, 321)
    lengths = pickle_io.load_feature_lengths(str(tmp_path / "f.pkl"))
    np.testing.assert_array_equal(lengths, [100, 321, 50])
    np.testing.assert_array_equal(feats[2, :, 50:], 0)


def test_generate_submission(synthetic_corpus, tmp_path):
    import pickle

    pred_path = str(tmp_path / "prediction.pkl")
    scores = np.linspace(0, 1, len(synthetic_corpus["uttids"]))
    pickle_io.write_predictions(pred_path, synthetic_corpus["uttids"], scores)
    out = submission.generate_submission(
        synthetic_corpus["features_path"], pred_path,
        "st000000", "Ada", "Lovelace", "TPU", output_dir=str(tmp_path),
    )
    assert out.endswith("st000000-Ada-Lovelace-TPU.pkl")
    with open(out, "rb") as f:
        sub = pickle.load(f)
    assert sub["student_id"] == "st000000"
    assert set(sub) == {"student_id", "first_name", "last_name", "nickname", "predictions"}
    np.testing.assert_allclose(sub["predictions"]["predictions"].values, scores)
    n1, n0 = submission.submission_class_counts(out)
    assert n1 + n0 == len(scores)


def test_submission_uttid_mismatch_raises(synthetic_corpus, tmp_path):
    pred_path = str(tmp_path / "prediction.pkl")
    pickle_io.write_predictions(pred_path, ["zzz"] * 3, [0.1, 0.2, 0.3])
    with pytest.raises(ValueError, match="uttid mismatch"):
        submission.generate_submission(
            synthetic_corpus["features_path"], pred_path, "s", "f", "l", "n",
            output_dir=str(tmp_path),
        )


def test_load_dataset_populates_lengths_for_variable_corpus(tmp_path):
    torch = pytest.importorskip("torch")
    from dfac_tpu.data.pipeline import load_dataset

    cells = [torch.randn(12, t) for t in (30, 21, 17)]
    pd.DataFrame({"uttid": ["a", "b", "c"], "features": cells}).to_pickle(tmp_path / "f.pkl")
    pd.DataFrame({"uttid": ["a", "b", "c"], "label": [1, 0, 1]}).to_pickle(tmp_path / "l.pkl")
    ds = load_dataset(str(tmp_path / "f.pkl"), str(tmp_path / "l.pkl"))
    np.testing.assert_array_equal(ds.lengths, [30, 21, 17])
    assert ds.features.shape == (3, 12, 30)
    # fixed-shape corpora keep lengths None (full frames implied)
    fixed = [torch.randn(12, 20) for _ in range(3)]
    pd.DataFrame({"uttid": ["a", "b", "c"], "features": fixed}).to_pickle(tmp_path / "f2.pkl")
    ds2 = load_dataset(str(tmp_path / "f2.pkl"))
    assert ds2.lengths is None


def test_align_labels_nonstrict_rejects_missing():
    """Non-strict alignment tolerates EXTRA labels but must still refuse
    features without labels — silently dropping rows would misalign the
    caller's un-filtered feature tensor."""
    from dfac_tpu.io.pickle_io import align_labels

    labels = np.asarray([1, 0, 1])
    out = align_labels(["a", "b"], ["a", "b", "c"], labels, strict=False)
    np.testing.assert_array_equal(out, [1, 0])
    with pytest.raises(ValueError, match="no label"):
        align_labels(["a", "x"], ["a", "b", "c"], labels, strict=False)


def test_align_labels_rejects_duplicate_uttids():
    import numpy as np
    import pytest

    from dfac_tpu.io.pickle_io import align_labels

    with pytest.raises(ValueError, match="duplicated uttids"):
        align_labels(
            ["u1", "u2"], ["u1", "u1", "u2"], np.array([0, 1, 0], np.int64)
        )
