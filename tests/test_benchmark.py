"""Benchmark harness + experiment CLI tests (tiny runs)."""

import os

import numpy as np
import pandas as pd
import pytest

from dfac_tpu.data.pipeline import ArrayDataset
from dfac_tpu.obs.base import EpochMetrics
from dfac_tpu.train.benchmark_harness import (
    ModelSpec,
    detect_overfit,
    parse_model_specs,
    run_benchmark,
)
from dfac_tpu.train.loop import TrainConfig


def _ds(rng, n=24, f=16, t=20):
    labels = (np.arange(n) % 2).astype(np.int32)
    feats = rng.normal(size=(n, f, t)).astype(np.float32)
    feats[labels == 1, : f // 2] += 2.0
    return ArrayDataset([f"u{i}" for i in range(n)], feats, labels)


def test_parse_model_specs():
    specs = parse_model_specs("cnn2d,cnn2d+specaug, cnn1d")
    assert [s.label for s in specs] == ["cnn2d", "cnn2d+specaug", "cnn1d"]
    assert specs[1].spec_augment and not specs[0].spec_augment
    with pytest.raises(ValueError):
        parse_model_specs("cnn2d+bogus")


def test_detect_overfit():
    def m(e, tl, dl):
        return EpochMetrics(epoch=e, train_loss=tl, dev_loss=dl, dev_eer=0.1)

    healthy = [m(1, 1.0, 1.0), m(2, 0.8, 0.9), m(3, 0.6, 0.8)]
    assert not detect_overfit(healthy)
    overfit = [m(1, 1.0, 0.8), m(2, 0.8, 0.9), m(3, 0.6, 1.0)]
    assert detect_overfit(overfit)


def test_run_benchmark_outputs(tmp_path, rng):
    out = str(tmp_path / "bench")
    result = run_benchmark(
        _ds(rng), _ds(np.random.default_rng(1), 16),
        parse_model_specs("cnn1d,cnn1d+specaug"),
        seeds=[0, 1],
        base_cfg=TrainConfig(batch_size=8, epochs=2, in_features=16, lr=2e-3),
        output_dir=out,
        make_plots=True,
        print_table=False,
    )
    assert len(result["runs"]) == 4
    assert len(result["ranking"]) == 2
    for f in ("model_runs.csv", "model_epochs.csv", "model_ranking.csv", "benchmark_report.md"):
        assert os.path.exists(os.path.join(out, f)), f
    assert os.path.exists(os.path.join(out, "model_ranking.png"))
    assert os.path.exists(os.path.join(out, "training_curves.png"))
    # per-model + combined plot files (reference src/benchmark.py:820-825)
    assert os.path.exists(os.path.join(out, "plots", "cnn1d_curves.png"))
    assert os.path.exists(os.path.join(out, "plots", "cnn1d+specaug_curves.png"))
    assert os.path.exists(os.path.join(out, "plots", "combined_losses.png"))
    runs = pd.read_csv(os.path.join(out, "model_runs.csv"))
    assert set(runs["model"]) == {"cnn1d", "cnn1d+specaug"}
    assert runs["best_dev_eer"].notna().all()
    ranking = pd.read_csv(os.path.join(out, "model_ranking.csv"))
    assert ranking["mean_best_eer"].is_monotonic_increasing
    epochs = pd.read_csv(os.path.join(out, "model_epochs.csv"))
    assert epochs["epoch_seconds"].notna().all() and (epochs["epoch_seconds"] > 0).all()
    assert epochs["utt_per_sec"].notna().all()
    report = open(os.path.join(out, "benchmark_report.md")).read()
    assert "## Ranking" in report and "cnn1d" in report
    assert "## Plots" in report and "plots/cnn1d_curves.png" in report


def test_compare_normalization_cli(tmp_path, rng):
    torch = pytest.importorskip("torch")
    root = tmp_path
    for split, n in (("train", 16), ("dev", 12)):
        labels = (np.arange(n) % 2).astype(np.int64)
        feats = rng.normal(size=(n, 16, 20)).astype(np.float32)
        feats[labels == 1, :8] += 2.0
        d = root / split
        d.mkdir()
        pd.DataFrame({"uttid": [f"{split}{i}" for i in range(n)],
                      "features": [torch.from_numpy(m) for m in feats]}).to_pickle(d / "features.pkl")
        pd.DataFrame({"uttid": [f"{split}{i}" for i in range(n)],
                      "label": labels}).to_pickle(d / "labels.pkl")

    from dfac_tpu.cli import compare_normalization

    rows = compare_normalization.main([
        "--train-features", str(root / "train/features.pkl"),
        "--train-labels", str(root / "train/labels.pkl"),
        "--dev-features", str(root / "dev/features.pkl"),
        "--dev-labels", str(root / "dev/labels.pkl"),
        "--schemes", "raw,cvmn", "--model", "cnn1d", "--epochs", "1",
        "--batch-size", "8", "--in-features", "16",
    ])
    assert [r["scheme"] for r in rows] == ["raw", "cvmn"]

    from dfac_tpu.cli import compare_kernels

    rows = compare_kernels.main([
        "--train-features", str(root / "train/features.pkl"),
        "--train-labels", str(root / "train/labels.pkl"),
        "--dev-features", str(root / "dev/features.pkl"),
        "--dev-labels", str(root / "dev/labels.pkl"),
        "--experiments", "3,3,3:raw;5,3,3:cvmn", "--epochs", "1",
        "--batch-size", "8", "--in-features", "16",
        "--checkpoint-dir", str(tmp_path / "kc"),
    ])
    assert len(rows) == 2
    from dfac_tpu.train.checkpoint import load_checkpoint

    ck = load_checkpoint(str(tmp_path / "kc" / "k5-3-3_cvmn.ckpt"))
    assert ck["config"]["kernel_sizes"] == [5, 3, 3]
    assert ck["config"]["normalization"] == "cvmn"


def test_utterance_norm_schemes(rng):
    from dfac_tpu.data.normalizer import apply_utterance_norm

    x = rng.normal(loc=2.0, size=(4, 6, 50)).astype(np.float32)
    np.testing.assert_array_equal(apply_utterance_norm(x, "raw"), x)
    cmn = apply_utterance_norm(x, "cmn")
    np.testing.assert_allclose(cmn.mean(axis=-1), 0.0, atol=1e-5)
    cvmn = apply_utterance_norm(x, "cvmn")
    np.testing.assert_allclose(cvmn.mean(axis=-1), 0.0, atol=1e-5)
    # torch-parity contract (src/compare_normalization.py:59-62): divide
    # by the UNBIASED std, so the unbiased std of the result is 1
    np.testing.assert_allclose(cvmn.std(axis=-1, ddof=1), 1.0, atol=1e-3)
    with pytest.raises(ValueError):
        apply_utterance_norm(x, "bogus")


def test_extract_features_cli(tmp_path):
    from dfac_tpu.cli import extract_features
    from dfac_tpu.features.lfcc import LFCCConfig
    from dfac_tpu.io.pickle_io import load_features

    cfg = LFCCConfig()
    rng = np.random.default_rng(0)
    archive = {f"utt{i}": rng.normal(size=cfg.num_samples(33)).astype(np.float32) for i in range(3)}
    npz = str(tmp_path / "waves.npz")
    np.savez(npz, **archive)
    out = str(tmp_path / "features.pkl")
    extract_features.main([
        "--audio", npz, "--out", out, "--frames", "33", "--no-pallas",
        "--tensor-format", "numpy",
    ])
    uttids, feats = load_features(out)
    assert uttids == ["utt0", "utt1", "utt2"]
    assert feats.shape == (3, 180, 33)
    assert np.isfinite(feats).all()


def test_extract_features_cli_npy_store(tmp_path):
    """--format npy writes a memory-mapped store that load_dataset streams,
    with features identical to the pkl output."""
    from dfac_tpu.cli import extract_features
    from dfac_tpu.data.pipeline import load_dataset
    from dfac_tpu.features.lfcc import LFCCConfig
    from dfac_tpu.io.npy_store import is_npy_store

    cfg = LFCCConfig()
    rng = np.random.default_rng(1)
    archive = {f"utt{i}": rng.normal(size=cfg.num_samples(33)).astype(np.float32) for i in range(3)}
    npz = str(tmp_path / "waves.npz")
    np.savez(npz, **archive)

    pkl_out = str(tmp_path / "features.pkl")
    store_out = str(tmp_path / "store")
    common = ["--audio", npz, "--frames", "33", "--no-pallas", "--tensor-format", "numpy"]
    extract_features.main(common + ["--out", pkl_out])
    extract_features.main(common + ["--out", store_out, "--format", "npy"])

    assert is_npy_store(store_out)
    from_pkl = load_dataset(pkl_out)
    from_store = load_dataset(store_out)
    assert from_store.uttids == from_pkl.uttids
    np.testing.assert_array_equal(np.asarray(from_store.features), from_pkl.features)
