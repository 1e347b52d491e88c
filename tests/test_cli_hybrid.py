"""CLI integration: CAE training/eval + ensembles + hybrid prediction.

Covers the config-3/config-4 pipelines (BASELINE.json) end to end through
the argparse entry points on a tiny CAE-geometry-compatible corpus.
"""

import os

import numpy as np
import pandas as pd
import pytest

T_, F_ = 49, 36  # survives the CAE pool/transpose chain (see test_cae.py)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    torch = pytest.importorskip("torch")
    root = tmp_path_factory.mktemp("hybrid_corpus")
    rng = np.random.default_rng(0)
    for split, n in (("train", 24), ("dev", 16)):
        labels = (np.arange(n) % 2).astype(np.int64)
        feats = rng.normal(size=(n, F_, T_)).astype(np.float32)
        feats[labels == 1, : F_ // 3] += 1.5
        feats[labels == 0] *= 1.6
        d = root / split
        d.mkdir()
        pd.DataFrame({
            "uttid": [f"{split}{i}" for i in range(n)],
            "features": [torch.from_numpy(m) for m in feats],
        }).to_pickle(d / "features.pkl")
        pd.DataFrame({"uttid": [f"{split}{i}" for i in range(n)],
                      "label": labels}).to_pickle(d / "labels.pkl")
    return root


@pytest.fixture(scope="module")
def artifacts(corpus, tmp_path_factory):
    """Train a tiny CNN and CAE once; downstream CLIs share them."""
    from dfac_tpu.cli import train as train_cli
    from dfac_tpu.cli import train_cae as train_cae_cli

    ck = tmp_path_factory.mktemp("ck")
    train_cli.main([
        "--train-features", str(corpus / "train/features.pkl"),
        "--train-labels", str(corpus / "train/labels.pkl"),
        "--dev-features", str(corpus / "dev/features.pkl"),
        "--dev-labels", str(corpus / "dev/labels.pkl"),
        "--model", "cnn2d", "--epochs", "1", "--batch-size", "8",
        "--in-features", str(F_), "--checkpoint-dir", str(ck), "--quiet",
    ])
    train_cae_cli.main([
        "--train-features", str(corpus / "train/features.pkl"),
        "--train-labels", str(corpus / "train/labels.pkl"),
        "--dev-features", str(corpus / "dev/features.pkl"),
        "--dev-labels", str(corpus / "dev/labels.pkl"),
        "--epochs", "1", "--batch-size", "8", "--base-channels", "4",
        "--checkpoint-dir", str(ck), "--quiet",
    ])
    return ck


def test_evaluate_cae_cli(corpus, artifacts, capsys):
    from dfac_tpu.cli import evaluate_cae as cli

    cli.main([
        "--features", str(corpus / "dev/features.pkl"),
        "--labels", str(corpus / "dev/labels.pkl"),
        "--checkpoint", str(artifacts / "cae_best.ckpt"),
        "--normalizer", str(artifacts / "normalizer.npz"),
        "--base-channels", "4", "--batch-size", "8",
    ])
    out = capsys.readouterr().out
    assert "best convention:" in out and "spoof/bonafide MSE ratio" in out


def test_ensemble_cli(corpus, artifacts, tmp_path, capsys):
    from dfac_tpu.cli import ensemble as cli

    out_path = str(tmp_path / "ens.pkl")
    cli.main([
        "--features", str(corpus / "dev/features.pkl"),
        "--labels", str(corpus / "dev/labels.pkl"),
        "--checkpoints", f"cnn2d:{artifacts / 'cnn2d_best.ckpt'}",
        f"cnn2d:{artifacts / 'cnn2d_last.ckpt'}",
        "--batch-size", "8", "--in-features", str(F_), "--out", out_path,
    ])
    out = capsys.readouterr().out
    assert "ensemble (mean of 2)" in out
    assert os.path.exists(out_path)


def test_hybrid_ensemble_and_predict_cli(corpus, artifacts, tmp_path, capsys):
    from dfac_tpu.cli import hybrid_ensemble as sweep_cli
    from dfac_tpu.cli import predict_hybrid as pred_cli

    res = sweep_cli.main([
        "--features", str(corpus / "dev/features.pkl"),
        "--labels", str(corpus / "dev/labels.pkl"),
        "--cnn-checkpoint", str(artifacts / "cnn2d_best.ckpt"),
        "--cae-checkpoint", str(artifacts / "cae_best.ckpt"),
        "--normalizer", str(artifacts / "normalizer.npz"),
        "--batch-size", "8", "--in-features", str(F_), "--base-channels", "4",
    ])
    assert 0.0 <= res["best_alpha"] <= 1.0
    assert len(res["sweep"]) == 21
    capsys.readouterr()

    out_path = str(tmp_path / "prediction.pkl")
    pred_cli.main([
        "--features", str(corpus / "dev/features.pkl"),
        "--cnn-checkpoint", str(artifacts / "cnn2d_best.ckpt"),
        "--cae-checkpoint", str(artifacts / "cae_best.ckpt"),
        "--normalizer", str(artifacts / "normalizer.npz"),
        "--alpha", str(res["best_alpha"]), "--out", out_path,
        "--batch-size", "8", "--in-features", str(F_), "--base-channels", "4",
        "--compare-with", out_path_prev(corpus, artifacts, tmp_path),
    ])
    out = capsys.readouterr().out
    assert "distribution:" in out and "vs " in out
    df = pd.read_pickle(out_path)
    assert len(df) == 16 and df["predictions"].between(0, 1).all()


def out_path_prev(corpus, artifacts, tmp_path):
    """A prior prediction file to diff against (supervised-only scores)."""
    from dfac_tpu.cli import predict as predict_cli

    prev = str(tmp_path / "prev.pkl")
    predict_cli.main([
        "--features", str(corpus / "dev/features.pkl"),
        "--checkpoint", str(artifacts / "cnn2d_best.ckpt"),
        "--model", "cnn2d", "--out", prev, "--batch-size", "8",
        "--in-features", str(F_),
    ])
    return prev


def test_predict_hybrid_fast_matches_slow(corpus, artifacts, tmp_path, capsys):
    """--fast routes BOTH legs through the folded fused chains; fused
    predictions must track the reference chains closely (bf16 compute)."""
    from dfac_tpu.cli import predict_hybrid as pred_cli

    slow_path = str(tmp_path / "slow.pkl")
    fast_path = str(tmp_path / "fast.pkl")
    common = [
        "--features", str(corpus / "dev/features.pkl"),
        "--cnn-checkpoint", str(artifacts / "cnn2d_best.ckpt"),
        "--cae-checkpoint", str(artifacts / "cae_best.ckpt"),
        "--normalizer", str(artifacts / "normalizer.npz"),
        "--alpha", "0.8", "--batch-size", "8",
        "--in-features", str(F_), "--base-channels", "4",
    ]
    pred_cli.main(common + ["--out", slow_path])
    pred_cli.main(common + ["--out", fast_path, "--fast"])
    capsys.readouterr()
    slow = pd.read_pickle(slow_path)["predictions"].to_numpy()
    fast = pd.read_pickle(fast_path)["predictions"].to_numpy()
    # min-max normalized fused scores on [0,1]; bf16 leg tolerance
    np.testing.assert_allclose(fast, slow, atol=0.05)
    # ranking must be essentially preserved (hybrid EER depends on order)
    from scipy.stats import spearmanr

    rho = spearmanr(fast, slow).statistic
    assert rho > 0.99


def test_predict_hybrid_data_parallel_matches_fast(corpus, artifacts, tmp_path, capsys):
    """--data-parallel shards both folded legs over the virtual mesh; the
    fused predictions must match the single-device --fast run (identical
    per-sample math, same bf16 chains)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from dfac_tpu.cli import predict_hybrid as pred_cli

    fast_path = str(tmp_path / "fast.pkl")
    dp_path = str(tmp_path / "dp.pkl")
    common = [
        "--features", str(corpus / "dev/features.pkl"),
        "--cnn-checkpoint", str(artifacts / "cnn2d_best.ckpt"),
        "--cae-checkpoint", str(artifacts / "cae_best.ckpt"),
        "--normalizer", str(artifacts / "normalizer.npz"),
        "--alpha", "0.8", "--batch-size", "8",
        "--in-features", str(F_), "--base-channels", "4", "--fast",
    ]
    pred_cli.main(common + ["--out", fast_path])
    pred_cli.main(common + ["--out", dp_path, "--data-parallel", "4"])
    capsys.readouterr()
    fast = pd.read_pickle(fast_path)["predictions"].to_numpy()
    dp = pd.read_pickle(dp_path)["predictions"].to_numpy()
    np.testing.assert_allclose(dp, fast, atol=2e-3)


def test_predict_hybrid_data_parallel_guards(corpus, artifacts, tmp_path):
    from dfac_tpu.cli import predict_hybrid as pred_cli

    common = [
        "--features", str(corpus / "dev/features.pkl"),
        "--cnn-checkpoint", str(artifacts / "cnn2d_best.ckpt"),
        "--cae-checkpoint", str(artifacts / "cae_best.ckpt"),
        "--normalizer", str(artifacts / "normalizer.npz"),
        "--out", str(tmp_path / "x.pkl"),
    ]
    with pytest.raises(SystemExit, match="--fast"):
        pred_cli.main(common + ["--data-parallel", "4"])
    with pytest.raises(SystemExit, match="batch-size"):
        pred_cli.main(common + ["--fast", "--data-parallel", "3",
                                "--batch-size", "8"])
