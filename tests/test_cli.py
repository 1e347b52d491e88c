"""End-to-end CLI pipeline test: train -> predict -> evaluate -> submission.

Exercises BASELINE.json config 1 (CPU-runnable full pipeline) on a tiny
synthetic corpus with full-size feature geometry semantics scaled down.
"""

import os

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    f_dim, t_dim = 180, 321
    for split, n in (("train", 24), ("dev", 16), ("test", 12)):
        labels = (np.arange(n) % 2).astype(np.int64)
        feats = rng.normal(size=(n, f_dim, t_dim)).astype(np.float32)
        feats[labels == 1, :60, :] += 1.5  # separable on the LFCC block
        uttids = [f"{split}{i:04d}" for i in range(n)]
        d = root / split
        d.mkdir()
        pd.DataFrame(
            {"uttid": uttids, "features": [torch.from_numpy(m) for m in feats]}
        ).to_pickle(d / "features.pkl")
        pd.DataFrame({"uttid": uttids, "label": labels}).to_pickle(d / "labels.pkl")
    return root


def test_full_cli_pipeline(corpus_dir, tmp_path, capsys):
    from dfac_tpu.cli import evaluate as eval_cli
    from dfac_tpu.cli import generate_submission as sub_cli
    from dfac_tpu.cli import predict as predict_cli
    from dfac_tpu.cli import train as train_cli
    from dfac_tpu.cli import data_tools

    ckdir = str(tmp_path / "ck")
    train_cli.main([
        "--train-features", str(corpus_dir / "train/features.pkl"),
        "--train-labels", str(corpus_dir / "train/labels.pkl"),
        "--dev-features", str(corpus_dir / "dev/features.pkl"),
        "--dev-labels", str(corpus_dir / "dev/labels.pkl"),
        "--model", "cnn1d", "--epochs", "2", "--batch-size", "8",
        "--lr", "2e-3", "--checkpoint-dir", ckdir, "--quiet",
        "--spec-augment", "--label-smoothing", "0.05",
        "--debug-augment-stats",
    ])
    out = capsys.readouterr().out
    assert "[augment-stats] before:" in out and "best dev EER" in out
    ckpt = os.path.join(ckdir, "cnn1d_best.ckpt")
    assert os.path.exists(ckpt)

    pred_path = str(tmp_path / "prediction.pkl")
    predict_cli.main([
        "--features", str(corpus_dir / "test/features.pkl"),
        "--checkpoint", ckpt, "--model", "cnn1d", "--out", pred_path,
        "--batch-size", "8",
    ])
    df = pd.read_pickle(pred_path)
    assert list(df.columns) == ["uttid", "predictions"]
    assert len(df) == 12
    assert df["predictions"].between(0, 1).all()  # sigmoid on by default

    # score-file evaluation mode (reference scripts/evaluation.py contract)
    eval_cli.main([pred_path, str(corpus_dir / "test/labels.pkl")])
    out = capsys.readouterr().out
    assert "EER:" in out and "Threshold:" in out and "FAR:" in out

    # checkpoint evaluation mode
    eval_cli.main([
        "--features", str(corpus_dir / "dev/features.pkl"),
        "--labels", str(corpus_dir / "dev/labels.pkl"),
        "--checkpoint", ckpt, "--model", "cnn1d", "--batch-size", "8",
    ])
    out = capsys.readouterr().out
    assert "eer=" in out

    # submission generation (positional argv contract)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        sub_cli.main([
            str(corpus_dir / "test/features.pkl"), pred_path,
            "st123456", "Grace", "Hopper", "TPUQueen",
        ])
    finally:
        os.chdir(cwd)
    assert (tmp_path / "st123456-Grace-Hopper-TPUQueen.pkl").exists()

    # forensics tools run over the artifacts
    data_tools.main(["analyze-pickles", pred_path])
    out = capsys.readouterr().out
    assert "protocol" in out
    data_tools.main(["check-shape", str(corpus_dir / "test/features.pkl")])
    out = capsys.readouterr().out
    assert "Shape:" in out
    data_tools.main(["score-distributions", pred_path])
    out = capsys.readouterr().out
    assert "p50" in out.splitlines()[0]
    data_tools.main([
        "submission-stats", str(tmp_path / "st123456-Grace-Hopper-TPUQueen.pkl")
    ])
    out = capsys.readouterr().out
    assert "Class 1 count:" in out


def test_predict_rejects_mismatched_sigmoid_flags(corpus_dir):
    from dfac_tpu.cli import predict as predict_cli

    with pytest.raises(SystemExit):
        predict_cli.parse_args([
            "--features", "x", "--checkpoint", "y", "--model", "cnn2d",
            "--out", "z", "--apply-sigmoid", "--no-apply-sigmoid",
        ])


def test_train_cli_dp_smoke(corpus_dir, tmp_path):
    """shard_map data-parallel training through the CLI on the CPU mesh."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from dfac_tpu.cli import train as train_cli

    result = train_cli.main([
        "--train-features", str(corpus_dir / "train/features.pkl"),
        "--train-labels", str(corpus_dir / "train/labels.pkl"),
        "--dev-features", str(corpus_dir / "dev/features.pkl"),
        "--dev-labels", str(corpus_dir / "dev/labels.pkl"),
        "--model", "cnn2d", "--epochs", "1", "--batch-size", "8",
        "--checkpoint-dir", str(tmp_path / "dp"), "--quiet",
        "--data-parallel", "4",
    ])
    assert result["best_eer"] is not None


def test_train_cli_fused_fit(corpus_dir, tmp_path):
    from dfac_tpu.cli import train as train_cli
    from dfac_tpu.train.checkpoint import load_model_variables

    ck = str(tmp_path / "fused_ck")
    result = train_cli.main([
        "--train-features", str(corpus_dir / "train/features.pkl"),
        "--train-labels", str(corpus_dir / "train/labels.pkl"),
        "--dev-features", str(corpus_dir / "dev/features.pkl"),
        "--dev-labels", str(corpus_dir / "dev/labels.pkl"),
        "--model", "cnn1d", "--epochs", "2", "--batch-size", "8",
        "--checkpoint-dir", ck, "--quiet", "--fused-fit",
    ])
    assert result["best_eer"] is not None
    variables = load_model_variables(os.path.join(ck, "cnn1d_best.ckpt"))
    assert "params" in variables


def test_predict_fast_matches_standard(corpus_dir, tmp_path, capsys):
    """--fast (folded-BN transpose-free serving chain) produces the same
    prediction.pkl as the standard model.apply path at f32 tolerance."""
    from dfac_tpu.cli import predict as predict_cli
    from dfac_tpu.cli import train as train_cli

    ckdir = str(tmp_path / "ck2d")
    train_cli.main([
        "--train-features", str(corpus_dir / "train/features.pkl"),
        "--train-labels", str(corpus_dir / "train/labels.pkl"),
        "--dev-features", str(corpus_dir / "dev/features.pkl"),
        "--dev-labels", str(corpus_dir / "dev/labels.pkl"),
        "--model", "cnn2d", "--epochs", "1", "--batch-size", "8",
        "--checkpoint-dir", ckdir, "--quiet",
    ])
    ckpt = os.path.join(ckdir, "cnn2d_best.ckpt")

    outs = {}
    for tag, extra in (("std", []), ("fast", ["--fast"])):
        path = str(tmp_path / f"pred_{tag}.pkl")
        predict_cli.main([
            "--features", str(corpus_dir / "test/features.pkl"),
            "--checkpoint", ckpt, "--model", "cnn2d", "--out", path,
            "--batch-size", "8", *extra,
        ])
        outs[tag] = pd.read_pickle(path)

    # the fast path reports achieved throughput split into host-wait vs
    # device-wait (ingest observability); the std path does not
    out_text = capsys.readouterr().out
    assert "throughput:" in out_text and "host-wait" in out_text

    assert list(outs["fast"]["uttid"]) == list(outs["std"]["uttid"])
    np.testing.assert_allclose(
        outs["fast"]["predictions"], outs["std"]["predictions"], atol=2e-5
    )

    # --fast + --data-parallel: the folded chain sharded over the virtual
    # mesh must reproduce the single-device fast output exactly (f32)
    import jax

    if len(jax.devices()) >= 4:
        dp_path = str(tmp_path / "pred_fast_dp.pkl")
        predict_cli.main([
            "--features", str(corpus_dir / "test/features.pkl"),
            "--checkpoint", ckpt, "--model", "cnn2d", "--out", dp_path,
            "--batch-size", "8", "--fast", "--data-parallel", "4",
        ])
        dp = pd.read_pickle(dp_path)
        np.testing.assert_allclose(
            dp["predictions"], outs["fast"]["predictions"], atol=1e-6
        )


def test_predict_fast_rejects_unsupported_combos(corpus_dir):
    from dfac_tpu.cli import predict as predict_cli

    with pytest.raises(SystemExit, match="data-parallel"):
        predict_cli.main([
            "--features", str(corpus_dir / "test/features.pkl"),
            "--checkpoint", "nonexistent", "--model", "cnn2d",
            "--out", "x.pkl", "--fast", "--data-parallel", "3",
            "--batch-size", "8",
        ])


def test_predict_fast_cnn1d_matches_standard(corpus_dir, tmp_path):
    """cnn1d --fast (folded BN1d chain) matches the model.apply path, both
    single-device and sharded over the virtual mesh."""
    import jax

    from dfac_tpu.cli import predict as predict_cli
    from dfac_tpu.cli import train as train_cli

    ckdir = str(tmp_path / "ck1d")
    train_cli.main([
        "--train-features", str(corpus_dir / "train/features.pkl"),
        "--train-labels", str(corpus_dir / "train/labels.pkl"),
        "--dev-features", str(corpus_dir / "dev/features.pkl"),
        "--dev-labels", str(corpus_dir / "dev/labels.pkl"),
        "--model", "cnn1d", "--epochs", "1", "--batch-size", "8",
        "--checkpoint-dir", ckdir, "--quiet",
    ])
    ckpt = os.path.join(ckdir, "cnn1d_best.ckpt")

    outs = {}
    cases = [("std", []), ("fast", ["--fast"])]
    if len(jax.devices()) >= 4:
        cases.append(("fast_dp", ["--fast", "--data-parallel", "4"]))
    for tag, extra in cases:
        path = str(tmp_path / f"pred1d_{tag}.pkl")
        predict_cli.main([
            "--features", str(corpus_dir / "test/features.pkl"),
            "--checkpoint", ckpt, "--model", "cnn1d", "--out", path,
            "--batch-size", "8", *extra,
        ])
        outs[tag] = pd.read_pickle(path)

    np.testing.assert_allclose(
        outs["fast"]["predictions"], outs["std"]["predictions"], atol=2e-5
    )
    if "fast_dp" in outs:
        np.testing.assert_allclose(
            outs["fast_dp"]["predictions"], outs["fast"]["predictions"], atol=1e-6
        )


def test_train_fast_recipe_flag():
    """--train-fast resolves to the EER-parity-gated fast recipe
    (results/train_fast_ab.md): dropout 0, BN freeze tail where the
    per-epoch program switch exists."""
    from dfac_tpu.cli.train import parse_args

    base = [
        "--train-features", "t.pkl", "--train-labels", "tl.pkl",
        "--dev-features", "d.pkl", "--dev-labels", "dl.pkl",
    ]
    a = parse_args(base + ["--train-fast"])
    assert a.dropout == 0.0 and a.bn_freeze_after == 0.5
    # fused gets the full recipe too (in-program lax.cond epoch switch)
    a = parse_args(base + ["--train-fast", "--fused-fit"])
    assert a.dropout == 0.0 and a.bn_freeze_after == 0.5
    # DP paths get the full recipe (frozen shard_map step variant)
    a = parse_args(base + ["--train-fast", "--data-parallel", "4"])
    assert a.dropout == 0.0 and a.bn_freeze_after == 0.5
    # an explicit user FRAC wins over the recipe default
    a = parse_args(base + ["--train-fast", "--bn-freeze-after", "0.8"])
    assert a.bn_freeze_after == 0.8


def test_predict_ingest_int8_matches_fast(corpus_dir, tmp_path):
    """--ingest-int8: int8-quantized upload + fused dequant produces
    predictions within the quantization step of the plain fast chain,
    single-device and sharded over the virtual mesh; flag misuse errors."""
    import jax

    from dfac_tpu.cli import predict as predict_cli
    from dfac_tpu.cli import train as train_cli

    ckdir = str(tmp_path / "ck_q8")
    train_cli.main([
        "--train-features", str(corpus_dir / "train/features.pkl"),
        "--train-labels", str(corpus_dir / "train/labels.pkl"),
        "--dev-features", str(corpus_dir / "dev/features.pkl"),
        "--dev-labels", str(corpus_dir / "dev/labels.pkl"),
        "--model", "cnn2d", "--epochs", "1", "--batch-size", "8",
        "--checkpoint-dir", ckdir, "--quiet",
    ])
    ckpt = os.path.join(ckdir, "cnn2d_best.ckpt")

    outs = {}
    cases = [("fast", ["--fast"]), ("q8", ["--fast", "--ingest-int8"])]
    if len(jax.devices()) >= 4:
        cases.append(
            ("q8_dp", ["--fast", "--ingest-int8", "--data-parallel", "4"])
        )
    for tag, extra in cases:
        path = str(tmp_path / f"pred_{tag}.pkl")
        predict_cli.main([
            "--features", str(corpus_dir / "test/features.pkl"),
            "--checkpoint", ckpt, "--model", "cnn2d", "--out", path,
            "--batch-size", "8", *extra,
        ])
        outs[tag] = pd.read_pickle(path)

    np.testing.assert_allclose(
        outs["q8"]["predictions"], outs["fast"]["predictions"], atol=3e-2
    )
    if "q8_dp" in outs:
        # sharded q8 == single-device q8 exactly (same math per shard)
        np.testing.assert_allclose(
            outs["q8_dp"]["predictions"], outs["q8"]["predictions"], atol=1e-6
        )

    with pytest.raises(SystemExit, match="folded fast chain"):
        predict_cli.main([
            "--features", str(corpus_dir / "test/features.pkl"),
            "--checkpoint", ckpt, "--model", "cnn2d", "--out", "x.pkl",
            "--ingest-int8", "--batch-size", "8",
        ])
