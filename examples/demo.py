#!/usr/bin/env python3
"""Runnable end-to-end demo of the dfac-tpu library API.

The reference ships a non-runnable skeleton (``examples/demo.py``) showing
how to structure training/evaluation/prediction; this demo actually runs —
it synthesizes a tiny corpus, trains the flagship CNN2D, evaluates dev EER
on device, writes a ``prediction.pkl``, and fuses with a CAE anomaly score.

    python examples/demo.py            # runs on whatever backend jax picks
    JAX_PLATFORMS=cpu python examples/demo.py
"""

import os
import sys
import tempfile

# runnable from a repo checkout without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # Some environments pre-register an accelerator plugin from
    # sitecustomize and pin jax_platforms, which silently overrides the
    # env var; re-assert the user's choice after import.
    jax.config.update("jax_platforms", "cpu")

from dfac_tpu.data.pipeline import ArrayDataset
from dfac_tpu.ensemble.hybrid import fuse_scores, sweep_alpha
from dfac_tpu.io.pickle_io import write_predictions
from dfac_tpu.ops.eer import calculate_eer
from dfac_tpu.train.cae_loop import CAEConfig, CAETrainer, cae_mse_scores
from dfac_tpu.train.evaluate import evaluate_classifier, predict_scores
from dfac_tpu.train.loop import TrainConfig, Trainer


def synth_corpus(seed: int, n: int, f_dim: int = 36, t_dim: int = 81) -> ArrayDataset:
    """Separable toy corpus in the stored [N, F, T] orientation."""
    rng = np.random.default_rng(seed)
    labels = (np.arange(n) % 2).astype(np.int32)
    feats = rng.normal(size=(n, f_dim, t_dim)).astype(np.float32)
    feats[labels == 1, : f_dim // 3] += 1.5  # bonafide marks the "LFCC block"
    # NB: f_dim must survive the CAE pool/transpose chain (36 -> ... -> 36,
    # like 180 in production; the reference has the same constraint)
    return ArrayDataset([f"utt{seed}{i:04d}" for i in range(n)], feats, labels)


def main():
    train_ds, dev_ds, test_ds = synth_corpus(0, 64), synth_corpus(1, 32), synth_corpus(2, 32)

    # ── supervised CNN2D ─────────────────────────────────────────────
    cfg = TrainConfig(
        model="cnn2d", in_features=36, epochs=3, batch_size=16, lr=2e-3,
        label_smoothing=0.05, lr_scheduler="plateau",
        device_resident=True,  # epoch = one program: fast even over a remote relay
    )
    trainer = Trainer(cfg)
    result = trainer.fit(train_ds, dev_ds)
    print(f"CNN2D best dev EER: {result['best_eer']:.4f}")

    metrics, _, _ = evaluate_classifier(
        trainer.model, trainer.variables(), test_ds, batch_size=16
    )
    print(f"CNN2D test EER:     {metrics['eer']:.4f} (threshold {metrics['threshold']:.4f})")

    sup_scores = predict_scores(
        trainer.model, trainer.variables(), test_ds, batch_size=16, apply_sigmoid=True
    )
    with tempfile.NamedTemporaryFile(suffix=".pkl") as tmp:
        write_predictions(tmp.name, test_ds.uttids, sup_scores)
        print(f"wrote prediction.pkl with {len(sup_scores)} rows -> {tmp.name}")

    # ── CAE anomaly scorer + hybrid fusion ───────────────────────────
    cae = CAETrainer(
        CAEConfig(epochs=2, batch_size=16, base_channels=4, device_resident=True)
    )
    cae.fit(train_ds, dev_ds)
    cae_scores = cae_mse_scores(cae.model, cae.variables(), test_ds, cae.normalizer, 16)

    sweep = sweep_alpha(sup_scores, cae_scores, test_ds.labels)
    hybrid = fuse_scores(sup_scores, cae_scores, alpha=sweep["best_alpha"])
    eer, _ = calculate_eer(hybrid, test_ds.labels)
    print(f"hybrid alpha={sweep['best_alpha']:.2f} test EER: {eer:.4f}")


if __name__ == "__main__":
    main()
