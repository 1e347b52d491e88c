"""``dfac-evaluate-cae`` — CAE anomaly evaluation CLI.

Feature-parity target: reference ``src/evaluation_cae.py`` — per-sample
reconstruction MSE, dual +/-MSE EER convention, per-class MSE means and
spoof/bonafide ratio.
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate a trained CAE with reconstruction-error scoring.")
    p.add_argument("--features", required=True)
    p.add_argument("--labels", required=True)
    p.add_argument("--checkpoint", required=True, help="cae checkpoint (.ckpt or torch .pt)")
    p.add_argument("--normalizer", required=True, help="normalizer sidecar (.npz or torch .pt)")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--base-channels", type=int, default=32)
    p.add_argument("--device", default=None)
    p.add_argument("--out", default=None, help="optionally write MSE scores as prediction.pkl")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    from dfac_tpu.data.normalizer import FeatureNormalizer
    from dfac_tpu.data.pipeline import load_dataset
    from dfac_tpu.io.pickle_io import write_predictions
    from dfac_tpu.models import build_model
    from dfac_tpu.train.cae_loop import evaluate_cae
    from dfac_tpu.train.checkpoint import load_model_variables

    ds = load_dataset(args.features, args.labels)
    model = build_model("cae", base_channels=args.base_channels)
    variables = load_model_variables(args.checkpoint, model_name="cae")
    normalizer = FeatureNormalizer.load(args.normalizer)

    rep = evaluate_cae(model, variables, ds, normalizer, args.batch_size)
    print(f"EER (+MSE convention): {rep['eer_pos_mse']:.6f}")
    print(f"EER (-MSE convention): {rep['eer_neg_mse']:.6f}")
    print(f"best convention: {rep['convention']}  EER: {rep['eer']:.6f}  threshold: {rep['threshold']:.6f}")
    print(f"bonafide mean MSE: {rep['bonafide_mean_mse']:.6f}")
    print(f"spoof mean MSE:    {rep['spoof_mean_mse']:.6f}")
    print(f"spoof/bonafide MSE ratio: {rep['spoof_bonafide_ratio']:.4f}")
    if args.out:
        write_predictions(args.out, ds.uttids, rep["scores"])
        print(f"wrote MSE scores to {args.out}")
    return rep


if __name__ == "__main__":
    main()
