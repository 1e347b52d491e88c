"""``python -m dfac_tpu.cli.train_detector`` — dlqueen detector train + predict.

Feature-parity target: reference ``src/dlqueen_model.py:266-448`` main() —
train the DeepfakeDetector with weighted sampling / pos_weight BCE / EMA /
grad clipping, then run inference on a test split and write prediction.pkl
(logits by default, ``--use-prob`` for sigmoid), printing EER when the test
split has labels.
"""

from __future__ import annotations

import argparse

from dfac_tpu.cli.common import add_multihost_args, init_multihost
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train/predict the DeepfakeDetector (dlqueen recipe).")
    p.add_argument("--data-dir", default="data")
    p.add_argument("--train-split", default="train")
    p.add_argument("--dev-split", default="dev")
    p.add_argument("--test-split", default="test2")
    p.add_argument("--ckpt-path", default="best_model.ckpt")
    p.add_argument("--prediction-pkl", default="prediction.pkl")
    p.add_argument("--device", default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--grad-clip", type=float, default=5.0)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--dropout", type=float, default=0.3)
    p.add_argument("--encoder-dropout", type=float, default=0.2,
                   help="per-block encoder dropout (reference ConvEncoder default)")
    p.add_argument("--bn-freeze-after", type=float, default=0.0, metavar="FRAC",
                   help="fast-numerics recipe: freeze BatchNorm (running-stats "
                        "forward, no stat updates) for epochs after FRAC of the "
                        "schedule (0 disables; quality A/B: "
                        "results/alt_trainer_fast_ab.md). Composes with --ema: "
                        "the EMA keeps averaging params over frozen stats")
    p.add_argument("--train-fast", action="store_true",
                   help="opt-in fast-numerics recipe, EER-parity-gated in "
                        "results/alt_trainer_fast_ab.md: dropout-free training "
                        "(head + encoder) plus a BN freeze tail (2nd half of "
                        "the schedule)")
    p.add_argument("--use-prob", action="store_true", help="save sigmoid probs instead of logits")
    p.add_argument("--specaug", action="store_true")
    p.add_argument("--time-mask-max", type=int, default=30)
    p.add_argument("--time-mask-n", type=int, default=2)
    p.add_argument("--freq-mask-max", type=int, default=24)
    p.add_argument("--freq-mask-n", type=int, default=2)
    p.add_argument("--ema", action="store_true")
    p.add_argument("--ema-decay", type=float, default=0.999)
    p.add_argument("--patience", type=int, default=6)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--fast", action="store_true",
                   help="score the test split through the folded-BN detector "
                        "serving chain (BN folded into the encoder convs, one "
                        "fused program, prefetch-threaded ingest)")
    p.add_argument("--device-resident", action="store_true",
                   help="corpus in HBM; each epoch runs as one scan program")
    p.add_argument("--fused-fit", action="store_true",
                   help="the WHOLE run (epochs + dev EER + best rule + patience) "
                   "as one dispatched program")
    p.add_argument("--resident-chunk-batches", type=int, default=0, metavar="G",
                   help="stream the epoch in chunks of G batches (one dispatch per "
                        "chunk, upload overlapped) — for corpora larger than HBM; "
                        "composes with --data-parallel")
    p.add_argument("--chunk-ingest", choices=["f32", "bf16", "int8"], default="f32",
                   help="compress the chunked-streaming host->device upload: "
                        "bf16 halves the link bytes, int8 quarters them "
                        "(per-row scales, dequant fused into the train step) "
                        "- the remedy for ingest-bound chunked training; "
                        "quality impact EER-gated (tests/test_chunked.py). "
                        "Requires --resident-chunk-batches")
    p.add_argument("--data-parallel", type=int, default=0,
                   help="shard_map DP over N devices (axis_name-synced BatchNorm)")
    p.add_argument("--checkpoint-format", choices=("pickle", "orbax"), default="pickle",
                   help="checkpoint layout: single-file pickle or orbax directory")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace of the run to this directory")
    add_multihost_args(p)
    args = p.parse_args(argv)
    if args.train_fast:
        # the fastest recipe that PASSes the EER gate
        # (results/alt_trainer_fast_ab.md): both dropouts off + the BN
        # freeze tail. Composes with every training mode, fused included
        # (the fused program switches epoch bodies with lax.cond).
        args.dropout = 0.0
        args.encoder_dropout = 0.0
        if not args.bn_freeze_after:
            args.bn_freeze_after = 0.5
    if args.fused_fit and args.resident_chunk_batches:
        p.error("--fused-fit compiles the whole run over a device-resident "
                "corpus; it cannot stream chunks — drop one of "
                "--fused-fit/--resident-chunk-batches")
    if args.device_resident and args.resident_chunk_batches:
        p.error("--device-resident uploads the whole corpus once; "
                "--resident-chunk-batches streams it — pick one")
    return args


def main(argv=None):
    args = parse_args(argv)
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    if args.multihost:
        init_multihost(args)  # join the cluster before the backend wakes up
        if args.epochs <= 0:
            from dfac_tpu.parallel import multihost as mh

            if not mh.is_coordinator():
                # score-only mode is pure local compute from a checkpoint on
                # the coordinator's filesystem — concurrent writes of the
                # same prediction.pkl from every host would corrupt it
                return

    from dfac_tpu.data.pipeline import load_dataset
    from dfac_tpu.io.pickle_io import write_predictions
    from dfac_tpu.models import build_model
    from dfac_tpu.ops.eer import calculate_eer
    from dfac_tpu.train.checkpoint import load_model_variables
    from dfac_tpu.train.detector_loop import DetectorConfig, DetectorTrainer, detector_scores

    cfg = DetectorConfig(
        epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        weight_decay=args.weight_decay, grad_clip=args.grad_clip,
        hidden=args.hidden, dropout=args.dropout,
        encoder_dropout=args.encoder_dropout,
        bn_freeze_after_frac=args.bn_freeze_after, specaug=args.specaug,
        time_mask_max=args.time_mask_max, time_mask_n=args.time_mask_n,
        freq_mask_max=args.freq_mask_max, freq_mask_n=args.freq_mask_n,
        ema=args.ema, ema_decay=args.ema_decay, patience=args.patience,
        seed=args.seed, compute_dtype="bfloat16" if args.bf16 else None,
        # fused fit runs over a device-resident corpus; the flag also
        # selects the GSPMD model when composed with --multihost
        device_resident=args.device_resident or args.fused_fit,
        resident_chunk_batches=args.resident_chunk_batches,
        chunk_ingest=args.chunk_ingest,
        data_parallel=args.data_parallel,
        multihost=args.multihost,
        checkpoint_format=args.checkpoint_format,
    )

    def split_paths(split):
        return (
            os.path.join(args.data_dir, split, "features.pkl"),
            os.path.join(args.data_dir, split, "labels.pkl"),
        )

    test_feat, test_lab = split_paths(args.test_split)
    has_test_labels = os.path.exists(test_lab)

    if args.epochs > 0:
        train_ds = load_dataset(*split_paths(args.train_split))
        dev_ds = load_dataset(*split_paths(args.dev_split))
        in_ch = train_ds.features.shape[1]
        trainer = DetectorTrainer(cfg, in_channels=in_ch)
        fit = trainer.fit_fused if args.fused_fit else trainer.fit
        from dfac_tpu.obs.profiling import trace

        with trace(args.profile_dir):
            result = fit(train_ds, dev_ds, ckpt_path=args.ckpt_path)
        if args.multihost:
            from dfac_tpu.parallel import multihost as mh

            # the scoring stage below reloads the checkpoint (coordinator's
            # filesystem) and is pure local compute — run it there only;
            # the barrier orders it after the coordinator's ckpt write
            mh.sync("detector-fit")
            if not mh.is_coordinator():
                return result
        print(f"Training done. Best dev EER: {result['best_eer']:.6f}")
        model = trainer.model
        test_ds = load_dataset(test_feat, test_lab if has_test_labels else None)
    else:
        # load the test split ONCE: labels merge here, in_channels read here
        test_ds = load_dataset(test_feat, test_lab if has_test_labels else None)
        model = build_model(
            "detector", in_channels=test_ds.features.shape[1],
            hidden=args.hidden, dropout=args.dropout,
        )

    if not os.path.exists(args.ckpt_path):
        raise FileNotFoundError(f"Checkpoint not found: {args.ckpt_path}")
    variables = load_model_variables(args.ckpt_path, model_name="detector")
    import numpy as np

    lengths = test_ds.lengths if test_ds.lengths is not None else np.full(
        len(test_ds), test_ds.features.shape[2], np.int32
    )
    if args.fast:
        import jax.numpy as jnp

        from dfac_tpu.models.fast_infer import detector_scores_fast

        scores = detector_scores_fast(
            variables, test_ds, lengths, args.batch_size,
            apply_sigmoid=args.use_prob,
            compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        )
    else:
        scores = detector_scores(
            model, variables, test_ds, lengths, args.batch_size, apply_sigmoid=args.use_prob
        )
    write_predictions(args.prediction_pkl, test_ds.uttids, scores)
    print(f"Saved prediction file -> {args.prediction_pkl}  shape: ({len(scores)}, 2)")

    if has_test_labels:
        eer, _ = calculate_eer(scores, test_ds.labels)
        print(f"EER on split '{args.test_split}': {eer:.6f}")


if __name__ == "__main__":
    main()
