"""``dfac-train-cae`` — CAE anomaly-model training CLI.

Feature-parity target: reference ``src/train_cae.py:108-163`` flags —
bonafide-only reconstruction training with normalizer build/load, rich Live
dashboard (or plain prints), cae_best/cae_last/normalizer artifacts.
"""

from __future__ import annotations

import argparse

from dfac_tpu.cli.common import add_data_args, add_multihost_args, init_multihost, set_seed


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train the ConvAutoencoder on bonafide-only data.")
    add_data_args(p)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=80)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--lr-scheduler-patience", type=int, default=7)
    p.add_argument("--lr-scheduler-factor", type=float, default=0.5)
    p.add_argument("--early-stop", type=int, default=10)
    p.add_argument("--base-channels", type=int, default=32)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--normalizer", default=None,
                   help="load an existing normalizer (.npz or torch .pt) instead of fitting")
    p.add_argument("--device", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--device-resident", action="store_true",
                   help="bonafide corpus in HBM; each epoch is one compiled program")
    p.add_argument("--fused-fit", action="store_true",
                   help="the WHOLE run (epochs + validation + best rule + "
                   "plateau + early stop) as one dispatched program")
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
    p.add_argument("--bn-freeze-after", type=float, default=0.0, metavar="FRAC",
                   help="fast-numerics recipe: freeze every BatchNorm (encoder "
                        "+ decoder; running-stats forward, no stat updates) for "
                        "epochs after FRAC of the schedule (0 disables; quality "
                        "A/B: results/alt_trainer_fast_ab.md)")
    p.add_argument("--train-fast", action="store_true",
                   help="opt-in fast-numerics recipe, MSE/EER-parity-gated in "
                        "results/alt_trainer_fast_ab.md: the CAE has no "
                        "dropout, so this is the BN freeze tail (2nd half of "
                        "the schedule)")
    add_multihost_args(p)
    p.add_argument("--checkpoint-format", choices=("pickle", "orbax"), default="pickle",
                   help="checkpoint layout: single-file pickle or orbax directory")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace of the run to this directory")
    p.add_argument("--no-rich", action="store_true")
    p.add_argument("--quiet", action="store_true")
    args = p.parse_args(argv)
    if args.train_fast and not args.bn_freeze_after:
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
    set_seed(args.seed)
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    if args.multihost:
        init_multihost(args)  # join the cluster before the backend wakes up

    from dfac_tpu.data.normalizer import FeatureNormalizer
    from dfac_tpu.data.pipeline import load_dataset
    from dfac_tpu.obs.cae_dashboard import create_cae_visualizer
    from dfac_tpu.train.cae_loop import CAEConfig, CAETrainer

    train_ds = load_dataset(args.train_features, args.train_labels)
    dev_ds = load_dataset(args.dev_features, args.dev_labels)

    cfg = CAEConfig(
        batch_size=args.batch_size,
        epochs=args.epochs,
        lr=args.lr,
        weight_decay=args.weight_decay,
        lr_scheduler_patience=args.lr_scheduler_patience,
        lr_scheduler_factor=args.lr_scheduler_factor,
        early_stop=args.early_stop,
        base_channels=args.base_channels,
        seed=args.seed,
        # fused fit runs over a device-resident corpus; the flag also
        # selects the GSPMD model when composed with --multihost
        device_resident=args.device_resident or args.fused_fit,
        resident_chunk_batches=args.resident_chunk_batches,
        chunk_ingest=args.chunk_ingest,
        data_parallel=args.data_parallel,
        multihost=args.multihost,
        checkpoint_format=args.checkpoint_format,
        bn_freeze_after_frac=args.bn_freeze_after,
    )
    visualizer = create_cae_visualizer("noop" if args.quiet else ("plain" if args.no_rich else "rich"))
    trainer = CAETrainer(cfg, visualizer=visualizer)
    normalizer = FeatureNormalizer.load(args.normalizer) if args.normalizer else None
    fit = trainer.fit_fused if args.fused_fit else trainer.fit
    from dfac_tpu.obs.profiling import trace

    with trace(args.profile_dir):
        result = fit(train_ds, dev_ds, checkpoint_dir=args.checkpoint_dir, normalizer=normalizer)
    print(f"best val reconstruction MSE: {result['best_val_mse']:.6f}")
    return result


if __name__ == "__main__":
    main()
