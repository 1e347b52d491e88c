"""``dfac-train`` — supervised training CLI.

Feature-parity target: reference ``src/train.py:94-246`` — the full ~40-flag
surface (model/optimizer/scheduler/augmentation/calibration/checkpointing),
including ``--debug-augment-stats`` and the rich/tqdm visualizer switch.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from dfac_tpu.cli.common import (
    add_augment_args,
    add_data_args,
    add_multihost_args,
    add_swap_tf_args,
    augment_config_from_args,
    init_multihost,
    set_seed,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train a model for audio deepfake detection (TPU).")
    add_data_args(p)
    p.add_argument(
        "--model",
        default="cnn2d",
        choices=[
            "cnn2d", "cnn1d", "meanpool_mlp", "statspool_mlp", "cnn1d_spatial",
            "cnn1d_archive", "cnn2d_spatial", "crnn", "crnn2", "cnn2d_robust",
        ],
    )
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--num-workers", type=int, default=2,
                   help="accepted for reference-CLI compatibility (no host workers needed)")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--early-stop", type=int, default=0, help="patience in epochs (0 disables)")
    p.add_argument("--lr-scheduler", default="none", choices=["none", "plateau"])
    p.add_argument("--lr-scheduler-metric", default="dev_eer", choices=["dev_eer", "dev_loss"])
    p.add_argument("--lr-scheduler-factor", type=float, default=0.5)
    p.add_argument("--lr-scheduler-patience", type=int, default=2)
    p.add_argument("--lr-scheduler-threshold", type=float, default=1e-4)
    p.add_argument("--lr-scheduler-min-lr", type=float, default=1e-6)
    p.add_argument("--device", default=None, help="tpu or cpu (default: auto)")
    p.add_argument("--in-features", type=int, default=180)
    p.add_argument("--hidden-dim", type=int, default=128)
    p.add_argument("--dropout", type=float, default=0.2)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--run-name", default="",
                   help="optional subfolder under --checkpoint-dir for outputs")
    p.add_argument("--no-rich", action="store_true", help="use tqdm instead of rich")
    p.add_argument("--quiet", action="store_true", help="noop visualizer (CI)")
    p.add_argument("--seed", type=int, default=0)
    add_augment_args(p)
    p.add_argument("--label-smoothing", type=float, default=0.0,
                   help="label smoothing epsilon in [0, 0.5)")
    p.add_argument("--debug-augment-stats", action="store_true",
                   help="print feature stats before/after augmentation on the first batch")
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute (TPU fast path)")
    p.add_argument("--data-parallel", type=int, default=0,
                   help="shard_map DP over N devices (0 = single device)")
    p.add_argument("--checkpoint-format", choices=("pickle", "orbax"), default="pickle",
                   help="checkpoint layout: single-file pickle or orbax directory")
    p.add_argument("--device-resident", action="store_true",
                   help="upload the training corpus to HBM once; gather batches on device")
    p.add_argument("--resident-chunk-batches", type=int, default=0, metavar="G",
                   help="stream the epoch in chunks of G batches (one dispatch per "
                        "chunk, upload overlapped) — for corpora larger than HBM; "
                        "same batches/PRNG as the default per-batch loop")
    p.add_argument("--chunk-ingest", choices=["f32", "bf16", "int8"], default="f32",
                   help="compress the chunked-streaming host->device upload: "
                        "bf16 halves the link bytes, int8 quarters them "
                        "(per-row scales, dequant fused into the train step) "
                        "- the remedy for ingest-bound chunked training; "
                        "quality impact EER-gated (tests/test_chunked.py). "
                        "Requires --resident-chunk-batches")
    p.add_argument("--fused-fit", action="store_true",
                   help="run the ENTIRE training loop (epochs+eval+plateau+early-stop) "
                        "as one compiled program (implies --device-resident; no live UI)")
    p.add_argument("--resume", default=None, metavar="CKPT",
                   help="resume training from a checkpoint (model+optimizer+scheduler+epoch)")
    p.add_argument("--bn-freeze-after", type=float, default=0.0, metavar="FRAC",
                   help="fast-numerics recipe: freeze BatchNorm (running-stats "
                        "forward, no stat updates) for epochs after FRAC of the "
                        "schedule (0 disables; quality A/B: results/train_fast_ab.md)")
    p.add_argument("--train-fast", action="store_true",
                   help="opt-in fast-numerics recipe, EER-parity-gated in "
                        "results/train_fast_ab.md: dropout-free training, plus a "
                        "BN freeze tail (2nd half of the schedule) on the "
                        "single-device per-epoch paths; throughput numbers: "
                        "scripts/train_fast_probe.py")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace of the run to this directory")
    add_multihost_args(p)
    add_swap_tf_args(p)
    args = p.parse_args(argv)
    if args.train_fast:
        # the fastest recipe that PASSes the EER gate (results/
        # train_fast_ab.md): drop dropout entirely + the BN freeze tail.
        # Composes with every training mode, fused included (the fused
        # program switches epoch bodies with lax.cond at the boundary).
        args.dropout = 0.0
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


def _debug_augment_stats(augment_fn, feats_swapped):
    """First-batch before/after quantile dump (reference ``src/train.py:390-430``)."""
    import jax

    def stats(x):
        x = np.asarray(x)
        flat = x.reshape(-1)
        q01, q50, q99 = np.quantile(flat, [0.01, 0.50, 0.99])
        return (
            f"shape={tuple(x.shape)} min={flat.min():.4f} q01={q01:.4f} "
            f"median={q50:.4f} q99={q99:.4f} max={flat.max():.4f} "
            f"mean={flat.mean():.4f} std={flat.std():.4f} "
            f"zero%={100 * (flat == 0).mean():.4f}"
        )

    print("[augment-stats] before:", stats(feats_swapped))
    if augment_fn is not None:
        out = augment_fn(jax.random.key(0), feats_swapped)
        print("[augment-stats] after: ", stats(out))
    else:
        print("[augment-stats] after:  (no augmentation enabled)")


def main(argv=None):
    args = parse_args(argv)
    set_seed(args.seed)
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    if args.multihost:
        init_multihost(args)  # join the cluster before the backend wakes up

    from dfac_tpu.data.pipeline import load_dataset
    from dfac_tpu.obs.factory import create_visualizer
    from dfac_tpu.train.checkpoint import build_config_dict
    from dfac_tpu.train.loop import TrainConfig, Trainer

    checkpoint_root = args.checkpoint_dir
    if args.run_name:
        checkpoint_root = os.path.join(checkpoint_root, args.run_name)
    if args.multihost:
        from dfac_tpu.parallel import multihost as mh

        if not mh.is_coordinator():
            # exactly one process per pod writes artifacts; trained state is
            # replicated so the coordinator's copy IS the global model
            # (Trainer.fit gates itself — this covers the fused branch too)
            checkpoint_root = None

    train_ds = load_dataset(args.train_features, args.train_labels)
    dev_ds = load_dataset(args.dev_features, args.dev_labels)

    cfg = TrainConfig(
        model=args.model,
        batch_size=args.batch_size,
        epochs=args.epochs,
        lr=args.lr,
        weight_decay=args.weight_decay,
        early_stop=args.early_stop,
        lr_scheduler=args.lr_scheduler,
        lr_scheduler_metric=args.lr_scheduler_metric,
        lr_scheduler_factor=args.lr_scheduler_factor,
        lr_scheduler_patience=args.lr_scheduler_patience,
        lr_scheduler_threshold=args.lr_scheduler_threshold,
        lr_scheduler_min_lr=args.lr_scheduler_min_lr,
        in_features=args.in_features,
        hidden_dim=args.hidden_dim,
        dropout=args.dropout,
        seed=args.seed,
        label_smoothing=args.label_smoothing,
        swap_tf=args.swap_tf,
        augment=augment_config_from_args(args),
        compute_dtype="bfloat16" if args.bf16 else None,
        data_parallel=args.data_parallel,
        device_resident=args.device_resident or args.fused_fit,
        resident_chunk_batches=args.resident_chunk_batches,
        chunk_ingest=args.chunk_ingest,
        checkpoint_format=args.checkpoint_format,
        multihost=args.multihost,
        bn_freeze_after_frac=args.bn_freeze_after,
    )

    visualizer = create_visualizer(
        "noop" if args.quiet else ("tqdm" if args.no_rich else "rich")
    )
    trainer = Trainer(cfg, visualizer=visualizer)

    if args.debug_augment_stats:
        first = train_ds.features[: args.batch_size]
        feats = np.transpose(first, (0, 2, 1)) if args.swap_tf else first
        _debug_augment_stats(trainer.augment_fn, feats)

    from dfac_tpu.obs.profiling import trace

    with trace(args.profile_dir):
        if args.fused_fit:
            result = trainer.fit_fused(train_ds, dev_ds, resume_from=args.resume)
            if checkpoint_root:
                os.makedirs(checkpoint_root, exist_ok=True)
                config = build_config_dict(args)
                trainer_state = {
                    "best_eer": result["best_eer"],
                    "best_train_loss": result["best_train_loss"],
                    "best_dev_loss": result["best_dev_loss"],
                    "epochs_no_improve": result["epochs_no_improve"],
                    "lr": trainer._lr,
                }
                new_best = any(m.is_best for m in result["history"])
                if new_best:  # never clobber a resumed run's better best ckpt
                    trainer.save_checkpoint_file(
                        os.path.join(checkpoint_root, f"{args.model}_best.ckpt"),
                        epoch=result["best_epoch"],
                        variables=trainer.best_variables(),
                        config_snapshot=config, trainer_state=trainer_state,
                    )
                if result["history"]:
                    # a resume that had nothing left to train (start epoch
                    # past --epochs) must not rewrite the resume point with
                    # an epoch-0 checkpoint
                    trainer.save_checkpoint_file(
                        os.path.join(checkpoint_root, f"{args.model}_last.ckpt"),
                        epoch=result["history"][-1].epoch,
                        config_snapshot=config, trainer_state=trainer_state,
                    )
        else:
            result = trainer.fit(
                train_ds, dev_ds, checkpoint_dir=checkpoint_root,
                config_snapshot=build_config_dict(args),
                resume_from=args.resume,
            )
    if result["best_eer"] is not None:
        print(f"best dev EER: {result['best_eer']:.6f}")
    return result


if __name__ == "__main__":
    main()
