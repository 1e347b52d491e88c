"""``dfac-predict`` — generate prediction.pkl from a checkpoint.

Feature-parity target: reference ``src/predict.py`` — label-free batched
inference (sigmoid on by default, swap_tf on by default), strict
prediction-count assertion, ``prediction.pkl`` DataFrame {uttid,
predictions}. Accepts both dfac-tpu checkpoints and reference PyTorch
``.pt`` files (auto-imported).
"""

from __future__ import annotations

import argparse

from dfac_tpu.cli.common import add_multihost_args, add_swap_tf_args, init_multihost


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Generate prediction.pkl from a model checkpoint.")
    p.add_argument("--features", required=True, help="Path to features.pkl")
    p.add_argument("--checkpoint", required=True, help="Path to model checkpoint (.ckpt or torch .pt)")
    p.add_argument("--model", required=True, choices=["cnn2d", "cnn1d"])
    p.add_argument("--out", required=True, help="Output path for prediction.pkl")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--device", default=None)
    p.add_argument("--in-features", type=int, default=180)
    p.add_argument("--dropout", type=float, default=0.3)
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    p.add_argument(
        "--fast", action="store_true",
        help="folded-BatchNorm fused serving chain (cnn2d: the bench.py "
        "transpose-free path, ~1.3x model.apply; cnn1d: folded BN1d chain; "
        "scores match to bf16/f32 rounding — see models/fast_infer.py)",
    )
    p.add_argument("--data-parallel", type=int, default=0,
                   help="shard each scoring batch over N devices (0 = single device)")
    p.add_argument(
        "--int8", action="store_true",
        help="w8a8 int8 DEVICE COMPUTE for the folded cnn2d chain: blocks "
        "2-3 run int8 x int8 -> int32 convs with int8 activations "
        "(per-output-channel weight scales, calibrated static activation "
        "scales; EER parity test-gated like --bf16). NOTE: measured SLOWER "
        "than the bf16 chain on TPU v5e via XLA (19.3k vs 24.7k utt/s "
        "CNN-only — the MXU's int8 rate does not materialize through XLA; "
        "results/v5e_measurements.md round 5) — provided for accelerators/"
        "toolchains where int8 conv is fast, not as the v5e default. "
        "Requires --fast, cnn2d, single device",
    )
    p.add_argument(
        "--ingest-int8", action="store_true",
        help="quantize feature rows to int8 (per utterance x feature-dim "
        "scale) on the host and dequantize fused into the first conv — "
        "half the host->device bytes of bf16 ingest, for transfer-bound "
        "links; scores shift by ~amax/254 per group (EER parity "
        "test-gated). Requires --fast",
    )
    add_multihost_args(p, extra_help="requires --fast")
    sig = p.add_mutually_exclusive_group()
    sig.add_argument("--apply-sigmoid", dest="apply_sigmoid", action="store_true", default=True)
    sig.add_argument("--no-apply-sigmoid", dest="apply_sigmoid", action="store_false")
    add_swap_tf_args(p)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    if args.multihost and not args.fast:
        raise SystemExit("--multihost serving runs the folded fast chain — add --fast")
    if args.ingest_int8 and not args.fast:
        raise SystemExit("--ingest-int8 rides the folded fast chain — add --fast")
    if args.int8 and (
        not args.fast or args.model != "cnn2d"
        or args.multihost or args.data_parallel > 1
    ):
        raise SystemExit(
            "--int8 (w8a8 device compute) runs the folded cnn2d chain on a "
            "single device — use with --fast --model cnn2d and without "
            "--multihost/--data-parallel"
        )
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    if args.multihost:
        init_multihost(args)  # join the cluster before the backend wakes up
    if args.fast and args.data_parallel > 1 and args.batch_size % args.data_parallel:
        raise SystemExit("--batch-size must divide by --data-parallel")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dfac_tpu.data.pipeline import load_dataset
    from dfac_tpu.io.pickle_io import write_predictions
    from dfac_tpu.models import build_model
    from dfac_tpu.train.checkpoint import load_model_variables
    from dfac_tpu.train.evaluate import predict_scores

    model = build_model(
        args.model,
        in_features=args.in_features,
        dropout=args.dropout,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
    )
    variables = load_model_variables(args.checkpoint, model_name=args.model)
    ds = load_dataset(args.features)

    import time

    from dfac_tpu.io.prefetch import PrefetchStats

    stats = PrefetchStats() if args.fast else None
    t_run = time.perf_counter()

    mesh = None
    if args.data_parallel > 1:
        from dfac_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=args.data_parallel)

    if args.fast and mesh is not None:
        # folded-BN chain sharded over the mesh, batch by batch
        from dfac_tpu.models.fast_infer import _ingest, fold_cnn1d, fold_cnn2d
        from dfac_tpu.parallel.mesh import batch_sharding
        from dfac_tpu.parallel.serving import make_sharded_cnn2d_feature_scorer
        from dfac_tpu.train.evaluate import collect_masked_scores

        dtype = jnp.bfloat16 if args.bf16 else jnp.float32
        folded = (fold_cnn2d if args.model == "cnn2d" else fold_cnn1d)(variables)
        scorer = make_sharded_cnn2d_feature_scorer(
            mesh, swap_tf=args.swap_tf, apply_sigmoid=args.apply_sigmoid,
            compute_dtype=dtype, model=args.model, ingest_int8=args.ingest_int8,
        )
        if args.multihost:
            # each process ingests only ITS row slice of every (padded,
            # fixed-size) batch; scores allgather across hosts at the end
            from dfac_tpu.parallel import multihost as mh

            folded = mh.replicate_tree(folded, mesh)
            lo, hi = mh.local_row_range(mesh, args.batch_size)

            if args.ingest_int8:
                # per-host quantization of its OWN row slice: the same
                # 2x-fewer-link-bytes lever as single-host --ingest-int8,
                # stacked on top of the 1/n_hosts row split (each host's
                # upload shrinks from rows/n * 2B to rows/n * ~1.13B)
                from dfac_tpu.io.fastcast import quant_i8

                def prepare(b):
                    q, scales = quant_i8(np.ascontiguousarray(b.features[lo:hi]))
                    return (
                        mh.batch_from_local(q, mesh, global_rows=args.batch_size),
                        mh.batch_from_local(scales, mesh, global_rows=args.batch_size),
                    )

                run = lambda qs: scorer(folded, qs[0], qs[1])  # noqa: E731
            else:

                def prepare(b):
                    local = np.asarray(b.features[lo:hi])
                    if dtype == jnp.bfloat16:
                        from dfac_tpu.io.fastcast import cast_bf16

                        local = cast_bf16(local)
                    return mh.batch_from_local(
                        local, mesh, global_rows=args.batch_size
                    )

                run = lambda feats: scorer(folded, feats)  # noqa: E731

            scores = collect_masked_scores(
                run, ds, args.batch_size,
                prepare_batch=prepare, gather=mh.gather_rows, stats=stats,
            )
        elif args.ingest_int8:
            from dfac_tpu.models.fast_infer import _ingest_q8

            shard = batch_sharding(mesh)
            scores = collect_masked_scores(
                lambda qs: scorer(folded, qs[0], qs[1]),
                ds, args.batch_size,
                prepare_batch=lambda b: _ingest_q8(b.features, shard),
                stats=stats,
            )
        else:
            shard = batch_sharding(mesh)
            scores = collect_masked_scores(
                lambda feats: scorer(folded, feats),
                ds, args.batch_size,
                # sharded put: slices land on their chips directly instead of
                # committing to device 0 and resharding over ICI per batch
                prepare_batch=lambda b: _ingest(b.features, dtype, shard),
                stats=stats,
            )
    elif args.fast and args.model == "cnn1d":
        from dfac_tpu.models.fast_infer import predict_scores_fast_cnn1d

        scores = predict_scores_fast_cnn1d(
            variables, ds,
            batch_size=args.batch_size, swap_tf=args.swap_tf,
            apply_sigmoid=args.apply_sigmoid,
            compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
            stats=stats, ingest_int8=args.ingest_int8,
        )
    elif args.fast and args.int8:
        from dfac_tpu.models.fast_infer_int8 import predict_scores_w8a8

        scores = predict_scores_w8a8(
            variables, ds,
            batch_size=args.batch_size, swap_tf=args.swap_tf,
            apply_sigmoid=args.apply_sigmoid,
            compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
            stats=stats, ingest_int8=args.ingest_int8,
        )
    elif args.fast:
        from dfac_tpu.models.fast_infer import predict_scores_fast

        scores = predict_scores_fast(
            variables, ds,
            batch_size=args.batch_size, swap_tf=args.swap_tf,
            apply_sigmoid=args.apply_sigmoid,
            compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
            stats=stats, ingest_int8=args.ingest_int8,
        )
    else:
        scores = predict_scores(
            model, variables, ds,
            batch_size=args.batch_size, swap_tf=args.swap_tf, apply_sigmoid=args.apply_sigmoid,
            mesh=mesh,
        )
    elapsed = time.perf_counter() - t_run
    if len(scores) != len(ds):
        raise ValueError("Number of predictions does not match number of rows in features.pkl")
    if args.multihost:
        from dfac_tpu.parallel import multihost as mh

        if not mh.is_coordinator():
            return  # every process computed the full scores; one writes
    write_predictions(args.out, ds.uttids, scores)
    print(f"wrote {len(scores)} predictions to {args.out}")
    if stats is not None and elapsed > 0:
        # achieved throughput split by where the pipeline waited: host-wait
        # = the device feed loop blocked on ingest (disk gather + cast);
        # device-wait = compute still draining after ingest finished. The
        # sustained rate of the overlapped pipeline is min(cast, device) —
        # these counters make that observable without a profiler trace.
        print(
            f"throughput: {len(scores) / elapsed:,.1f} utt/s over {elapsed:.2f}s "
            f"(host-wait {stats.host_wait_s:.2f}s, device-wait "
            f"{stats.device_wait_s:.2f}s, {stats.items} batches)"
        )
        if stats.host_bound():
            import logging

            logging.getLogger(__name__).warning(
                "ingest-bound run: the device waited on host batch assembly "
                "%.1fs vs %.1fs of device drain. Raise DFAC_TPU_INGEST_THREADS, "
                "store features as a memory-mapped .npy corpus "
                "(dfac-data-tools convert-to-npy), or use --multihost so each "
                "host ingests only its row slice.",
                stats.host_wait_s, stats.device_wait_s,
            )


if __name__ == "__main__":
    main()
