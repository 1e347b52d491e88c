"""``dfac-predict-hybrid`` — hybrid CNN+CAE prediction on an unlabeled set.

Feature-parity target: reference ``src/predict_hybrid.py`` — fixed-alpha
fusion (default 0.80) of supervised sigmoid scores and raw CAE MSE scores
(both min-max normalized), prediction.pkl output, score-distribution report,
and optional per-sample diff / class-agreement vs an existing submission.
"""

from __future__ import annotations

import argparse

from dfac_tpu.cli.common import add_multihost_args, init_multihost


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Hybrid CNN+CAE prediction for submission.")
    p.add_argument("--features", required=True)
    p.add_argument("--cnn-checkpoint", required=True)
    p.add_argument("--cnn-model", default="cnn2d", choices=["cnn2d", "cnn1d"])
    p.add_argument("--cae-checkpoint", required=True)
    p.add_argument("--normalizer", required=True)
    p.add_argument("--alpha", type=float, default=0.80,
                   help="supervised weight (reference src/predict_hybrid.py:107)")
    p.add_argument("--out", default="prediction.pkl")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--in-features", type=int, default=180)
    p.add_argument("--base-channels", type=int, default=32)
    p.add_argument("--compare-with", default=None,
                   help="existing prediction.pkl to diff against")
    p.add_argument("--fast", action="store_true",
                   help="folded-BN fused serving chains for BOTH legs "
                   "(bf16 with f32 accumulation; cnn2d/cnn1d + CAE)")
    p.add_argument("--data-parallel", type=int, default=0,
                   help="shard each scoring batch over N devices (requires "
                   "--fast; both legs run per shard)")
    add_multihost_args(p, extra_help="requires --fast")
    p.add_argument("--device", default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.multihost and not args.fast:
        raise SystemExit(
            "--multihost hybrid serving runs the folded fast chains — add --fast"
        )
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    if args.multihost:
        init_multihost(args)  # join the cluster before the backend wakes up

    from dfac_tpu.data.normalizer import FeatureNormalizer
    from dfac_tpu.data.pipeline import load_dataset
    from dfac_tpu.ensemble.hybrid import (
        compare_with_submission,
        fuse_scores,
        score_distribution_report,
    )
    from dfac_tpu.io.pickle_io import load_predictions, write_predictions
    from dfac_tpu.models import build_model
    from dfac_tpu.train.cae_loop import cae_mse_scores
    from dfac_tpu.train.checkpoint import load_model_variables
    from dfac_tpu.train.evaluate import predict_scores

    ds = load_dataset(args.features)

    cnn_vars = load_model_variables(args.cnn_checkpoint, model_name=args.cnn_model)
    cae_vars = load_model_variables(args.cae_checkpoint, model_name="cae")
    normalizer = FeatureNormalizer.load(args.normalizer)

    if args.data_parallel > 1:
        if not args.fast:
            raise SystemExit("--data-parallel hybrid serving requires --fast")
        if args.batch_size % args.data_parallel:
            raise SystemExit("--batch-size must divide by --data-parallel")
        import jax.numpy as jnp
        import numpy as np

        from dfac_tpu.models.fast_infer import _ingest, fold_cae, fold_cnn1d, fold_cnn2d
        from dfac_tpu.parallel.mesh import batch_sharding, make_mesh
        from dfac_tpu.parallel.serving import make_sharded_hybrid_scorer
        from dfac_tpu.train.evaluate import collect_masked_scores

        mesh = make_mesh(n_data=args.data_parallel)
        scorer = make_sharded_hybrid_scorer(mesh, model=args.cnn_model)
        fold_sup = fold_cnn2d if args.cnn_model == "cnn2d" else fold_cnn1d
        folded_sup, folded_cae = fold_sup(cnn_vars), fold_cae(cae_vars)
        mean = jnp.asarray(normalizer.mean)
        std = jnp.asarray(normalizer.std)
        shard = batch_sharding(mesh)
        # f32 upload, NOT a host bf16 cast: the one feats array feeds BOTH
        # legs, and the CAE leg's MSE target is formed in f32 from the raw
        # input — pre-quantizing would shift its scores. Sharded put lands
        # slices on their chips; the shared collect contract gives the
        # prefetch-threaded ingest and the empty-corpus guard.
        if args.multihost:
            from dfac_tpu.parallel import multihost as mh

            folded_sup = mh.replicate_tree(folded_sup, mesh)
            folded_cae = mh.replicate_tree(folded_cae, mesh)
            lo, hi = mh.local_row_range(mesh, args.batch_size)
            prepare = lambda b: mh.batch_from_local(  # noqa: E731
                np.ascontiguousarray(b.features[lo:hi]), mesh,
                global_rows=args.batch_size,
            )
            gather = mh.gather_rows
        else:
            prepare = lambda b: _ingest(b.features, jnp.float32, shard)  # noqa: E731
            gather = None
        sup, cae_s = collect_masked_scores(
            lambda feats: scorer(folded_sup, folded_cae, mean, std, feats),
            ds, args.batch_size,
            prepare_batch=prepare,
            n_outputs=2,
            gather=gather,
        )
    elif args.fast:
        # both legs through the folded-BN fused chains (models/fast_infer.py)
        from dfac_tpu.models.fast_infer import cae_mse_scores_fast

        if args.cnn_model == "cnn2d":
            from dfac_tpu.models.fast_infer import predict_scores_fast

            sup = predict_scores_fast(cnn_vars, ds, args.batch_size, apply_sigmoid=True)
        else:
            from dfac_tpu.models.fast_infer import predict_scores_fast_cnn1d

            sup = predict_scores_fast_cnn1d(cnn_vars, ds, args.batch_size, apply_sigmoid=True)
        cae_s = cae_mse_scores_fast(cae_vars, ds, normalizer, args.batch_size)
    else:
        cnn = build_model(args.cnn_model, in_features=args.in_features)
        sup = predict_scores(cnn, cnn_vars, ds, args.batch_size, apply_sigmoid=True)
        cae = build_model("cae", base_channels=args.base_channels)
        cae_s = cae_mse_scores(cae, cae_vars, ds, normalizer, args.batch_size)

    hybrid = fuse_scores(sup, cae_s, alpha=args.alpha)
    if args.multihost:
        from dfac_tpu.parallel import multihost as mh

        if not mh.is_coordinator():
            return  # every process computed the full scores; one writes
    write_predictions(args.out, ds.uttids, hybrid)
    print(f"wrote {len(hybrid)} hybrid predictions (alpha={args.alpha}) to {args.out}")

    rep = score_distribution_report(hybrid)
    print(
        f"distribution: min={rep['min']:.6f} median={rep['median']:.4f} max={rep['max']:.6f}  "
        f"class1@0.5={rep['n_class1_at_0.5']} class0@0.5={rep['n_class0_at_0.5']}"
    )

    if args.compare_with:
        ou, os_ = load_predictions(args.compare_with)
        diff = compare_with_submission(ds.uttids, hybrid, ou, os_)
        print(
            f"vs {args.compare_with}: common={diff['n_common']} "
            f"mean|d|={diff['mean_abs_diff']:.6f} max|d|={diff['max_abs_diff']:.6f} "
            f"agreement={diff['class_agreement']:.4f} flipped={diff['n_flipped']}"
        )


if __name__ == "__main__":
    main()
