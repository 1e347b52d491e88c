#!/usr/bin/env python
"""Round-2 training-throughput experiments (VERDICT item 7).

Measures the device-resident epoch-scan program under variations: batch
size, compute dtype, pooling implementation, corpus orientation. Each
variant times full epochs on a synthetic corpus at production geometry.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--batches", type=int, nargs="*", default=[256, 512, 1024])
    ap.add_argument("--depthwise-pool", action="store_true")
    ap.add_argument("--pre-transposed", action="store_true",
                    help="store the corpus in model view (B,T,F); no per-step transpose")
    ap.add_argument("--dtypes", nargs="*", default=["bfloat16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.depthwise_pool:
        from dfac_tpu.models import common, fast_infer

        def dw_pool(x, window, strides=None):
            return fast_infer._depthwise_avg_pool(x, tuple(window))

        common.avg_pool = dw_pool
        import dfac_tpu.models.cnn2d as cnn2d_mod

        cnn2d_mod.avg_pool = dw_pool

    from dfac_tpu.models import build_model
    from dfac_tpu.train.loop import TrainState, make_epoch_scan
    from dfac_tpu.train.optim import build_optimizer

    n = args.n
    rng = np.random.default_rng(0)

    for dtype in args.dtypes:
        dt = jnp.dtype(dtype) if dtype != "float32" else None
        model = build_model("cnn2d", compute_dtype=dt)
        tx = build_optimizer("cnn2d", 1e-3)
        variables = model.init(
            {"params": jax.random.key(0)}, jnp.zeros((1, 321, 180), jnp.float32)
        )
        from dfac_tpu.utils.rng import train_key

        state = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            key=train_key(1),  # production trainers use the rbg chain
        )
        shape = (n, 321, 180) if args.pre_transposed else (n, 180, 321)
        feats = jax.jit(lambda key: jax.random.normal(key, shape, jnp.float32))(
            jax.random.key(2)
        )
        labels = jnp.asarray((np.arange(n) % 2).astype(np.float32))

        for bsz in args.batches:
            scan = make_epoch_scan(
                model, tx, swap_tf=not args.pre_transposed, label_smoothing=0.05,
                augment_fn=None, n_examples=n, batch_size=bsz,
            )

            def run(st, seed):
                st, loss, count = scan(st, feats, labels, np.int64(seed))
                return st, float(loss), float(count)  # host fetch = barrier

            st, *_ = run(state, 0)  # warmup/compile
            best = float("inf")
            for rep in range(4):
                t0 = time.perf_counter()
                st, loss, count = run(st, rep + 1)
                best = min(best, time.perf_counter() - t0)
            tag = []
            if args.depthwise_pool:
                tag.append("dwpool")
            if args.pre_transposed:
                tag.append("pretrans")
            print(
                f"{dtype:9s} B={bsz:5d} {'+'.join(tag) or 'base':16s}: "
                f"{n / best:8,.0f} utt/s  ({best*1e3:7.1f} ms/epoch)"
            )


if __name__ == "__main__":
    main()
