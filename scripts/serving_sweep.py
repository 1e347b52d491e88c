#!/usr/bin/env python
"""Headline serving chain: batch-size x scan-unroll sweep of the ONE-dispatch
corpus program (the exact configuration `bench.py` ships).

Round-3's floor analysis put the fused waveform->LFCC->CNN2D chain at ~85%
of its HBM materialization floor at B=128, attributing the remainder to
"pipeline bubbles at the B=128 sweet spot". This probe checks whether a
different (B, unroll) point of the SAME one-dispatch scan closes any of it:
unroll>1 lets XLA software-pipeline consecutive batch bodies (overlap the
front-end GEMMs of step k+1 with the conv tail of step k) without changing
batch geometry.

Run on the TPU:  python scripts/serving_sweep.py
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
    ap.add_argument("--batches", type=int, nargs="*", default=[64, 96, 128, 160, 192, 256])
    ap.add_argument("--unrolls", type=int, nargs="*", default=[1, 2])
    ap.add_argument("--n-batches", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax

    # env JAX_PLATFORMS is ignored under the axon relay — honor it explicitly
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from dfac_tpu.features.lfcc import LFCCConfig
    from dfac_tpu.models import build_model
    from dfac_tpu.models.fast_infer import cnn2d_fast_scores_tf, fold_cnn2d
    from dfac_tpu.ops.pallas.gemm_frontend import gemm_lfcc_features_tf

    cfg = LFCCConfig()
    n_samples = cfg.num_samples(321)
    model = build_model("cnn2d")
    variables = model.init({"params": jax.random.key(0)}, jnp.zeros((1, 321, 180), jnp.float32))
    folded = fold_cnn2d(variables)
    print(f"devices: {jax.devices()}  n_batches={args.n_batches}")

    for B in args.batches:
        corpus = jax.jit(
            lambda key, B=B: jax.random.normal(
                key, (args.n_batches, B, n_samples), jnp.float32
            )
        )(jax.random.key(1))
        n_corpus = args.n_batches * B

        for unroll in args.unrolls:

            @jax.jit
            def score(folded, corpus3d, unroll=unroll):
                def body(_, waves):
                    feats = gemm_lfcc_features_tf(waves, cfg, compute_dtype=jnp.bfloat16)
                    return None, cnn2d_fast_scores_tf(folded, feats)

                _, out = jax.lax.scan(body, None, corpus3d, unroll=unroll)
                return out.reshape(-1)

            def run():
                # host fetch = the only reliable barrier through the relay
                return np.asarray(score(folded, corpus))

            run()  # compile
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t0)
            print(
                f"B={B:4d} unroll={unroll}  {n_corpus / best:10,.0f} utt/s"
                f"  ({best:.3f}s / {n_corpus})",
                flush=True,
            )


if __name__ == "__main__":
    main()
