#!/usr/bin/env python
"""Round-2 perf experiments for the headline serving chain.

Sweeps batch size and stage composition for the e2e waveform -> LFCC ->
CNN2D chain on the real TPU, and times each stage alone, so the headline
bench configuration is chosen from measurements, not guesses.
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


def time_corpus(fn, batches, n_corpus, reps=5):
    import jax.numpy as jnp

    def run():
        outs = [fn(b) for b in batches]
        return np.asarray(jnp.concatenate([o.reshape(-1) for o in outs]))

    run()  # warmup/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return n_corpus / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[256, 512, 1024, 2048])
    ap.add_argument("--n-corpus", type=int, default=8192)
    ap.add_argument("--stages", action="store_true", help="also time stages alone")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dfac_tpu.features.lfcc import LFCCConfig
    from dfac_tpu.models import build_model
    from dfac_tpu.models.fast_infer import cnn2d_fast_scores_tf, fold_cnn2d
    from dfac_tpu.ops.pallas.gemm_frontend import gemm_lfcc_features_tf

    cfg = LFCCConfig()
    n_corpus = args.n_corpus
    n_samples = cfg.num_samples(321)

    model = build_model("cnn2d")
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 321, 180), jnp.float32)
    )
    folded = fold_cnn2d(variables)

    corpus = jax.jit(
        lambda key: jax.random.normal(key, (n_corpus, n_samples), jnp.float32)
    )(jax.random.key(1))

    @jax.jit
    def e2e(waves):
        feats = gemm_lfcc_features_tf(waves, cfg, compute_dtype=jnp.bfloat16)
        return cnn2d_fast_scores_tf(folded, feats)

    @jax.jit
    def frontend_only(waves):
        return gemm_lfcc_features_tf(waves, cfg, compute_dtype=jnp.bfloat16)[:, 0, 0]

    feats_corpus = None
    for bsz in args.batches:
        batches = [corpus[s : s + bsz] for s in range(0, n_corpus, bsz)]
        r = time_corpus(e2e, batches, n_corpus)
        print(f"e2e      B={bsz:5d}: {r:,.0f} utt/s")
        if args.stages:
            rf = time_corpus(frontend_only, batches, n_corpus)
            print(f"frontend B={bsz:5d}: {rf:,.0f} utt/s")
            if feats_corpus is None:
                feats_corpus = jax.jit(
                    lambda c: gemm_lfcc_features_tf(c, cfg, compute_dtype=jnp.bfloat16)
                )(corpus)

            @jax.jit
            def cnn_only(feats):
                return cnn2d_fast_scores_tf(folded, feats)

            fb = [feats_corpus[s : s + bsz] for s in range(0, n_corpus, bsz)]
            rc = time_corpus(cnn_only, fb, n_corpus)
            print(f"cnn      B={bsz:5d}: {rc:,.0f} utt/s")


if __name__ == "__main__":
    main()
