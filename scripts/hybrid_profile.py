#!/usr/bin/env python
"""Hybrid-submission serving throughput: both legs (folded CNN2D scores +
folded CAE per-sample MSE) + alpha fusion, measured end to end on device-
resident features (VERDICT r2 weak item 4 follow-up: a measured hybrid
utt/s next to the single-leg numbers in results/v5e_measurements.md).

Run on the TPU: python scripts/hybrid_profile.py [--n 8192] [--batch 128]
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
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--alpha", type=float, default=0.80)
    ap.add_argument("--device", default=None, help="e.g. cpu (env JAX_PLATFORMS is ignored under the axon relay)")
    args = ap.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp

    from dfac_tpu.ensemble.hybrid import fuse_scores
    from dfac_tpu.models import build_model
    from dfac_tpu.models.fast_infer import (
        cae_fast_mse,
        cnn2d_fast_scores,
        fold_cae,
        fold_cnn2d,
    )

    F, T, B, n = 180, 321, args.batch, args.n
    print(f"devices: {jax.devices()}  n={n} B={B} alpha={args.alpha}")

    sup_model = build_model("cnn2d")
    cae_model = build_model("cae")
    k = jax.random.key(0)
    sup_vars = sup_model.init({"params": k}, jnp.zeros((1, T, F)))
    cae_vars = cae_model.init({"params": jax.random.key(1)}, jnp.zeros((1, F, T)))
    folded_sup = fold_cnn2d(sup_vars)
    folded_cae = fold_cae(cae_vars)
    mean = jnp.zeros((F,), jnp.float32)
    std = jnp.ones((F,), jnp.float32)

    # synthesize the corpus ON DEVICE (host->device of GBs hangs the relay)
    feats = jax.jit(
        lambda k: jax.random.normal(k, (n, F, T), jnp.float32).astype(jnp.bfloat16)
    )(jax.random.key(2))
    np.asarray(jnp.sum(feats.astype(jnp.float32)))  # barrier

    n_batches = n // B

    @jax.jit
    def hybrid_scores(feats):
        def body(_, batch):
            sup = cnn2d_fast_scores(folded_sup, batch, apply_sigmoid=True)
            mse = cae_fast_mse(folded_cae, batch, mean, std)
            # reference anomaly convention: higher MSE -> more fake;
            # min-max normalize per corpus happens host-side in the CLI —
            # here the fusion runs on raw per-batch scores (same FLOPs).
            cae_s = 1.0 - jnp.tanh(mse)
            return None, args.alpha * sup + (1 - args.alpha) * cae_s

        _, scores = jax.lax.scan(body, None, feats.reshape(n_batches, B, F, T))
        return scores.reshape(-1)

    out = hybrid_scores(feats)
    np.asarray(out)  # warm + barrier
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(hybrid_scores(feats))
        best = min(best, time.perf_counter() - t0)
    print(f"hybrid both-legs fused serving: {n/best:,.0f} utt/s  ({best:.3f}s / {n})")

    # single-leg controls on the same corpus/program shape
    for name, leg in (
        ("cnn2d leg only", lambda b: cnn2d_fast_scores(folded_sup, b, apply_sigmoid=True)),
        ("cae leg only", lambda b: cae_fast_mse(folded_cae, b, mean, std)),
    ):
        @jax.jit
        def run(feats, leg=leg):
            _, s = jax.lax.scan(
                lambda _, b: (None, leg(b)), None, feats.reshape(n_batches, B, F, T)
            )
            return s.reshape(-1)

        np.asarray(run(feats))
        bestl = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(run(feats))
            bestl = min(bestl, time.perf_counter() - t0)
        print(f"{name:30s}: {n/bestl:,.0f} utt/s")

    # host-side fusion check (what the CLI does): fuse_scores parity
    fused = fuse_scores(np.zeros(4), np.ones(4), alpha=args.alpha)
    assert fused.shape == (4,)


if __name__ == "__main__":
    main()
