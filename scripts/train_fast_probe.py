#!/usr/bin/env python
"""Training throughput of the fast-numerics recipes vs the baseline.

The round-3 byte-floor audit (results/v5e_measurements.md) proved the
exact-parity train step sits within ~5% of its HBM-traffic floor — but the
floor itself moves if the recipe changes. This probe measures the
device-resident epoch scan (the production single-chip mode) at production
geometry for:

* baseline        — dropout 0.2, BN training stats every step
* dropout-free    — dropout 0.0 (removes the mask generation + the
                    backward's regenerated-bytes traffic; the byte
                    accounting predicts ~10-15%)
* bn-frozen       — dropout 0.2, BatchNorm on running stats (drops the
                    batch-stat reductions + running-stats update)
* fast (combined) — dropout 0.0 + frozen BN (the --train-fast candidate)

Quality gate for these recipes: results/train_fast_ab.md (EER A/B across
seeds). Run on the TPU: python scripts/train_fast_probe.py
[--n 16384] [--batch 512]; fold numbers into results/v5e_measurements.md.
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
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--f-dim", type=int, default=180)
    ap.add_argument("--t-dim", type=int, default=321)
    args = ap.parse_args()

    import jax

    # the axon sitecustomize pins jax_platforms; an env JAX_PLATFORMS=cpu
    # is silently ignored unless applied as an explicit config update
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from dfac_tpu.data.pipeline import ArrayDataset
    from dfac_tpu.train.loop import TrainConfig, Trainer

    F, T, n = args.f_dim, args.t_dim, args.n
    print(f"devices: {jax.devices()}  corpus n={n} ({n*F*T*4/1e9:.1f} GB f32)")
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(n, F, T)).astype(np.float32)
    labels = (np.arange(n) % 2).astype(np.int32)
    train_ds = ArrayDataset([f"u{i}" for i in range(n)], feats, labels)

    def time_recipe(name, dropout, freeze):
        # bn_freeze_after_frac such that EVERY measured epoch is frozen
        # (epochs > round(epochs * tiny) -> all of them)
        cfg = TrainConfig(
            model="cnn2d", batch_size=args.batch, epochs=100, seed=0,
            in_features=F, compute_dtype="bfloat16", device_resident=True,
            dropout=dropout, bn_freeze_after_frac=0.001 if freeze else 0.0,
        )
        tr = Trainer(cfg)
        tr.state = tr.init_state(feats[: args.batch])
        tr.train_epoch(train_ds, epoch=1)  # compile + warm
        times = []
        for e in range(2, 2 + args.epochs):
            t0 = time.perf_counter()
            tr.train_epoch(train_ds, epoch=e)
            jax.block_until_ready(tr.state.params)
            np.asarray(jax.tree.leaves(tr.state.params)[0])  # relay barrier
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"{name:24s} {best:7.3f}s/epoch  {n/best:9.0f} utt/s")
        return n / best

    base = time_recipe("baseline (drop 0.2)", 0.2, False)
    df = time_recipe("dropout-free", 0.0, False)
    bf = time_recipe("bn-frozen", 0.2, True)
    fast = time_recipe("fast (drop 0 + frozen)", 0.0, True)
    print(
        f"vs baseline: dropout-free {df/base:.3f}x  bn-frozen {bf/base:.3f}x  "
        f"fast {fast/base:.3f}x"
    )


if __name__ == "__main__":
    main()
