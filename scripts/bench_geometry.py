#!/usr/bin/env python
"""Reference-style benchmark sweep at production [180, 321] geometry on TPU.

VERDICT r3 item 7: run the quality harness end-to-end on hardware at the
geometry the reference trains at (180 LFCC features x 321 frames; reference
``src/benchmark.py`` sweep), producing the EER-vs-wall-clock report the
reference publishes (``results/archive/20260201_195009/benchmark_report.md``).

The corpus is synthesized in memory (the reference ships no feature corpora,
and this relay host's disk reads at ~30 MB/s — a 1.4 GB on-disk corpus would
measure the disk, not the harness). Same overlapping-class construction as
``scripts/train_fast_ab.py``, scaled to production geometry.

Run on the TPU:  python scripts/bench_geometry.py
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

F_DIM, T_DIM = 180, 321
DELTA = 0.25  # weaker per-band shift than the toy study: more bands at F=180


def corpus(n: int, seed: int, delta: float = DELTA):
    from dfac_tpu.data.pipeline import ArrayDataset

    r = np.random.default_rng(seed)
    feats = r.normal(size=(n, F_DIM, T_DIM)).astype(np.float32)
    labels = (np.arange(n) % 2).astype(np.int32)
    mask = labels == 1
    feats[mask, : F_DIM // 4, :] += delta * r.random((mask.sum(), 1, 1)).astype(np.float32)
    return ArrayDataset([f"u{i}" for i in range(n)], feats, labels)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-train", type=int, default=4096)
    ap.add_argument("--n-dev", type=int, default=2048)
    ap.add_argument("--models", default="cnn2d,cnn2d+specaug,cnn1d")
    ap.add_argument("--seeds", default="0,1")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--out", default="results/benchmark_v5e_geometry")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from dfac_tpu.train.benchmark_harness import parse_model_specs, run_benchmark
    from dfac_tpu.train.loop import TrainConfig

    print(f"devices: {jax.devices()}")
    train_ds = corpus(args.n_train, seed=0)
    dev_ds = corpus(args.n_dev, seed=1)
    print(
        f"corpus: train n={args.n_train} dev n={args.n_dev} [{F_DIM},{T_DIM}] "
        f"({(args.n_train + args.n_dev) * F_DIM * T_DIM * 4 / 1e9:.1f} GB f32)"
    )

    cfg = TrainConfig(
        batch_size=args.batch_size,
        epochs=args.epochs,
        lr=1e-3,
        in_features=F_DIM,
        dropout=0.2,
        device_resident=True,  # one program per epoch: the TPU-native path
    )
    run_benchmark(
        train_ds, dev_ds,
        parse_model_specs(args.models),
        [int(s) for s in args.seeds.split(",")],
        cfg, args.out,
    )
    print(f"benchmark outputs written to {args.out}")


if __name__ == "__main__":
    main()
