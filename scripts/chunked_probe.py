#!/usr/bin/env python
"""Chunked streaming training throughput vs resident and host-loop modes.

Measures the three supervised epoch modes on the same synthetic corpus
(production geometry, bf16):

* device-resident epoch scan (corpus in HBM, one dispatch/epoch) — ceiling
* chunked streaming (--resident-chunk-batches G) for several G — the
  larger-than-HBM mode; gap to resident = upload exposure not hidden by
  the prefetch overlap
* per-batch host loop — floor

Run on the TPU: python scripts/chunked_probe.py [--n 16384] [--batch 512]
Results go in results/v5e_measurements.md (round 3 ingest section).
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
    ap.add_argument("--chunks", type=int, nargs="*", default=[8])
    ap.add_argument("--ingests", nargs="*", default=["f32", "bf16", "int8"],
                    help="--chunk-ingest modes to sweep: on upload-bound "
                         "rigs (this relay: ~5 MB/s h2d) rates should scale "
                         "~1/bytes (f32 -> bf16 -> int8 = 1x, 2x, ~3.5x)")
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
    dev_ds = ArrayDataset([f"d{i}" for i in range(512)], feats[:512], labels[:512])

    def time_mode(name, **cfg_kw):
        cfg = TrainConfig(
            model="cnn2d", batch_size=args.batch, epochs=1, seed=0,
            in_features=F, compute_dtype="bfloat16", **cfg_kw,
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
        print(f"{name:32s} {best:7.3f}s/epoch  {n/best:9.0f} utt/s")
        return n / best

    resident = time_mode("device-resident epoch scan", device_resident=True)
    for g in args.chunks:
        for ingest in args.ingests:
            time_mode(
                f"chunked G={g} ingest={ingest}",
                resident_chunk_batches=g, chunk_ingest=ingest,
            )
    host = time_mode("per-batch host loop")
    print(f"resident/host ratio: {resident/host:.2f}x")


if __name__ == "__main__":
    main()
