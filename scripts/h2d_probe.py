#!/usr/bin/env python
"""Host<->device link microbenchmark: what does the transfer path sustain?

The ingest-inclusive serving numbers (scripts/ingest_probe.py) bottleneck
on host->device transfer when the link is thin — PCIe on a production
host, the tunnel relay on the bench rig. This probe isolates the link:

* H2D: ``device_put`` + block, per payload size and dtype (f32/bf16/int8)
* D2H: ``np.asarray(device_array)`` fetch
* dispatch: round-trip latency of a trivial jit program (the per-batch
  floor any non-resident loop pays)

Run on the TPU: python scripts/h2d_probe.py [--mb 1 8 64]
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
    ap.add_argument("--mb", type=int, nargs="+", default=[1, 8, 64])
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    dev = jax.devices()[0]
    print(f"device: {dev}")

    # --- dispatch floor: trivial jit round trip
    f = jax.jit(lambda x: x + 1.0)
    x = jax.device_put(jnp.zeros((8,), jnp.float32), dev)
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    for _ in range(20):
        jax.block_until_ready(f(x))
    dt = (time.perf_counter() - t0) / 20
    print(f"jit round-trip latency: {dt*1e3:8.2f} ms")

    rng = np.random.default_rng(0)
    for mb in args.mb:
        n = mb * (1 << 20)
        for label, arr in (
            ("f32 ", rng.normal(size=(n // 4,)).astype(np.float32)),
            ("bf16", None),
            ("int8", rng.integers(-127, 127, size=(n,), dtype=np.int8)),
        ):
            if label == "bf16":
                import ml_dtypes

                arr = rng.normal(size=(n // 2,)).astype(np.float32).astype(
                    ml_dtypes.bfloat16
                )
            # H2D
            jax.block_until_ready(jax.device_put(arr, dev))  # warm path
            t0 = time.perf_counter()
            outs = []
            for _ in range(args.reps):
                outs.append(jax.device_put(arr, dev))
            jax.block_until_ready(outs)
            h2d = mb * args.reps / (time.perf_counter() - t0)
            # D2H
            d = outs[-1]
            np.asarray(d)
            t0 = time.perf_counter()
            for _ in range(args.reps):
                np.asarray(d)
            d2h = mb * args.reps / (time.perf_counter() - t0)
            print(f"{mb:4d} MB {label}: H2D {h2d:8.1f} MB/s   D2H {d2h:8.1f} MB/s")


if __name__ == "__main__":
    main()
