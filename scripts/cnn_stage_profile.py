#!/usr/bin/env python
"""Per-stage timing of the folded CNN2D serving chain on the real TPU.

Times progressively longer prefixes of the fast-inference program so the
difference between consecutive rows isolates each stage's cost. Used to
decide where Pallas fusion pays (round 2 perf push).
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
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--n-corpus", type=int, default=8192)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from dfac_tpu.models import build_model
    from dfac_tpu.models.fast_infer import fold_cnn2d

    model = build_model("cnn2d")
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 321, 180), jnp.float32)
    )
    folded = fold_cnn2d(variables)
    dt = jnp.bfloat16

    n, bsz = args.n_corpus, args.batch
    feats = jax.jit(
        lambda key: jax.random.normal(key, (n, 321, 180), dt)
    )(jax.random.key(1))
    batches = [feats[s : s + bsz] for s in range(0, n, bsz)]

    def conv(h, i):
        h = jax.lax.conv_general_dilated(
            h, folded[f"w{i}"].astype(dt), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return jnp.maximum(h + folded[f"b{i}"], 0.0).astype(dt)

    def pool(h):
        return nn.avg_pool(h, (2, 1), (2, 1), "VALID")

    def head(h):
        hm = jnp.mean(h.astype(jnp.float32), axis=1)
        emb = jnp.swapaxes(hm, 1, 2).reshape(hm.shape[0], -1)
        return (emb.astype(dt) @ folded["w_cls"].astype(dt) + folded["b_cls"])[:, 0]

    stages = {
        "conv1": lambda x: conv(x[..., None], 1),
        "+pool1": lambda x: pool(conv(x[..., None], 1)),
        "+conv2": lambda x: conv(pool(conv(x[..., None], 1)), 2),
        "+pool2": lambda x: pool(conv(pool(conv(x[..., None], 1)), 2)),
        "+conv3": lambda x: conv(pool(conv(pool(conv(x[..., None], 1)), 2)), 3),
        "+head": lambda x: head(conv(pool(conv(pool(conv(x[..., None], 1)), 2)), 3)),
    }

    prev = 0.0
    for name, fn in stages.items():
        # reduce to a scalar per batch so host fetch (the only reliable
        # execution barrier through the relay) transfers almost nothing
        g = jax.jit(lambda x, fn=fn: fn(x).astype(jnp.float32).sum())

        def run():
            return np.asarray(jnp.stack([g(b) for b in batches]))

        run()
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        us = best / n * 1e6
        print(f"{name:7s}: {us:6.2f} us/utt  (delta {us - prev:6.2f})  {n/best:8,.0f} utt/s")
        prev = us


if __name__ == "__main__":
    main()
