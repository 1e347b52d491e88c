#!/usr/bin/env python
"""Probe pool implementations for the (2,1) time-pool in the CNN chain.

The reduce_window pool runs at ~420 GB/s; candidates reshape the T axis
(free, major-dim split) and reduce at better lane utilization.
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
    ap.add_argument("--n-corpus", type=int, default=4096)
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
    feats = jax.jit(lambda key: jax.random.normal(key, (n, 321, 180), dt))(
        jax.random.key(1)
    )
    batches = [feats[s : s + bsz] for s in range(0, n, bsz)]

    def conv(h, i):
        h = jax.lax.conv_general_dilated(
            h, folded[f"w{i}"].astype(dt), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return jnp.maximum(h + folded[f"b{i}"], 0.0).astype(dt)

    def head(h):
        hm = jnp.mean(h.astype(jnp.float32), axis=1)
        emb = jnp.swapaxes(hm, 1, 2).reshape(hm.shape[0], -1)
        return (emb.astype(dt) @ folded["w_cls"].astype(dt) + folded["b_cls"])[:, 0]

    def pool_rw(h):
        return nn.avg_pool(h, (2, 1), (2, 1), "VALID")

    def pool_reshape(h):
        b, t, f, c = h.shape
        t2 = t - (t % 2)
        return ((h[:, :t2].reshape(b, t2 // 2, 2, f, c)).mean(axis=2)).astype(h.dtype)

    def pool_reshape_flat(h):
        b, t, f, c = h.shape
        t2 = t - (t % 2)
        flat = h[:, :t2].reshape(b, t2 // 2, 2, f * c)
        return flat.mean(axis=2).astype(h.dtype).reshape(b, t2 // 2, f, c)

    def pool_add(h):
        b, t, f, c = h.shape
        t2 = t - (t % 2)
        g = h[:, :t2].reshape(b, t2 // 2, 2, f, c)
        return ((g[:, :, 0] + g[:, :, 1]) * 0.5).astype(h.dtype)

    def make_chain(pool):
        def chain(x):
            h = conv(x[..., None], 1)
            h = pool(h)
            h = conv(h, 2)
            h = pool(h)
            h = conv(h, 3)
            return head(h)
        return chain

    def timeit(fn):
        g = jax.jit(lambda x: fn(x).astype(jnp.float32).sum())

        def run():
            return np.asarray(jnp.stack([g(b) for b in batches]))

        run()
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        return n / best

    base = make_chain(pool_rw)
    a = jax.jit(base)(batches[0])
    variants = {
        "reduce_window": base,
        "reshape_mean": make_chain(pool_reshape),
        "reshape_flat": make_chain(pool_reshape_flat),
        "reshape_add": make_chain(pool_add),
    }
    for name, fn in variants.items():
        if name != "reduce_window":
            b = jax.jit(fn)(batches[0])
            print(f"max |logit diff| vs base ({name}): {float(jnp.max(jnp.abs(a-b))):.3e}")
    for name, fn in variants.items():
        print(f"{name:14s}: {timeit(fn):8,.0f} utt/s")


if __name__ == "__main__":
    main()
