#!/usr/bin/env python
"""Probe: can XLA fuse the (2,1) time-pool into the conv epilogue?

Compares the reduce_window avg_pool against a strided-slice formulation
``(relu(h)[:, 0::2] + relu(h)[:, 1::2]) * 0.5`` (identical math for even T)
on the full folded CNN chain, on the real TPU.
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
    feats = jax.jit(lambda key: jax.random.normal(key, (n, 321, 180), dt))(
        jax.random.key(1)
    )
    batches = [feats[s : s + bsz] for s in range(0, n, bsz)]

    def conv_raw(h, i):
        return jax.lax.conv_general_dilated(
            h, folded[f"w{i}"].astype(dt), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    def head(h):
        hm = jnp.mean(h.astype(jnp.float32), axis=1)
        emb = jnp.swapaxes(hm, 1, 2).reshape(hm.shape[0], -1)
        return (emb.astype(dt) @ folded["w_cls"].astype(dt) + folded["b_cls"])[:, 0]

    def chain_reduce_window(x):
        h = x[..., None]
        for i in (1, 2, 3):
            h = jnp.maximum(conv_raw(h, i) + folded[f"b{i}"], 0.0).astype(dt)
            if i < 3:
                h = nn.avg_pool(h, (2, 1), (2, 1), "VALID")
        return head(h)

    def chain_strided(x):
        h = x[..., None]
        for i in (1, 2, 3):
            h = jnp.maximum(conv_raw(h, i) + folded[f"b{i}"], 0.0)
            if i < 3:
                t = h.shape[1] - (h.shape[1] % 2)
                h = ((h[:, 0:t:2] + h[:, 1:t:2]) * 0.5).astype(dt)
            else:
                h = h.astype(dt)
        return head(h)

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

    # numeric check first
    a = jax.jit(chain_reduce_window)(batches[0])
    b = jax.jit(chain_strided)(batches[0])
    md = float(jnp.max(jnp.abs(a - b)))
    print(f"max |diff| reduce_window vs strided: {md:.3e}")

    print(f"reduce_window pool: {timeit(chain_reduce_window):8,.0f} utt/s")
    print(f"strided-slice pool: {timeit(chain_strided):8,.0f} utt/s")


if __name__ == "__main__":
    main()
