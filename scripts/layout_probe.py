#!/usr/bin/env python
"""Probe: NCHW vs NHWC layout for the folded CNN chain on TPU.

NHWC puts C (32/64/128) in the lane dim — C=32 wastes 3/4 of each tile.
NCHW puts F=180 in lanes (70% util) and T in sublanes, so the (2,1)
time-pool becomes a sublane-dim reduce. Measures both chains end to end.
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

    def head_from_btfc(h):
        hm = jnp.mean(h.astype(jnp.float32), axis=1)
        emb = jnp.swapaxes(hm, 1, 2).reshape(hm.shape[0], -1)
        return (emb.astype(dt) @ folded["w_cls"].astype(dt) + folded["b_cls"])[:, 0]

    def chain_nhwc(x):
        h = x[..., None]
        for i in (1, 2, 3):
            h = jax.lax.conv_general_dilated(
                h, folded[f"w{i}"].astype(dt), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            h = jnp.maximum(h + folded[f"b{i}"], 0.0).astype(dt)
            if i < 3:
                h = nn.avg_pool(h, (2, 1), (2, 1), "VALID")
        return head_from_btfc(h)

    def chain_nchw(x):
        h = x[:, None, :, :]  # (B, 1, T, F)
        for i in (1, 2, 3):
            w = jnp.transpose(folded[f"w{i}"], (3, 2, 0, 1)).astype(dt)  # OIHW
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.float32,
            )
            b = folded[f"b{i}"][None, :, None, None]
            h = jnp.maximum(h + b, 0.0).astype(dt)
            if i < 3:
                t2 = h.shape[2] - (h.shape[2] % 2)
                h = jax.lax.reduce_window(
                    h[:, :, :t2], jnp.asarray(0, h.dtype), jax.lax.add,
                    (1, 1, 2, 1), (1, 1, 2, 1), "VALID",
                ) * jnp.asarray(0.5, h.dtype)
        # h: (B, C, T', F) -> mean over T' -> (B, C, F): already channel-major
        hm = jnp.mean(h.astype(jnp.float32), axis=2)
        emb = hm.reshape(hm.shape[0], -1)
        return (emb.astype(dt) @ folded["w_cls"].astype(dt) + folded["b_cls"])[:, 0]

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

    a = jax.jit(chain_nhwc)(batches[0])
    b = jax.jit(chain_nchw)(batches[0])
    print(f"max |logit diff| nhwc vs nchw: {float(jnp.max(jnp.abs(a - b))):.3e}")

    print(f"nhwc: {timeit(chain_nhwc):8,.0f} utt/s")
    print(f"nchw: {timeit(chain_nchw):8,.0f} utt/s")


if __name__ == "__main__":
    main()
