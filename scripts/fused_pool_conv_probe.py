#!/usr/bin/env python
"""Probe: fold the time-pool INTO the consumer conv (exact algebra).

``pool(2,1)`` is linear and sits between relu_i and conv_{i+1}, so
``conv_{i+1} o pool`` is exactly a stride-(2,1) convolution with a (6,3)
kernel whose time taps interleave ``k/2``:

    out[u] = sum_dt k[dt] * (r[2u+2dt] + r[2u+2dt+1]) / 2

VALID pooling over odd T drops the last frame, so the input is sliced to
even length first. Measures baseline vs conv2-fused vs conv2+conv3-fused
on the real TPU, with numeric checks.
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

    def expand_pool_kernel(k):
        """(3, 3, Cin, Cout) conv kernel -> (6, 3, Cin, Cout) pool-fused kernel."""
        k = jnp.asarray(k, jnp.float32) * 0.5
        return jnp.repeat(k, 2, axis=0)  # taps [k0,k0,k1,k1,k2,k2]/2

    def conv(h, w, b, stride=(1, 1), pad="SAME"):
        h = jax.lax.conv_general_dilated(
            h, w.astype(dt), stride, pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return jnp.maximum(h + b, 0.0).astype(dt)

    def head(h):
        hm = jnp.mean(h.astype(jnp.float32), axis=1)
        emb = jnp.swapaxes(hm, 1, 2).reshape(hm.shape[0], -1)
        return (emb.astype(dt) @ folded["w_cls"].astype(dt) + folded["b_cls"])[:, 0]

    w2f = expand_pool_kernel(folded["w2"])
    w3f = expand_pool_kernel(folded["w3"])

    def chain_base(x):
        h = conv(x[..., None], folded["w1"], folded["b1"])
        h = nn.avg_pool(h, (2, 1), (2, 1), "VALID")
        h = conv(h, folded["w2"], folded["b2"])
        h = nn.avg_pool(h, (2, 1), (2, 1), "VALID")
        h = conv(h, folded["w3"], folded["b3"])
        return head(h)

    def chain_f2(x):
        h = conv(x[..., None], folded["w1"], folded["b1"])
        t = h.shape[1] - (h.shape[1] % 2)
        h = conv(h[:, :t], w2f, folded["b2"], stride=(2, 1), pad=((2, 2), (1, 1)))
        h = nn.avg_pool(h, (2, 1), (2, 1), "VALID")
        h = conv(h, folded["w3"], folded["b3"])
        return head(h)

    def chain_f23(x):
        h = conv(x[..., None], folded["w1"], folded["b1"])
        t = h.shape[1] - (h.shape[1] % 2)
        h = conv(h[:, :t], w2f, folded["b2"], stride=(2, 1), pad=((2, 2), (1, 1)))
        h = conv(h, w3f, folded["b3"], stride=(2, 1), pad=((2, 2), (1, 1)))
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

    a = jax.jit(chain_base)(batches[0])
    for name, fn in [("f2", chain_f2), ("f23", chain_f23)]:
        b = jax.jit(fn)(batches[0])
        print(f"max |logit diff| base vs {name}: {float(jnp.max(jnp.abs(a - b))):.3e}")

    print(f"baseline      : {timeit(chain_base):8,.0f} utt/s")
    print(f"conv2-fused   : {timeit(chain_f2):8,.0f} utt/s")
    print(f"conv2+3-fused : {timeit(chain_f23):8,.0f} utt/s")


if __name__ == "__main__":
    main()
