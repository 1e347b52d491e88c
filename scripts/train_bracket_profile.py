#!/usr/bin/env python
"""Bracket the training-step time: fwd(eval) vs fwd(train) vs fwd+bwd vs
full step (fwd+bwd+AdamW). Each stage is its own jit program timed with a
host-fetch barrier, so the deltas attribute the epoch-scan's cost
(VERDICT round-2 item 7).
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


def bench(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax_leaf(out))  # barrier
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax_leaf(out))
        best = min(best, time.perf_counter() - t0)
    return best


def jax_leaf(tree):
    import jax

    return jax.tree.leaves(tree)[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from dfac_tpu.models import build_model
    from dfac_tpu.train.optim import build_optimizer

    B = args.batch
    dt = None if args.dtype == "float32" else jnp.dtype(args.dtype)
    model = build_model("cnn2d", compute_dtype=dt)
    tx = build_optimizer("cnn2d", 1e-3)
    variables = model.init({"params": jax.random.key(0)}, jnp.zeros((1, 321, 180), jnp.float32))
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    opt_state = tx.init(params)

    x = jax.jit(lambda k: jax.random.normal(k, (B, 321, 180), jnp.float32))(jax.random.key(1))
    y = jnp.asarray((np.arange(B) % 2).astype(np.float32))
    key = jax.random.key(2)

    def loss_fn(p, bs, xin, dropkey):
        (logits), mut = model.apply(
            {"params": p, "batch_stats": bs}, xin, train=True,
            mutable=["batch_stats"], rngs={"dropout": dropkey},
        )
        per = optax.sigmoid_binary_cross_entropy(logits[:, 0], y)
        return jnp.mean(per), mut

    @jax.jit
    def fwd_eval(p, bs, xin):
        return model.apply({"params": p, "batch_stats": bs}, xin, train=False)

    @jax.jit
    def fwd_train(p, bs, xin, k):
        return loss_fn(p, bs, xin, k)[0]

    @jax.jit
    def fwd_bwd(p, bs, xin, k):
        (l, mut), g = jax.value_and_grad(loss_fn, has_aux=True)(p, bs, xin, k)
        return l, g

    @jax.jit
    def full_step(p, bs, os_, xin, k):
        (l, mut), g = jax.value_and_grad(loss_fn, has_aux=True)(p, bs, xin, k)
        updates, os2 = tx.update(g, os_, p)
        p2 = optax.apply_updates(p, updates)
        return l, p2, mut.get("batch_stats", bs), os2

    rows = [
        ("fwd eval-mode (running stats)", bench(fwd_eval, params, batch_stats, x)),
        ("fwd train-mode (batch stats)", bench(fwd_train, params, batch_stats, x, key)),
        ("fwd+bwd", bench(fwd_bwd, params, batch_stats, x, key)),
        ("full step (fwd+bwd+AdamW)", bench(full_step, params, batch_stats, opt_state, x, key)),
    ]
    print(f"CNN2D {args.dtype} B={B} (per-batch times, best of 5)")
    for name, t in rows:
        print(f"  {name:34s}: {t*1e3:7.2f} ms  ({B/t:9,.0f} utt/s)")


if __name__ == "__main__":
    main()
