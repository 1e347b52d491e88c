#!/usr/bin/env python
"""Round-3 training-throughput probe: isolate and attack the backward-pass
costs named by the round-2 attribution (results/v5e_measurements.md):

  * wgrad contractions under-filling the MXU (9 taps x CI=1/32/64),
  * train-mode BatchNorm stat passes,
  * dropout mask generation/multiplies.

Stages:
  1. isolated wgrad / dgrad per conv geometry (XLA's native lowering)
  2. wgrad reformulations: patches-GEMM (tap-packed im2col) via
     lax.conv_general_dilated_patches + dot_general
  3. BN stat pass variants (fused mean+sq reduce vs dot-based)
  4. full-step variants: baseline / remat / custom-vjp convs
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import optax


def _small(tree):
    """Reduce every output leaf to a scalar INSIDE the jit program, so the
    host-fetch execution barrier never pulls a big tensor through the
    remote relay (a 1.9 GB activation fetch kills the connection). A sum —
    not a slice — so XLA cannot dead-code-eliminate any of the computation;
    costs one extra read of the largest leaf (~2.4 ms for a 1.9 GB
    activation at HBM bandwidth), tolerable noise here."""
    return jax.tree.map(
        lambda a: jnp.sum(a.astype(jnp.float32)) if hasattr(a, "ravel") else a, tree
    )


def _scalarize(tree):
    leaves = [v for v in jax.tree.leaves(_small(tree))]
    out = leaves[0]
    for leaf in leaves[1:]:
        out = out + leaf
    return out


def bench(fn, *args, reps=5):
    wrapped = jax.jit(lambda *a: _small(fn(*a)))
    out = wrapped(*args)
    np.asarray(jax.tree.leaves(out)[0])  # host-fetch barrier (relay-safe)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = wrapped(*args)
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def bench_slope(fn, *args, perturb: int = 0, iters=(4, 12), reps=4):
    """Per-call on-device time of ``fn`` with the ~28 ms relay dispatch
    overhead cancelled: run N iterations of ``fn`` inside ONE lax.scan
    program for two values of N and take the slope. A tiny carry-dependent
    perturbation (+carry*1e-30 on args[perturb]) chains the iterations so
    XLA cannot hoist or CSE the loop body; it adds one elementwise pass
    over that argument per iteration (identical across compared variants).
    """

    def make(n):
        @jax.jit
        def run(*a0):
            def body(carry, _):
                a = list(a0)
                a[perturb] = a[perturb] + (carry * 1e-30).astype(a[perturb].dtype)
                return _scalarize(fn(*a)), None
            s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return s

        return run

    times = []
    for n in iters:
        f = make(n)
        f(*args)
        np.asarray(f(*args))  # warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            best = min(best, time.perf_counter() - t0)
        times.append(best)
    return (times[1] - times[0]) / (iters[1] - iters[0])


DN = ("NHWC", "HWIO", "NHWC")


def conv(x, w):
    # mirrors the model's flax nn.Conv(dtype=bf16): bf16 in, bf16 out, no
    # preferred_element_type (whose VJP rejects mixed-dtype cotangents)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=DN
    )


def stage1_isolated_grads(B, dt):
    """Per-conv wgrad/dgrad times under XLA's native lowering."""
    geoms = [
        ("conv1", (B, 321, 180, 1), 32),
        ("conv2", (B, 160, 180, 32), 64),
        ("conv3", (B, 80, 180, 64), 128),
    ]
    print(f"\n== stage 1: isolated conv grads (B={B}, {dt.__name__ if hasattr(dt,'__name__') else dt}) ==")
    for name, xshape, co in geoms:
        ci = xshape[-1]
        key = jax.random.key(0)
        x = jax.jit(lambda k: jax.random.normal(k, xshape, jnp.float32).astype(dt))(key)
        w = jax.jit(lambda k: jax.random.normal(k, (3, 3, ci, co), jnp.float32).astype(dt))(
            jax.random.key(1)
        )
        dy = jax.jit(lambda k: jax.random.normal(k, xshape[:-1] + (co,), jnp.float32).astype(dt))(
            jax.random.key(2)
        )

        fwd_t = bench_slope(lambda x, w: conv(x, w), x, w)

        @jax.jit
        def wgrad(x, w, dy):
            _, vjp = jax.vjp(lambda w: conv(x, w), w)
            return vjp(dy)[0]

        @jax.jit
        def dgrad(x, w, dy):
            _, vjp = jax.vjp(lambda x: conv(x, w), x)
            return vjp(dy)[0]

        wg_t = bench_slope(wgrad, x, w, dy)
        dg_t = bench_slope(dgrad, x, w, dy)
        flops = 2 * 9 * ci * co * np.prod(xshape[:-1])
        print(
            f"  {name}: fwd {fwd_t*1e3:7.2f} ms ({flops/fwd_t/1e12:6.1f} TF/s) | "
            f"wgrad {wg_t*1e3:7.2f} ms ({flops/wg_t/1e12:6.1f} TF/s) | "
            f"dgrad {dg_t*1e3:7.2f} ms ({flops/dg_t/1e12:6.1f} TF/s)"
        )


def patches_wgrad(x, dy, ci, co):
    """Tap-packed wgrad: one [9*CI, K] x [K, CO] GEMM via im2col patches."""
    B, H, W, _ = x.shape
    patches = jax.lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), "SAME", dimension_numbers=DN
    )  # (B, H, W, 9*ci) with channel-major tap order? (ci*9) — order checked in test
    k = patches.reshape(-1, patches.shape[-1])
    g = dy.reshape(-1, co)
    dw = jax.lax.dot_general(
        k, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (9*ci, co)
    return dw


def stage2_wgrad_reformulations(B, dt):
    print(f"\n== stage 2: wgrad reformulations (B={B}) ==")
    geoms = [
        ("conv1", (B, 321, 180, 1), 32),
        ("conv2", (B, 160, 180, 32), 64),
        ("conv3", (B, 80, 180, 64), 128),
    ]
    for name, xshape, co in geoms:
        ci = xshape[-1]
        x = jax.jit(lambda k: jax.random.normal(k, xshape, jnp.float32).astype(dt))(jax.random.key(0))
        dy = jax.jit(lambda k: jax.random.normal(k, xshape[:-1] + (co,), jnp.float32).astype(dt))(
            jax.random.key(2)
        )
        t = bench_slope(functools.partial(patches_wgrad, ci=ci, co=co), x, dy)
        flops = 2 * 9 * ci * co * np.prod(xshape[:-1])
        print(f"  {name} patches-GEMM wgrad: {t*1e3:7.2f} ms ({flops/t/1e12:6.1f} TF/s)")


def stage3_bn_stats(B, dt):
    print(f"\n== stage 3: BN stat passes (B={B}) ==")
    shapes = [(B, 321, 180, 32), (B, 160, 180, 64), (B, 80, 180, 128)]
    for shape in shapes:
        x = jax.jit(lambda k: jax.random.normal(k, shape, jnp.float32).astype(dt))(jax.random.key(0))
        gb = np.prod(shape) * np.dtype(np.float32 if dt is jnp.float32 else np.float16).itemsize / 1e9

        @jax.jit
        def stats_reduce(x):
            xf = x.astype(jnp.float32)
            return jnp.mean(xf, axis=(0, 1, 2)), jnp.mean(jnp.square(xf), axis=(0, 1, 2))

        @jax.jit
        def stats_normalize(x):
            # the full train-mode BN: stats + normalize pass (two passes)
            xf = x.astype(jnp.float32)
            m = jnp.mean(xf, axis=(0, 1, 2))
            msq = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
            v = jnp.maximum(msq - m * m, 0.0)
            return ((x - m) * jax.lax.rsqrt(v + 1e-5)).astype(x.dtype)

        t1 = bench_slope(stats_reduce, x)
        t2 = bench_slope(stats_normalize, x)
        print(
            f"  {shape}: stats {t1*1e3:6.2f} ms ({gb/t1:6.0f} GB/s) | "
            f"stats+norm {t2*1e3:6.2f} ms ({3*gb/t2:6.0f} GB/s eff)"
        )


def build_step(variant, B, dt, model, tx):
    from dfac_tpu.utils.rng import train_key

    variables = model.init({"params": jax.random.key(0)}, jnp.zeros((1, 321, 180), jnp.float32))
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    opt_state = tx.init(params)
    x = jax.jit(lambda k: jax.random.normal(k, (B, 321, 180), jnp.float32))(jax.random.key(1))
    y = jnp.asarray((np.arange(B) % 2).astype(np.float32))
    key = train_key(0)

    def loss_fn(p, bs, xin, dropkey):
        out, mut = model.apply(
            {"params": p, "batch_stats": bs}, xin, train=True,
            mutable=["batch_stats"], rngs={"dropout": dropkey},
        )
        per = optax.sigmoid_binary_cross_entropy(out[:, 0], y)
        return jnp.mean(per), mut

    if variant == "remat":
        loss_inner = loss_fn

        def loss_fn(p, bs, xin, dropkey):  # noqa: F811
            return jax.checkpoint(
                loss_inner, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            )(p, bs, xin, dropkey)

    @jax.jit
    def full_step(p, bs, os_, xin, k):
        (l, mut), g = jax.value_and_grad(loss_fn, has_aux=True)(p, bs, xin, k)
        updates, os2 = tx.update(g, os_, p)
        p2 = optax.apply_updates(p, updates)
        return l, p2, mut.get("batch_stats", bs), os2

    return full_step, (params, batch_stats, opt_state, x, key)


def stage4_full_steps(B, dt):
    from dfac_tpu.models import build_model
    from dfac_tpu.train.optim import build_optimizer

    print(f"\n== stage 4: full-step variants (B={B}) ==")
    model = build_model("cnn2d", compute_dtype=(None if dt is jnp.float32 else dt))
    tx = build_optimizer("cnn2d", 1e-3)
    for variant in ("baseline", "remat"):
        step, args = build_step(variant, B, dt, model, tx)
        t = bench_slope(step, *args, perturb=3)
        print(f"  {variant:10s}: {t*1e3:7.2f} ms  ({B/t:9,.0f} utt/s)")


def stage5_step_bracket(B, dt):
    """Slope-timed bracket of the REAL model step: where do the ~100 ms go?"""
    from dfac_tpu.models import build_model
    from dfac_tpu.train.optim import build_optimizer
    from dfac_tpu.utils.rng import train_key

    print(f"\n== stage 5: model-step bracket (B={B}) ==")
    tx = build_optimizer("cnn2d", 1e-3)
    cd = None if dt is jnp.float32 else dt

    def setup(dropout):
        model = build_model("cnn2d", compute_dtype=cd, dropout=dropout)
        variables = model.init(
            {"params": jax.random.key(0)}, jnp.zeros((1, 321, 180), jnp.float32)
        )
        return model, variables["params"], variables.get("batch_stats", {})

    model, params, batch_stats = setup(0.2)
    model0, params0, batch_stats0 = setup(0.0)
    opt_state = tx.init(params)
    x = jax.jit(lambda k: jax.random.normal(k, (B, 321, 180), jnp.float32))(jax.random.key(1))
    y = jnp.asarray((np.arange(B) % 2).astype(np.float32))
    key = train_key(0)

    def loss_of(m):
        def loss_fn(p, bs, xin, dropkey):
            out, mut = m.apply(
                {"params": p, "batch_stats": bs}, xin, train=True,
                mutable=["batch_stats"], rngs={"dropout": dropkey},
            )
            per = optax.sigmoid_binary_cross_entropy(out[:, 0], y)
            return jnp.mean(per), mut

        return loss_fn

    loss_fn = loss_of(model)
    loss_fn0 = loss_of(model0)

    rows = [
        ("fwd eval", lambda p, bs, xin, k: model.apply({"params": p, "batch_stats": bs}, xin), 2),
        ("fwd train (no dropout)", lambda p, bs, xin, k: loss_fn0(p, bs, xin, k)[0], 2),
        ("fwd train (dropout)", lambda p, bs, xin, k: loss_fn(p, bs, xin, k)[0], 2),
        ("fwd+bwd (no dropout)",
         lambda p, bs, xin, k: jax.value_and_grad(loss_fn0, has_aux=True)(p, bs, xin, k)[1], 2),
        ("fwd+bwd (dropout)",
         lambda p, bs, xin, k: jax.value_and_grad(loss_fn, has_aux=True)(p, bs, xin, k)[1], 2),
    ]
    for name, fn, pidx in rows:
        which = params0 if "no dropout" in name else params
        bs_in = batch_stats0 if "no dropout" in name else batch_stats
        t = bench_slope(fn, which, bs_in, x, key, perturb=pidx)
        print(f"  {name:24s}: {t*1e3:7.2f} ms  ({B/t:9,.0f} utt/s)")

    def full(p, bs, os_, xin, k):
        (l, mut), g = jax.value_and_grad(loss_fn, has_aux=True)(p, bs, xin, k)
        updates, os2 = tx.update(g, os_, p)
        return l, optax.apply_updates(p, updates), mut.get("batch_stats", bs), os2

    t = bench_slope(full, params, batch_stats, opt_state, x, key, perturb=3)
    print(f"  {'full step':24s}: {t*1e3:7.2f} ms  ({B/t:9,.0f} utt/s)")


def stage6_variants(B, dt):
    """Functional CNN2D replica: A/B pool + dropout implementations under
    the full train-mode fwd+bwd (the real optimization candidates)."""
    print(f"\n== stage 6: fwd+bwd variants (B={B}) ==")
    from dfac_tpu.utils.rng import train_key

    rngk = np.random.default_rng(0)
    chans = [(1, 32), (32, 64), (64, 128)]
    params = {}
    for i, (ci, co) in enumerate(chans, 1):
        params[f"w{i}"] = jnp.asarray(rngk.normal(size=(3, 3, ci, co)) * 0.1, jnp.float32)
        params[f"b{i}"] = jnp.zeros((co,), jnp.float32)
        params[f"g{i}"] = jnp.ones((co,), jnp.float32)
        params[f"be{i}"] = jnp.zeros((co,), jnp.float32)
    params["wc"] = jnp.asarray(rngk.normal(size=(128 * 180, 1)) * 0.01, jnp.float32)
    x = jax.jit(lambda k: jax.random.normal(k, (B, 321, 180), jnp.float32))(jax.random.key(1))
    y = jnp.asarray((np.arange(B) % 2).astype(np.float32))
    key = train_key(0)

    def pool_rw(h):
        from flax import linen as nn

        return nn.avg_pool(h, (2, 1), (2, 1), "VALID")

    def pool_dw(h):
        # no preferred_element_type: its f32 output breaks the VJP's
        # dtype match against the bf16 taps (MXU accumulates f32 anyway)
        c = h.shape[-1]
        taps = jnp.full((2, 1, 1, c), 0.5, h.dtype)
        return jax.lax.conv_general_dilated(
            h, taps, (2, 1), "VALID", dimension_numbers=DN,
            feature_group_count=c,
        )

    def drop_f32(k, h, rate):
        keep = jax.random.bernoulli(k, 1.0 - rate, h.shape)
        return jnp.where(keep, h / (1.0 - rate), 0.0)

    def drop_u8(k, h, rate):
        # one random BYTE per element; keep iff byte >= round(rate*256)
        thresh = int(round(rate * 256))
        bits = jax.random.bits(k, h.shape, jnp.uint8)
        return jnp.where(bits >= thresh, h / (1.0 - thresh / 256.0), 0.0)

    def drop_none(k, h, rate):
        return h

    def make_loss(pool, drop):
        def loss(params, xin, key):
            k1, k2 = jax.random.split(key)
            h = xin[..., None].astype(dt)
            for i, k_ in ((1, k1), (2, k2), (3, None)):
                h = conv(h, params[f"w{i}"].astype(dt)) + params[f"b{i}"]
                hf = h.astype(jnp.float32)
                m = jnp.mean(hf, axis=(0, 1, 2))
                msq = jnp.mean(jnp.square(hf), axis=(0, 1, 2))
                v = jnp.maximum(msq - m * m, 0.0)
                h = ((h - m) * jax.lax.rsqrt(v + 1e-5) * params[f"g{i}"] + params[f"be{i}"]).astype(dt)
                h = jnp.maximum(h, 0)
                if i < 3:
                    h = pool(h)
                    h = drop(k_, h, 0.2).astype(dt)
            hm = jnp.mean(h.astype(jnp.float32), axis=1)
            emb = jnp.swapaxes(hm, 1, 2).reshape(hm.shape[0], -1)
            logits = (emb.astype(dt) @ params["wc"].astype(dt)).astype(jnp.float32)[:, 0]
            import optax as _o

            return jnp.mean(_o.sigmoid_binary_cross_entropy(logits, y))

        return lambda p, xin, k: jax.value_and_grad(loss)(p, xin, k)[1]

    variants = [
        ("rw-pool + f32-drop (baseline)", pool_rw, drop_f32),
        ("dw-pool + f32-drop", pool_dw, drop_f32),
        ("rw-pool + u8-drop", pool_rw, drop_u8),
        ("dw-pool + u8-drop", pool_dw, drop_u8),
        ("dw-pool + no-drop", pool_dw, drop_none),
    ]
    for name, pool, drop in variants:
        t = bench_slope(make_loss(pool, drop), params, x, key, perturb=1)
        print(f"  {name:32s}: {t*1e3:7.2f} ms  ({B/t:9,.0f} utt/s)")


def stage7_backward_attribution(B, dt):
    """Where do the ~60 ms of backward go? Block-depth prefixes + BN
    precision variants + batch-size sweep on the u8-drop replica."""
    print(f"\n== stage 7: backward attribution (B={B}) ==")
    from dfac_tpu.utils.rng import train_key

    rngk = np.random.default_rng(0)
    chans = [(1, 32), (32, 64), (64, 128)]
    params = {}
    for i, (ci, co) in enumerate(chans, 1):
        params[f"w{i}"] = jnp.asarray(rngk.normal(size=(3, 3, ci, co)) * 0.1, jnp.float32)
        params[f"b{i}"] = jnp.zeros((co,), jnp.float32)
        params[f"g{i}"] = jnp.ones((co,), jnp.float32)
        params[f"be{i}"] = jnp.zeros((co,), jnp.float32)
    params["wc"] = jnp.asarray(rngk.normal(size=(128 * 180, 1)) * 0.01, jnp.float32)
    y = jnp.asarray((np.arange(B) % 2).astype(np.float32))
    key = train_key(0)

    def drop_u8(k, h, rate):
        bits = jax.random.bits(k, h.shape, jnp.uint8)
        return jnp.where(bits >= 51, h / (1.0 - 51 / 256.0), 0.0)

    def pool_dw(h):
        c = h.shape[-1]
        taps = jnp.full((2, 1, 1, c), 0.5, h.dtype)
        return jax.lax.conv_general_dilated(
            h, taps, (2, 1), "VALID", dimension_numbers=DN, feature_group_count=c,
        )

    def make_loss(depth=3, bn="f32", with_drop=True, batch=None):
        yb = y if batch is None else jnp.asarray((np.arange(batch) % 2).astype(np.float32))

        def loss(params, xin, key):
            ks = jax.random.split(key, 3)
            h = xin[..., None].astype(dt)
            for i in range(1, depth + 1):
                h = conv(h, params[f"w{i}"].astype(dt)) + params[f"b{i}"]
                if bn == "f32":
                    hf = h.astype(jnp.float32)
                    m = jnp.mean(hf, axis=(0, 1, 2))
                    msq = jnp.mean(jnp.square(hf), axis=(0, 1, 2))
                    v = jnp.maximum(msq - m * m, 0.0)
                    h = ((h - m) * jax.lax.rsqrt(v + 1e-5) * params[f"g{i}"] + params[f"be{i}"]).astype(dt)
                elif bn == "bf16norm":
                    # stats still f32-accumulated reduces over the bf16
                    # array, but the normalize runs in bf16 (no f32
                    # materialization for the backward to re-read)
                    m = jnp.mean(h, axis=(0, 1, 2), dtype=jnp.float32)
                    msq = jnp.mean(jnp.square(h.astype(jnp.float32)), axis=(0, 1, 2))
                    v = jnp.maximum(msq - m * m, 0.0)
                    inv = (jax.lax.rsqrt(v + 1e-5) * params[f"g{i}"]).astype(dt)
                    h = (h - m.astype(dt)) * inv + params[f"be{i}"].astype(dt)
                elif bn == "none":
                    pass
                h = jnp.maximum(h, 0)
                if i < 3:
                    h = pool_dw(h)
                    if with_drop:
                        h = drop_u8(ks[i], h, 0.2).astype(dt)
        # head always runs on whatever depth produced
            hm = jnp.mean(h.astype(jnp.float32), axis=1)
            emb = jnp.swapaxes(hm, 1, 2).reshape(hm.shape[0], -1)
            wc = params["wc"][: emb.shape[1]]
            logits = (emb.astype(dt) @ wc.astype(dt)).astype(jnp.float32)[:, 0]
            import optax as _o

            return jnp.mean(_o.sigmoid_binary_cross_entropy(logits, yb))

        return lambda p, xin, k: jax.value_and_grad(loss)(p, xin, k)[1]

    x = jax.jit(lambda k: jax.random.normal(k, (B, 321, 180), jnp.float32))(jax.random.key(1))
    rows = [
        ("depth1 (conv1 block)", make_loss(depth=1), x),
        ("depth2 (+conv2)", make_loss(depth=2), x),
        ("depth3 full (u8, f32-BN)", make_loss(depth=3), x),
        ("depth3, bf16-normalize BN", make_loss(depth=3, bn="bf16norm"), x),
        ("depth3, no BN", make_loss(depth=3, bn="none"), x),
    ]
    for name, fn, xin in rows:
        t = bench_slope(fn, params, xin, key, perturb=1)
        print(f"  {name:28s}: {t*1e3:7.2f} ms  ({xin.shape[0]/t:9,.0f} utt/s)")
    for b2 in (256, 1024):
        x2 = jax.jit(lambda k: jax.random.normal(k, (b2, 321, 180), jnp.float32))(jax.random.key(1))
        t = bench_slope(make_loss(depth=3, batch=b2), params, x2, key, perturb=1)
        print(f"  full u8 @ B={b2:<6d}          : {t*1e3:7.2f} ms  ({b2/t:9,.0f} utt/s)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--stages", default="1,2,3,4")
    args = ap.parse_args()
    dt = jnp.float32 if args.dtype == "float32" else jnp.bfloat16
    stages = set(args.stages.split(","))
    print(f"devices: {jax.devices()}")
    if "1" in stages:
        stage1_isolated_grads(args.batch, dt)
    if "2" in stages:
        stage2_wgrad_reformulations(args.batch, dt)
    if "3" in stages:
        stage3_bn_stats(args.batch, dt)
    if "4" in stages:
        stage4_full_steps(args.batch, dt)
    if "5" in stages:
        stage5_step_bracket(args.batch, dt)
    if "6" in stages:
        stage6_variants(args.batch, dt)
    if "7" in stages:
        stage7_backward_attribution(args.batch, dt)


if __name__ == "__main__":
    main()
