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
import math
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


def stage8_fused_epilogue(B, dt):
    """The production fused custom-vjp epilogue (ops/fused_block.py) vs the
    straight-line AD control, on the stage-7 replica. Also checks gradient
    agreement between the two formulations on-device."""
    print(f"\n== stage 8: fused custom-vjp epilogue (B={B}) ==")
    from dfac_tpu.ops.fused_block import make_block_epilogue
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

    def head(h, params, yb):
        hm = jnp.mean(h.astype(jnp.float32), axis=1)
        emb = jnp.swapaxes(hm, 1, 2).reshape(hm.shape[0], -1)
        logits = (emb.astype(dt) @ params["wc"].astype(dt)).astype(jnp.float32)[:, 0]
        return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, yb))

    def drop_u8_bits(bits, h):
        return jnp.where(bits >= 51, h / (1.0 - 51 / 256.0), 0.0)

    def pool_dw(h):
        c = h.shape[-1]
        taps = jnp.full((2, 1, 1, c), 0.5, h.dtype)
        return jax.lax.conv_general_dilated(
            h, taps, (2, 1), "VALID", dimension_numbers=DN, feature_group_count=c,
        )

    def bits_for(k, h):
        return jax.random.bits(
            k, (h.shape[0], h.shape[1] // 2, h.shape[2], h.shape[3]), jnp.uint8
        )

    def loss_control(params, xin, key):
        ks = jax.random.split(key, 2)
        h = xin[..., None].astype(dt)
        for i in (1, 2, 3):
            h = conv(h, params[f"w{i}"].astype(dt)) + params[f"b{i}"]
            hf = h.astype(jnp.float32)
            m = jnp.mean(hf, axis=(0, 1, 2))
            msq = jnp.mean(jnp.square(hf), axis=(0, 1, 2))
            v = jnp.maximum(msq - m * m, 0.0)
            yv = (h - m) * jax.lax.rsqrt(v + 1e-5)
            yv = yv * params[f"g{i}"] + params[f"be{i}"]
            h = jnp.maximum(yv.astype(dt), 0)
            if i < 3:
                bits = bits_for(ks[i - 1], h)
                h = drop_u8_bits(bits, pool_dw(h)).astype(dt)
        return head(h, params, y)

    ep12 = make_block_epilogue(pool=True, drop_thresh=51)
    ep3 = make_block_epilogue(pool=False, drop_thresh=0)

    def loss_fused(params, xin, key):
        ks = jax.random.split(key, 2)
        h = xin[..., None].astype(dt)
        for i in (1, 2, 3):
            # b is zero here, so the f32 add then bf16 cast is lossless and
            # the fused path sees the identical bf16 conv output as control.
            h = (conv(h, params[f"w{i}"].astype(dt)) + params[f"b{i}"]).astype(dt)
            if i < 3:
                bits = bits_for(ks[i - 1], h)
                h, _, _ = ep12(h, params[f"g{i}"], params[f"be{i}"], bits)
            else:
                h, _, _ = ep3(h, params[f"g{i}"], params[f"be{i}"], None)
        return head(h, params, y)

    x = jax.jit(lambda k: jax.random.normal(k, (B, 321, 180), jnp.float32))(jax.random.key(1))
    gc = jax.jit(jax.grad(loss_control))(params, x, key)
    gf = jax.jit(jax.grad(loss_fused))(params, x, key)
    for k in sorted(gc):
        a, b2 = np.asarray(gc[k], np.float32), np.asarray(gf[k], np.float32)
        rel = np.max(np.abs(a - b2)) / (np.max(np.abs(a)) + 1e-12)
        print(f"  grad agreement {k:4s}: max rel diff {rel:.2e}")

    for name, fn in (("control (straight-line AD)", loss_control), ("fused custom-vjp", loss_fused)):
        t = bench_slope(lambda p, xin, k: jax.grad(fn)(p, xin, k), params, x, key, perturb=1)
        print(f"  {name:28s}: {t*1e3:7.2f} ms  ({B/t:9,.0f} utt/s)")


def stage9_epilogue_micro(B, dt):
    """Single-block epilogue (BN+ReLU+pool+drop) fwd/bwd micro-A/B:
      a. AD through the unfused chain (conv-pool, u8 dropout) — control
      b. ops/fused_block.py custom_vjp as written
      c. custom_vjp variant: conv-pool forward, even/odd half-space backward
         (no full-size upsampled f32 intermediate to materialize)
    Localizes where stage 8's fused-path regression comes from."""
    print(f"\n== stage 9: epilogue micro A/B (B={B}) ==")
    from dfac_tpu.ops.fused_block import make_block_epilogue

    C = 32
    # All inputs generated ON DEVICE: host->device of multi-GB arrays hangs
    # the remote relay.
    y0 = jax.jit(
        lambda k: jax.random.normal(k, (B, 321, 180, C), jnp.float32).astype(dt)
    )(jax.random.key(0))
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    bits = jax.jit(lambda k: jax.random.bits(k, (B, 160, 180, C), jnp.uint8))(
        jax.random.key(1)
    )
    ct = jax.jit(
        lambda k: jax.random.normal(k, (B, 160, 180, C), jnp.float32).astype(dt)
    )(jax.random.key(2))
    keep_inv = 1.0 / (1.0 - 51 / 256.0)

    def pool_dw(h):
        c = h.shape[-1]
        taps = jnp.full((2, 1, 1, c), 0.5, h.dtype)
        return jax.lax.conv_general_dilated(
            h, taps, (2, 1), "VALID", dimension_numbers=DN, feature_group_count=c,
        )

    def unfused(y0, scale, bias, bits):
        xf = y0.astype(jnp.float32)
        m = jnp.mean(xf, axis=(0, 1, 2))
        msq = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
        v = jnp.maximum(msq - m * m, 0.0)
        y = (y0 - m) * jax.lax.rsqrt(v + 1e-5)
        y = y * scale + bias
        y = jnp.maximum(y.astype(dt), 0)
        y = pool_dw(y)
        return jnp.where(bits >= 51, y * jnp.asarray(keep_inv, y.dtype), 0)

    fused_b = make_block_epilogue(pool=True, drop_thresh=51)

    # --- variant c: conv-pool fwd, even/odd-space bwd ---
    @jax.custom_vjp
    def fused_c(y0, scale, bias, bits):
        return _c_fwd(y0, scale, bias, bits)[0]

    def _c_fwd(y0, scale, bias, bits):
        xf = y0.astype(jnp.float32)
        m = jnp.mean(xf, axis=(0, 1, 2))
        msq = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
        v = jnp.maximum(msq - m * m, 0.0)
        r = jax.lax.rsqrt(v + 1e-5)
        y = (y0 - m) * r
        y = y * scale + bias
        y = jnp.maximum(y.astype(dt), 0)
        y = pool_dw(y)
        out = jnp.where(bits >= 51, y * jnp.asarray(keep_inv, y.dtype), 0)
        return out, (y0, scale, bias, bits, m, r)

    def _c_bwd(res, ct):
        y0, scale, bias, bits, m, r = res
        h2 = y0.shape[1] // 2
        n = math.prod(y0.shape[:-1])
        dd = jnp.where(bits >= 51, ct.astype(jnp.float32) * keep_inv, 0.0) * 0.5

        def half(off):
            ys = jax.lax.slice_in_dim(y0, off, 2 * h2, stride=2, axis=1)
            xh = (ys.astype(jnp.float32) - m) * r
            mask = (xh * scale + bias).astype(dt) > 0
            dy = jnp.where(mask, dd, 0.0)
            return xh, dy

        xh_e, dy_e = half(0)
        xh_o, dy_o = half(1)
        s1 = jnp.sum(dy_e, axis=(0, 1, 2)) + jnp.sum(dy_o, axis=(0, 1, 2))
        s2 = jnp.sum(dy_e * xh_e, axis=(0, 1, 2)) + jnp.sum(dy_o * xh_o, axis=(0, 1, 2))
        rs = r * scale
        c1 = rs * s1 / n
        c2 = rs * s2 / n

        def back(xh, dy):
            return (rs * dy - c1 - xh * c2).astype(dt)

        de = back(xh_e, dy_e)
        do = back(xh_o, dy_o)
        inter = jnp.stack([de, do], axis=2).reshape(
            y0.shape[0], 2 * h2, *y0.shape[2:]
        )
        if y0.shape[1] != 2 * h2:
            pad = [(0, 0)] * y0.ndim
            pad[1] = (0, y0.shape[1] - 2 * h2)
            inter = jnp.pad(inter, pad)
        return inter, s2, s1, np.zeros(bits.shape, jax.dtypes.float0)

    fused_c.defvjp(_c_fwd, _c_bwd)

    # bits/ct passed as ARGUMENTS, never closed over: the remote-compile
    # relay rejects programs with half-GB embedded constants (HTTP 413).
    variants = [
        ("a. AD unfused (control)", unfused),
        ("b. fused_block as written", lambda y0, s, b, bits: fused_b(y0, s, b, bits)[0]),
        ("c. conv-pool fwd / even-odd bwd", fused_c),
    ]
    for name, fn in variants:
        tf_ = bench_slope(fn, y0, scale, bias, bits, perturb=0)

        def vjp_loss(y0, s, b, bits, ct):
            return jnp.sum(fn(y0, s, b, bits).astype(jnp.float32) * ct.astype(jnp.float32))

        tb = bench_slope(
            lambda y0, s, b, bits, ct: jax.grad(vjp_loss, argnums=(0, 1, 2))(y0, s, b, bits, ct),
            y0, scale, bias, bits, ct, perturb=0,
        )
        print(f"  {name:34s}: fwd {tf_*1e3:6.2f} ms   fwd+bwd {tb*1e3:7.2f} ms")


def stage10_epi3_head(B, dt):
    """Block-3 epilogue + head (BN+ReLU+mean-over-T+flatten+matmul) micro:
      a. AD through the chain (control)
      b. custom_vjp that factorizes the mean-broadcast backward through
         per-(b,f,c) partial sums (cnt, sum mask*xhat over t), so the
         full-resolution f32 cotangent dy = mask*dhm/T is never
         materialized — only the bf16 dy0 write plus two reads of y0.
    No pool here, so the stage-9 layout traps (strided slices, upsamples)
    don't apply; the question is purely whether XLA's AD materializes the
    broadcast in f32."""
    print(f"\n== stage 10: epi3+head micro A/B (B={B}) ==")
    C = 128
    T = 80
    y0 = jax.jit(
        lambda k: jax.random.normal(k, (B, T, 180, C), jnp.float32).astype(dt)
    )(jax.random.key(0))
    g = jnp.ones((C,), jnp.float32)
    be = jnp.zeros((C,), jnp.float32)
    wc = jax.jit(
        lambda k: jax.random.normal(k, (C * 180, 1), jnp.float32) * 0.01
    )(jax.random.key(1))
    ct = jax.jit(lambda k: jax.random.normal(k, (B,), jnp.float32))(jax.random.key(2))

    def control(y0, g, be, wc):
        xf = y0.astype(jnp.float32)
        m = jnp.mean(xf, axis=(0, 1, 2))
        msq = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
        v = jnp.maximum(msq - m * m, 0.0)
        r = jax.lax.rsqrt(v + 1e-5)
        h = (y0 - m) * r
        h = h * g + be
        h = jnp.maximum(h.astype(dt), 0)
        hm = jnp.mean(h.astype(jnp.float32), axis=1)  # (B, 180, C)
        emb = jnp.swapaxes(hm, 1, 2).reshape(hm.shape[0], -1)
        return (emb.astype(dt) @ wc.astype(dt)).astype(jnp.float32)[:, 0]

    @jax.custom_vjp
    def fused(y0, g, be, wc):
        return _f_fwd(y0, g, be, wc)[0]

    def _f_fwd(y0, g, be, wc):
        xf = y0.astype(jnp.float32)
        m = jnp.mean(xf, axis=(0, 1, 2))
        msq = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
        v = jnp.maximum(msq - m * m, 0.0)
        r = jax.lax.rsqrt(v + 1e-5)
        h = jnp.maximum(((y0 - m) * r * g + be).astype(dt), 0)
        hm = jnp.mean(h.astype(jnp.float32), axis=1)
        emb = jnp.swapaxes(hm, 1, 2).reshape(hm.shape[0], -1)
        logits = (emb.astype(dt) @ wc.astype(dt)).astype(jnp.float32)[:, 0]
        return logits, (y0, g, be, wc, m, r, emb)

    def _f_bwd(res, dlogit):
        y0, g, be, wc, m, r, emb = res
        B_, T_, F_, C_ = y0.shape
        n = B_ * T_ * F_
        dwc = (emb.astype(jnp.float32).T @ dlogit[:, None]).astype(wc.dtype)
        demb = dlogit[:, None] * wc.astype(jnp.float32)[None, :, 0]  # (B, C*F)
        dhm = jnp.swapaxes(demb.reshape(B_, C_, F_), 1, 2) / T_  # (B, F, C)

        # pass 1: per-(b,f,c) mask count and sum of mask*xhat over t
        xhat = (y0.astype(jnp.float32) - m) * r
        mask = (xhat * g + be).astype(dt) > 0
        cnt = jnp.sum(jnp.where(mask, 1.0, 0.0), axis=1)  # (B, F, C)
        sxh = jnp.sum(jnp.where(mask, xhat, 0.0), axis=1)
        s1 = jnp.sum(dhm * cnt, axis=(0, 1))  # (C,)
        s2 = jnp.sum(dhm * sxh, axis=(0, 1))
        rs = r * g
        c1 = rs * s1 / n
        c2 = rs * s2 / n
        # pass 2: dy0 (the only full-size write, bf16). The barrier keeps
        # CSE from merging this recompute with pass 1 (a merged xhat would
        # be materialized in f32 — the exact thing this variant avoids).
        y0b = jax.lax.optimization_barrier(y0)
        xhat2 = (y0b.astype(jnp.float32) - m) * r
        mask2 = (xhat2 * g + be).astype(dt) > 0
        dy0 = jnp.where(mask2, rs * dhm[:, None], 0.0) - c1 - xhat2 * c2
        return dy0.astype(y0.dtype), s2, s1, dwc

    fused.defvjp(_f_fwd, _f_bwd)

    gc_ = jax.jit(jax.grad(lambda y0, g, be, wc: jnp.sum(control(y0, g, be, wc) * ct),
                           argnums=(0, 1, 2, 3)))(y0, g, be, wc)
    gf_ = jax.jit(jax.grad(lambda y0, g, be, wc: jnp.sum(fused(y0, g, be, wc) * ct),
                           argnums=(0, 1, 2, 3)))(y0, g, be, wc)
    for i, nm in enumerate(("dy0", "dg", "dbe", "dwc")):
        a, b = np.asarray(gc_[i], np.float32), np.asarray(gf_[i], np.float32)
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-12)
        print(f"  grad agreement {nm:4s}: max rel diff {rel:.2e}")

    for name, fn in (("a. AD control", control), ("b. factorized custom-vjp", fused)):
        tf_ = bench_slope(fn, y0, g, be, wc, perturb=0)
        tb = bench_slope(
            lambda y0, g, be, wc: jax.grad(
                lambda *a: jnp.sum(fn(*a) * ct), argnums=(0, 1, 2, 3)
            )(y0, g, be, wc),
            y0, g, be, wc, perturb=0,
        )
        print(f"  {name:28s}: fwd {tf_*1e3:6.2f} ms   fwd+bwd {tb*1e3:7.2f} ms")


def stage11_pallas_conv1(B, dt):
    """Flash-block-1 feasibility: what does ONE conv1-equivalent pass cost
    in Pallas? The flash kernel needs ~4 such passes (fwd stats, fwd emit,
    bwd sums, bwd wgrad); XLA's conv1 fwd is 1.6 ms, so the whole plan
    lives or dies on this number.
      v0. traffic floor: read x, per-channel-free sum/sumsq only
      v1. VPU: channel-leading acc (32, T, F), 9 broadcast FMAs
      v2. MXU: leading-axis-contracted dot_general((9,T,F), (9,32))
    Each grid step owns one sample; out is a per-sample (32,) checksum so
    nothing big is written (isolates read+compute)."""
    print(f"\n== stage 11: Pallas conv1-pass feasibility (B={B}) ==")
    from jax.experimental import pallas as pl

    T, F, CO = 321, 180, 32
    x = jax.jit(
        lambda k: jax.random.normal(k, (B, T, F), jnp.float32).astype(dt)
    )(jax.random.key(0))
    w = jax.jit(
        lambda k: (jax.random.normal(k, (3, 3, CO), jnp.float32) * 0.1).astype(dt)
    )(jax.random.key(1))

    def shifts(xt):
        """3 dx-shifted (T+2, F) views of the zero-padded sample."""
        xp = jnp.pad(xt, ((1, 1), (1, 1)))  # (T+2, F+2)
        return [jax.lax.slice(xp, (0, d), (T + 2, d + F)) for d in (0, 1, 2)]

    def kern_v0(x_ref, w_ref, out_ref):
        xt = x_ref[0].astype(jnp.float32)
        s = jnp.sum(xt) + jnp.sum(jnp.square(xt))
        out_ref[0] = jnp.full((CO,), s, jnp.float32)

    def kern_v1(x_ref, w_ref, out_ref):
        xt = x_ref[0]
        xs = [s.astype(jnp.float32) for s in shifts(xt)]
        wf = w_ref[:].astype(jnp.float32)
        acc = jnp.zeros((CO, T, F), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                s = jax.lax.slice(xs[dx], (dy, 0), (dy + T, F))
                acc = acc + s[None] * wf[dy, dx][:, None, None]
        out_ref[0] = jnp.sum(acc, axis=(1, 2))

    def kern_v2(x_ref, w_ref, out_ref):
        xt = x_ref[0]
        xs = shifts(xt)
        taps = jnp.stack(
            [jax.lax.slice(xs[dx], (dy, 0), (dy + T, F))
             for dy in range(3) for dx in range(3)],
            axis=0,
        )  # (9, T, F) bf16
        w9 = w_ref[:].reshape(9, CO)
        y = jax.lax.dot_general(
            taps, w9, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T, F, CO)
        out_ref[0] = jnp.sum(y, axis=(0, 1))

    def run(kern):
        return pl.pallas_call(
            kern,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, T, F), lambda b: (b, 0, 0)),
                pl.BlockSpec((3, 3, CO), lambda b: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, CO), lambda b: (b, 0)),
            out_shape=jax.ShapeDtypeStruct((B, CO), jnp.float32),
        )

    # XLA control: the production conv1 (fwd only)
    t = bench_slope(lambda x, w: conv(x[..., None], w[:, :, None, :]), x, w)
    print(f"  XLA conv1 fwd (control)     : {t*1e3:7.2f} ms")

    for name, kern in (("v0 traffic floor", kern_v0),
                       ("v1 VPU chan-leading", kern_v1),
                       ("v2 MXU lead-contract dot", kern_v2)):
        try:
            fn = run(kern)
            t = bench_slope(fn, x, w)
            print(f"  {name:28s}: {t*1e3:7.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"  {name:28s}: FAILED {type(e).__name__}: {str(e)[:160]}")


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
    if "8" in stages:
        stage8_fused_epilogue(args.batch, dt)
    if "9" in stages:
        stage9_epilogue_micro(args.batch, dt)
    if "10" in stages:
        stage10_epi3_head(args.batch, dt)
    if "11" in stages:
        stage11_pallas_conv1(args.batch, dt)


if __name__ == "__main__":
    main()
