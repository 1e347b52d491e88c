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

    # Agreement check fetches SCALARS only: a 1.9 GB dy0 host fetch hangs
    # the remote relay, so the max-rel-diff reduction runs on device.
    @jax.jit
    def agree(y0, g, be, wc):
        gc_ = jax.grad(lambda y0, g, be, wc: jnp.sum(control(y0, g, be, wc) * ct),
                       argnums=(0, 1, 2, 3))(y0, g, be, wc)
        gf_ = jax.grad(lambda y0, g, be, wc: jnp.sum(fused(y0, g, be, wc) * ct),
                       argnums=(0, 1, 2, 3))(y0, g, be, wc)
        return [
            jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
            / (jnp.max(jnp.abs(a.astype(jnp.float32))) + 1e-12)
            for a, b in zip(gc_, gf_)
        ]
    rels = agree(y0, g, be, wc)
    for nm, r_ in zip(("dy0", "dg", "dbe", "dwc"), rels):
        print(f"  grad agreement {nm:4s}: max rel diff {float(r_):.2e}")

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
        out_ref[0] = jnp.full((8, 128), s, jnp.float32)

    def kern_v1(x_ref, w_ref, out_ref):
        xt = x_ref[0]
        xs = [s.astype(jnp.float32) for s in shifts(xt)]
        wf = w_ref[:].astype(jnp.float32)
        acc = jnp.zeros((CO, T, F), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                s = jax.lax.slice(xs[dx], (dy, 0), (dy + T, F))
                acc = acc + s[None] * wf[dy, dx][:, None, None]
        out_ref[0] = jnp.full((8, 128), jnp.sum(acc), jnp.float32)

    def _taps(xt):
        xs = shifts(xt)
        return jnp.stack(
            [jax.lax.slice(xs[dx], (dy, 0), (dy + T, F))
             for dy in range(3) for dx in range(3)],
            axis=0,
        )  # (9, T, F)

    def kern_v2(x_ref, w_ref, out_ref):
        w9 = w_ref[:].reshape(9, CO)
        y = jax.lax.dot_general(
            _taps(x_ref[0]), w9, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T, F, CO)
        out_ref[0] = jnp.full((8, 128), jnp.sum(y), jnp.float32)

    def kern_v3(x_ref, w_ref, out_ref):
        # 8 samples per grid step; taps (9, 8, T, F), M = 8*T*F
        xp = jnp.pad(x_ref[:], ((0, 0), (1, 1), (1, 1)))
        taps = jnp.stack(
            [jax.lax.slice(xp, (0, dy, dx), (8, dy + T, dx + F))
             for dy in range(3) for dx in range(3)],
            axis=0,
        )
        w9 = w_ref[:].reshape(9, CO)
        y = jax.lax.dot_general(
            taps, w9, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (8, T, F, CO)
        out_ref[0] = jnp.full((8, 128), jnp.sum(y), jnp.float32)

    def kern_v4(x_ref, w_ref, out_ref):
        # full emit pass: conv -> affine -> relu -> 2x1 pool -> pooled write
        w9 = w_ref[:].reshape(9, CO)
        y = jax.lax.dot_general(
            _taps(x_ref[0]), w9, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T, F, CO) f32
        a = jnp.maximum(y * 1.01 + 0.01, 0.0)
        p = 0.5 * (a[0 : 2 * TP : 2] + a[1 : 2 * TP : 2])  # leading-axis pairs
        out_ref[0] = p.astype(dt)

    def run(kern, n_samples=1, emit=False):
        if emit:
            out_spec = pl.BlockSpec((1, TP, F, CO), lambda b: (b, 0, 0, 0))
            out_shape = jax.ShapeDtypeStruct((B, TP, F, CO), dt)
        else:
            out_spec = pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0))
            out_shape = jax.ShapeDtypeStruct((B // n_samples, 8, 128), jnp.float32)
        return pl.pallas_call(
            kern,
            grid=(B // n_samples,),
            in_specs=[
                pl.BlockSpec((n_samples, T, F), lambda b: (b, 0, 0)),
                pl.BlockSpec((3, 3, CO), lambda b: (0, 0, 0)),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
        )

    TP = T // 2  # pooled rows

    # XLA control: the production conv1 (fwd only)
    t = bench_slope(lambda x, w: conv(x[..., None], w[:, :, None, :]), x, w)
    print(f"  XLA conv1 fwd (control)     : {t*1e3:7.2f} ms")

    for name, kern, kw in (("v0 traffic floor", kern_v0, {}),
                           ("v1 VPU chan-leading", kern_v1, {}),
                           ("v2 MXU lead-contract dot", kern_v2, {}),
                           ("v3 MXU 8-sample tile", kern_v3, {"n_samples": 8}),
                           ("v4 emit pass (pooled write)", kern_v4, {"emit": True})):
        try:
            fn = run(kern, **kw)
            t = bench_slope(fn, x, w)
            print(f"  {name:28s}: {t*1e3:7.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"  {name:28s}: FAILED {type(e).__name__}: {str(e)[:160]}")


def stage12_conv_formulations(B, dt):
    """Conv-in-Pallas formulation shoot-out, round 2. Round 1 of this stage
    crashed Mosaic everywhere; the real error (pallas_err_probe.py) was
    `tpu.reshape (3,3,32) -> (9,32) unsupported` — collapsing leading dims
    is only a layout no-op when the second-minor dim is sublane-aligned, so
    the in-kernel weight reshape (not the taps) was the crasher. All
    variants now take pre-reshaped weights and avoid misaligned collapses:
      a. odd-offset 2D taps, jnp.stack, leading-axis dot
      c. flat-shift im2col: host-padded flat sample, 9 dynamic lane
         slices, (9, M) sublane-contract dot
      d. VPU FMA, channel-last acc
      f. conv2-shape: dy lane-interleave + 3 sublane-sliced K=96 rank-3
         dots (no reshape)
    XLA controls: conv1 1.6 ms, conv2 4.0 ms (results/v5e_measurements.md)."""
    print(f"\n== stage 12: conv formulation shoot-out (B={B}) ==")
    from jax.experimental import pallas as pl

    T, F, CO = 321, 180, 32
    x = jax.jit(
        lambda k: jax.random.normal(k, (B, T, F), jnp.float32).astype(dt)
    )(jax.random.key(0))
    w9 = jax.jit(
        lambda k: (jax.random.normal(k, (9, CO), jnp.float32) * 0.1).astype(dt)
    )(jax.random.key(1))
    Np = (T + 2) * (F + 2)
    xpad_flat = jax.jit(
        lambda x: jnp.pad(x, ((0, 0), (1, 1), (1, 1))).reshape(B, 1, Np)
    )(x)

    def csum(out_ref, val):
        out_ref[0] = jnp.full((8, 128), val, jnp.float32)

    Tv, Fv = T - 2, F - 2  # valid-region output (edge handling elided)

    def kern_a(x_ref, w_ref, out_ref):
        xt = x_ref[0]
        taps = jnp.stack(
            [jax.lax.slice(xt, (dy, dx), (dy + Tv, dx + Fv))
             for dy in range(3) for dx in range(3)],
            axis=0,
        )  # (9, Tv, Fv)
        y = jax.lax.dot_general(
            taps, w_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Tv, Fv, CO)
        csum(out_ref, jnp.sum(y))

    M = T * (F + 2)  # flat im2col span (junk cols at f=F,F+1 discarded later)

    def kern_c(xf_ref, w_ref, out_ref):
        xf = xf_ref[0, 0]  # (Np,) flat padded sample
        offs = [dy * (F + 2) + dx for dy in range(3) for dx in range(3)]
        taps = jnp.stack(
            [jax.lax.dynamic_slice(xf, (o,), (M,)) for o in offs], axis=0
        )  # (9, M)
        y = jax.lax.dot_general(
            taps, w_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (M, CO)
        csum(out_ref, jnp.sum(y))

    def kern_d(x_ref, w_ref, out_ref):
        xt = x_ref[0]
        wf = w_ref[:].astype(jnp.float32)
        acc = jnp.zeros((Tv, Fv, CO), jnp.float32)
        for k in range(9):
            dy, dx = divmod(k, 3)
            s = jax.lax.slice(xt, (dy, dx), (dy + Tv, dx + Fv))
            acc = acc + s.astype(jnp.float32)[:, :, None] * wf[k][None, None, :]
        csum(out_ref, jnp.sum(acc))

    # --- conv2-shape variant: (T2, F, 32) -> (T2, F, 64) ---
    T2, CI2, CO2 = 160, 32, 64
    h1 = jax.jit(
        lambda k: jax.random.normal(k, (B, T2 + 2, F + 2, CI2), jnp.float32).astype(dt)
    )(jax.random.key(2))  # pre-padded
    # w2dx[dx] = rows (dy, ci) stacked -> (3, 96, CO2)
    w2dx = jax.jit(
        lambda k: (jax.random.normal(k, (3, 3 * CI2, CO2), jnp.float32) * 0.1).astype(dt)
    )(jax.random.key(3))

    def kern_f(h_ref, w_ref, out_ref):
        ht = h_ref[0]  # (T2+2, F+2, 32)
        # dy lane-interleave: A (T2, F+2, 96), lane k = (dy, ci)
        A = jnp.concatenate(
            [jax.lax.slice(ht, (dy, 0, 0), (dy + T2, F + 2, CI2)) for dy in range(3)],
            axis=2,
        )
        acc = jnp.zeros((T2, F, CO2), jnp.float32)
        for dx in range(3):
            a_dx = jax.lax.slice(A, (0, dx, 0), (T2, dx + F, 3 * CI2))
            acc = acc + jax.lax.dot_general(
                a_dx, w_ref[dx],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        csum(out_ref, jnp.sum(acc))

    def run(kern, in_arr, in_block, w_arr):
        return pl.pallas_call(
            kern,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(in_block, lambda b: (b,) + (0,) * (len(in_block) - 1)),
                pl.BlockSpec(w_arr.shape, lambda b: (0,) * w_arr.ndim),
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        )

    cases = [
        ("a odd-taps leading-dot", kern_a, x, (1, T, F), w9),
        ("c flat-shift im2col dot", kern_c, xpad_flat, (1, 1, Np), w9),
        ("d VPU FMA channel-last", kern_d, x, (1, T, F), w9),
        ("f conv2 interleave K=96x3", kern_f, h1, (1, T2 + 2, F + 2, CI2), w2dx),
    ]
    for name, kern, arr, blk, warr in cases:
        try:
            fn = run(kern, arr, blk, warr)
            t = bench_slope(fn, arr, warr)
            flops = (
                B * T2 * F * CI2 * CO2 * 18 if name.startswith("f")
                else B * Tv * Fv * CO * 18
            )
            print(f"  {name:28s}: {t*1e3:7.2f} ms  ({flops/t/1e12:6.1f} TF/s)")
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            key = "unsupported" if "unsupported" in msg else None
            if key:
                i = msg.index(key)
                msg = msg[max(0, i - 60):i + 120].replace("\n", " ")
            else:
                msg = msg[:140]
            print(f"  {name:28s}: FAILED {type(e).__name__}: {msg}")


def stage13_conv_aligned(B, dt):
    """Conv-in-Pallas, round 3: every tile 16x128-aligned (stage 12's real
    blockers: misaligned tpu.reshape collapses inside leading-axis dots;
    dynamic_slice unsupported). Probe geometry uses a 320-row valid window
    (edge columns elided — timing only).
      g. conv1: roll-built taps (f32 round trip), leading-axis dot K=9
      h. conv1: odd-offset lax.slice taps on aligned tile, leading dot
      i. conv1: patches (B,Tp,Fp,9) precomputed in HBM, trailing dot K=9
      j. conv2: dy leading slices + dx sublane-offset slices, 9 x K=32
         trailing dots (no rolls)
      k. conv2: dy leading slices + dx sublane roll (f32), 9 x K=32 dots
    XLA controls: conv1 1.6 ms, conv2 4.0 ms."""
    print(f"\n== stage 13: aligned conv formulations (B={B}) ==")
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, F, CO = 321, 180, 32
    Tp, Fp = 336, 256        # aligned padded tile (bf16: 16 x 128)
    Tv = 320                 # aligned valid output rows
    x = jax.jit(
        lambda k: jax.random.normal(k, (B, Tp, Fp), jnp.float32).astype(dt)
    )(jax.random.key(0))
    w9 = jax.jit(
        lambda k: (jax.random.normal(k, (9, CO), jnp.float32) * 0.1).astype(dt)
    )(jax.random.key(1))
    patches = jax.jit(
        lambda k: jax.random.normal(k, (B, Tv, Fp, 9), jnp.float32).astype(dt)
    )(jax.random.key(2))

    def csum(out_ref, val):
        out_ref[0] = jnp.full((8, 128), val, jnp.float32)

    def kern_g(x_ref, w_ref, out_ref):
        xt = x_ref[0].astype(jnp.float32)  # (Tp, Fp) f32 for roll
        taps = jnp.stack(
            [jax.lax.slice(
                xt if dx == 1 else pltpu.roll(xt, (1 - dx) % Fp, axis=1),
                (dy, 0), (dy + Tv, Fp))
             for dy in range(3) for dx in range(3)],
            axis=0,
        ).astype(dt)  # (9, Tv, Fp)
        y = jax.lax.dot_general(
            taps, w_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        csum(out_ref, jnp.sum(y))

    def kern_h(x_ref, w_ref, out_ref):
        xt = x_ref[0]  # (Tp, Fp) bf16
        taps = jnp.stack(
            [jax.lax.slice(xt, (dy, dx), (dy + Tv, dx + 128))
             for dy in range(3) for dx in range(3)],
            axis=0,
        )  # (9, Tv, 128) — odd lane offsets, aligned sizes
        y = jax.lax.dot_general(
            taps, w_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        csum(out_ref, jnp.sum(y))

    def kern_i(p_ref, w_ref, out_ref):
        p = p_ref[0]  # (Tv, Fp, 9)
        y = jax.lax.dot_general(
            p, w_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Tv, Fp, CO)
        csum(out_ref, jnp.sum(y))

    # --- conv2 shape: (160, 180, 32) -> (160, 180, 64) ---
    T2, CI2, CO2 = 160, 32, 64
    T2p, F2p = 176, 192      # aligned: sublane mult 16 covers 162/182
    h1 = jax.jit(
        lambda k: jax.random.normal(k, (B, T2p, F2p, CI2), jnp.float32).astype(dt)
    )(jax.random.key(3))
    w2 = jax.jit(
        lambda k: (jax.random.normal(k, (9, CI2, CO2), jnp.float32) * 0.1).astype(dt)
    )(jax.random.key(4))

    def kern_j(h_ref, w_ref, out_ref):
        ht = h_ref[0]  # (T2p, F2p, 32)
        acc = jnp.zeros((T2, 176, CO2), jnp.float32)
        for k in range(9):
            dy, dx = divmod(k, 3)
            s = jax.lax.slice(ht, (dy, dx, 0), (dy + T2, dx + 176, CI2))
            acc = acc + jax.lax.dot_general(
                s, w_ref[k], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        csum(out_ref, jnp.sum(acc))

    def kern_k(h_ref, w_ref, out_ref):
        ht = h_ref[0].astype(jnp.float32)
        acc = jnp.zeros((T2, F2p, CO2), jnp.float32)
        for k in range(9):
            dy, dx = divmod(k, 3)
            sh = ht if dx == 1 else pltpu.roll(ht, (1 - dx) % F2p, axis=1)
            s = jax.lax.slice(sh, (dy, 0, 0), (dy + T2, F2p, CI2)).astype(dt)
            acc = acc + jax.lax.dot_general(
                s, w_ref[k], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        csum(out_ref, jnp.sum(acc))

    def run(kern, in_arr, in_block, w_arr):
        return pl.pallas_call(
            kern,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(in_block, lambda b: (b,) + (0,) * (len(in_block) - 1)),
                pl.BlockSpec(w_arr.shape, lambda b: (0,) * w_arr.ndim),
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        )

    cases = [
        ("g conv1 roll-taps lead-dot", kern_g, x, (1, Tp, Fp), w9),
        ("h conv1 slice-taps lead-dot", kern_h, x, (1, Tp, Fp), w9),
        ("i conv1 HBM-patches K=9 dot", kern_i, patches, (1, Tv, Fp, 9), w9),
        ("j conv2 sublane-shift 9xK32", kern_j, h1, (1, T2p, F2p, CI2), w2),
        ("k conv2 roll-shift 9xK32", kern_k, h1, (1, T2p, F2p, CI2), w2),
    ]
    for name, kern, arr, blk, warr in cases:
        try:
            fn = run(kern, arr, blk, warr)
            t = bench_slope(fn, arr, warr)
            flops = (
                B * T2 * F * CI2 * CO2 * 18 if "conv2" in name
                else B * Tv * F * CO * 18
            )
            print(f"  {name:28s}: {t*1e3:7.2f} ms  ({flops/t/1e12:6.1f} TF/s)")
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            for key in ("unsupported", "Unimplemented", "Not implemented",
                        "NotImplemented", "INTERNAL"):
                if key in msg:
                    i = msg.index(key)
                    msg = msg[max(0, i - 80):i + 160].replace("\n", " ")
                    break
            else:
                msg = msg[:140]
            print(f"  {name:28s}: FAILED {type(e).__name__}: {msg}")


def stage14_conv_chunked(B, dt):
    """Conv-in-Pallas, round 4. Stage 13's 'crashes' were VMEM OOMs: whole-
    sample intermediates (taps/acc) blow the 16 MB budget, and a patches
    array with minor dim 9 pads 9 -> 128 lanes (21 MB/block). Fixes: inner
    fori_loop over T chunks with pl.ds ref reads, tap-leading patches.
      h2. conv1: in-kernel taps per (64, 128) chunk, leading dot K=9
      i2. conv1: XLA-precomputed tap-leading patches (B, 9, Tp, Fp),
          chunked leading dot K=9 (no in-kernel tap build)
      j2. conv2: chunked 9 x K=32 rank-3 trailing dots, slice-built taps
    XLA controls: conv1 1.6 ms, conv2 4.0 ms."""
    print(f"\n== stage 14: chunked conv formulations (B={B}) ==")
    from jax.experimental import pallas as pl

    CO = 32
    Tp, Fp, Tv = 336, 256, 320
    x = jax.jit(
        lambda k: jax.random.normal(k, (B, Tp, Fp), jnp.float32).astype(dt)
    )(jax.random.key(0))
    w9 = jax.jit(
        lambda k: (jax.random.normal(k, (9, CO), jnp.float32) * 0.1).astype(dt)
    )(jax.random.key(1))
    p9 = jax.jit(
        lambda k: jax.random.normal(k, (B, 9, Tp, Fp), jnp.float32).astype(dt)
    )(jax.random.key(2))

    def csum(out_ref, val):
        out_ref[0] = jnp.full((8, 128), val, jnp.float32)

    def kern_h2(x_ref, w_ref, out_ref):
        def chunk(t, acc):
            ti, fi = t // 2, t % 2
            xc = x_ref[0, pl.ds(ti * 64, 66), pl.ds(fi * 128, 130)]
            taps = jnp.stack(
                [jax.lax.slice(xc, (dy, dx), (dy + 64, dx + 128))
                 for dy in range(3) for dx in range(3)],
                axis=0,
            )  # (9, 64, 128)
            y = jax.lax.dot_general(
                taps, w_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc + jnp.sum(y)

        out = jax.lax.fori_loop(0, 10, chunk, jnp.float32(0.0))
        csum(out_ref, out)

    def kern_i2(p_ref, w_ref, out_ref):
        def chunk(t, acc):
            taps = p_ref[0, :, pl.ds(t * 64, 64), :]  # (9, 64, Fp)
            y = jax.lax.dot_general(
                taps, w_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc + jnp.sum(y)

        out = jax.lax.fori_loop(0, 5, chunk, jnp.float32(0.0))
        csum(out_ref, out)

    # --- conv2 shape ---
    T2, CI2, CO2 = 160, 32, 64
    T2p, F2p = 176, 192
    h1 = jax.jit(
        lambda k: jax.random.normal(k, (B, T2p, F2p, CI2), jnp.float32).astype(dt)
    )(jax.random.key(3))
    w2 = jax.jit(
        lambda k: (jax.random.normal(k, (9, CI2, CO2), jnp.float32) * 0.1).astype(dt)
    )(jax.random.key(4))

    def kern_j2(h_ref, w_ref, out_ref):
        def chunk(t, acc):
            hc = h_ref[0, pl.ds(t * 32, 34), :, :]  # (34, 192, 32)
            yc = jnp.zeros((32, 176, CO2), jnp.float32)
            for k in range(9):
                dy, dx = divmod(k, 3)
                s = jax.lax.slice(hc, (dy, dx, 0), (dy + 32, dx + 176, CI2))
                yc = yc + jax.lax.dot_general(
                    s, w_ref[k], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            return acc + jnp.sum(yc)

        out = jax.lax.fori_loop(0, 5, chunk, jnp.float32(0.0))
        csum(out_ref, out)

    def run(kern, in_arr, in_block, w_arr):
        return pl.pallas_call(
            kern,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(in_block, lambda b: (b,) + (0,) * (len(in_block) - 1)),
                pl.BlockSpec(w_arr.shape, lambda b: (0,) * w_arr.ndim),
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        )

    cases = [
        ("h2 conv1 chunked slice-taps", kern_h2, x, (1, Tp, Fp), w9),
        ("i2 conv1 HBM tap-patches", kern_i2, p9, (1, 9, Tp, Fp), w9),
        ("j2 conv2 chunked 9xK32", kern_j2, h1, (1, T2p, F2p, CI2), w2),
    ]
    for name, kern, arr, blk, warr in cases:
        try:
            fn = run(kern, arr, blk, warr)
            t = bench_slope(fn, arr, warr)
            flops = (
                B * T2 * 176 * CI2 * CO2 * 18 if "conv2" in name
                else B * Tv * Fp * CO * 18
            )
            print(f"  {name:28s}: {t*1e3:7.2f} ms  ({flops/t/1e12:6.1f} TF/s)")
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            idx = msg.find("Mosaic")
            if idx < 0:
                idx = msg.find("Ran out of memory")
            msg = msg[idx:idx + 300].replace("\n", " ") if idx >= 0 else msg[-300:]
            print(f"  {name:28s}: FAILED {type(e).__name__}: {msg}")


def stage15_conv2_chunks(B, dt):
    """Conv-in-Pallas, round 5 — the conv2/conv3 trailing-dot formulations
    (stage 14's j2 OOM'd at chunk=32; leading-dot conv1 measured hopeless
    at ~1.5 TF/s). If these hit >=100 TF/s, flash blocks 2+3 are viable
    and worth ~35 ms of the 99 ms step.
      j3. conv2 (160,180,32)->(,,64):  chunk=16, 9 x K=32 rank-3 dots
      j4. conv2 via dy-interleave:     chunk=16, 3 x K=96 dots
      j5. conv3 (80,180,64)->(,,128):  chunk=16, 9 x K=64 dots
      c2. conv1 flat-shift taps as RHS (w lhs (32,9)), trailing dot
    XLA controls: conv1 1.6 / conv2 4.0 / conv3 6.5 ms."""
    print(f"\n== stage 15: conv2/conv3 chunked trailing dots (B={B}) ==")
    from jax.experimental import pallas as pl

    def csum(out_ref, val):
        out_ref[0] = jnp.full((8, 128), val, jnp.float32)

    def make_convk(T2, F2p, CI, CO, chunk, n_chunk):
        def kern(h_ref, w_ref, out_ref):
            def body(t, acc):
                hc = h_ref[0, pl.ds(t * chunk, chunk + 2), :, :]
                yc = jnp.zeros((chunk, F2p - 16, CO), jnp.float32)
                for k in range(9):
                    dy, dx = divmod(k, 3)
                    s = jax.lax.slice(
                        hc, (dy, dx, 0), (dy + chunk, dx + F2p - 16, CI)
                    )
                    yc = yc + jax.lax.dot_general(
                        s, w_ref[k], (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                return acc + jnp.sum(yc)

            csum(out_ref, jax.lax.fori_loop(0, n_chunk, body, jnp.float32(0.0)))

        return kern

    def make_conv_inter(T2, F2p, CI, CO, chunk, n_chunk):
        # dy-interleave: A (chunk, F2p, 3*CI) lane-concat, 3 sublane-shifted
        # K=3*CI dots
        def kern(h_ref, w_ref, out_ref):
            def body(t, acc):
                hc = h_ref[0, pl.ds(t * chunk, chunk + 2), :, :]
                A = jnp.concatenate(
                    [jax.lax.slice(hc, (dy, 0, 0), (dy + chunk, F2p, CI))
                     for dy in range(3)],
                    axis=2,
                )  # (chunk, F2p, 3*CI)
                yc = jnp.zeros((chunk, F2p - 16, CO), jnp.float32)
                for dx in range(3):
                    s = jax.lax.slice(
                        A, (0, dx, 0), (chunk, dx + F2p - 16, 3 * CI)
                    )
                    yc = yc + jax.lax.dot_general(
                        s, w_ref[dx], (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                return acc + jnp.sum(yc)

            csum(out_ref, jax.lax.fori_loop(0, n_chunk, body, jnp.float32(0.0)))

        return kern

    def run(kern, in_arr, in_block, w_arr):
        return pl.pallas_call(
            kern,
            grid=(in_arr.shape[0],),
            in_specs=[
                pl.BlockSpec(in_block, lambda b: (b,) + (0,) * (len(in_block) - 1)),
                pl.BlockSpec(w_arr.shape, lambda b: (0,) * w_arr.ndim),
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((in_arr.shape[0], 8, 128), jnp.float32),
        )

    cases = []
    # conv2: (160+pad, 180+pad, 32) -> 64
    T2p, F2p, CI2, CO2 = 176, 192, 32, 64
    h1 = jax.jit(
        lambda k: jax.random.normal(k, (B, T2p, F2p, CI2), jnp.float32).astype(dt)
    )(jax.random.key(3))
    w2 = jax.jit(
        lambda k: (jax.random.normal(k, (9, CI2, CO2), jnp.float32) * 0.1).astype(dt)
    )(jax.random.key(4))
    w2i = jax.jit(
        lambda k: (jax.random.normal(k, (3, 3 * CI2, CO2), jnp.float32) * 0.1).astype(dt)
    )(jax.random.key(5))
    fl2 = B * 160 * 176 * CI2 * CO2 * 18
    cases.append(("j3 conv2 chunk16 9xK32", make_convk(T2p, F2p, CI2, CO2, 16, 10),
                  h1, (1, T2p, F2p, CI2), w2, fl2))
    cases.append(("j4 conv2 interleave 3xK96", make_conv_inter(T2p, F2p, CI2, CO2, 16, 10),
                  h1, (1, T2p, F2p, CI2), w2i, fl2))

    # conv3: (80+pad, 180+pad, 64) -> 128
    T3p, CI3, CO3 = 96, 64, 128
    h2arr = jax.jit(
        lambda k: jax.random.normal(k, (B, T3p, F2p, CI3), jnp.float32).astype(dt)
    )(jax.random.key(6))
    w3 = jax.jit(
        lambda k: (jax.random.normal(k, (9, CI3, CO3), jnp.float32) * 0.1).astype(dt)
    )(jax.random.key(7))
    fl3 = B * 80 * 176 * CI3 * CO3 * 18
    cases.append(("j5 conv3 chunk16 9xK64", make_convk(T3p, F2p, CI3, CO3, 16, 5),
                  h2arr, (1, T3p, F2p, CI3), w3, fl3))

    # conv1 flat-shift, w as lhs (CO, 9), taps as rhs (9, M)
    T, F, CO = 321, 180, 32
    Np = (T + 2) * (F + 2) + 128
    xf = jax.jit(
        lambda k: jax.random.normal(k, (B, 16, ((Np + 127) // 128) * 128),
                                    jnp.float32).astype(dt)
    )(jax.random.key(8))  # row 0 holds the flat padded sample (timing only)
    wt = jax.jit(
        lambda k: (jax.random.normal(k, (CO, 16), jnp.float32) * 0.1).astype(dt)
    )(jax.random.key(9))
    Mc = 8192
    n_mc = (T * (F + 2)) // Mc + 1

    def kern_c2(xf_ref, w_ref, out_ref):
        offs = [dy * (F + 2) + dx for dy in range(3) for dx in range(3)]

        def body(t, acc):
            base = t * Mc
            taps = jnp.concatenate(
                [xf_ref[0, :1, pl.ds(base + o, Mc)] for o in offs]
                + [jnp.zeros((7, Mc), dt)],
                axis=0,
            )  # (16, Mc)
            y = jax.lax.dot_general(
                w_ref[:], taps, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (CO, Mc)
            return acc + jnp.sum(y)

        csum(out_ref, jax.lax.fori_loop(0, n_mc, body, jnp.float32(0.0)))

    fl1 = B * T * (F + 2) * CO * 18
    cases.append(("c2 conv1 flat-shift w-lhs", kern_c2, xf,
                  (1, 16, xf.shape[2]), wt, fl1))

    for name, kern, arr, blk, warr, flops in cases:
        try:
            fn = run(kern, arr, blk, warr)
            t = bench_slope(fn, arr, warr)
            print(f"  {name:28s}: {t*1e3:7.2f} ms  ({flops/t/1e12:6.1f} TF/s)")
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            idx = msg.find("Mosaic")
            if idx < 0:
                idx = msg.find("Ran out of memory")
            msg = msg[idx:idx + 260].replace("\n", " ") if idx >= 0 else msg[-260:]
            print(f"  {name:28s}: FAILED {type(e).__name__}: {msg}")


def stage16_bwd_fusion(B, dt):
    """Can XLA fuse the epilogue-backward's passes into the neighboring
    convs? Two hypotheses on the conv2->conv3 boundary shapes:
      (a) consumer fusion: the s1/s2 reduction of dz2 = f(dh2, y2) fuses
          into dgrad3's output pass (which writes dh2) — saving the
          separate read of (dh2, y2).
      (b) producer fusion: wgrad2/dgrad2 consume dy2 as a fused input
          expression recomputed from (dh2, y2, s1, s2) — saving the dy2
          materialization (write + 2 reads vs 2 recompute-reads).
    All arrays passed as ARGUMENTS (closed-over device arrays embed as
    compile-request constants and 413 the relay)."""
    print(f"\n== stage 16: backward cross-pass fusion (B={B}) ==")
    T2, F, CI2, CO2 = 160, 180, 32, 64       # block-2 geometry
    T3 = 80
    y2 = jax.jit(
        lambda k: jax.random.normal(k, (B, T2, F, CO2), jnp.float32).astype(dt)
    )(jax.random.key(0))
    dy3 = jax.jit(
        lambda k: jax.random.normal(k, (B, T3, F, 2 * CO2), jnp.float32).astype(dt)
    )(jax.random.key(1))
    w3 = jax.jit(
        lambda k: (jax.random.normal(k, (3, 3, CO2, 2 * CO2), jnp.float32) * 0.1).astype(dt)
    )(jax.random.key(2))
    h1 = jax.jit(
        lambda k: jax.random.normal(k, (B, T2, F, CI2), jnp.float32).astype(dt)
    )(jax.random.key(3))
    w2 = jax.jit(
        lambda k: (jax.random.normal(k, (3, 3, CI2, CO2), jnp.float32) * 0.1).astype(dt)
    )(jax.random.key(4))
    bits2 = jax.jit(
        lambda k: jax.random.bits(k, (B, T3, F, CO2), jnp.uint8)
    )(jax.random.key(5))
    dh2c = jax.jit(
        lambda k: jax.random.normal(k, (B, T3, F, CO2), jnp.float32).astype(dt)
    )(jax.random.key(6))

    def dgrad(dy, w):
        return jax.lax.conv_general_dilated(
            dy, jnp.flip(w, (0, 1)).swapaxes(2, 3), (1, 1), "SAME",
            dimension_numbers=DN,
        )

    def dz2_of(dh2, y2, bits2):
        """relu'(z2) * pool-upsample(byte-mask(dh2)): the epilogue-bwd
        elementwise chain (affine params elided — same traffic)."""
        keep = bits2 >= 51
        dp = jnp.where(keep, dh2 * jnp.float32(1.25).astype(dt), 0)
        da = jnp.repeat(dp, 2, axis=1) * jnp.float32(0.5).astype(dt)
        return jnp.where(y2 > 0, da, 0)

    # (a) consumer fusion probe
    t_dg = bench_slope(dgrad, dy3, w3)

    def dg_plus_sums(dy3, w3, y2, bits2):
        dh2 = dgrad(dy3, w3)
        dz = dz2_of(dh2, y2, bits2).astype(jnp.float32)
        s1 = jnp.sum(dz, axis=(0, 1, 2))
        s2 = jnp.sum(dz * y2.astype(jnp.float32), axis=(0, 1, 2))
        return dh2, s1, s2

    t_dgs = bench_slope(dg_plus_sums, dy3, w3, y2, bits2)
    print(f"  dgrad3 alone                : {t_dg*1e3:7.2f} ms")
    print(f"  dgrad3 + fused dz2 sums     : {t_dgs*1e3:7.2f} ms  (delta {(t_dgs-t_dg)*1e3:+.2f})")

    # (b) producer fusion probe: wgrad2+dgrad2 from dy2
    def dy2_expr(dh2, y2, bits2):
        dz = dz2_of(dh2, y2, bits2)
        return (dz.astype(jnp.float32) - 1e-4
                - y2.astype(jnp.float32) * 1e-5).astype(dt)

    def wgrad2(h1, dy2, w2):
        _, vjp = jax.vjp(
            lambda w: jax.lax.conv_general_dilated(
                h1, w, (1, 1), "SAME", dimension_numbers=DN
            ),
            w2,
        )
        return vjp(dy2)[0]

    def both_materialized(dh2, y2, bits2, h1, w2):
        dy2 = dy2_expr(dh2, y2, bits2)
        dy2 = jax.lax.optimization_barrier(dy2)  # force materialization
        return wgrad2(h1, dy2, w2), dgrad(dy2, w2)

    def both_fused(dh2, y2, bits2, h1, w2):
        # two barrier-separated copies of the expression, one per consumer,
        # so XLA may fuse each into its conv input instead of sharing
        dh2a = jax.lax.optimization_barrier(dh2)
        dh2b = jax.lax.optimization_barrier(dh2)
        return (wgrad2(h1, dy2_expr(dh2a, y2, bits2), w2),
                dgrad(dy2_expr(dh2b, y2, bits2), w2))

    def both_shared(dh2, y2, bits2, h1, w2):
        dy2 = dy2_expr(dh2, y2, bits2)
        return wgrad2(h1, dy2, w2), dgrad(dy2, w2)

    t_mat = bench_slope(both_materialized, dh2c, y2, bits2, h1, w2)
    t_fus = bench_slope(both_fused, dh2c, y2, bits2, h1, w2)
    t_shr = bench_slope(both_shared, dh2c, y2, bits2, h1, w2)
    print(f"  wg2+dg2, dy2 materialized   : {t_mat*1e3:7.2f} ms")
    print(f"  wg2+dg2, dy2 per-consumer   : {t_fus*1e3:7.2f} ms  (delta {(t_fus-t_mat)*1e3:+.2f})")
    print(f"  wg2+dg2, dy2 shared (XLA)   : {t_shr*1e3:7.2f} ms  (delta {(t_shr-t_mat)*1e3:+.2f})")


def stage17_hand_step(B, dt):
    """The hand-scheduled backward (ops/train_chain.py) vs flax+jax.grad on
    the production geometry. Compares loss+grads computation only (no
    optimizer; identical between the two)."""
    print(f"\n== stage 17: hand step vs AD step (B={B}) ==")
    from dfac_tpu.models import build_model
    from dfac_tpu.ops.train_chain import cnn2d_hand_loss_and_grad
    from dfac_tpu.utils.rng import train_key

    T, F = 321, 180
    model = build_model("cnn2d", in_features=F,
                        compute_dtype=dt if dt == jnp.bfloat16 else None)
    x0 = jax.jit(lambda k: jax.random.normal(k, (1, T, F), jnp.float32))(
        jax.random.key(0)
    )
    variables = model.init(jax.random.key(0), x0, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    x = jax.jit(lambda k: jax.random.normal(k, (B, T, F), jnp.float32))(
        jax.random.key(1)
    )
    labels = jax.jit(
        lambda k: (jax.random.uniform(k, (B,)) > 0.5).astype(jnp.float32)
    )(jax.random.key(2))
    weights = jnp.ones((B,), jnp.float32)
    key = train_key(0)

    def ad_step(params, batch_stats, x, labels, weights, key):
        def loss_fn(p):
            out, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"], rngs={"dropout": key},
            )
            logits = out.reshape(-1)
            per = optax.sigmoid_binary_cross_entropy(logits, labels)
            return jnp.sum(per * weights) / jnp.maximum(jnp.sum(weights), 1.0), mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, grads, mutated["batch_stats"]

    def hand_step(params, batch_stats, x, labels, weights, key):
        keys = jax.random.split(key, 2)
        (loss, new_stats), grads = cnn2d_hand_loss_and_grad(
            params, batch_stats, x, keys, labels, weights,
            dropout_rate=0.2, compute_dtype=dt if dt == jnp.bfloat16 else None,
        )
        return loss, grads, new_stats

    for name, fn in (("flax + jax.grad", ad_step), ("hand backward", hand_step)):
        t = bench_slope(fn, params, batch_stats, x, labels, weights, key,
                        perturb=2)
        print(f"  {name:28s}: {t*1e3:7.2f} ms  ({B/t:9,.0f} utt/s)")


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
    if "12" in stages:
        stage12_conv_formulations(args.batch, dt)
    if "13" in stages:
        stage13_conv_aligned(args.batch, dt)
    if "14" in stages:
        stage14_conv_chunked(args.batch, dt)
    if "15" in stages:
        stage15_conv2_chunks(args.batch, dt)
    if "16" in stages:
        stage16_bwd_fusion(args.batch, dt)
    if "17" in stages:
        stage17_hand_step(args.batch, dt)


if __name__ == "__main__":
    main()
