"""Fused BN->ReLU->pool->dropout epilogue vs the unfused module chain.

The fused op (``ops/fused_block.py``) must reproduce the unfused training
path — TorchBatchNorm (train mode) + ReLU + depthwise-conv avg_pool +
FastDropout — in both values and gradients, including the odd-row floor
pooling (321 -> 160) and the cross-device stat sync under shard_map.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfac_tpu.models.common import avg_pool
from dfac_tpu.ops.fused_block import make_block_epilogue


def _unfused(y0, scale, bias, bits, *, pool, drop_thresh, eps=1e-5):
    """The straight-line chain exactly as the models compose it
    (models/common.py TorchBatchNorm train branch + avg_pool + FastDropout)."""
    xf = y0.astype(jnp.float32)
    axes = tuple(range(y0.ndim - 1))
    m = jnp.mean(xf, axis=axes)
    msq = jnp.mean(jnp.square(xf), axis=axes)
    v = jnp.maximum(msq - jnp.square(m), 0.0)
    y = (y0 - m) * jax.lax.rsqrt(v + eps)
    y = y * scale + bias
    y = jnp.maximum(y.astype(y0.dtype), 0)
    if pool:
        y = avg_pool(y, (2, 1))
    if drop_thresh > 0:
        keep = 1.0 - drop_thresh / 256.0
        y = jnp.where(bits >= drop_thresh, y / jnp.asarray(keep, y.dtype),
                      jnp.zeros((), y.dtype))
    return y, m, v


def _setup(rng, b=3, h=9, w=8, c=5, dtype=jnp.float32):
    y0 = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32).astype(dtype)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, size=(c,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    bits = jnp.asarray(rng.integers(0, 256, size=(b, h // 2, w, c)), jnp.uint8)
    return y0, scale, bias, bits


@pytest.mark.parametrize("pool,thresh", [(True, 51), (True, 0), (False, 0)])
def test_forward_matches_unfused_f32(rng, pool, thresh):
    y0, scale, bias, bits = _setup(rng)
    if not pool:
        bits = bits.repeat(2, axis=1)[:, : y0.shape[1]]
    bits_in = bits if thresh > 0 else None
    fused = make_block_epilogue(pool=pool, drop_thresh=thresh)
    out, m, v = fused(y0, scale, bias, bits_in)
    ref, mr, vr = _unfused(y0, scale, bias, bits, pool=pool, drop_thresh=thresh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(m), np.asarray(mr))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(vr))


def test_forward_matches_unfused_bf16(rng):
    y0, scale, bias, bits = _setup(rng, h=8, dtype=jnp.bfloat16)
    fused = make_block_epilogue(pool=True, drop_thresh=51)
    out, m, v = fused(y0, scale, bias, bits)
    ref, mr, vr = _unfused(y0, scale, bias, bits, pool=True, drop_thresh=51)
    # On TPU the depthwise-conv pool accumulates bf16 products in f32 on the
    # MXU, making the fused (a+b)*0.5 bit-equal; the CPU backend this test
    # runs on accumulates the conv in bf16, so allow one bf16 ulp.
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=1 / 128, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(m), np.asarray(mr))


@pytest.mark.parametrize("pool,thresh,h", [(True, 51, 9), (True, 51, 8), (False, 0, 9)])
def test_gradients_match_unfused(rng, pool, thresh, h):
    """d(loss)/d(y0, scale, bias) of the fused op == AD through the chain."""
    y0, scale, bias, bits = _setup(rng, h=h)
    if not pool:
        bits = None
    fused = make_block_epilogue(pool=pool, drop_thresh=thresh)

    def loss_fused(y0, scale, bias):
        out, _, _ = fused(y0, scale, bias, bits)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    def loss_ref(y0, scale, bias):
        out, _, _ = _unfused(y0, scale, bias, bits, pool=pool, drop_thresh=thresh)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(y0, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(y0, scale, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)


def test_stats_cotangents_flow(rng):
    """Gradients THROUGH the returned (mean, var) match AD (the custom bwd
    includes their analytic contributions, not just zeros)."""
    y0, scale, bias, _ = _setup(rng, h=8)
    fused = make_block_epilogue(pool=False, drop_thresh=0)

    def loss_fused(y0):
        _, m, v = fused(y0, scale, bias, None)
        return jnp.sum(jnp.square(m)) + jnp.sum(v)

    def loss_ref(y0):
        _, m, v = _unfused(y0, scale, bias, None, pool=False, drop_thresh=0)
        return jnp.sum(jnp.square(m)) + jnp.sum(v)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_fused)(y0)), np.asarray(jax.grad(loss_ref)(y0)),
        rtol=1e-5, atol=1e-7,
    )


def test_shard_map_axis_matches_global(rng):
    """Fused epilogue under 8-device shard_map DP == single-device on the
    global batch, values and gradients (the pmean'd stats and psum'd
    backward sums implement the exact cross-device BatchNorm)."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    devs = jax.devices("cpu")[:8]
    mesh = Mesh(np.array(devs), ("data",))
    y0, scale, bias, bits = _setup(rng, b=16, h=9)

    fused_g = make_block_epilogue(pool=True, drop_thresh=51)
    fused_l = make_block_epilogue(pool=True, drop_thresh=51, axis_name="data")

    def loss_global(y0, scale, bias):
        out, _, _ = fused_g(y0, scale, bias, bits)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("data"), P(), P(), P("data")),
        out_specs=P(),
    )
    def loss_shard(y0, scale, bias, bits):
        out, _, _ = fused_l(y0, scale, bias, bits)
        return jax.lax.psum(jnp.sum(jnp.sin(out.astype(jnp.float32))), "data")

    def loss_sharded(y0, scale, bias):
        return loss_shard(y0, scale, bias, bits)

    np.testing.assert_allclose(
        float(loss_global(y0, scale, bias)), float(loss_sharded(y0, scale, bias)),
        rtol=1e-6,
    )
    gg = jax.grad(loss_global, argnums=(0, 1, 2))(y0, scale, bias)
    gs = jax.grad(loss_sharded, argnums=(0, 1, 2))(y0, scale, bias)
    for a, b in zip(gg, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)
