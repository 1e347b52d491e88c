#!/usr/bin/env python
"""Print FULL compile errors for the stage-13 kernel variants (the relay's
HTTP 500 wrapper hides the Mosaic message unless you print everything)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 8
dt = jnp.bfloat16
T, F, CO = 321, 180, 32
Tp, Fp, Tv = 336, 256, 320

x = jax.jit(lambda k: jax.random.normal(k, (B, Tp, Fp), jnp.float32).astype(dt))(
    jax.random.key(0)
)
w9 = jax.jit(
    lambda k: (jax.random.normal(k, (9, CO), jnp.float32) * 0.1).astype(dt)
)(jax.random.key(1))
patches = jax.jit(
    lambda k: jax.random.normal(k, (B, Tv, Fp, 9), jnp.float32).astype(dt)
)(jax.random.key(2))

T2, CI2, CO2 = 160, 32, 64
T2p, F2p = 176, 192
h1 = jax.jit(
    lambda k: jax.random.normal(k, (B, T2p, F2p, CI2), jnp.float32).astype(dt)
)(jax.random.key(3))
w2 = jax.jit(
    lambda k: (jax.random.normal(k, (9, CI2, CO2), jnp.float32) * 0.1).astype(dt)
)(jax.random.key(4))


def csum(out_ref, val):
    out_ref[0] = jnp.full((8, 128), val, jnp.float32)


def kern_g(x_ref, w_ref, out_ref):
    xt = x_ref[0].astype(jnp.float32)
    taps = jnp.stack(
        [jax.lax.slice(
            xt if dx == 1 else pltpu.roll(xt, (1 - dx) % Fp, axis=1),
            (dy, 0), (dy + Tv, Fp))
         for dy in range(3) for dx in range(3)],
        axis=0,
    ).astype(dt)
    y = jax.lax.dot_general(
        taps, w_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    csum(out_ref, jnp.sum(y))


def kern_i(p_ref, w_ref, out_ref):
    p = p_ref[0]
    y = jax.lax.dot_general(
        p, w_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    csum(out_ref, jnp.sum(y))


def kern_j(h_ref, w_ref, out_ref):
    ht = h_ref[0]
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


CASES = {
    "g": (kern_g, x, (1, Tp, Fp), w9),
    "i": (kern_i, patches, (1, Tv, Fp, 9), w9),
    "j": (kern_j, h1, (1, T2p, F2p, CI2), w2),
    "k": (kern_k, h1, (1, T2p, F2p, CI2), w2),
}

for name in (sys.argv[1:] or CASES):
    kern, arr, blk, warr = CASES[name]
    try:
        out = np.asarray(run(kern, arr, blk, warr)(arr, warr))
        print(f"== {name}: OK {out[0, 0, 0]:.3f}")
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        idx = msg.find("Mosaic")
        print(f"== {name}: FAILED\n{msg[idx:idx + 600] if idx >= 0 else msg[-800:]}\n")
