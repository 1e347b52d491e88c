"""Hand-scheduled CNN2D training step core (forward + manual backward).

Feature-parity target: the reference training loss/step on its CNN2D
(``src/model.py:5-42`` + ``src/train.py:31-91``) — identical math to the
flax path (:mod:`dfac_tpu.models.cnn2d` under ``train=True`` +
``jax.value_and_grad``), but with the backward written BY HAND so its pass
structure can be scheduled for the TPU memory system instead of whatever
``jax.grad`` emits.

Why: the round-3 step attribution (``results/v5e_measurements.md``) shows
every AD-generated pass sits within ~15% of its HBM byte floor, so the only
remaining training-throughput lever is removing whole passes — e.g. fusing
the BN-backward reductions into the preceding dgrad's output pass, or
recomputing the conv cotangent inside each conv-grad's input fusion instead
of materializing it (``scripts/train_opt_probe.py --stages 16``). Those
restructures need explicit control of the backward program, which is what
this module provides.

Numerics contract: bit-comparable to the flax path for dropout rate 0 (same
op order), and for dropout > 0 the hand backward must match ``jax.grad`` of
:func:`cnn2d_train_forward` exactly (tested in
``tests/test_train_chain.py``). Batch-stat running updates follow
:class:`~dfac_tpu.models.common.TorchBatchNorm` (biased batch var for
normalization, unbiased in the running update).
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from dfac_tpu.models.common import apply_byte_dropout, avg_pool, byte_dropout_thresh
from dfac_tpu.train.optim import smooth_labels

DN = ("NHWC", "HWIO", "NHWC")


def _conv(x, w, precision=None):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=DN, precision=precision
    )


class _BlockRes(NamedTuple):
    """Per-block residuals for the hand backward (small stats + the conv
    output; activations after it are recomputed, not stored)."""

    h_in: jax.Array      # block input (conv operand) — needed for wgrad
    y: jax.Array         # conv output + bias (compute dtype)
    mean: jax.Array      # (C,) f32 batch mean
    r: jax.Array         # (C,) f32 rsqrt(var + eps)
    key: jax.Array | None  # dropout PRNG key (blocks 1-2), else None
    # The u8 dropout bytes are NOT stored: jax.random.bits(key, shape) is
    # deterministic per (key, shape), so the backward regenerates them.
    # Storing them would force the forward to materialize the bits tensor
    # (a write) and the backward to read it back — ~0.7 GB of HBM traffic
    # per step at B=512 that the VPU regenerates essentially for free.


def _block_forward(h, kernel, bias, scale, bn_bias, key, *, dt, thresh, eps):
    """conv -> TorchBatchNorm(train) -> ReLU -> [pool -> byte-dropout].

    Mirrors the flax ops exactly: conv+bias in compute dtype, stats and
    normalize in f32, cast back to compute dtype, pool via the depthwise
    conv, dropout from one u8 byte per element.
    """
    precision = jax.lax.Precision.HIGHEST if dt is None else None
    kdt = kernel.astype(dt) if dt is not None else kernel
    bdt = bias.astype(dt) if dt is not None else bias
    y = _conv(h, kdt, precision) + bdt

    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=(0, 1, 2))
    mean_sq = jnp.mean(jnp.square(yf), axis=(0, 1, 2))
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    r = jax.lax.rsqrt(var + eps)
    z = ((yf - mean) * r * scale + bn_bias).astype(y.dtype)
    a = jnp.maximum(z, 0)

    if key is not None:
        p = avg_pool(a, (2, 1))
        if thresh >= 256:
            out = jnp.zeros_like(p)
        else:
            bits = jax.random.bits(key, p.shape, jnp.uint8)
            out = apply_byte_dropout(p, bits, thresh)
    else:
        out = a
    return out, _BlockRes(h, y, mean, r, key), var


def cnn2d_train_forward(
    params: dict,
    x: jax.Array,
    drop_keys,
    labels: jax.Array,
    weights: jax.Array,
    *,
    dropout_rate: float = 0.2,
    label_smoothing: float = 0.0,
    compute_dtype: Any = None,
    eps: float = 1e-5,
):
    """Training-mode forward; returns (loss, aux) where aux carries the
    residuals, per-block batch stats, and logits.

    ``drop_keys`` are two PRNG keys (block-1 and block-2 dropout);
    ``weights`` is the tail-batch mask (true-size batches,
    ``train/loop.py``). The flax model draws its two dropout masks from
    ``make_rng`` fold-ins instead of an explicit split, so masks differ
    from the flax path draw-for-draw (no RNG-bit contract; per-seed
    determinism only).
    """
    dt = compute_dtype
    thresh = byte_dropout_thresh(dropout_rate)
    h = x[..., None].astype(dt or x.dtype)

    residuals, stats = [], []
    for i in (1, 2, 3):
        p = params[f"conv{i}"]["conv"]
        bn = params[f"bn{i}"]
        key = drop_keys[i - 1] if (i < 3 and thresh > 0) else None
        h, res, var = _block_forward(
            h, p["kernel"], p["bias"], bn["scale"], bn["bias"], key,
            dt=dt, thresh=thresh, eps=eps,
        )
        if i < 3 and thresh <= 0:
            h = avg_pool(h, (2, 1))
        residuals.append(res)
        stats.append((res.mean, var))

    hm = jnp.mean(h, axis=1)                       # (B, F, C) compute dtype
    emb = jnp.swapaxes(hm, 1, 2).reshape(hm.shape[0], -1)
    d = params["classifier"]["dense"]
    kdt = d["kernel"].astype(dt) if dt is not None else d["kernel"]
    bdt = d["bias"].astype(dt) if dt is not None else d["bias"]
    precision = jax.lax.Precision.HIGHEST if dt is None else None
    logits = (
        jax.lax.dot_general(emb, kdt, (((1,), (0,)), ((), ())),
                            precision=precision) + bdt
    ).astype(jnp.float32).reshape(-1)

    per = optax.sigmoid_binary_cross_entropy(
        logits, smooth_labels(labels, label_smoothing)
    )
    denom = jnp.maximum(jnp.sum(weights), 1.0)
    loss = jnp.sum(per * weights) / denom
    return loss, {
        "residuals": residuals,
        "stats": stats,
        "logits": logits,
        "emb": emb,
        "h3_shape": h.shape,
    }


def cnn2d_train_backward(params, aux, x, labels, weights, *,
                         dropout_rate=0.2, label_smoothing=0.0,
                         compute_dtype=None):
    # (x is unused — every block input is stored in aux's residuals — but
    # kept in the signature so forward/backward call sites stay symmetric)
    """Hand-written gradient of :func:`cnn2d_train_forward` w.r.t. params.

    Derivation per block (TorchBatchNorm backward, biased variance):
        xhat = (y - m) * r,  r = rsqrt(var + eps)
        z    = cast(xhat * g + be);  a = relu(z)
        s1   = sum(dz_f32);  s2 = sum(dz_f32 * xhat)   [per channel]
        dg   = s2;  dbe = s1
        dy   = cast(r * g * (dz_f32 - s1/n - xhat * s2/n))
    The var = max(var, 0) clamp subgradient is 1 whenever var > 0 (the
    clamp can only bind for an all-constant channel, where xhat == 0 and
    the formula degrades identically to jax.grad's).
    """
    dt = compute_dtype
    thresh = byte_dropout_thresh(dropout_rate)
    residuals = aux["residuals"]
    logits, emb = aux["logits"], aux["emb"]
    precision = jax.lax.Precision.HIGHEST if dt is None else None

    # loss -> logits
    denom = jnp.maximum(jnp.sum(weights), 1.0)
    targets = smooth_labels(labels, label_smoothing)
    dlogits = (jax.nn.sigmoid(logits) - targets) * weights / denom  # (B,) f32

    # head: logits = emb @ Wc + bc  (computed in dt, cast f32)
    d = params["classifier"]["dense"]
    cdt = dt or emb.dtype
    dl = dlogits.astype(cdt)[:, None]                      # (B, 1)
    dWc = jax.lax.dot_general(emb, dl, (((0,), (0,)), ((), ())),
                              precision=precision).astype(jnp.float32)
    # sum in the compute dtype exactly as AD does (the astype transpose of
    # logits' f32 cast lands BEFORE the bias-broadcast adjoint)
    dbc = jnp.sum(dl).astype(jnp.float32).reshape(1)
    demb = jax.lax.dot_general(
        dl, d["kernel"].astype(cdt), (((1,), (1,)), ((), ())),
        precision=precision,
    )                                                       # (B, F*C)
    Bsz, T3, F, C3 = aux["h3_shape"]
    dhm = jnp.swapaxes(demb.reshape(Bsz, C3, F), 1, 2)      # (B, F, C)
    dh = jnp.broadcast_to(dhm[:, None], (Bsz, T3, F, C3)) / jnp.asarray(
        T3, dhm.dtype
    )

    grads = {"classifier": {"dense": {"kernel": dWc, "bias": dbc}}}

    for i in (3, 2, 1):
        res = residuals[i - 1]
        bn = params[f"bn{i}"]
        if i < 3:
            # dropout backward (bits regenerated from the stored key —
            # deterministic per (key, shape)) then pool backward; dropout
            # is a self-adjoint diagonal map, so the backward IS
            # apply_byte_dropout with the same bits
            if res.key is not None and thresh >= 256:
                dp = jnp.zeros_like(dh)
            elif res.key is not None:
                bits = jax.random.bits(res.key, dh.shape, jnp.uint8)
                dp = apply_byte_dropout(dh, bits, thresh)
            else:
                dp = dh
            _, pool_vjp = jax.vjp(lambda a: avg_pool(a, (2, 1)),
                                  jnp.zeros(res.y.shape, res.y.dtype))
            dz_post = pool_vjp(dp)[0]
        else:
            dz_post = dh

        # relu mask on the CAST z exactly as forward
        yf = res.y.astype(jnp.float32)
        xhat = (yf - res.mean) * res.r
        z = (xhat * bn["scale"] + bn["bias"]).astype(res.y.dtype)
        dz = jnp.where(z > 0, dz_post, jnp.zeros((), dz_post.dtype))
        dzf = dz.astype(jnp.float32)

        n = math.prod(res.y.shape[:-1])
        s1 = jnp.sum(dzf, axis=(0, 1, 2))
        s2 = jnp.sum(dzf * xhat, axis=(0, 1, 2))
        grads[f"bn{i}"] = {"scale": s2, "bias": s1}

        rg = res.r * bn["scale"]
        dyf = rg * (dzf - s1 / n - xhat * (s2 / n))
        dy = dyf.astype(res.y.dtype)

        # conv: y = conv(h_in, cast(kernel)) + cast(bias)
        p = params[f"conv{i}"]["conv"]
        kdt = p["kernel"].astype(dt) if dt is not None else p["kernel"]
        db = jnp.sum(dyf, axis=(0, 1, 2))
        _, conv_vjp = jax.vjp(
            lambda hh, ww: _conv(hh, ww, precision), res.h_in, kdt
        )
        dh_in, dw = conv_vjp(dy)
        grads[f"conv{i}"] = {"conv": {"kernel": dw.astype(jnp.float32),
                                      "bias": db}}
        dh = dh_in

    return grads


def running_stats_update(batch_stats, aux, *, momentum=0.1):
    """TorchBatchNorm running-stat update from the forward's batch stats
    (biased batch var normalizes; unbiased updates the running var)."""
    new = {}
    for i in (1, 2, 3):
        mean, var = aux["stats"][i - 1]
        res = aux["residuals"][i - 1]
        n = math.prod(res.y.shape[:-1])
        unbiased = var * (n / max(n - 1, 1))
        old = batch_stats[f"bn{i}"]
        new[f"bn{i}"] = {
            "mean": (1 - momentum) * old["mean"] + momentum * mean,
            "var": (1 - momentum) * old["var"] + momentum * unbiased,
        }
    return new


def cnn2d_hand_loss_and_grad(
    params, batch_stats, x, drop_keys, labels, weights, *,
    dropout_rate=0.2, label_smoothing=0.0, compute_dtype=None,
):
    """(loss, new_batch_stats), grads — the drop-in replacement for
    ``jax.value_and_grad`` over the flax CNN2D loss (``train/loop.py``
    ``make_train_step``)."""
    loss, aux = cnn2d_train_forward(
        params, x, drop_keys, labels, weights,
        dropout_rate=dropout_rate, label_smoothing=label_smoothing,
        compute_dtype=compute_dtype,
    )
    grads = cnn2d_train_backward(
        params, aux, x, labels, weights,
        dropout_rate=dropout_rate, label_smoothing=label_smoothing,
        compute_dtype=compute_dtype,
    )
    new_stats = running_stats_update(batch_stats, aux)
    return (loss, new_stats), grads
