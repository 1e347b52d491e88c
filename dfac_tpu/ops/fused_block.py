"""Fused training-time block epilogue: BatchNorm -> ReLU -> avg-pool -> dropout.

**Measured negative result — NOT the production path.** On the v5e
(``scripts/train_opt_probe.py`` stage 9, B=512, C=32 block-1 geometry):

    AD through the unfused chain (control): fwd  6.0 ms   fwd+bwd 16.2 ms
    this custom_vjp as written:             fwd 12.2 ms   fwd+bwd 32.4 ms
    conv-pool fwd / even-odd-slice bwd:     fwd  6.6 ms   fwd+bwd 26.2 ms

XLA's reverse-mode AD of the straight-line formulation is already within
~15% of the HBM-bandwidth floor for this epilogue (~8.7 ms minimum
backward traffic at 819 GB/s): the stat passes fuse into the forward for
free and the pool backward stays inside XLA's convolution layout domain.
The hand-written VJPs lose to layout, not arithmetic — the strided-slice
pool (lane-dim gathers, the same 9x penalty measured for serving pooling
in round 2) and the ``jnp.repeat``/``stack`` upsample in the backward each
force relayout copies that cost more than the f32 residual re-reads they
save. Conclusion recorded in ``results/v5e_measurements.md`` (round 3):
beating XLA here requires fusing ACROSS the conv boundaries (never
materializing the pre-pool conv output), not re-deriving the epilogue VJP.

The op is kept because it is correct, tested (``tests/test_fused_block.py``
— grad parity vs AD, shard_map psum semantics), and documents the exact
residual-minimal two-pass BN backward:

    dxhat = g * relu_mask * dpool_upsampled
    dy0   = r * (dxhat - mean(dxhat) - xhat * mean(dxhat * xhat))

Semantics are those of the unfused chain (``models/common.py``):

* :class:`~dfac_tpu.models.common.TorchBatchNorm` in train mode — biased
  batch variance for normalization (reference ``src/model.py:31-40`` uses
  ``nn.BatchNorm2d``); the (mean, biased var) pair is returned so the
  caller can apply torch's unbiased running-stat update.
* ReLU on the ``compute_dtype`` (bf16-rounded) normalized value.
* Floor-mode (2, 1) average pooling over the row axis (torch
  ``AvgPool2d(2, 1)`` shape rule: 321 -> 160, last row dropped). The
  (a + b) * 0.5 sum in f32 is bit-identical to the depthwise-conv pooling
  of the unfused path (multiplying by 0.5 commutes exactly with the one
  f32 rounding of a bf16 a + b).
* :class:`~dfac_tpu.models.common.FastDropout` byte-threshold dropout on
  the pooled output, from caller-supplied u8 bytes (so the fused and
  unfused paths can share a mask stream in tests).

``axis_name`` extends every reduction (forward stats AND the backward
S1/S2 sums) with a ``lax.pmean`` so the op is exact under shard_map data
parallelism — the same cross-device BatchNorm gradient AD derives through
the unfused path's ``pmean``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def make_block_epilogue(
    *,
    pool: bool,
    drop_thresh: int,
    eps: float = 1e-5,
    axis_name: str | None = None,
):
    """Build the fused epilogue ``fn(y0, scale, bias, bits) -> (out, mean, var)``.

    Args:
      pool: apply (2, 1) floor average pooling over axis 1 (rows). The
        returned function accepts rank >= 3 arrays ``(B, H, ..., C)``;
        pooling always acts on axis 1.
      drop_thresh: u8 dropout threshold (``round(rate * 256)``); 0 disables
        dropout and ``bits`` must be None.
      eps: BatchNorm epsilon.
      axis_name: shard_map axis to sync batch statistics (and their
        gradients) across, or None for single-device/GSPMD use.

    Returns:
      A function of ``(y0, scale, bias, bits)`` returning
      ``(out, mean, biased_var)``. ``bits`` must be u8 of the *output*
      shape when ``drop_thresh > 0``, else None. mean/var are f32 ``(C,)``
      — biased variance, for the caller's running-stat update. Gradients
      flow to ``y0``, ``scale`` and ``bias``; cotangents on mean/var are
      honored (they are zero in normal training where running stats are
      not differentiated).
    """
    if drop_thresh < 0 or drop_thresh > 255:
        raise ValueError(f"drop_thresh out of range: {drop_thresh}")
    keep_p = 1.0 - drop_thresh / 256.0

    def _pmean(x):
        return jax.lax.pmean(x, axis_name) if axis_name is not None else x

    def _n_total(local_n):
        if axis_name is not None:
            return local_n * jax.lax.psum(1, axis_name)
        return local_n

    def _stats(y0):
        xf = y0.astype(jnp.float32)
        reduce_axes = tuple(range(y0.ndim - 1))
        mean = _pmean(jnp.mean(xf, axis=reduce_axes))
        mean_sq = _pmean(jnp.mean(jnp.square(xf), axis=reduce_axes))
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        return mean, var

    def _normalize_relu(y0, scale, bias, mean, r):
        # Same op order as TorchBatchNorm.__call__ so the bf16 rounding —
        # and therefore the backward's recomputed ReLU mask — is bit-equal.
        y = (y0 - mean) * r
        y = y * scale + bias
        return jnp.maximum(y.astype(y0.dtype), 0)

    def _pool(y):
        h2 = y.shape[1] // 2
        a = jax.lax.slice_in_dim(y, 0, 2 * h2, stride=2, axis=1)
        b = jax.lax.slice_in_dim(y, 1, 2 * h2, stride=2, axis=1)
        return ((a.astype(jnp.float32) + b.astype(jnp.float32)) * 0.5).astype(y.dtype)

    def _drop(y, bits):
        # models/common.apply_byte_dropout is the canonical op (division
        # form): reusing it keeps the fused path bit-identical to the
        # unfused chain — y * (1/keep_p) rounds differently for ~1% of
        # f32 inputs
        from dfac_tpu.models.common import apply_byte_dropout

        return apply_byte_dropout(y, bits, drop_thresh)

    @jax.custom_vjp
    def epilogue(y0, scale, bias, bits):
        out, _ = _fwd(y0, scale, bias, bits)
        return out

    def _fwd(y0, scale, bias, bits):
        if drop_thresh > 0 and bits is None:
            raise ValueError(
                "make_block_epilogue built with drop_thresh > 0 needs u8 "
                "bits of the output shape (got None) — build a separate "
                "epilogue with drop_thresh=0 for eval"
            )
        mean, var = _stats(y0)
        r = jax.lax.rsqrt(var + eps)
        y = _normalize_relu(y0, scale, bias, mean, r)
        if pool:
            y = _pool(y)
        if drop_thresh > 0:
            y = _drop(y, bits)
        return (y, mean, var), (y0, scale, bias, bits, mean, r)

    def _bwd(res, cts):
        y0, scale, bias, bits, mean, r = res
        ct_out, ct_mean, ct_var = cts

        # Dropout backward: the kept elements' cotangent, rescaled by the
        # SAME dtype-rounded constant the forward applied — bf16(keep_inv)
        # != f32(keep_inv), and using the unrounded float here would make
        # the VJP deviate ~2^-9 relative from true AD on every kept element.
        d = ct_out.astype(jnp.float32)
        if drop_thresh > 0:
            # exact adjoint of the forward's division by the dtype-rounded
            # keep_p constant (apply_byte_dropout's form)
            kp_fwd = jnp.asarray(keep_p, ct_out.dtype).astype(jnp.float32)
            d = jnp.where(bits >= drop_thresh, d / kp_fwd, 0.0)
        # Pool backward: each input row receives half its output row's
        # cotangent; the dropped odd row (floor pooling) receives zero.
        if pool:
            h = y0.shape[1]
            h2 = h // 2
            d = jnp.repeat(d * 0.5, 2, axis=1)
            if h != 2 * h2:
                pad = [(0, 0)] * y0.ndim
                pad[1] = (0, h - 2 * h2)
                d = jnp.pad(d, pad)

        xf = y0.astype(jnp.float32)
        xhat = (xf - mean) * r
        # Recompute the pre-ReLU value with the forward's exact rounding.
        ybf = ((xhat * scale + bias)).astype(y0.dtype)
        dy = jnp.where(ybf > 0, d, 0.0)

        reduce_axes = tuple(range(y0.ndim - 1))
        s1 = jnp.sum(dy, axis=reduce_axes)
        s2 = jnp.sum(dy * xhat, axis=reduce_axes)
        n = _n_total(math.prod(y0.shape[:-1]))
        if axis_name is not None:
            # Global sums: scale/bias are replicated over the axis, so their
            # cotangents must come back replicated (shard_map's transpose
            # does not auto-psum through a custom_vjp), and the dy0 formula
            # needs the global-batch means.
            s1 = jax.lax.psum(s1, axis_name)
            s2 = jax.lax.psum(s2, axis_name)
        dscale = s2
        dbias = s1
        rs = r * scale
        dy0 = rs * dy - (rs * s1 / n) - xhat * (rs * s2 / n)
        # Cotangents of the returned (mean, biased var): zero in normal
        # training, included for correctness. d mean/d y0 = 1/n;
        # d var/d y0 = 2 (y0 - mean)/n (the clamp at var=0 is measure-zero).
        if axis_name is not None:
            # mean/var are pmean'd (replicated) outputs — like s1/s2 above,
            # shard_map's transpose does not auto-psum custom_vjp cotangents
            ct_mean = jax.lax.psum(ct_mean, axis_name)
            ct_var = jax.lax.psum(ct_var, axis_name)
        dy0 = dy0 + (ct_mean - 2.0 * mean * ct_var) / n + xf * (2.0 * ct_var / n)
        dy0 = dy0.astype(y0.dtype)

        if bits is None:
            dbits = None
        else:
            dbits = np.zeros(bits.shape, jax.dtypes.float0)
        return dy0, dscale, dbias, dbits

    def _fwd_rule(y0, scale, bias, bits):
        return _fwd(y0, scale, bias, bits)

    epilogue.defvjp(_fwd_rule, _bwd)
    return epilogue
