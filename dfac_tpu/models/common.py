"""Shared building blocks for the model zoo.

All models are flax.linen modules operating in TPU-native channels-last
layout (NHWC / NTC); the reference's NCHW tensors are never materialized.
Blocks here exist to pin down *semantic parity* with the PyTorch reference
where torch and XLA defaults differ:

* :class:`TorchBatchNorm` — batch statistics use the biased variance, while
  the running variance is updated with the **unbiased** batch variance
  (torch's rule). Supports ``axis_name`` so data-parallel training syncs
  batch stats over the mesh with ``lax.pmean``.
* :func:`kaiming_uniform_init` / :func:`torch_bias_init` — torch's default
  ``kaiming_uniform_(a=sqrt(5))`` fan-in initialization, so retrained models
  share the reference's init distribution.
* :func:`avg_pool` — floor-mode (VALID) average pooling, matching torch's
  default shape rule 321 -> 160 (reference ``src/model_cae.py:92-105``).
* :class:`ConvTranspose2dTorch` — stride-2 kernel-2 transposed conv with
  torch ``output_padding`` semantics (the extra row/col receives only the
  bias; reference ``src/model_cae.py:68-69``).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def kaiming_uniform_init(a: float = math.sqrt(5.0), fan_in: int | None = None):
    """torch's default weight init for Conv*/Linear.

    ``U(-b, b)`` with ``b = gain * sqrt(3 / fan_in)``, ``gain =
    sqrt(2 / (1 + a^2))``. For flax kernels fan_in defaults to the product
    of all dimensions except the last (output features); pass ``fan_in``
    explicitly where torch computes it differently (ConvTranspose* uses
    weight dim 1 = OUT channels: ``_calculate_fan_in_and_fan_out`` on a
    (in, out, kH, kW) tensor)."""

    def init(key, shape, dtype=jnp.float32):
        fan = fan_in if fan_in is not None else math.prod(int(s) for s in shape[:-1])
        gain = math.sqrt(2.0 / (1.0 + a * a))
        bound = gain * math.sqrt(3.0 / fan)
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_bias_init(fan_in: int):
    """torch's default bias init: ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))``."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch-exact train/eval semantics.

    Normalizes over all axes except the last (channel) axis. In training,
    batch statistics use the biased variance; the running variance is updated
    with the *unbiased* batch variance (torch's rule, which flax's BatchNorm
    does not follow). ``axis_name`` enables cross-device stat reduction for
    data-parallel training (SURVEY.md §7 hard part c).
    """

    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    epsilon: float = 1e-5
    axis_name: str | None = None
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool) -> jax.Array:
        num_features = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((num_features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((num_features,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones_init(), (num_features,))
        bias = self.param("bias", nn.initializers.zeros_init(), (num_features,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            mean_sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
            n = math.prod(x.shape[:-1])
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean_sq = jax.lax.pmean(mean_sq, self.axis_name)
                n = n * jax.lax.psum(1, self.axis_name)
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)


def avg_pool(x: jax.Array, window: Sequence[int], strides: Sequence[int] | None = None) -> jax.Array:
    """Floor-mode average pooling over the spatial dims of an NHWC/NTC array.

    ``window`` covers the non-batch, non-channel axes. VALID padding
    reproduces torch's default floor division shape rule.

    Implemented as a stride-``strides`` depthwise convolution with constant
    ``1/prod(window)`` taps instead of ``reduce_window``: on TPU the conv
    stays inside XLA's convolution layout domain (reduce_window forces a
    relayout on C-minor activations) — measured ~20% faster in the serving
    chain (results/v5e_measurements.md, round 2) and now shared by the
    training path too (round 3). Bit-exact vs ``nn.avg_pool`` in f32
    (``precision=HIGHEST`` + f32 accumulation; scaling by the reciprocal
    window size is exact for power-of-two windows and correctly rounded
    otherwise); in bf16 the MXU accumulates in f32 before one bf16 round.
    The VJP is the transposed depthwise convolution — the same
    uniform-scatter gradient as ``reduce_window``'s.
    """
    strides = tuple(strides) if strides is not None else tuple(window)
    window = tuple(window)
    c = x.shape[-1]
    spatial = "".join("DHW"[3 - len(window):])  # 1D -> "W", 2D -> "HW"
    dn = (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C")
    taps = jnp.full((*window, 1, c), 1.0 / math.prod(window), x.dtype)
    if x.dtype == jnp.bfloat16:
        # no preferred_element_type: its f32 output would hand the VJP an
        # f32 cotangent against bf16 taps, which lax.conv rejects. The TPU
        # MXU accumulates bf16 convs in f32 internally regardless, so the
        # f32-accumulate-then-round-once property still holds.
        kwargs = {}
    else:
        kwargs = dict(
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return jax.lax.conv_general_dilated(
        x, taps, strides, "VALID",
        dimension_numbers=dn,
        feature_group_count=c,
        **kwargs,
    ).astype(x.dtype)


class Conv(nn.Module):
    """3x3/SAME-style conv with torch-default initialization, NHWC."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | None = None
    padding: Any = "SAME"
    use_bias: bool = True
    feature_group_count: int = 1
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        fan_in = in_features * math.prod(self.kernel_size) // self.feature_group_count
        return nn.Conv(
            features=self.features,
            kernel_size=tuple(self.kernel_size),
            strides=self.strides,
            padding=self.padding,
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            kernel_init=kaiming_uniform_init(),
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            # f32 mode needs full-precision MXU passes for torch parity; in
            # bf16 compute mode the default (fast) precision is the point.
            precision=None if self.dtype is not None else jax.lax.Precision.HIGHEST,
            name="conv",
        )(x)


class Dense(nn.Module):
    """Linear layer with torch-default initialization."""

    features: int
    use_bias: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = x.shape[-1]
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=kaiming_uniform_init(),
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            precision=None if self.dtype is not None else jax.lax.Precision.HIGHEST,
            name="dense",
        )(x)


class ConvTranspose2dTorch(nn.Module):
    """Transposed conv, kernel=2 stride=2, with torch ``output_padding``.

    VALID transposed conv gives out = 2*in per axis; ``output_padding``
    appends rows/cols that receive no input contribution — in torch these
    evaluate to the bias alone, which is reproduced here by padding the
    pre-bias output with zeros and adding the bias afterwards.
    """

    features: int
    output_padding: tuple[int, int] = (0, 0)
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # torch's _calculate_fan_in_and_fan_out reads dim 1 of the
        # (in, out, kH, kW) ConvTranspose weight — fan_in = OUT*k*k, for
        # both the kernel and the bias bound (NOT in*k*k as for Conv).
        fan_in = self.features * 4  # kernel 2x2
        y = nn.ConvTranspose(
            features=self.features,
            kernel_size=(2, 2),
            strides=(2, 2),
            padding="VALID",
            use_bias=False,
            kernel_init=kaiming_uniform_init(fan_in=fan_in),
            dtype=self.dtype,
            precision=None if self.dtype is not None else jax.lax.Precision.HIGHEST,
            name="convt",
        )(x)
        op_h, op_w = self.output_padding
        if op_h or op_w:
            y = jnp.pad(y, ((0, 0), (0, op_h), (0, op_w), (0, 0)))
        bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
        return y + bias


def byte_dropout_thresh(rate: float) -> int:
    """Quantized dropout threshold: one uint8 byte per element is compared
    against ``round(rate * 256)``. Clamped to [0, 256]; <= 0 keeps
    everything, 256 drops everything (torch's rate=1.0 -> zeros). The ONE
    place the quantization rule lives — FastDropout and the hand-scheduled
    training chain (ops/train_chain.py) must draw identical masks."""
    return max(0, min(int(round(rate * 256)), 256))


def apply_byte_dropout(x: jax.Array, bits: jax.Array, thresh: int) -> jax.Array:
    """Keep elements whose byte >= thresh, rescaled by the true quantized
    keep probability (E[output] == input exactly). ``thresh`` must come
    from :func:`byte_dropout_thresh`; 0 and 256 are handled without
    touching ``bits`` (256 would not fit in uint8)."""
    if thresh <= 0:
        return x
    if thresh >= 256:
        return jnp.zeros_like(x)
    keep_p = 1.0 - thresh / 256.0
    return jnp.where(bits >= thresh, x / jnp.asarray(keep_p, x.dtype),
                     jnp.zeros((), x.dtype))


class FastDropout(nn.Module):
    """Element dropout from one random BYTE per element.

    ``jax.random.bernoulli`` forms a full f32 uniform per element from the
    PRNG bits; at CNN2D training scale (two masks over ~700M elements at
    B=512) that costs 15.4 ms of a ~100 ms step on a v5e. Drawing uint8
    bits and comparing against ``round(rate * 256)`` measures 4.6 ms for
    the same masks (``results/v5e_measurements.md`` round 3).

    Semantics: keep probability quantizes to a multiple of 1/256 — rate
    0.2 becomes 51/256 = 0.19921875, and the kept values are rescaled by
    the TRUE quantized keep probability so E[output] == input exactly.
    The reference has no RNG-bit contract (it uses python/torch global
    RNGs); the <=2e-3 absolute rate quantization is far below the
    run-to-run noise of retrained models. Rates that quantize to 0 keep
    everything (identical to rate 0); rates that quantize to 256
    (rate >= ~0.998) drop everything, matching torch's rate=1.0.
    """

    rate: float
    deterministic: bool | None = None  # drop-in for nn.Dropout's signature

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool | None = None) -> jax.Array:
        if deterministic is None and self.deterministic is None:
            # mirror nn.Dropout's merge_param contract instead of silently
            # treating "unresolved" as train mode
            raise ValueError(
                "FastDropout: 'deterministic' must be set via the "
                "constructor or the call argument"
            )
        det = self.deterministic if deterministic is None else deterministic
        thresh = byte_dropout_thresh(self.rate)
        if det or thresh <= 0:
            return x
        if thresh >= 256:
            return jnp.zeros_like(x)
        key = self.make_rng("dropout")
        bits = jax.random.bits(key, x.shape, jnp.uint8)
        return apply_byte_dropout(x, bits, thresh)


class ChannelDropout(nn.Module):
    """torch ``Dropout1d``/``Dropout2d``: zero whole channels per sample.

    Mask shape is (B, 1, ..., C): each sample independently drops entire
    feature maps, scaled by 1/(1-rate).
    """

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        if deterministic or self.rate == 0.0:
            return x
        key = self.make_rng("dropout")
        keep = 1.0 - self.rate
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
        mask = jax.random.bernoulli(key, keep, mask_shape)
        return jnp.where(mask, x / keep, 0.0)
