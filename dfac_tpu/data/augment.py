"""On-device, PRNG-keyed batch augmentations.

Feature-parity target: reference ``src/augmentation.py:5-186``. Semantics are
preserved — one random draw per *batch* (not per sample), contiguous masked
segments with ratios uniform in [min, max], floor-length, circular time
shift — but the implementation is pure-functional jax: every op takes an
explicit PRNG key, compiles under jit (static shapes, iota-based masks, no
data-dependent control flow), and fuses into the train step. The reference's
host-side Python ``random`` calls per batch are gone; augmentation costs no
host round-trip.

All ops act on model-view batches ``[B, T, F]``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

AugmentFn = Callable[[jax.Array, jax.Array], jax.Array]  # (key, x) -> x


def time_shift(key: jax.Array, x: jax.Array, max_shift_ratio: float = 0.1) -> jax.Array:
    """Random circular shift along time (reference ``augmentation.py:5-31``)."""
    if max_shift_ratio <= 0:
        return x
    t = x.shape[1]
    if t <= 1:
        return x
    max_shift = int(t * max_shift_ratio)
    if max_shift < 1:
        return x
    shift = jax.random.randint(key, (), -max_shift, max_shift + 1)
    return jnp.roll(x, shift, axis=1)


def channel_drop(key: jax.Array, x: jax.Array, drop_prob: float = 0.1) -> jax.Array:
    """Bernoulli keep-mask of shape (1, 1, F) broadcast over batch and time
    (reference ``augmentation.py:34-54``). No rescaling — matches reference."""
    if drop_prob <= 0:
        return x
    keep = jax.random.uniform(key, (1, 1, x.shape[2])) >= drop_prob
    return x * keep.astype(x.dtype)


def gaussian_jitter(key: jax.Array, x: jax.Array, std: float = 0.01) -> jax.Array:
    """Additive Gaussian feature noise (reference ``augmentation.py:57-70``)."""
    if std <= 0:
        return x
    return x + jax.random.normal(key, x.shape, x.dtype) * std


def _segment_mask(key: jax.Array, length: int, min_ratio: float, max_ratio: float) -> jax.Array:
    """Boolean (length,) mask with one contiguous True segment.

    Segment length = floor(length * U[min_ratio, max_ratio]) clamped to
    [1, length-1]; start uniform in [0, length - seg_len] — the exact draw
    scheme of reference ``augmentation.py:83-121``.
    """
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, (), minval=min_ratio, maxval=max_ratio)
    seg = jnp.clip((length * u).astype(jnp.int32), 1, length - 1)
    # uniform integer start in [0, length - seg] with a traced upper bound
    u2 = jax.random.uniform(k2, ())
    start = (u2 * (length - seg + 1).astype(jnp.float32)).astype(jnp.int32)
    start = jnp.minimum(start, length - seg)
    idx = jnp.arange(length)
    return (idx >= start) & (idx < start + seg)


def time_mask(
    key: jax.Array, x: jax.Array, max_mask_ratio: float = 0.2, min_mask_ratio: float = 0.05
) -> jax.Array:
    """SpecAugment time masking: zero one contiguous time segment for the
    whole batch (reference ``augmentation.py:83-121``)."""
    mask = _segment_mask(key, x.shape[1], min_mask_ratio, max_mask_ratio)
    return jnp.where(mask[None, :, None], 0.0, x).astype(x.dtype)


def feature_mask(
    key: jax.Array, x: jax.Array, max_mask_ratio: float = 0.1, min_mask_ratio: float = 0.02
) -> jax.Array:
    """SpecAugment feature masking (reference ``augmentation.py:124-162``)."""
    mask = _segment_mask(key, x.shape[2], min_mask_ratio, max_mask_ratio)
    return jnp.where(mask[None, None, :], 0.0, x).astype(x.dtype)


def spec_augment(
    key: jax.Array,
    x: jax.Array,
    time_mask_ratio: float = 0.2,
    feature_mask_ratio: float = 0.1,
    apply_time_mask: bool = True,
    apply_feature_mask: bool = False,
) -> jax.Array:
    """Combined SpecAugment (reference ``augmentation.py:165-186``)."""
    kt, kf = jax.random.split(key)
    if apply_time_mask:
        x = time_mask(kt, x, max_mask_ratio=time_mask_ratio)
    if apply_feature_mask:
        x = feature_mask(kf, x, max_mask_ratio=feature_mask_ratio)
    return x


def _per_sample_count_mask(key: jax.Array, length: int, max_width: int, num_masks: int) -> jax.Array:
    """(length,) keep-mask with ``num_masks`` random-width zero segments.

    The dlqueen SpecAugment draw scheme (reference
    ``src/dlqueen_model.py:33-62``): each mask has width uniform in
    [0, min(max_width, length)] (0 = no-op) and uniform start.
    """
    keep = jnp.ones((length,), jnp.bool_)
    idx = jnp.arange(length)
    for i in range(num_masks):
        kw, ks, key = jax.random.split(key, 3)
        w = jax.random.randint(kw, (), 0, min(max_width, length) + 1)
        start = (jax.random.uniform(ks, ()) * (length - w + 1)).astype(jnp.int32)
        keep = keep & ~((idx >= start) & (idx < start + w))
    return keep


def dlqueen_spec_augment(
    key: jax.Array,
    x: jax.Array,
    time_mask_max: int = 30,
    time_mask_n: int = 2,
    freq_mask_max: int = 24,
    freq_mask_n: int = 2,
) -> jax.Array:
    """Per-sample time+frequency masking on (B, T, C) batches.

    Unlike :func:`spec_augment` (one mask per batch), every sample draws its
    own masks — matching the dlqueen trainer's per-sample loop (reference
    ``src/dlqueen_model.py:357-364``) but fully vectorized with vmap.
    """
    b, t, c = x.shape

    def one(key_i, xi):
        kt, kf = jax.random.split(key_i)
        tmask = _per_sample_count_mask(kt, t, time_mask_max, time_mask_n)
        fmask = _per_sample_count_mask(kf, c, freq_mask_max, freq_mask_n)
        return xi * tmask[:, None].astype(xi.dtype) * fmask[None, :].astype(xi.dtype)

    return jax.vmap(one)(jax.random.split(key, b), x)


def compose(*fns: AugmentFn | None) -> AugmentFn:
    """Chain keyed augmentations, splitting the key per stage
    (reference ``augmentation.py:73-80``)."""
    active = [f for f in fns if f is not None]

    def _apply(key: jax.Array, x: jax.Array) -> jax.Array:
        keys = jax.random.split(key, max(len(active), 1))
        for f, k in zip(active, keys):
            x = f(k, x)
        return x

    return _apply


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Flag-level mirror of the reference train.py augmentation knobs
    (``src/train.py:158-225``)."""

    spec_augment: bool = False
    time_mask_ratio: float = 0.2
    feature_mask_ratio: float = 0.1
    feature_mask: bool = False
    time_shift: bool = False
    time_shift_ratio: float = 0.1
    channel_drop: bool = False
    channel_drop_prob: float = 0.1
    gaussian_jitter: bool = False
    gaussian_jitter_std: float = 0.01

    @property
    def any_enabled(self) -> bool:
        return self.spec_augment or self.time_shift or self.channel_drop or self.gaussian_jitter


def build_augment_fn(cfg: AugmentConfig) -> AugmentFn | None:
    """Assemble the pipeline in the reference's application order
    (``src/train.py:343-388``): specaug, time_shift, channel_drop, jitter."""
    fns: list[AugmentFn] = []
    if cfg.spec_augment:
        fns.append(
            lambda k, x: spec_augment(
                k,
                x,
                time_mask_ratio=cfg.time_mask_ratio,
                feature_mask_ratio=cfg.feature_mask_ratio,
                apply_time_mask=True,
                apply_feature_mask=cfg.feature_mask,
            )
        )
    if cfg.time_shift:
        fns.append(lambda k, x: time_shift(k, x, max_shift_ratio=cfg.time_shift_ratio))
    if cfg.channel_drop:
        fns.append(lambda k, x: channel_drop(k, x, drop_prob=cfg.channel_drop_prob))
    if cfg.gaussian_jitter:
        fns.append(lambda k, x: gaussian_jitter(k, x, std=cfg.gaussian_jitter_std))
    return compose(*fns) if fns else None
