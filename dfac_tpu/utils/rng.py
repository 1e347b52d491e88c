"""PRNG key construction for the training hot path.

The trainers thread one PRNG key through every step (dropout masks +
augmentation draws). With JAX's default threefry2x32 implementation,
generating the two dropout masks of a CNN2D train step (~350M elements at
B=256) costs ~7.4 ms/step on a TPU v5e — ~12% of the whole on-device
fwd+bwd+update program (measured in ``scripts/train_bracket_profile.py``
methodology; numbers in ``results/v5e_measurements.md``). The ``rbg``
implementation lowers to the TPU's native RngBitGenerator and removes
almost all of that cost, while staying deterministic per seed.

The reference trainer uses Python's ``random`` module for augmentation
and torch's global RNG for dropout (``/root/reference/src/train.py:249-254``)
— there is no bit-level RNG contract to preserve, only determinism given a
seed, which both implementations provide.
"""

from __future__ import annotations

import jax

__all__ = ["train_key"]


def train_key(seed: int) -> jax.Array:
    """Deterministic per-seed PRNG key for the dropout/augment chain.

    Uses the TPU-native ``rbg`` generator when available; falls back to the
    default (threefry) implementation on jax versions without it.
    """
    try:
        return jax.random.key(seed, impl="rbg")
    except (TypeError, ValueError):
        return jax.random.key(seed)
