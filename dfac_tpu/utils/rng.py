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

**Reproducibility caveat**: ``rbg``'s output is implementation-defined —
same-seed runs are bit-reproducible only within one fixed JAX/XLA version
and backend, not across environments (threefry is stable across both).
Set ``DFAC_TPU_PRNG=threefry`` (or pass ``impl='threefry2x32'``) for
reproducibility-sensitive runs that must replay bit-exactly across
versions/backends, at ~12% step-time cost on TPU.
"""

from __future__ import annotations

import os

import jax

__all__ = ["train_key"]


def train_key(seed: int, impl: str | None = None) -> jax.Array:
    """Deterministic per-seed PRNG key for the dropout/augment chain.

    Uses the TPU-native ``rbg`` generator by default (falling back to
    threefry on jax versions without it). ``impl`` — or the
    ``DFAC_TPU_PRNG`` environment variable — overrides the generator
    (e.g. ``'threefry2x32'`` for cross-environment bit reproducibility).
    """
    explicit = impl is not None or bool(os.environ.get("DFAC_TPU_PRNG"))
    impl = impl or os.environ.get("DFAC_TPU_PRNG") or "rbg"
    impl = {"threefry": "threefry2x32"}.get(impl, impl)
    known = {"rbg", "unsafe_rbg", "threefry2x32"}
    if impl not in known:
        # fail loudly: a typo'd DFAC_TPU_PRNG silently falling back to the
        # default generator would defeat the reproducibility override
        raise ValueError(
            f"unknown PRNG impl {impl!r} (DFAC_TPU_PRNG/impl); "
            f"choose one of {sorted(known)} or 'threefry'"
        )
    try:
        return jax.random.key(seed, impl=impl)
    except TypeError:
        if explicit:
            # an explicitly requested generator must not silently
            # downgrade to the backend default (the run would not be
            # bit-reproducible while the user believes it is)
            raise
        # old jax without the impl kwarg: backend-default generator
        return jax.random.key(seed)
