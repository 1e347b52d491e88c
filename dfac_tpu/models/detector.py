"""DeepfakeDetector — the variable-length-capable "dlqueen" model.

Feature-parity target: reference ``src/dlqueen_model.py:115-173``.
ConvEncoder: Conv1d k=5 then 2x k=3 (SAME), C->hidden=256, each followed by
BatchNorm + GELU(exact) + Dropout. StatsPool: length-masked mean+std pooling
over time -> (B, 2*hidden). Head: Linear(512, 256) -> GELU -> Dropout ->
Linear(256, 1).

TPU-native: fixed padded (B, T, C) batches with a length mask (no
pad_sequence — padding is static-shape, masking is on-device), so the whole
forward jit-compiles once for a corpus.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from dfac_tpu.models.common import Conv, Dense, FastDropout, TorchBatchNorm


def stats_pool(x: jax.Array, lengths: jax.Array) -> jax.Array:
    """Masked mean+std pooling over time.

    x: (B, T, C); lengths: (B,) valid frame counts. Matches reference
    ``src/dlqueen_model.py:115-129``: denominator clamped to >= 1, variance
    floored at 1e-6 before the sqrt.
    """
    t = x.shape[1]
    mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(x.dtype)[..., None]  # (B,T,1)
    denom = jnp.maximum(jnp.sum(mask, axis=1), 1.0)  # (B,1)
    mean = jnp.sum(x * mask, axis=1) / denom  # (B,C)
    var = jnp.sum(mask * jnp.square(x - mean[:, None, :]), axis=1) / denom
    std = jnp.sqrt(jnp.maximum(var, 1e-6))
    return jnp.concatenate([mean, std], axis=-1)  # (B, 2C)


class DeepfakeDetector(nn.Module):
    in_channels: int = 180
    hidden: int = 256
    dropout: float = 0.3
    encoder_dropout: float = 0.2
    axis_name: str | None = None
    compute_dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        lengths: jax.Array | None = None,
        train: bool = False,
        bn_frozen: bool = False,
    ):
        """x: (B, T, C); lengths: (B,) or None (= all frames valid).

        ``bn_frozen`` (only meaningful with ``train=True``): BatchNorm runs
        on its RUNNING stats and stops updating them — the freeze-tail
        fast-numerics recipe (torch ``bn.eval()`` during training), same
        contract as :class:`~dfac_tpu.models.cnn2d.CNN2D`. Dropout stays
        governed by ``train``.
        """
        dt = self.compute_dtype
        h = x.astype(dt or x.dtype)
        if lengths is None:
            lengths = jnp.full((x.shape[0],), x.shape[1], jnp.int32)

        for i, k in enumerate((5, 3, 3)):
            h = Conv(self.hidden, (k,), dtype=dt, name=f"enc_conv{i + 1}")(h)
            h = TorchBatchNorm(axis_name=self.axis_name, dtype=dt, name=f"enc_bn{i + 1}")(
                h, use_running_average=(not train) or bn_frozen
            )
            h = nn.gelu(h, approximate=False)
            h = FastDropout(self.encoder_dropout, deterministic=not train)(h)

        z = stats_pool(h.astype(jnp.float32), lengths)  # (B, 2*hidden)
        z = Dense(self.hidden, dtype=dt, name="head_fc1")(z)
        z = nn.gelu(z, approximate=False)
        z = FastDropout(self.dropout, deterministic=not train)(z)
        logits = Dense(1, dtype=dt, name="head_fc2")(z)
        return logits[..., 0].astype(jnp.float32)  # (B,)
