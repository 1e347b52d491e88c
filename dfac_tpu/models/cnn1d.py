"""CNN1D — 1D classifier treating the 180 feature dims as channels.

Feature-parity target: reference ``src/model_cnn1d.py:5-46``: three
[Conv1d k=3 SAME -> BatchNorm -> ReLU -> Dropout] blocks 180->32->64->128
sliding over time, global average pool over time, Linear(128, 1).

TPU-native layout is (B, T, C): the conv contracts the 180-channel axis on
the MXU at every time step; no transpose is materialized (the reference's
``x.transpose(1, 2)`` is just our native layout).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from dfac_tpu.models.common import Conv, Dense, FastDropout, TorchBatchNorm


class CNN1D(nn.Module):
    in_features: int = 180
    base_channels: int = 32
    num_classes: int = 1
    dropout: float = 0.2
    axis_name: str | None = None
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        """x: (B, T, F) — F is the conv channel axis."""
        bc = self.base_channels
        dt = self.compute_dtype
        h = x.astype(dt or x.dtype)

        for i, ch in enumerate((bc, bc * 2, bc * 4)):
            h = Conv(ch, (3,), dtype=dt, name=f"conv{i + 1}")(h)
            h = TorchBatchNorm(axis_name=self.axis_name, dtype=dt, name=f"bn{i + 1}")(
                h, use_running_average=not train
            )
            h = nn.relu(h)
            if i < 2:
                h = FastDropout(self.dropout, deterministic=not train)(h)

        h = jnp.mean(h, axis=1)  # AdaptiveAvgPool1d(1) over time -> (B, C)
        logits = Dense(self.num_classes, dtype=dt, name="classifier")(h)
        return logits.astype(jnp.float32)


class CNN1DVariant(nn.Module):
    """CNN1D with configurable per-layer kernel sizes.

    Feature-parity target: reference ``src/compare_kernels.py:38-67``
    ``CNN1D_Variant`` — the kernel-size A/B study body ((3,3,3) vs (5,3,3)
    receptive fields).
    """

    in_features: int = 180
    base_channels: int = 32
    kernel_sizes: tuple[int, int, int] = (3, 3, 3)
    num_classes: int = 1
    dropout: float = 0.2
    axis_name: str | None = None
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        bc = self.base_channels
        dt = self.compute_dtype
        h = x.astype(dt or x.dtype)
        for i, (ch, k) in enumerate(zip((bc, bc * 2, bc * 4), self.kernel_sizes)):
            h = Conv(ch, (int(k),), dtype=dt, name=f"conv{i + 1}")(h)
            h = TorchBatchNorm(axis_name=self.axis_name, dtype=dt, name=f"bn{i + 1}")(
                h, use_running_average=not train
            )
            h = nn.relu(h)
            if i < 2:
                h = FastDropout(self.dropout, deterministic=not train)(h)
        h = jnp.mean(h, axis=1)
        return Dense(self.num_classes, dtype=dt, name="classifier")(h).astype(jnp.float32)
