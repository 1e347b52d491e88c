"""CNN2D — the primary (submitted) classifier.

Feature-parity target: reference ``src/model.py:5-42``. A 2D CNN over the
(T=321, F=180) grid treated as a 1-channel image: three [Conv 3x3 SAME ->
BatchNorm -> ReLU] blocks with channels 1->32->64->128, average pooling
(2, 1) after blocks 1-2 (pools time only, preserving all 180 feature
columns), dropout 0.2 between blocks; head = mean over the time axis ->
flatten (channel-major, matching torch's NCHW flatten so embeddings are
layout-identical) -> Linear(128 * 180, 1).

TPU-native differences: NHWC layout throughout (the channel axis lands on
the 128-wide lane dimension of the MXU), fp32 params with an optional
``compute_dtype=bfloat16`` inference path.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from dfac_tpu.models.common import Conv, Dense, FastDropout, TorchBatchNorm, avg_pool


class CNN2D(nn.Module):
    in_features: int = 180
    base_channels: int = 32
    num_classes: int = 1
    dropout: float = 0.2
    axis_name: str | None = None
    compute_dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        return_embedding: bool = False,
        bn_frozen: bool = False,
    ):
        """x: (B, T, F) in model-view orientation (after swap_tf).

        ``bn_frozen`` (only meaningful with ``train=True``): BatchNorm uses
        its RUNNING stats in the forward and stops updating them — the
        freeze-tail training recipe (torch's ``bn.eval()`` during training).
        Dropout stays governed by ``train``. Skips the batch-stat
        reduction and the running-stats update traffic in the train step.
        """
        bc = self.base_channels
        dt = self.compute_dtype
        h = x[..., None].astype(dt or x.dtype)  # (B, T, F, 1)

        for i, ch in enumerate((bc, bc * 2, bc * 4)):
            h = Conv(ch, (3, 3), dtype=dt, name=f"conv{i + 1}")(h)
            h = TorchBatchNorm(axis_name=self.axis_name, dtype=dt, name=f"bn{i + 1}")(
                h, use_running_average=(not train) or bn_frozen
            )
            h = nn.relu(h)
            if i < 2:
                h = avg_pool(h, (2, 1))
                h = FastDropout(self.dropout, deterministic=not train)(h)

        h = jnp.mean(h, axis=1)  # (B, F, C) — average over time only
        # Channel-major flatten: embedding index = c * F + f (torch layout).
        embedding = jnp.swapaxes(h, 1, 2).reshape(h.shape[0], -1)
        logits = Dense(self.num_classes, dtype=dt, name="classifier")(embedding)
        logits = logits.astype(jnp.float32)
        if return_embedding:
            return logits, embedding.astype(jnp.float32)
        return logits
