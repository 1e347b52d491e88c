"""ConvAutoencoder — bonafide-only anomaly scorer.

Feature-parity target: reference ``src/model_cae.py:20-125``. Fully-conv AE
on normalized (T=321, F=180) spectrograms. Encoder: 4x [Conv 3x3 SAME -> BN
-> ReLU -> AvgPool 2x2 floor-mode], channels 1->32->64->128->256, spatial
bottleneck 20x11 (floor-pool chain 321->160->80->40->20, 180->90->45->22->11).
Decoder: 4x ConvTranspose k=2 s=2 (block-3 inverse uses output_padding
(0, 1) to recover 45 from 22), channels 256->128->64->32->1, no final
activation. Decoder emits T=320; the output is zero-padded back to T=321
(reference ``src/model_cae.py:113-121``).

Returns ``(reconstruction (B,T,F), latent (B,20,11,256) NHWC)``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from dfac_tpu.models.common import Conv, ConvTranspose2dTorch, TorchBatchNorm, avg_pool


class ConvAutoencoder(nn.Module):
    base_channels: int = 32
    axis_name: str | None = None
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        """x: (B, T, F) normalized spectrogram."""
        bc = self.base_channels
        dt = self.compute_dtype
        t_orig = x.shape[1]
        h = x[..., None].astype(dt or x.dtype)  # (B, T, F, 1)

        # Encoder
        for i, ch in enumerate((bc, bc * 2, bc * 4, bc * 8)):
            h = Conv(ch, (3, 3), dtype=dt, name=f"enc_conv{i + 1}")(h)
            h = TorchBatchNorm(axis_name=self.axis_name, dtype=dt, name=f"enc_bn{i + 1}")(
                h, use_running_average=not train
            )
            h = nn.relu(h)
            h = avg_pool(h, (2, 2))
        latent = h  # (B, 20, 11, 256)

        # Decoder
        dec_specs = [
            (bc * 4, (0, 0), True),
            (bc * 2, (0, 1), True),  # 22 -> 45 via output_padding on F
            (bc, (0, 0), True),
            (1, (0, 0), False),      # no BN / activation on the last block
        ]
        for i, (ch, out_pad, bn) in enumerate(dec_specs):
            h = ConvTranspose2dTorch(ch, output_padding=out_pad, dtype=dt, name=f"dec_convt{i + 1}")(h)
            if bn:
                h = TorchBatchNorm(axis_name=self.axis_name, dtype=dt, name=f"dec_bn{i + 1}")(
                    h, use_running_average=not train
                )
                h = nn.relu(h)

        # Trim or zero-pad the time axis back to the input length.
        t_recon = h.shape[1]
        if t_recon < t_orig:
            h = jnp.pad(h, ((0, 0), (0, t_orig - t_recon), (0, 0), (0, 0)))
        elif t_recon > t_orig:
            h = h[:, :t_orig]

        reconstruction = h[..., 0].astype(jnp.float32)  # (B, T, F)
        return reconstruction, latent.astype(jnp.float32)


def reconstruction_mse(reconstruction: jax.Array, x: jax.Array) -> jax.Array:
    """Per-sample mean squared reconstruction error over (T, F).

    The CAE anomaly score (reference ``src/evaluation_cae.py:50-53``). On
    this dataset the *raw* (+MSE) convention is the bonafide score — fakes
    reconstruct better (reference ``results/cae_v7_test1_eval.txt:10``).
    """
    return jnp.mean(jnp.square(reconstruction - x), axis=(1, 2))
