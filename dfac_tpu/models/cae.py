"""ConvAutoencoder — bonafide-only anomaly scorer.

Feature-parity target: reference ``src/model_cae.py:20-125``. Fully-conv AE
on normalized (T=321, F=180) spectrograms. Encoder: 4x [Conv 3x3 SAME -> BN
-> ReLU -> AvgPool 2x2 floor-mode], channels 1->32->64->128->256, spatial
bottleneck 20x11 (floor-pool chain 321->160->80->40->20, 180->90->45->22->11).
Decoder: 4x ConvTranspose k=2 s=2, channels 256->128->64->32->1, no final
activation; per-stage F output_padding is computed from the encoder's
shape trace (identical to the reference's hardcoded (0, 1) that recovers
45 from 22 at F=180, but valid for any geometry). Decoder emits T=320;
the output is zero-padded back to T=321 (reference
``src/model_cae.py:113-121``).

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
        if x.shape[1] < 16 or x.shape[2] < 16:
            raise ValueError(
                "ConvAutoencoder needs T >= 16 and F >= 16 so the 4-stage "
                f"floor-pool chain keeps a nonempty bottleneck; got {x.shape[1:]}. "
                "(The reference geometry is T=321, F=180.)"
            )
        h = x[..., None].astype(dt or x.dtype)  # (B, T, F, 1)

        # Encoder. Track the pre-pool F size at each stage: the decoder's
        # output_padding is computed from this trace (pre - 2*post per
        # stage), which reproduces the reference's hardcoded (0, 1) on
        # block 3 at F=180 (45 = 2*22 + 1, ``src/model_cae.py:68-69``) and
        # generalizes to any input geometry. The T axis intentionally does
        # NOT get output_padding: the reference emits T=320 and pads back
        # to 321 (``:113-121``), and we preserve that numeric behavior.
        f_sizes = []
        for i, ch in enumerate((bc, bc * 2, bc * 4, bc * 8)):
            h = Conv(ch, (3, 3), dtype=dt, name=f"enc_conv{i + 1}")(h)
            h = TorchBatchNorm(axis_name=self.axis_name, dtype=dt, name=f"enc_bn{i + 1}")(
                h, use_running_average=not train
            )
            h = nn.relu(h)
            f_sizes.append(h.shape[2])
            h = avg_pool(h, (2, 2))
        latent = h  # (B, 20, 11, 256) at the production geometry

        # Decoder: invert the pools in reverse stage order.
        f_pads = [f_sizes[k] - 2 * (f_sizes[k] // 2) for k in (3, 2, 1, 0)]
        dec_specs = [
            (bc * 4, (0, f_pads[0]), True),
            (bc * 2, (0, f_pads[1]), True),
            (bc, (0, f_pads[2]), True),
            (1, (0, f_pads[3]), False),  # no BN / activation on the last block
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
