"""ConvAutoencoder — bonafide-only anomaly scorer.

Feature-parity target: reference ``src/model_cae.py:20-125``. Fully-conv AE
on normalized (T=321, F=180) spectrograms. Encoder: 4x [Conv 3x3 SAME -> BN
-> ReLU -> AvgPool 2x2 floor-mode], channels 1->32->64->128->256, spatial
bottleneck 20x11 (floor-pool chain 321->160->80->40->20, 180->90->45->22->11).
Decoder: 4x ConvTranspose k=2 s=2, channels 256->128->64->32->1, no final
activation; per-stage output_padding is computed from the encoder's shape
trace (identical to the reference's hardcoded (0, 1) that recovers 45
from 22 at F=180, but valid for any geometry; the output stage's T pad
stays 0 so the reference's emit-T=320-then-zero-pad-to-321 semantics are
preserved exactly, and the padded deficit is at most T's parity
everywhere — reference ``src/model_cae.py:113-121``).

Returns ``(reconstruction (B,T,F), latent (B,20,11,256) NHWC)``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from dfac_tpu.models.common import Conv, ConvTranspose2dTorch, TorchBatchNorm, avg_pool


def decoder_output_paddings(t_sizes, f_sizes):
    """Per-stage ConvTranspose ``output_padding`` from the encoder's
    pre-pool shape trace (pre - 2*post per stage). The ONE place the
    emit-then-pad rule lives: F uses the trace on every stage; T's OUTPUT
    stage stays 0 because the reference emits T=320 and zero-pads back to
    321 (``src/model_cae.py:113-121``) — the folded serving chain
    (``models/fast_infer.cae_fast_mse``) must replay exactly this rule."""
    f_pads = [f_sizes[k] - 2 * (f_sizes[k] // 2) for k in (3, 2, 1, 0)]
    t_pads = [t_sizes[k] - 2 * (t_sizes[k] // 2) for k in (3, 2, 1)] + [0]
    return t_pads, f_pads


class ConvAutoencoder(nn.Module):
    base_channels: int = 32
    axis_name: str | None = None
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False, bn_frozen: bool = False):
        """x: (B, T, F) normalized spectrogram.

        ``bn_frozen`` (only meaningful with ``train=True``): every
        BatchNorm (encoder and decoder) runs on its RUNNING stats and
        stops updating them — the freeze-tail fast-numerics recipe, same
        contract as :class:`~dfac_tpu.models.cnn2d.CNN2D`."""
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

        # Encoder. Track the pre-pool (T, F) sizes at each stage: the
        # decoder's output_padding is computed from this trace (pre -
        # 2*post per stage), which reproduces the reference's hardcoded
        # (0, 1) on block 3 at F=180 (45 = 2*22 + 1,
        # ``src/model_cae.py:68-69``) and generalizes to any geometry.
        t_sizes, f_sizes = [], []
        for i, ch in enumerate((bc, bc * 2, bc * 4, bc * 8)):
            h = Conv(ch, (3, 3), dtype=dt, name=f"enc_conv{i + 1}")(h)
            h = TorchBatchNorm(axis_name=self.axis_name, dtype=dt, name=f"enc_bn{i + 1}")(
                h, use_running_average=(not train) or bn_frozen
            )
            h = nn.relu(h)
            t_sizes.append(h.shape[1])
            f_sizes.append(h.shape[2])
            h = avg_pool(h, (2, 2))
        latent = h  # (B, 20, 11, 256) at the production geometry

        # Decoder: invert the pools in reverse stage order. F uses the
        # shape trace on every stage. T uses the trace on the first three
        # decoder stages but NOT the output stage: the reference emits
        # T = 320 and zero-pads back to 321 (``src/model_cae.py:113-121``),
        # and stage-1 T output_padding would replace that zero frame with a
        # conv output. With the inner stages traced, the residual deficit
        # is at most the parity of T for every geometry (it was up to 15
        # frames of forced zeros before, e.g. 16 of 30 at T=30).
        t_pads, f_pads = decoder_output_paddings(t_sizes, f_sizes)
        dec_specs = [
            (bc * 4, (t_pads[0], f_pads[0]), True),
            (bc * 2, (t_pads[1], f_pads[1]), True),
            (bc, (t_pads[2], f_pads[2]), True),
            (1, (0, f_pads[3]), False),  # no BN / activation on the last block
        ]
        for i, (ch, out_pad, bn) in enumerate(dec_specs):
            h = ConvTranspose2dTorch(ch, output_padding=out_pad, dtype=dt, name=f"dec_convt{i + 1}")(h)
            if bn:
                h = TorchBatchNorm(axis_name=self.axis_name, dtype=dt, name=f"dec_bn{i + 1}")(
                    h, use_running_average=(not train) or bn_frozen
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
