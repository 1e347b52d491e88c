"""Archived model zoo — the 8 historical variants.

Feature-parity target: reference ``src/archive/models.py`` (MeanPoolMLP
:5-25, StatsPoolMLP :28-52, CNN1DSpatial :55-86, archived CNN1D :89-121,
CNN2DSpatial :124-155, CRNN/CRNN2 :158-234, CNN2D_Robust :237-298). All are
selectable through the registry and the benchmark harness, mirroring the
reference's historical sweeps.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
from flax import linen as nn

from dfac_tpu.models.common import (
    ChannelDropout,
    Conv,
    Dense,
    FastDropout,
    TorchBatchNorm,
    avg_pool,
)


def adaptive_avg_pool_1d(x: jax.Array, bins: int) -> jax.Array:
    """torch AdaptiveAvgPool1d over the time axis of a (B, T, C) array."""
    t = x.shape[1]
    if bins == 1:
        return jnp.mean(x, axis=1, keepdims=True)
    pieces = []
    for i in range(bins):
        start = (i * t) // bins
        end = -(-((i + 1) * t) // bins)  # ceil
        pieces.append(jnp.mean(x[:, start:end], axis=1))
    return jnp.stack(pieces, axis=1)  # (B, bins, C)


class MeanPoolMLP(nn.Module):
    """Mean pool over time, then a 2-hidden-layer MLP."""

    in_features: int = 321
    hidden_dim: int = 128
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        h = jnp.mean(x, axis=1)
        for i in range(2):
            h = Dense(self.hidden_dim, name=f"fc{i + 1}")(h)
            h = nn.relu(h)
            h = FastDropout(self.dropout, deterministic=not train)(h)
        return Dense(1, name="fc3")(h)


class StatsPoolMLP(nn.Module):
    """Mean + (biased) std + max pooling over time, then MLP."""

    in_features: int = 321
    hidden_dim: int = 128
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        mean = jnp.mean(x, axis=1)
        std = jnp.std(x, axis=1)  # biased, matching torch std(unbiased=False)
        mx = jnp.max(x, axis=1)
        h = jnp.concatenate([mean, std, mx], axis=-1)
        for i in range(2):
            h = Dense(self.hidden_dim, name=f"fc{i + 1}")(h)
            h = nn.relu(h)
            h = FastDropout(self.dropout, deterministic=not train)(h)
        return Dense(1, name="fc3")(h)


class _CNN1DBase(nn.Module):
    """Shared body of the archived CNN1D variants (128->128->256 over time)."""

    in_channels: int = 321
    dropout: float = 0.2
    pool_bins: int = 1
    spatial_dropout: bool = False
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        h = x  # (B, T, C): the reference transpose is our native layout
        for i, ch in enumerate((128, 128, 256)):
            h = Conv(ch, (3,), name=f"conv{i + 1}")(h)
            h = TorchBatchNorm(axis_name=self.axis_name, name=f"bn{i + 1}")(
                h, use_running_average=not train
            )
            h = nn.relu(h)
            if i < 2:
                if self.spatial_dropout:
                    h = ChannelDropout(self.dropout)(h, deterministic=not train)
                else:
                    h = FastDropout(self.dropout, deterministic=not train)(h)
        h = adaptive_avg_pool_1d(h, self.pool_bins)  # (B, bins, C)
        # channel-major flatten (torch flattens (B, C, bins)) so imported
        # classifier weights line up for pool_bins > 1
        h = jnp.swapaxes(h, 1, 2).reshape(h.shape[0], -1)
        return Dense(1, name="classifier")(h)


class CNN1DSpatial(_CNN1DBase):
    spatial_dropout: bool = True


class CNN1DArchive(_CNN1DBase):
    spatial_dropout: bool = False


class CNN2DSpatial(nn.Module):
    """CNN2D body with channel (Dropout2d) dropout between blocks."""

    in_features: int = 321
    base_channels: int = 32
    dropout: float = 0.2
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        bc = self.base_channels
        h = x[..., None]
        for i, ch in enumerate((bc, bc * 2, bc * 4)):
            h = Conv(ch, (3, 3), name=f"conv{i + 1}")(h)
            h = TorchBatchNorm(axis_name=self.axis_name, name=f"bn{i + 1}")(
                h, use_running_average=not train
            )
            h = nn.relu(h)
            if i < 2:
                h = avg_pool(h, (2, 1))
                h = ChannelDropout(self.dropout)(h, deterministic=not train)
        h = jnp.mean(h, axis=1)  # (B, F, C)
        h = jnp.swapaxes(h, 1, 2).reshape(h.shape[0], -1)  # channel-major
        return Dense(1, name="classifier")(h)


class _GRULayer(nn.Module):
    """Unidirectional batch-first GRU via nn.GRUCell + nn.scan."""

    hidden_size: int

    @nn.compact
    def __call__(self, x: jax.Array):  # (B, T, D) -> (B, T, H)
        scan = nn.transforms.scan(
            nn.GRUCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        carry = jnp.zeros((x.shape[0], self.hidden_size), x.dtype)
        _, ys = scan(features=self.hidden_size, name="cell")(carry, x)
        return ys


class CRNN(nn.Module):
    """CNN front-end (2 pooled blocks) + GRU back-end, last-step readout."""

    in_features: int = 321
    base_channels: int = 32
    rnn_hidden: int = 128
    num_layers: int = 1
    dropout: float = 0.3
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        bc = self.base_channels
        h = x[..., None]  # (B, T, F, 1)
        for i, ch in enumerate((bc, bc * 2)):
            h = Conv(ch, (3, 3), name=f"conv{i + 1}")(h)
            h = TorchBatchNorm(axis_name=self.axis_name, name=f"bn{i + 1}")(
                h, use_running_average=not train
            )
            h = nn.relu(h)
            h = avg_pool(h, (2, 1))
            h = FastDropout(self.dropout, deterministic=not train)(h)
        # (B, T', F, C) -> (B, T', C*F) channel-major (torch NCHW flatten)
        h = jnp.swapaxes(h, 2, 3).reshape(h.shape[0], h.shape[1], -1)
        for layer in range(self.num_layers):
            h = _GRULayer(self.rnn_hidden, name=f"gru{layer + 1}")(h)
            if layer < self.num_layers - 1:
                h = FastDropout(self.dropout, deterministic=not train)(h)
        last = h[:, -1]
        return Dense(1, name="classifier")(last)


class CRNN2(CRNN):
    num_layers: int = 2


class CNN2DRobust(nn.Module):
    """Residual-style double-conv blocks + SE attention + attention pooling."""

    in_features: int = 180
    base_channels: int = 64
    dropout: float = 0.3
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        bc = self.base_channels
        h = x[..., None]
        for i, ch in enumerate((bc, bc * 2, bc * 4)):
            for j in range(2):
                h = Conv(ch, (3, 3), name=f"block{i + 1}_conv{j + 1}")(h)
                h = TorchBatchNorm(axis_name=self.axis_name, name=f"block{i + 1}_bn{j + 1}")(
                    h, use_running_average=not train
                )
                h = nn.relu(h)
            h = avg_pool(h, (2, 1))
            h = ChannelDropout(self.dropout)(h, deterministic=not train)

        # Squeeze-and-excitation over channels
        c = bc * 4
        se = jnp.mean(h, axis=(1, 2), keepdims=True)  # (B,1,1,C)
        se = Conv(c // 16, (1, 1), name="se_fc1")(se)
        se = nn.relu(se)
        se = Conv(c, (1, 1), name="se_fc2")(se)
        se = nn.sigmoid(se)
        h = h * se

        h = jnp.mean(h, axis=2)  # average over the feature axis -> (B, T', C)
        attn = Dense(1, name="attention_pool")(h)  # (B, T', 1)
        attn = nn.softmax(attn, axis=1)
        h = jnp.sum(h * attn, axis=1)  # (B, C)

        h = FastDropout(self.dropout, deterministic=not train)(h)
        h = Dense(256, name="head_fc1")(h)
        h = nn.relu(h)
        h = FastDropout(self.dropout, deterministic=not train)(h)
        return Dense(1, name="head_fc2")(h)
