"""Model registry.

``build_model(name, **overrides)`` resolves every architecture the reference
project ships (current + archived), keyed by the same names its CLIs and
benchmark harness use.
"""

from __future__ import annotations

from typing import Any

from flax import linen as nn

from dfac_tpu.models.cae import ConvAutoencoder, reconstruction_mse  # noqa: F401
from dfac_tpu.models.cnn1d import CNN1D, CNN1DVariant
from dfac_tpu.models.cnn2d import CNN2D
from dfac_tpu.models.detector import DeepfakeDetector, stats_pool  # noqa: F401
from dfac_tpu.models.zoo import (
    CNN1DArchive,
    CNN1DSpatial,
    CNN2DRobust,
    CNN2DSpatial,
    CRNN,
    CRNN2,
    MeanPoolMLP,
    StatsPoolMLP,
)

MODEL_REGISTRY: dict[str, type[nn.Module]] = {
    "cnn2d": CNN2D,
    "cnn1d": CNN1D,
    "cnn1d_variant": CNN1DVariant,
    "cae": ConvAutoencoder,
    "detector": DeepfakeDetector,
    # archived zoo
    "meanpool_mlp": MeanPoolMLP,
    "statspool_mlp": StatsPoolMLP,
    "cnn1d_spatial": CNN1DSpatial,
    "cnn1d_archive": CNN1DArchive,
    "cnn2d_spatial": CNN2DSpatial,
    "crnn": CRNN,
    "crnn2": CRNN2,
    "cnn2d_robust": CNN2DRobust,
}


def build_model(name: str, **overrides: Any) -> nn.Module:
    if name not in MODEL_REGISTRY:
        raise ValueError(f"unknown model '{name}'; choose from {sorted(MODEL_REGISTRY)}")
    cls = MODEL_REGISTRY[name]
    fields = {f for f in cls.__dataclass_fields__}  # type: ignore[attr-defined]
    kwargs = {k: v for k, v in overrides.items() if k in fields}
    return cls(**kwargs)
