from dfac_tpu.obs.base import (  # noqa: F401
    BatchContext,
    BatchMetrics,
    EpochMetrics,
    TrainingConfig,
    TrainingVisualizer,
)
from dfac_tpu.obs.factory import create_visualizer  # noqa: F401
from dfac_tpu.obs.noop import NoOpVisualizer  # noqa: F401
