"""Visualizer factory with graceful degradation.

Feature-parity target: reference ``src/visualizers/__init__.py:25-60`` —
``create_visualizer('rich'|'tqdm'|'noop')`` with ImportError fallback chain
rich -> tqdm -> noop.
"""

from __future__ import annotations

from dfac_tpu.obs.base import TrainingVisualizer
from dfac_tpu.obs.noop import NoOpVisualizer


def create_visualizer(kind: str = "rich") -> TrainingVisualizer:
    if kind == "noop":
        return NoOpVisualizer()
    if kind == "rich":
        try:
            from dfac_tpu.obs.rich_visualizer import RichVisualizer

            return RichVisualizer()
        except ImportError:
            kind = "tqdm"
    if kind == "tqdm":
        try:
            from dfac_tpu.obs.tqdm_visualizer import TqdmVisualizer

            return TqdmVisualizer()
        except ImportError:
            return NoOpVisualizer()
    raise ValueError(f"unknown visualizer '{kind}' (rich|tqdm|noop)")
