"""Checkpoint score ensembling.

Feature-parity target: reference ``src/ensemble.py`` — load N ``arch:path``
checkpoints, score a shared (unshuffled) split with sigmoid probabilities
per model, ensemble by simple mean, report per-model and ensemble EER.
"""

from __future__ import annotations

import numpy as np

from dfac_tpu.data.pipeline import ArrayDataset
from dfac_tpu.models import build_model
from dfac_tpu.train.checkpoint import load_model_variables
from dfac_tpu.train.evaluate import predict_scores


def score_checkpoints(
    specs: list[tuple[str, str]],
    ds: ArrayDataset,
    batch_size: int = 128,
    swap_tf: bool = True,
    in_features: int = 180,
) -> dict[str, np.ndarray]:
    """``specs``: list of (arch, checkpoint_path). Returns sigmoid scores per
    spec keyed by ``"{arch}:{path}"``; a spec listed k times gets ``#2``...
    suffixes so the mean weights it k times like the reference's list
    (``src/ensemble.py:106-121``) — a dict collapse would silently drop
    the duplicate."""
    out = {}
    for arch, path in specs:
        model = build_model(arch, in_features=in_features)
        variables = load_model_variables(path, model_name=arch)
        key = base = f"{arch}:{path}"
        k = 2
        while key in out:
            key = f"{base}#{k}"
            k += 1
        out[key] = predict_scores(
            model, variables, ds, batch_size=batch_size, swap_tf=swap_tf, apply_sigmoid=True
        )
    return out


def ensemble_scores(per_model_scores: dict[str, np.ndarray] | list[np.ndarray]) -> np.ndarray:
    """Simple mean across models (reference ``src/ensemble.py:121``)."""
    arrs = list(per_model_scores.values()) if isinstance(per_model_scores, dict) else list(per_model_scores)
    if not arrs:
        raise ValueError("no scores to ensemble")
    return np.mean(np.stack(arrs, axis=0), axis=0)
