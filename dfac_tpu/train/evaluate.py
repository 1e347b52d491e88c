"""Batched evaluation / scoring.

Feature-parity target: reference ``src/evaluation.py:51-104`` ``evaluate()``:
run a classifier over a labeled split, return ``{avg_loss, eer, threshold}``
plus raw scores and labels. TPU-native: the per-batch forward + loss is one
jit'd function; scores accumulate on device; the EER crossing search runs on
device (:func:`dfac_tpu.ops.eer.eer_device`) with the two final divisions on
host for float64 exactness.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dfac_tpu.data.pipeline import ArrayDataset, batch_iterator
from dfac_tpu.ops.eer import eer_device
from dfac_tpu.train.optim import smooth_labels


@functools.partial(jax.jit, static_argnames=("model", "swap_tf", "apply_sigmoid", "label_smoothing"))
def _eval_step(model, variables, feats, labels, weights, swap_tf, apply_sigmoid, label_smoothing):
    x = jnp.transpose(feats, (0, 2, 1)) if swap_tf else feats
    out = model.apply(variables, x)
    logits = out[0] if isinstance(out, tuple) else out
    logits = logits.reshape(-1)
    per = optax.sigmoid_binary_cross_entropy(logits, smooth_labels(labels, label_smoothing))
    loss_sum = jnp.sum(per * weights)
    scores = jax.nn.sigmoid(logits) if apply_sigmoid else logits
    return scores, loss_sum


def predict_scores(
    model: Any,
    variables: dict,
    ds: ArrayDataset,
    batch_size: int = 128,
    swap_tf: bool = True,
    apply_sigmoid: bool = False,
) -> np.ndarray:
    """Score every utterance; returns (N,) float32 in dataset order.

    Per-batch results stay on device; one concatenated fetch at the end
    (a host round trip per batch dominates on remote accelerators).
    """
    chunks, masks = [], []
    for batch in batch_iterator(ds, batch_size):
        scores, _ = _eval_step(
            model, variables, jnp.asarray(batch.features), jnp.asarray(batch.labels),
            jnp.asarray(batch.weights), swap_tf, apply_sigmoid, 0.0,
        )
        chunks.append(scores)
        masks.append(batch.weights > 0)
    if not chunks:
        return np.zeros((0,), np.float32)
    flat = np.asarray(jnp.concatenate(chunks))
    return flat[np.concatenate(masks)]


def evaluate_classifier(
    model: Any,
    variables: dict,
    ds: ArrayDataset,
    batch_size: int = 128,
    swap_tf: bool = True,
    apply_sigmoid: bool = False,
    label_smoothing: float = 0.0,
    with_loss: bool = True,
) -> tuple[dict, np.ndarray, np.ndarray]:
    """Returns ``(metrics, scores, labels)`` like the reference ``evaluate``."""
    if ds.labels is None:
        raise ValueError("evaluate_classifier needs a labeled dataset")
    all_scores, masks = [], []
    loss_sum = jnp.zeros(())  # lazy device accumulation — one fetch at the end
    count = 0
    for batch in batch_iterator(ds, batch_size):
        scores, batch_loss_sum = _eval_step(
            model, variables, jnp.asarray(batch.features), jnp.asarray(batch.labels),
            jnp.asarray(batch.weights), swap_tf, apply_sigmoid, label_smoothing,
        )
        all_scores.append(scores)
        masks.append(batch.weights > 0)
        loss_sum = loss_sum + batch_loss_sum
        count += int(batch.weights.sum())

    if all_scores:
        scores = np.asarray(jnp.concatenate(all_scores))[np.concatenate(masks)]
    else:
        scores = np.zeros((0,), np.float32)
    labels = np.asarray(ds.labels)
    eer, threshold = (None, None)
    if len(scores):
        eer, threshold = eer_device(scores, labels)
    metrics = {
        "avg_loss": (float(loss_sum) / count) if (with_loss and count) else None,
        "eer": eer,
        "threshold": threshold,
    }
    return metrics, scores, labels
