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
from typing import Any, Callable

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


def collect_masked_scores(
    score_batch: Callable,
    ds: ArrayDataset,
    batch_size: int,
    prepare_batch: Callable | None = None,
    prefetch: int = 2,
    n_outputs: int = 1,
    gather: Callable | None = None,
    stats=None,
) -> np.ndarray:
    """Run ``score_batch(batch) -> (B,) device scores`` over every padded
    batch, keep results on device, then do ONE host fetch and drop the
    pad rows. The shared batching/tail-mask contract of every corpus
    scorer (a host round trip per batch dominates on remote accelerators).

    ``prepare_batch`` (optional) runs the host stage of ingest — memmap
    row pull, bf16 cast — and its output replaces the batch as
    ``score_batch``'s argument. It executes in a background thread
    (``io.prefetch.prefetched``, depth ``prefetch``), so host assembly of
    batch k+1 overlaps device scoring of batch k — the torch-DataLoader
    worker overlap of the reference serving loop, one thread because the
    heavy host stages release the GIL.

    With ``n_outputs > 1`` the scorer returns a TUPLE of per-row arrays
    (e.g. the hybrid scorer's supervised scores + CAE MSE) and the result
    is the tuple of masked concatenations.

    ``gather`` (optional) converts the concatenated device scores to a host
    array (default ``np.asarray``); multi-host callers pass
    :func:`dfac_tpu.parallel.multihost.gather_rows`, which allgathers rows
    whose shards live on other hosts.

    ``stats`` (optional :class:`dfac_tpu.io.prefetch.PrefetchStats`)
    records host-wait vs device-wait time, so callers can report whether
    the run was ingest-bound or device-bound."""
    from dfac_tpu.io.prefetch import prefetched

    to_host = gather if gather is not None else np.asarray

    def produce():
        for batch in batch_iterator(ds, batch_size):
            prepared = prepare_batch(batch) if prepare_batch is not None else batch
            yield prepared, batch.weights > 0

    chunks, masks = [], []
    for prepared, mask in prefetched(produce(), depth=prefetch, stats=stats):
        chunks.append(score_batch(prepared))
        masks.append(mask)
    if not chunks:
        empty = np.zeros((0,), np.float32)
        return empty if n_outputs == 1 else (empty,) * n_outputs
    keep = np.concatenate(masks)
    # the device dispatches above are async: whatever compute is still in
    # flight when ingest finishes drains HERE, in the one host fetch. That
    # drain is the device-bound share of the wall clock — fold it into the
    # stats so host-bound vs device-bound is decidable from the counters.
    import time as _time

    t0 = _time.perf_counter()
    if n_outputs > 1:
        out = tuple(
            to_host(jnp.concatenate([c[i] for c in chunks]))[keep]
            for i in range(n_outputs)
        )
    else:
        out = to_host(jnp.concatenate(chunks))[keep]
    if stats is not None:
        stats.device_wait_s += _time.perf_counter() - t0
    return out


def predict_scores(
    model: Any,
    variables: dict,
    ds: ArrayDataset,
    batch_size: int = 128,
    swap_tf: bool = True,
    apply_sigmoid: bool = False,
    mesh=None,
) -> np.ndarray:
    """Score every utterance; returns (N,) float32 in dataset order.

    Per-batch results stay on device; one concatenated fetch at the end
    (a host round trip per batch dominates on remote accelerators).

    With ``mesh`` (a ``jax.sharding.Mesh`` with a 'data' axis), every batch
    is sharded over the mesh's data axis and GSPMD parallelizes the forward
    across devices — batch_size must divide by the axis size.
    """
    shard = None
    if mesh is not None:
        from dfac_tpu.parallel.mesh import batch_sharding, replicate

        if batch_size % mesh.shape["data"] != 0:
            raise ValueError("batch_size must divide over the mesh data axis")
        shard = batch_sharding(mesh)
        variables = jax.device_put(variables, replicate(mesh))

    def put(x):
        arr = jnp.asarray(x)
        return jax.device_put(arr, shard) if shard is not None else arr

    def score_batch(batch):
        scores, _ = _eval_step(
            model, variables, put(batch.features), put(batch.labels),
            put(batch.weights), swap_tf, apply_sigmoid, 0.0,
        )
        return scores

    return collect_masked_scores(score_batch, ds, batch_size)


def eer_counts_masked(scores, labels, wmask):
    # Exact EER on the weighted subset: padded rows get -inf scores and
    # weight 0, so they occupy the bottom of the sort and contribute 0
    # to both cumulative counts.
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    masked_scores = jnp.where(wmask > 0, scores, neg_inf)
    order = jnp.argsort(masked_scores, stable=True)
    s = masked_scores[order]
    l = (labels * wmask)[order].astype(jnp.int32)
    w = wmask[order].astype(jnp.int32)
    n_bona = jnp.sum(l)
    n_total = jnp.sum(w)
    n_spoof = n_total - n_bona
    pad = jnp.zeros((1,), jnp.int32)
    cum_spoof = jnp.concatenate([pad, jnp.cumsum((1 - l) * w, dtype=jnp.int32)])
    cum_bona = jnp.concatenate([pad, jnp.cumsum(l, dtype=jnp.int32)])
    far_num = n_spoof - cum_spoof
    frr_num = cum_bona
    # exact |n_bona*far - n_spoof*frr| in emulated u64 (ops/wideint):
    # int32 products wrap once ns*nb >= 2^31 (~92k balanced rows),
    # which would corrupt the crossing argmin on large dev splits
    from dfac_tpu.ops import wideint as wi

    a_hi, a_lo = wi.mul_u32(wi.to_u32(n_bona), wi.to_u32(far_num))
    b_hi, b_lo = wi.mul_u32(wi.to_u32(n_spoof), wi.to_u32(frr_num))
    d_hi, d_lo = wi.abs_diff_u64(a_hi, a_lo, b_hi, b_lo)
    # exclude sentinel positions that precede real data: positions
    # 0..n_pad correspond to thresholds below every real score; the
    # reference curve starts at index 0 == FAR 1 / FRR 0 which is
    # position n_pad here. Masking earlier positions with the max u64
    # keeps the argmin on the real curve.
    n_pad = (jnp.asarray(w.shape[0], jnp.int32) - n_total)
    pos = jnp.arange(w.shape[0] + 1)
    u32max = jnp.uint32(0xFFFFFFFF)
    d_hi = jnp.where(pos >= n_pad, d_hi, u32max)
    d_lo = jnp.where(pos >= n_pad, d_lo, u32max)
    eer_idx = wi.argmin_u64_first(d_hi, d_lo)
    from dfac_tpu.ops.eer import THRESHOLD_EPSILON

    threshold = jnp.where(
        eer_idx == n_pad,
        s[n_pad] - THRESHOLD_EPSILON,
        jnp.where(
            eer_idx == w.shape[0],
            s[-1] + THRESHOLD_EPSILON,
            s[jnp.maximum(eer_idx - 1, 0)],
        ),
    )
    return far_num[eer_idx], frr_num[eer_idx], n_spoof, n_bona, threshold


def make_resident_evaluator(
    model: Any,
    swap_tf: bool = True,
    apply_sigmoid: bool = False,
    label_smoothing: float = 0.0,
    mesh=None,
):
    """Whole-split evaluation as ONE device program over a resident corpus.

    ``lax.scan`` over batch indices -> logits, weighted loss sum, and the
    exact EER crossing counts (:func:`eer_counts_masked`) all inside a
    single jit — one dispatch and a few scalars fetched per epoch,
    instead of re-transferring the dev features every evaluation.

    The in-jit crossing search uses exact emulated-u64 products
    (``ops/wideint.py``), bit-exact at any dev-split size below 2^31 rows.

    With ``mesh``, each scanned batch is sharding-constrained onto the
    mesh's 'data' axis (GSPMD data-parallel eval across the mesh — pods
    included) and all outputs are replicated so every host can read them.
    """
    from dfac_tpu.parallel.mesh import batch_constrainer, replicated_jit

    constrain = batch_constrainer(mesh)

    def evaluate(variables, feats_all, labels_all, idx_mat, w_mat):
        def body(loss_acc, xs):
            idx, w = xs
            feats = constrain(jnp.take(feats_all, jnp.maximum(idx, 0), axis=0))
            labels = constrain(jnp.take(labels_all, jnp.maximum(idx, 0), axis=0))
            x = jnp.transpose(feats, (0, 2, 1)) if swap_tf else feats
            out = model.apply(variables, x)
            logits = (out[0] if isinstance(out, tuple) else out).reshape(-1)
            per = optax.sigmoid_binary_cross_entropy(
                logits, smooth_labels(labels, label_smoothing)
            )
            scores = jax.nn.sigmoid(logits) if apply_sigmoid else logits
            return loss_acc + jnp.sum(per * w), scores

        loss_sum, scores = jax.lax.scan(body, jnp.zeros(()), (idx_mat, w_mat))
        flat_scores = scores.reshape(-1)
        flat_w = w_mat.reshape(-1)
        flat_idx = idx_mat.reshape(-1)
        flat_labels = jnp.take(labels_all, jnp.maximum(flat_idx, 0), axis=0)
        return loss_sum, flat_scores, eer_counts_masked(flat_scores, flat_labels, flat_w)

    return replicated_jit(evaluate, mesh)


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
