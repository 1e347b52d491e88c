"""Multi-chip serving: the end-to-end scoring pipeline over a device mesh.

Scales the headline inference path (raw waveform -> LFCC/delta/delta-delta
-> CNN -> sigmoid) across chips with ``shard_map`` over the 'data' axis:
each chip runs the full fused front-end + model on its slice of the
utterance batch; no collectives are needed in the forward (scores are
embarrassingly parallel), so throughput scales linearly over ICI.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from dfac_tpu.features.lfcc import LFCCConfig, lfcc_features


def _score_waves(model, variables, waves, cfg, frontend, apply_sigmoid):
    """One batch of raw waveforms -> scores (shared by the per-batch and
    whole-corpus sharded scorers)."""
    if frontend == "gemm":
        from dfac_tpu.ops.pallas.gemm_frontend import gemm_lfcc_features

        feats = gemm_lfcc_features(waves, cfg)
    else:
        feats = lfcc_features(waves, cfg, use_pallas=False)
    x = jnp.transpose(feats, (0, 2, 1))
    out = model.apply(variables, x)
    logits = (out[0] if isinstance(out, tuple) else out).reshape(-1)
    return jax.nn.sigmoid(logits) if apply_sigmoid else logits


def make_sharded_e2e_scorer(
    model: Any,
    mesh: Mesh,
    cfg: LFCCConfig = LFCCConfig(),
    frontend: str = "gemm",
    apply_sigmoid: bool = True,
    axis_name: str = "data",
):
    """Build a jit'd sharded scorer: (variables, waves (B, N)) -> (B,) scores.

    ``frontend``: 'gemm' (fused Pallas kernel, TPU) or 'fft' (XLA
    composition, runs anywhere). B must divide by the mesh's data axis.
    """

    def per_shard(variables, waves):
        return _score_waves(model, variables, waves, cfg, frontend, apply_sigmoid)

    return jax.jit(
        shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P(axis_name)),
            out_specs=P(axis_name),
        )
    )


def make_sharded_corpus_scorer(
    model: Any,
    mesh: Mesh,
    cfg: LFCCConfig = LFCCConfig(),
    frontend: str = "gemm",
    apply_sigmoid: bool = True,
    axis_name: str = "data",
):
    """Whole-corpus scoring as ONE dispatch over the mesh.

    Input: pre-batched waveforms ``(n_batches, B, n_samples)``; each shard
    runs a ``lax.scan`` over its slice of every batch, so the entire corpus
    is a single jit program — no per-batch host dispatch — sharded over
     ``axis_name``. Returns ``(n_batches * B,)`` scores in corpus order.
    Combines the two measured wins of the single-chip bench (scan over
    batches: +6% through a remote relay) and the DP serving path (linear
    scaling over ICI; scores are embarrassingly parallel, no collectives).
    B must divide by the mesh's ``axis_name`` size.
    """

    def per_shard(variables, corpus3d):
        # corpus3d: (n_batches, B/shards, n_samples) — the batch axis is
        # the sharded one so every scan step is a full local batch
        def body(_, waves):
            return None, _score_waves(model, variables, waves, cfg, frontend, apply_sigmoid)

        _, scores = jax.lax.scan(body, None, corpus3d)
        return scores  # (n_batches, B/shards)

    sharded = jax.jit(
        shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P(None, axis_name)),
            out_specs=P(None, axis_name),
        )
    )

    def score(variables, corpus3d):
        return sharded(variables, corpus3d).reshape(-1)

    return score
