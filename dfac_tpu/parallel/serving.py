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
        if frontend == "gemm":
            from dfac_tpu.ops.pallas.gemm_frontend import gemm_lfcc_features

            feats = gemm_lfcc_features(waves, cfg)
        else:
            feats = lfcc_features(waves, cfg, use_pallas=False)
        x = jnp.transpose(feats, (0, 2, 1))
        out = model.apply(variables, x)
        logits = (out[0] if isinstance(out, tuple) else out).reshape(-1)
        return jax.nn.sigmoid(logits) if apply_sigmoid else logits

    return jax.jit(
        shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P(axis_name)),
            out_specs=P(axis_name),
        )
    )
