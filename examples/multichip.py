#!/usr/bin/env python3
"""Runnable multi-chip demo: sharded serving + data-parallel training.

Shows the two scaling products of dfac-tpu on a ``jax.sharding.Mesh``:

1. **Sharded end-to-end serving** — the headline raw-waveform -> LFCC ->
   CNN2D -> sigmoid chain ``shard_map``-ped over the mesh's 'data' axis
   (:func:`dfac_tpu.parallel.serving.make_sharded_e2e_scorer`). Scores are
   embarrassingly parallel, so throughput scales linearly over ICI.
2. **shard_map data-parallel training** — exact global-batch gradients via
   psum'd cotangents and axis-synced BatchNorm statistics
   (:func:`dfac_tpu.parallel.data_parallel.make_shard_map_train_step`),
   numerically identical to single-device training on the same global batch
   (asserted below and in ``tests/test_parallel.py``).

On a real multi-chip TPU slice this runs as-is. Without one, it forces an
8-device virtual CPU mesh, which is how the test suite and the driver's
``dryrun_multichip`` validate the same code paths:

    python examples/multichip.py
"""

import os
import sys

# runnable from a repo checkout without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Force a virtual 8-CPU mesh when no multi-chip backend is available.
# (Must happen before jax initializes; jax.devices("cpu") picks the flag up
# lazily even if another backend is the default.)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # sitecustomize-registered accelerator plugins pin jax_platforms,
    # silently overriding the env var; re-assert the user's choice (and
    # avoid hanging on an unreachable accelerator relay).
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from dfac_tpu.features.lfcc import LFCCConfig
from dfac_tpu.models import build_model
from dfac_tpu.parallel.data_parallel import make_shard_map_train_step
from dfac_tpu.parallel.serving import make_sharded_e2e_scorer
from dfac_tpu.train.loop import TrainState
from dfac_tpu.utils.rng import train_key


def get_mesh(n: int = 8):
    devices = jax.devices()
    if len(devices) < n:
        devices = jax.devices("cpu")[:n]
    return jax.sharding.Mesh(np.array(devices[:n]), ("data",))


def main():
    mesh = get_mesh(8)
    print(f"mesh: {mesh.shape} on {mesh.devices.flat[0].platform}")

    # ── 1. sharded end-to-end serving ────────────────────────────────
    cfg = LFCCConfig(n_filters=24, n_ceps=12)  # small geometry for the demo
    model = build_model("cnn2d", in_features=36)
    waves = np.random.default_rng(0).normal(size=(64, cfg.num_samples(41))).astype(np.float32)
    variables = model.init({"params": jax.random.key(0)}, jnp.zeros((1, 41, 36), jnp.float32))

    scorer = make_sharded_e2e_scorer(model, mesh, cfg, frontend="fft")
    dev = mesh.devices.flat[0]
    scores = scorer(
        jax.device_put(variables, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())),
        jax.device_put(
            jnp.asarray(waves),
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")),
        ),
    )
    print(f"sharded e2e scores: shape={scores.shape}, mean={float(scores.mean()):.4f}")

    # ── 2. shard_map data-parallel training step ─────────────────────
    dp_model = build_model("cnn2d", in_features=36, axis_name="data")
    tx = optax.adamw(1e-3)
    feats = np.random.default_rng(1).normal(size=(64, 36, 41)).astype(np.float32)
    labels = (np.arange(64) % 2).astype(np.float32)
    v0 = dp_model.init({"params": jax.random.key(0)}, jnp.zeros((1, 41, 36), jnp.float32))
    state = TrainState(
        params=v0["params"], batch_stats=v0.get("batch_stats", {}),
        opt_state=tx.init(v0["params"]), key=train_key(0),
    )
    repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    shard = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    state = jax.device_put(state, repl)

    dp_step = make_shard_map_train_step(dp_model, tx, mesh)
    state, loss, count = dp_step(
        state,
        jax.device_put(jnp.asarray(feats), shard),
        jax.device_put(jnp.asarray(labels), shard),
        jax.device_put(jnp.ones(64, jnp.float32), shard),
    )
    print(
        f"dp train step: global-batch mean loss={float(loss) / max(float(count), 1):.4f} "
        f"over {int(count)} utts"
    )

    # ── 3. chunked streaming x DP (corpora larger than aggregate HBM) ──
    # host gathers G-batch chunks off the (memmap-able) corpus, uploads
    # them pre-sharded over 'data', device scans each chunk as ONE dispatch
    from dfac_tpu.train.chunked import stream_chunks
    from dfac_tpu.train.loop import make_dp_chunk_scan

    chunk_scan = make_dp_chunk_scan(
        dp_model, tx, mesh, swap_tf=True, label_smoothing=0.0, augment_fn=None
    )
    order = np.random.default_rng(2).permutation(64)
    chunks = stream_chunks(
        feats, (labels,), order, batch_size=16, chunk_batches=2, mesh=mesh
    )
    # stream_chunks already prefetches its host stage in a worker thread
    for ci, full, tail in chunks:
        state, loss_sum, count = chunk_scan(state, *full)
        print(f"chunk {ci}: {int(count)} utts in one dispatch, "
              f"mean loss={float(loss_sum) / float(count):.4f}")
        assert tail is None  # 64 rows / 16 = no partial batch
    print("done — all three paths ran over the", mesh.shape, "mesh")


if __name__ == "__main__":
    main()
