"""Device mesh construction + sharding rules.

The reference is strictly single-device (SURVEY.md §2 parallelism audit);
parallelism here is a new first-class TPU-native subsystem:

* 1-D or 2-D ``jax.sharding.Mesh`` over ``('data', 'model')`` — data
  parallelism over the utterance batch rides ICI; the wide classifier head
  (CNN2D's Linear(23040, 1)) is tensor-sharded over ``'model'``.
* Under jit + ``NamedSharding`` annotations, the GSPMD partitioner inserts
  the collectives (all-reduce for BatchNorm batch stats and the classifier
  contraction, all-gather where layouts change) — the scaling-book recipe:
  pick a mesh, annotate shardings, let XLA do the rest.
* An explicit ``shard_map`` data-parallel step (see
  :mod:`dfac_tpu.parallel.data_parallel`) is provided as the hand-scheduled
  alternative with per-shard control (psum'd grads, axis_name batch stats).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None, n_model: int = 1, devices: list | None = None
) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults to all devices on 'data'."""
    devices = devices if devices is not None else jax.devices()
    if n_model < 1:
        raise ValueError(f"n_model must be >= 1, got {n_model}")
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data < 1 or n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {max(n_data, 1) * n_model} devices, "
            f"only {len(devices)} available"
        )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_constrainer(mesh: Mesh | None):
    """Sharding-constraint closure for GSPMD data parallelism: annotate an
    in-program batch's leading axis onto the mesh's 'data' axis so the
    partitioner shards the surrounding compute across devices (and inserts
    the psums for grads / BatchNorm batch stats — the scaling-book recipe).
    ``mesh=None`` returns identity, so call sites stay mesh-agnostic."""
    if mesh is None:
        return lambda x: x
    sh = NamedSharding(mesh, P("data"))
    return lambda x: jax.lax.with_sharding_constraint(x, sh)


def replicated_jit(fn, mesh: Mesh | None):
    """jit with fully-replicated out_shardings when a mesh is given — on a
    multi-host mesh the host loop must be able to read every output
    (losses, re-fed state) from its local shards. ``mesh=None`` is plain
    ``jax.jit``."""
    if mesh is None:
        return jax.jit(fn)
    return jax.jit(fn, out_shardings=replicate(mesh))


def shard_model_params(
    params: Any, mesh: Mesh, min_shard_elems: int = 4096, placer=jax.device_put
) -> Any:
    """Tensor-parallel placement rule for this model family.

    Matrices whose input dim divides the 'model' axis and is large enough
    (the classifier heads: 23,040 x 1 for CNN2D) are sharded over 'model' on
    dim 0 (row/contraction parallelism — each shard holds a slice of the
    input features; XLA turns the matmul into partial products + psum).
    Everything else (small conv kernels, BN vectors) is replicated —
    broadcast cost is negligible next to HBM savings being irrelevant here.

    ``placer(x, sharding)`` performs the placement. The default
    ``jax.device_put`` only reaches process-addressable devices; on a
    multi-host mesh pass :func:`dfac_tpu.parallel.multihost.put_global`.
    """
    n_model = mesh.shape["model"]

    def place(x):
        if (
            n_model > 1
            and hasattr(x, "ndim")
            and x.ndim == 2
            and x.shape[0] % n_model == 0
            and x.size >= min_shard_elems
        ):
            return placer(x, NamedSharding(mesh, P("model", None)))
        return placer(x, replicate(mesh))

    return jax.tree.map(place, params)


def shard_train_state(
    state, mesh: Mesh, min_shard_elems: int = 4096, placer=jax.device_put
):
    """Place a TrainState on the mesh: params/opt_state under the
    tensor-parallel rule, batch_stats replicated, PRNG key replicated.
    ``placer`` as in :func:`shard_model_params`."""
    rep = replicate(mesh)
    return state.replace(
        params=shard_model_params(state.params, mesh, min_shard_elems, placer),
        batch_stats=jax.tree.map(lambda x: placer(x, rep), state.batch_stats),
        opt_state=shard_model_params(state.opt_state, mesh, min_shard_elems, placer),
        key=placer(state.key, rep),
    )
