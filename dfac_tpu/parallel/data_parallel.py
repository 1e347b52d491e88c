"""Explicit shard_map data-parallel train step.

The hand-scheduled alternative to the GSPMD path: the batch is split over
the 'data' mesh axis, each shard runs the full model locally, BatchNorm
batch statistics sync with ``lax.pmean`` (via ``axis_name='data'`` in
:class:`dfac_tpu.models.common.TorchBatchNorm`), and gradients/losses are
``psum``'d over ICI before the (replicated) optimizer update. Numerically
equivalent to single-device training on the concatenated batch when
dropout and augmentation are off (test-enforced); with them on, each
shard deliberately draws independent masks (the shard index is folded
into the keys below), so losses match single-device runs in expectation
but not bit-for-bit.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from dfac_tpu.train.optim import smooth_labels


def make_shard_map_train_step(
    model: Any,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    swap_tf: bool = True,
    label_smoothing: float = 0.0,
    augment_fn: Callable | None = None,
    axis_name: str = "data",
    bn_frozen: bool = False,
):
    """Build a jit'd shard_map DP train step over ``mesh``'s 'data' axis.

    The model must be built with ``axis_name='data'`` so its BatchNorm
    layers pmean their statistics — giving bit-parity with global-batch
    training (SURVEY.md §7 hard part c).

    ``bn_frozen=True`` builds the freeze-tail variant (BatchNorm runs on
    its replicated running stats and stops updating them — no stat pmean
    either): the ``--train-fast`` / ``--bn-freeze-after`` recipe on the DP
    paths, quality-gated in ``results/train_fast_ab.md``.
    """

    def per_shard(state, feats, labels, weights):
        next_key, aug_key, drop_key = jax.random.split(state.key, 3)
        # Same key on every shard would correlate masks; fold in the shard
        # index so each shard draws independently (the reference draws per
        # DataLoader batch; per-shard draws match its per-batch granularity
        # at global-batch = shard batches). Applies to BOTH the augment and
        # the dropout chains — a replicated drop_key would zero identical
        # activation positions on every shard (detector_loop.py:159 and
        # cae_loop.py's DP steps fold the same way).
        drop_key = jax.random.fold_in(drop_key, jax.lax.axis_index(axis_name))
        x = jnp.transpose(feats, (0, 2, 1)) if swap_tf else feats
        if augment_fn is not None:
            aug_key = jax.random.fold_in(aug_key, jax.lax.axis_index(axis_name))
            x = augment_fn(aug_key, x)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            extra = {"bn_frozen": True} if bn_frozen else {}
            out, mutated = model.apply(
                variables, x, train=True, mutable=["batch_stats"],
                rngs={"dropout": drop_key}, **extra,
            )
            logits = (out[0] if isinstance(out, tuple) else out).reshape(-1)
            per = optax.sigmoid_binary_cross_entropy(
                logits, smooth_labels(labels, label_smoothing)
            )
            # Local weighted SUM only: params enter replicated (P()), so
            # shard_map's AD inserts the cross-shard psum on their cotangents
            # automatically — grads come out as the gradient of the *global*
            # sum on every shard. One division by the global count turns
            # them into the exact global-batch mean gradient.
            return jnp.sum(per * weights), mutated

        (local_loss_sum, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        count = jax.lax.psum(jnp.sum(weights), axis_name)
        denom = jnp.maximum(count, 1.0)
        grads = jax.tree.map(lambda g: g / denom, grads)
        loss_sum = jax.lax.psum(local_loss_sum, axis_name)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=mutated.get("batch_stats", state.batch_stats),
            opt_state=new_opt_state,
            key=next_key,
        )
        return new_state, loss_sum, count

    state_spec = P()  # params/opt_state/batch_stats/key replicated
    data_spec = P(axis_name)

    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(state_spec, data_spec, data_spec, data_spec),
        out_specs=(state_spec, P(), P()),
    )
    return jax.jit(sharded)


def make_sharded_eval_step(model: Any, mesh: Mesh, swap_tf: bool = True, axis_name: str = "data"):
    """shard_map inference: each shard scores its slice; outputs stay
    sharded over 'data' (gather happens implicitly on host fetch)."""

    def per_shard(variables, feats):
        x = jnp.transpose(feats, (0, 2, 1)) if swap_tf else feats
        out = model.apply(variables, x)
        logits = (out[0] if isinstance(out, tuple) else out).reshape(-1)
        return logits

    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=P(axis_name),
    )
    return jax.jit(sharded)
