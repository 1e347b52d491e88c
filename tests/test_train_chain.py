"""Parity tests for the hand-scheduled CNN2D training core
(``dfac_tpu/ops/train_chain.py``) against the flax + jax.grad path.

Three layers of checks:
  1. forward parity vs ``model.apply(train=True)`` at dropout 0 (identical
     op order -> tight tolerances), including batch-stat updates;
  2. the hand backward vs ``jax.grad`` of the module's OWN forward — exact
     for any dropout rate/dtype (this is the guard that lets the backward's
     pass structure be rescheduled safely);
  3. end-to-end grads vs the flax ``value_and_grad`` at dropout 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dfac_tpu.models import build_model
from dfac_tpu.ops.train_chain import (
    cnn2d_hand_loss_and_grad,
    cnn2d_train_backward,
    cnn2d_train_forward,
    running_stats_update,
)
from dfac_tpu.train.optim import smooth_labels

B, T, F = 6, 33, 20


@pytest.fixture(scope="module")
def setup():
    # dropout=0 twin for flax-side comparisons (flax would otherwise apply
    # its own 0.2-rate masks; params are identical for the same init key)
    model = build_model("cnn2d", in_features=F, base_channels=8, dropout=0.0)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))
    labels = jnp.asarray((rng.random(B) > 0.5).astype(np.float32))
    weights = jnp.asarray([1.0] * (B - 2) + [1.0, 0.0], jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    return model, variables, x, labels, weights


def _flax_loss(model, variables, x, labels, weights, drop_key, ls=0.0):
    def loss_fn(params):
        out, mutated = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"], rngs={"dropout": drop_key},
        )
        logits = out.reshape(-1)
        per = optax.sigmoid_binary_cross_entropy(logits, smooth_labels(labels, ls))
        loss = jnp.sum(per * weights) / jnp.maximum(jnp.sum(weights), 1.0)
        return loss, mutated

    return loss_fn


def test_forward_parity_no_dropout(setup):
    model, variables, x, labels, weights = setup
    keys = jax.random.split(jax.random.key(1), 2)
    loss, aux = cnn2d_train_forward(
        variables["params"], x, keys, labels, weights, dropout_rate=0.0
    )
    (loss_ref, mutated), _ = jax.value_and_grad(
        _flax_loss(model, variables, x, labels, weights, jax.random.key(1)),
        has_aux=True,
    )(variables["params"])
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-6)

    new_stats = running_stats_update(variables["batch_stats"], aux)
    for i in (1, 2, 3):
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(new_stats[f"bn{i}"][k]),
                np.asarray(mutated["batch_stats"][f"bn{i}"][k]),
                rtol=1e-5, atol=1e-7,
                err_msg=f"bn{i}.{k} running update mismatch",
            )


@pytest.mark.parametrize("rate", [0.0, 0.2])
@pytest.mark.parametrize("dt", [None, jnp.bfloat16])
def test_hand_backward_matches_autodiff(setup, rate, dt):
    _, variables, x, labels, weights = setup
    keys = jax.random.split(jax.random.key(2), 2)

    def fwd(params):
        return cnn2d_train_forward(
            params, x, keys, labels, weights,
            dropout_rate=rate, compute_dtype=dt,
        )

    (loss, aux), ad_grads = jax.value_and_grad(fwd, has_aux=True)(
        variables["params"]
    )
    hand = cnn2d_train_backward(
        variables["params"], aux, x, labels, weights,
        dropout_rate=rate, compute_dtype=dt,
    )
    flat_ad = jax.tree_util.tree_leaves_with_path(ad_grads)
    flat_hand, _ = jax.tree_util.tree_flatten(hand)
    assert len(flat_ad) == len(flat_hand)
    tol = 2e-2 if dt == jnp.bfloat16 else 2e-5
    gmax = max(float(np.max(np.abs(np.asarray(a)))) for _, a in flat_ad)
    for (path, a), h in zip(flat_ad, flat_hand):
        key = jax.tree_util.keystr(path)
        if dt == jnp.bfloat16 and "conv" in key and "bias" in key:
            # d loss/d conv-bias is exactly 0 through train-mode BN; in
            # bf16 AD sums the bf16-rounded cotangent (noise ~1e-2) while
            # the hand path sums the f32 cotangent before the cast
            # (noise ~1e-7) — comparing two roundings of zero is moot.
            assert float(np.max(np.abs(np.asarray(h)))) < 1e-4 * (gmax + 1e-12)
            continue
        a, h = np.asarray(a, np.float64), np.asarray(h, np.float64)
        # absolute tolerance scaled by the LARGEST grad in the tree: conv
        # bias grads are pure rounding noise (train-mode BN cancels the
        # bias), so per-leaf relative checks would compare noise to noise
        np.testing.assert_allclose(
            h, a, atol=tol * (gmax + 1e-12), rtol=tol,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_end_to_end_vs_flax_grads(setup):
    model, variables, x, labels, weights = setup
    (loss_ref, _), ref_grads = jax.value_and_grad(
        _flax_loss(model, variables, x, labels, weights, jax.random.key(3)),
        has_aux=True,
    )(variables["params"])

    keys = jax.random.split(jax.random.key(3), 2)
    (loss, _), grads = cnn2d_hand_loss_and_grad(
        variables["params"], variables["batch_stats"], x, keys, labels,
        weights, dropout_rate=0.0,
    )
    # dropout 0 on both sides -> same math, same op order
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-6)
    ref_flat = jax.tree_util.tree_leaves_with_path(ref_grads)
    hand_flat = jax.tree_util.tree_leaves(grads)
    gmax = max(float(np.max(np.abs(np.asarray(a)))) for _, a in ref_flat)
    for (path, a), h in zip(ref_flat, hand_flat):
        a, h = np.asarray(a, np.float64), np.asarray(h, np.float64)
        np.testing.assert_allclose(
            h, a, atol=1e-5 * (gmax + 1e-12), rtol=1e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_make_train_step_dispatch():
    """CNN2D (single-device) gets the hand-scheduled step; DP-BN models and
    other architectures keep the flax-AD step."""
    import optax as _optax

    from dfac_tpu.train.loop import make_train_step

    tx = _optax.adam(1e-3)
    hand = make_train_step(
        build_model("cnn2d", in_features=F, base_channels=8),
        tx, False, 0.0, None,
    )
    assert "hand" in hand.__wrapped__.__name__

    dp = make_train_step(
        build_model("cnn2d", in_features=F, base_channels=8, axis_name="data"),
        tx, False, 0.0, None,
    )
    assert "hand" not in dp.__wrapped__.__name__

    other = make_train_step(
        build_model("cnn1d", in_features=F), tx, False, 0.0, None,
    )
    assert "hand" not in other.__wrapped__.__name__
