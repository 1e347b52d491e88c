"""Fused Pallas conv block: interpret-mode equivalence with XLA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from dfac_tpu.ops.pallas.conv_block import (
    cnn2d_fused_scores,
    fused_conv_block,
    reference_conv_block,
)


@pytest.mark.parametrize("h,w,cin,cout,pool", [
    (64, 24, 8, 16, True),
    (33, 24, 8, 16, True),   # odd H: floor-mode pool drops the tail row
    (32, 24, 8, 16, False),
    (40, 20, 1, 8, True),    # single input channel (conv1 case)
])
def test_fused_block_matches_xla(rng, h, w, cin, cout, pool):
    x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
    wk = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    ref = reference_conv_block(x, wk, b, pool=pool)
    with pltpu.force_tpu_interpret_mode():
        got = fused_conv_block(x, wk, b, pool=pool)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_full_fused_cnn2d_scores(rng):
    from dfac_tpu.models import build_model
    from dfac_tpu.models.fast_infer import fold_cnn2d

    f_, t_ = 20, 64
    model = build_model("cnn2d", in_features=f_, base_channels=8)
    x_swapped = jnp.asarray(rng.normal(size=(2, t_, f_)).astype(np.float32))
    variables = model.init({"params": jax.random.key(0)}, x_swapped)
    ref = np.asarray(jax.nn.sigmoid(model.apply(variables, x_swapped)[:, 0]))
    folded = fold_cnn2d(variables)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(cnn2d_fused_scores(folded, x_swapped))
    np.testing.assert_allclose(got, ref, atol=2e-2)  # bf16 activations


@pytest.mark.parametrize("h,w,cin,cout,pool", [
    (64, 24, 8, 16, True),
    (33, 24, 8, 16, True),
    (32, 24, 8, 16, False),
    (40, 20, 1, 8, True),
    (96, 24, 8, 16, True),   # multiple tiles
])
def test_fused_block_v2_matches_xla(rng, h, w, cin, cout, pool):
    from dfac_tpu.ops.pallas.conv_block import fused_conv_block_v2

    x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
    wk = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    ref = reference_conv_block(x, wk, b, pool=pool)
    with pltpu.force_tpu_interpret_mode():
        got = fused_conv_block_v2(x, wk, b, pool=pool)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)
