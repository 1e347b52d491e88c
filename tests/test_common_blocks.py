"""Unit tests for the shared model building blocks (models/common.py)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfac_tpu.models.common import (
    ChannelDropout,
    ConvTranspose2dTorch,
    TorchBatchNorm,
    avg_pool,
    kaiming_uniform_init,
    torch_bias_init,
)


def test_kaiming_uniform_bounds_and_stats(rng):
    init = kaiming_uniform_init()
    shape = (3, 3, 16, 32)  # fan_in = 144
    w = np.asarray(init(jax.random.key(0), shape))
    fan_in = 3 * 3 * 16
    bound = math.sqrt(2.0 / 6.0) * math.sqrt(3.0 / fan_in)
    assert np.abs(w).max() <= bound + 1e-7
    # roughly uniform: std ~= bound/sqrt(3)
    assert np.std(w) == pytest.approx(bound / math.sqrt(3), rel=0.1)


def test_torch_bias_init_bounds():
    b = np.asarray(torch_bias_init(64)(jax.random.key(1), (32,)))
    assert np.abs(b).max() <= 1.0 / math.sqrt(64) + 1e-9


def test_avg_pool_floor_mode():
    x = jnp.arange(7 * 4, dtype=jnp.float32).reshape(1, 7, 4, 1)
    y = avg_pool(x, (2, 1))
    assert y.shape == (1, 3, 4, 1)  # floor(7/2) = 3, torch semantics
    np.testing.assert_allclose(np.asarray(y[0, 0, :, 0]), (np.arange(4) + np.arange(4, 8)) / 2)


def test_batchnorm_eval_uses_running_stats(rng):
    bn = TorchBatchNorm()
    x = jnp.asarray(rng.normal(size=(4, 6, 3)).astype(np.float32))
    variables = bn.init(jax.random.key(0), x, use_running_average=False)
    variables["batch_stats"] = {
        "mean": jnp.asarray([1.0, 2.0, 3.0]),
        "var": jnp.asarray([4.0, 4.0, 4.0]),
    }
    y = np.asarray(bn.apply(variables, x, use_running_average=True))
    expect = (np.asarray(x) - np.array([1, 2, 3])) / np.sqrt(4.0 + 1e-5)
    np.testing.assert_allclose(y, expect, atol=1e-5)


def test_batchnorm_train_updates_unbiased_running_var(rng):
    bn = TorchBatchNorm(momentum=0.1)
    x = jnp.asarray(rng.normal(size=(8, 5, 2)).astype(np.float32))
    variables = bn.init(jax.random.key(0), x, use_running_average=False)
    _, mutated = bn.apply(variables, x, use_running_average=False, mutable=["batch_stats"])
    flat = np.asarray(x).reshape(-1, 2)
    n = flat.shape[0]
    biased = flat.var(axis=0)
    unbiased = biased * n / (n - 1)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["var"]), 0.9 * 1.0 + 0.1 * unbiased, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]), 0.1 * flat.mean(axis=0), atol=1e-6
    )


def test_channel_dropout_drops_whole_channels(rng):
    cd = ChannelDropout(rate=0.5)
    x = jnp.ones((4, 10, 8))
    y = np.asarray(
        cd.apply({}, x, deterministic=False, rngs={"dropout": jax.random.key(3)})
    )
    # each (sample, channel) is either fully zero or fully scaled by 1/keep
    for b in range(4):
        for c in range(8):
            col = y[b, :, c]
            assert np.all(col == 0) or np.allclose(col, 2.0)
    # deterministic mode = identity
    np.testing.assert_array_equal(
        np.asarray(cd.apply({}, x, deterministic=True)), np.asarray(x)
    )


def test_convtranspose_output_padding_column_is_bias_only(rng):
    m = ConvTranspose2dTorch(features=2, output_padding=(0, 1))
    x = jnp.asarray(rng.normal(size=(1, 3, 4, 2)).astype(np.float32))
    variables = m.init(jax.random.key(0), x)
    y = np.asarray(m.apply(variables, x))
    assert y.shape == (1, 6, 9, 2)  # 2x upsample + 1 extra column
    bias = np.asarray(variables["params"]["bias"])
    np.testing.assert_allclose(y[0, :, -1, :], np.broadcast_to(bias, (6, 2)), atol=1e-6)


def test_fast_dropout_rate_one_drops_everything():
    """rate=1.0 (thresh 256) must produce zeros like nn.Dropout, not
    uint8-overflow or divide by keep_p=0."""
    import flax.linen as nn

    from dfac_tpu.models.common import FastDropout

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return FastDropout(1.0, deterministic=False)(x)

    x = jnp.ones((4, 8))
    y = M().apply({}, x, rngs={"dropout": jax.random.key(0)})
    np.testing.assert_array_equal(np.asarray(y), 0.0)


def test_fast_dropout_unresolved_deterministic_raises():
    import flax.linen as nn
    import pytest as _pytest

    from dfac_tpu.models.common import FastDropout

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return FastDropout(0.2)(x)

    with _pytest.raises(ValueError, match="deterministic"):
        M().apply({}, jnp.ones((2, 2)), rngs={"dropout": jax.random.key(0)})


def test_byte_dropout_helper_shared_semantics():
    from dfac_tpu.models.common import apply_byte_dropout, byte_dropout_thresh

    assert byte_dropout_thresh(0.0) == 0
    assert byte_dropout_thresh(0.2) == 51
    assert byte_dropout_thresh(1.0) == 256
    x = jnp.full((3, 3), 2.0)
    bits = jnp.zeros((3, 3), jnp.uint8)
    np.testing.assert_array_equal(np.asarray(apply_byte_dropout(x, bits, 0)), 2.0)
    np.testing.assert_array_equal(np.asarray(apply_byte_dropout(x, bits, 256)), 0.0)


def test_train_key_rejects_unknown_impl(monkeypatch):
    import pytest as _pytest

    from dfac_tpu.utils.rng import train_key

    monkeypatch.setenv("DFAC_TPU_PRNG", "threefrey")  # typo
    with _pytest.raises(ValueError, match="unknown PRNG impl"):
        train_key(0)
    monkeypatch.setenv("DFAC_TPU_PRNG", "threefry")  # alias works
    train_key(0)


def test_convtranspose_init_matches_torch_fan():
    """torch computes ConvTranspose fan_in from weight dim 1 (= OUT
    channels): bounds must be 1/sqrt(out*k*k), not 1/sqrt(in*k*k)."""
    torch = pytest.importorskip("torch")

    from dfac_tpu.models.common import ConvTranspose2dTorch

    in_c, out_c = 256, 128
    m = ConvTranspose2dTorch(features=out_c)
    variables = m.init(jax.random.key(0), jnp.zeros((1, 4, 4, in_c)))
    k = np.asarray(variables["params"]["convt"]["kernel"])
    b = np.asarray(variables["params"]["bias"])
    expect_bound = 1.0 / np.sqrt(out_c * 4)

    ref = torch.nn.ConvTranspose2d(in_c, out_c, 2, stride=2)
    ref_bound = (ref.weight.abs().max() / 0.999).item()  # sample max ~ bound
    assert abs(np.abs(k).max() - ref_bound) < 0.2 * expect_bound
    assert np.abs(k).max() <= expect_bound * 1.0001
    assert np.abs(k).max() > 0.95 * expect_bound  # 262k samples hug the bound
    assert np.abs(b).max() <= expect_bound * 1.0001
