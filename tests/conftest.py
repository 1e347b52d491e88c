"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so that the multi-chip
sharding paths (Mesh / shard_map / pjit) compile and execute in CI without
TPU hardware (SURVEY.md §4). Env vars must be set before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize registers the TPU backend and pins jax_platforms;
# an explicit config update is required to actually land on CPU.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def synthetic_corpus(rng, tmp_path):
    """Write a tiny synthetic features/labels pkl pair with torch.Tensor cells
    (the reference on-disk contract) and return paths + ground truth arrays."""
    torch = pytest.importorskip("torch")
    import pandas as pd

    n, f_dim, t_dim = 12, 180, 321
    feats = rng.normal(size=(n, f_dim, t_dim)).astype(np.float32)
    labels = (rng.random(n) > 0.5).astype(np.int64)
    uttids = [f"utt{i:04d}" for i in range(n)]

    fpath, lpath = tmp_path / "features.pkl", tmp_path / "labels.pkl"
    pd.DataFrame({"uttid": uttids, "features": [torch.from_numpy(m) for m in feats]}).to_pickle(fpath)
    pd.DataFrame({"uttid": uttids, "label": labels}).to_pickle(lpath)
    return {
        "features_path": str(fpath),
        "labels_path": str(lpath),
        "uttids": uttids,
        "features": feats,
        "labels": labels,
    }
