"""flax -> torch export: roundtrip identity and torch-side load parity."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dfac_tpu.models import build_model  # noqa: E402
from dfac_tpu.utils.torch_export import flax_to_torch, save_torch_checkpoint  # noqa: E402
from dfac_tpu.utils.torch_import import torch_to_flax  # noqa: E402


@pytest.mark.parametrize("name,kw", [
    ("cnn2d", {"in_features": 12, "base_channels": 4}),
    ("cnn1d", {"in_features": 12, "base_channels": 4}),
    ("cae", {"base_channels": 4}),
    ("detector", {"in_channels": 12, "hidden": 8}),
    ("crnn", {"in_features": 12, "base_channels": 4, "rnn_hidden": 8}),
])
def test_export_import_roundtrip(name, kw, rng):
    model = build_model(name, **kw)
    # the CAE needs F >= 16 for its 4-stage floor-pool chain
    f = 16 if name == "cae" else 12
    x = jnp.asarray(rng.normal(size=(2, 16, f)).astype(np.float32))
    variables = model.init({"params": jax.random.key(0)}, x)
    # randomize batch stats so they round-trip non-trivially
    if "batch_stats" in variables:
        variables["batch_stats"] = jax.tree.map(
            lambda a: jnp.asarray(rng.random(a.shape) + 0.5, jnp.float32),
            variables["batch_stats"],
        )
    sd = flax_to_torch(name, variables)
    back = torch_to_flax(name, sd)
    for a, b in zip(jax.tree.leaves(variables["params"]), jax.tree.leaves(back["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    if "batch_stats" in variables:
        for a, b in zip(
            jax.tree.leaves(variables["batch_stats"]), jax.tree.leaves(back["batch_stats"])
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_exported_checkpoint_loads_in_torch(tmp_path, rng):
    """A real torch.nn module load_state_dict-accepts our export, and
    produces the same outputs as the flax model."""
    import torch.nn as tnn

    model = build_model("cnn1d", in_features=12, base_channels=4)
    x_np = rng.normal(size=(3, 16, 12)).astype(np.float32)
    variables = model.init({"params": jax.random.key(1)}, jnp.asarray(x_np))

    path = str(tmp_path / "export.pt")
    save_torch_checkpoint("cnn1d", variables, path)

    class TorchCNN1D(tnn.Module):
        def __init__(self, in_features=12, bc=4):
            super().__init__()
            self.conv = tnn.Sequential(
                tnn.Conv1d(in_features, bc, 3, padding=1), tnn.BatchNorm1d(bc), tnn.ReLU(), tnn.Dropout(0.2),
                tnn.Conv1d(bc, bc * 2, 3, padding=1), tnn.BatchNorm1d(bc * 2), tnn.ReLU(), tnn.Dropout(0.2),
                tnn.Conv1d(bc * 2, bc * 4, 3, padding=1), tnn.BatchNorm1d(bc * 4), tnn.ReLU(),
            )
            self.pool = tnn.AdaptiveAvgPool1d(1)
            self.classifier = tnn.Linear(bc * 4, 1)

        def forward(self, x):
            return self.classifier(self.pool(self.conv(x.transpose(1, 2))).flatten(1))

    tm = TorchCNN1D()
    tm.load_state_dict(torch.load(path, weights_only=True))
    tm.eval()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x_np)).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x_np)))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
