"""Numerical parity: flax zoo vs PyTorch reference architectures.

Each test builds a small PyTorch module mirroring the reference spec (layer
sequence and hyperparameters from SURVEY.md §2), imports its weights through
``dfac_tpu.utils.torch_import``, and checks eval-mode outputs agree to float32
tolerance. This pins down the cross-framework semantics that are easy to get
wrong: SAME-vs-torch conv padding, floor-mode pooling, ConvTranspose
output_padding, BatchNorm running stats, GRU gate math, exact-vs-tanh GELU.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dfac_tpu.models import build_model  # noqa: E402
from dfac_tpu.utils.torch_import import torch_to_flax  # noqa: E402

B, T, F = 3, 33, 20


def _randomize_bn(module):
    """Non-trivial running stats so stat-mapping errors are caught."""
    g = torch.Generator().manual_seed(5)
    for m in module.modules():
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
            m.weight.data.copy_(torch.randn(m.weight.shape, generator=g) * 0.2 + 1)
            m.bias.data.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)


def _compare(name, tmodule, x_np, flax_input=None, tol=2e-5, torch_out=None, **apply_kw):
    tmodule.eval()
    _randomize_bn(tmodule)
    sd = {k: v.detach().numpy() for k, v in tmodule.state_dict().items()}
    variables = torch_to_flax(name, sd)
    model = build_model(name, **apply_kw.pop("model_kw", {}))
    with torch.no_grad():
        ref = tmodule(torch.from_numpy(x_np)) if torch_out is None else torch_out(tmodule)
    got = model.apply(variables, jnp.asarray(x_np if flax_input is None else flax_input), **apply_kw)
    if isinstance(got, tuple):
        got = got[0]
    np.testing.assert_allclose(
        np.asarray(got).reshape(ref.shape), ref.numpy(), atol=tol, rtol=1e-4
    )
    return variables, model


def _conv_bn_relu_2d(cin, cout):
    return [tnn.Conv2d(cin, cout, 3, padding=1), tnn.BatchNorm2d(cout), tnn.ReLU()]


class TorchCNN2D(tnn.Module):
    """Mirror of reference src/model.py:5-42 (reduced size)."""

    def __init__(self, in_features=F, bc=8, dropout=0.2):
        super().__init__()
        self.conv = tnn.Sequential(
            *_conv_bn_relu_2d(1, bc), tnn.AvgPool2d((2, 1)), tnn.Dropout(dropout),
            *_conv_bn_relu_2d(bc, bc * 2), tnn.AvgPool2d((2, 1)), tnn.Dropout(dropout),
            *_conv_bn_relu_2d(bc * 2, bc * 4),
        )
        self.classifier = tnn.Linear(bc * 4 * in_features, 1)

    def forward(self, x):
        x = self.conv(x.unsqueeze(1))
        emb = x.mean(dim=2).flatten(1)
        return self.classifier(emb)


def test_cnn2d_parity(rng):
    x = rng.normal(size=(B, T, F)).astype(np.float32)
    _compare("cnn2d", TorchCNN2D(), x, model_kw={"in_features": F, "base_channels": 8})


def test_cnn2d_embedding_layout(rng):
    x = rng.normal(size=(B, T, F)).astype(np.float32)
    tm = TorchCNN2D()
    tm.eval()
    _randomize_bn(tm)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = torch_to_flax("cnn2d", sd)
    model = build_model("cnn2d", in_features=F, base_channels=8)
    _, emb = model.apply(variables, jnp.asarray(x), return_embedding=True)
    with torch.no_grad():
        ref_emb = tm.conv(torch.from_numpy(x).unsqueeze(1)).mean(dim=2).flatten(1)
    np.testing.assert_allclose(np.asarray(emb), ref_emb.numpy(), atol=2e-5, rtol=1e-4)


def test_cnn2d_train_mode_batchnorm_parity(rng):
    """Train-mode batch stats + running-stat updates match torch exactly."""
    x = rng.normal(size=(B, T, F)).astype(np.float32)
    tm = TorchCNN2D(dropout=0.0)
    _randomize_bn(tm)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = torch_to_flax("cnn2d", sd)
    model = build_model("cnn2d", in_features=F, base_channels=8, dropout=0.0)

    tm.train()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))
    got, mutated = model.apply(
        variables, jnp.asarray(x), train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.key(0)},
    )
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=3e-5, rtol=1e-4)
    # running stats after one train step (torch updates with unbiased var)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["bn1"]["mean"]),
        tm.conv[1].running_mean.numpy(), atol=1e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["bn1"]["var"]),
        tm.conv[1].running_var.numpy(), atol=1e-5, rtol=1e-4,
    )


class TorchCNN1D(tnn.Module):
    """Mirror of reference src/model_cnn1d.py:5-46."""

    def __init__(self, in_features=F, bc=8):
        super().__init__()
        self.conv = tnn.Sequential(
            tnn.Conv1d(in_features, bc, 3, padding=1), tnn.BatchNorm1d(bc), tnn.ReLU(), tnn.Dropout(0.2),
            tnn.Conv1d(bc, bc * 2, 3, padding=1), tnn.BatchNorm1d(bc * 2), tnn.ReLU(), tnn.Dropout(0.2),
            tnn.Conv1d(bc * 2, bc * 4, 3, padding=1), tnn.BatchNorm1d(bc * 4), tnn.ReLU(),
        )
        self.pool = tnn.AdaptiveAvgPool1d(1)
        self.classifier = tnn.Linear(bc * 4, 1)

    def forward(self, x):
        x = self.conv(x.transpose(1, 2))
        return self.classifier(self.pool(x).flatten(1))


def test_cnn1d_parity(rng):
    x = rng.normal(size=(B, T, F)).astype(np.float32)
    _compare("cnn1d", TorchCNN1D(), x, model_kw={"in_features": F, "base_channels": 8})


class TorchCAE(tnn.Module):
    """Mirror of reference src/model_cae.py:20-125."""

    def __init__(self, bc=4):
        super().__init__()
        enc = []
        cin = 1
        for ch in (bc, bc * 2, bc * 4, bc * 8):
            enc += [tnn.Conv2d(cin, ch, 3, padding=1), tnn.BatchNorm2d(ch), tnn.ReLU(), tnn.AvgPool2d(2)]
            cin = ch
        self.encoder = tnn.Sequential(*enc)
        self.decoder = tnn.Sequential(
            tnn.ConvTranspose2d(bc * 8, bc * 4, 2, stride=2), tnn.BatchNorm2d(bc * 4), tnn.ReLU(),
            tnn.ConvTranspose2d(bc * 4, bc * 2, 2, stride=2, output_padding=(0, 1)),
            tnn.BatchNorm2d(bc * 2), tnn.ReLU(),
            tnn.ConvTranspose2d(bc * 2, bc, 2, stride=2), tnn.BatchNorm2d(bc), tnn.ReLU(),
            tnn.ConvTranspose2d(bc, 1, 2, stride=2),
        )

    def forward(self, x):
        x4 = x.unsqueeze(1)
        latent = self.encoder(x4)
        recon = self.decoder(latent)
        t_orig, t_rec = x.size(1), recon.size(2)
        if t_rec < t_orig:
            recon = tnn.functional.pad(recon, (0, 0, 0, t_orig - t_rec))
        elif t_rec > t_orig:
            recon = recon[:, :, :t_orig]
        return recon.squeeze(1), latent


def test_cae_parity(rng):
    x = rng.normal(size=(B, T, F)).astype(np.float32)
    tm = TorchCAE()
    tm.eval()
    _randomize_bn(tm)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = torch_to_flax("cae", sd)
    model = build_model("cae", base_channels=4)
    recon, latent = model.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        ref_recon, ref_latent = tm(torch.from_numpy(x))
    assert recon.shape == (B, T, F)
    np.testing.assert_allclose(np.asarray(recon), ref_recon.numpy(), atol=2e-5, rtol=1e-4)
    # latent: ours NHWC vs torch NCHW
    np.testing.assert_allclose(
        np.transpose(np.asarray(latent), (0, 3, 1, 2)), ref_latent.numpy(), atol=2e-5, rtol=1e-4
    )


class TorchDetector(tnn.Module):
    """Mirror of reference src/dlqueen_model.py:115-173."""

    def __init__(self, in_ch=F, hidden=16):
        super().__init__()
        self.enc = tnn.Module()
        self.enc.net = tnn.Sequential(
            tnn.Conv1d(in_ch, hidden, 5, padding=2), tnn.BatchNorm1d(hidden), tnn.GELU(), tnn.Dropout(0.2),
            tnn.Conv1d(hidden, hidden, 3, padding=1), tnn.BatchNorm1d(hidden), tnn.GELU(), tnn.Dropout(0.2),
            tnn.Conv1d(hidden, hidden, 3, padding=1), tnn.BatchNorm1d(hidden), tnn.GELU(), tnn.Dropout(0.2),
        )
        self.head = tnn.Sequential(
            tnn.Linear(hidden * 2, hidden), tnn.GELU(), tnn.Dropout(0.3), tnn.Linear(hidden, 1)
        )

    def forward(self, x, lengths):
        h = self.enc.net(x)  # (B, C, T)
        t = h.shape[2]
        mask = (torch.arange(t)[None, :] < lengths[:, None]).unsqueeze(1).float()
        denom = mask.sum(dim=2).clamp(min=1.0)
        mean = (h * mask).sum(dim=2) / denom
        var = (mask * (h - mean.unsqueeze(-1)) ** 2).sum(dim=2) / denom
        std = torch.sqrt(var.clamp(min=1e-6))
        z = torch.cat([mean, std], dim=1)
        return self.head(z).squeeze(1)


def test_detector_parity_with_length_mask(rng):
    x = rng.normal(size=(B, T, F)).astype(np.float32)
    lengths = np.array([T, 17, 9], np.int32)
    # zero out padding frames like the padded-batch pipeline does
    for i, ln in enumerate(lengths):
        x[i, ln:] = 0
    tm = TorchDetector()
    tm.eval()
    _randomize_bn(tm)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = torch_to_flax("detector", sd)
    model = build_model("detector", in_channels=F, hidden=16)
    got = model.apply(variables, jnp.asarray(x), lengths=jnp.asarray(lengths))
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(x, (0, 2, 1))), torch.from_numpy(lengths))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5, rtol=1e-4)


class TorchMeanPoolMLP(tnn.Module):
    def __init__(self, in_features=F, hidden=8):
        super().__init__()
        self.feature_extractor = tnn.Sequential(
            tnn.Linear(in_features, hidden), tnn.ReLU(), tnn.Dropout(0.2),
            tnn.Linear(hidden, hidden), tnn.ReLU(), tnn.Dropout(0.2),
            tnn.Linear(hidden, 1),
        )

    def forward(self, x):
        return self.feature_extractor(x.mean(dim=1))


def test_meanpool_mlp_parity(rng):
    x = rng.normal(size=(B, T, F)).astype(np.float32)
    _compare("meanpool_mlp", TorchMeanPoolMLP(), x,
             model_kw={"in_features": F, "hidden_dim": 8})


class TorchStatsPoolMLP(tnn.Module):
    def __init__(self, in_features=F, hidden=8):
        super().__init__()
        self.feature_extractor = tnn.Sequential(
            tnn.Linear(in_features * 3, hidden), tnn.ReLU(), tnn.Dropout(0.2),
            tnn.Linear(hidden, hidden), tnn.ReLU(), tnn.Dropout(0.2),
            tnn.Linear(hidden, 1),
        )

    def forward(self, x):
        pooled = torch.cat(
            [x.mean(dim=1), x.std(dim=1, unbiased=False), x.max(dim=1).values], dim=1
        )
        return self.feature_extractor(pooled)


def test_statspool_mlp_parity(rng):
    x = rng.normal(size=(B, T, F)).astype(np.float32)
    _compare("statspool_mlp", TorchStatsPoolMLP(), x,
             model_kw={"in_features": F, "hidden_dim": 8})


class TorchCRNN(tnn.Module):
    """Mirror of reference src/archive/models.py:158-234 (reduced)."""

    def __init__(self, in_features=F, bc=4, hidden=8, num_layers=1):
        super().__init__()
        self.conv = tnn.Sequential(
            tnn.Conv2d(1, bc, 3, padding=1), tnn.BatchNorm2d(bc), tnn.ReLU(),
            tnn.AvgPool2d((2, 1)), tnn.Dropout(0.3),
            tnn.Conv2d(bc, bc * 2, 3, padding=1), tnn.BatchNorm2d(bc * 2), tnn.ReLU(),
            tnn.AvgPool2d((2, 1)), tnn.Dropout(0.3),
        )
        self.rnn = tnn.GRU(bc * 2 * in_features, hidden, num_layers=num_layers,
                           batch_first=True, dropout=0.0 if num_layers == 1 else 0.3)
        self.classifier = tnn.Linear(hidden, 1)

    def forward(self, x):
        x = self.conv(x.unsqueeze(1))
        x = x.permute(0, 2, 1, 3).flatten(2)
        out, _ = self.rnn(x)
        return self.classifier(out[:, -1, :])


@pytest.mark.parametrize("name,layers", [("crnn", 1), ("crnn2", 2)])
def test_crnn_parity(rng, name, layers):
    x = rng.normal(size=(B, T, F)).astype(np.float32)
    _compare(name, TorchCRNN(num_layers=layers), x,
             model_kw={"in_features": F, "base_channels": 4, "rnn_hidden": 8})


class TorchCNN2DRobust(tnn.Module):
    """Mirror of reference src/archive/models.py:237-298 (reduced)."""

    def __init__(self, bc=16):
        super().__init__()
        def block(cin, cout):
            return tnn.Sequential(
                tnn.Conv2d(cin, cout, 3, padding=1), tnn.BatchNorm2d(cout), tnn.ReLU(),
                tnn.Conv2d(cout, cout, 3, padding=1), tnn.BatchNorm2d(cout), tnn.ReLU(),
                tnn.AvgPool2d((2, 1)), tnn.Dropout2d(0.3),
            )
        self.block1, self.block2, self.block3 = block(1, bc), block(bc, bc * 2), block(bc * 2, bc * 4)
        self.se = tnn.Sequential(
            tnn.AdaptiveAvgPool2d(1), tnn.Conv2d(bc * 4, bc * 4 // 16, 1), tnn.ReLU(),
            tnn.Conv2d(bc * 4 // 16, bc * 4, 1), tnn.Sigmoid(),
        )
        self.attention_pool = tnn.Linear(bc * 4, 1)
        self.classifier = tnn.Sequential(
            tnn.Dropout(0.3), tnn.Linear(bc * 4, 256), tnn.ReLU(), tnn.Dropout(0.3), tnn.Linear(256, 1)
        )

    def forward(self, x):
        x = self.block3(self.block2(self.block1(x.unsqueeze(1))))
        x = x * self.se(x)
        x = x.mean(dim=3).transpose(1, 2)
        attn = torch.softmax(self.attention_pool(x), dim=1)
        return self.classifier((x * attn).sum(dim=1))


def test_cnn2d_robust_parity(rng):
    x = rng.normal(size=(B, T, F)).astype(np.float32)
    _compare("cnn2d_robust", TorchCNN2DRobust(), x,
             model_kw={"in_features": F, "base_channels": 16})


class TorchCNN1DSpatial(tnn.Module):
    def __init__(self, in_channels=F, spatial=True):
        super().__init__()
        drop = tnn.Dropout1d if spatial else tnn.Dropout
        self.conv = tnn.Sequential(
            tnn.Conv1d(in_channels, 128, 3, padding=1), tnn.BatchNorm1d(128), tnn.ReLU(), drop(0.2),
            tnn.Conv1d(128, 128, 3, padding=1), tnn.BatchNorm1d(128), tnn.ReLU(), drop(0.2),
            tnn.Conv1d(128, 256, 3, padding=1), tnn.BatchNorm1d(256), tnn.ReLU(),
        )
        self.pool = tnn.AdaptiveAvgPool1d(1)
        self.classifier = tnn.Linear(256, 1)

    def forward(self, x):
        x = self.conv(x.transpose(1, 2))
        return self.classifier(self.pool(x).flatten(1))


@pytest.mark.parametrize("name,spatial", [("cnn1d_spatial", True), ("cnn1d_archive", False)])
def test_cnn1d_zoo_parity(rng, name, spatial):
    x = rng.normal(size=(B, T, F)).astype(np.float32)
    _compare(name, TorchCNN1DSpatial(spatial=spatial), x, model_kw={"in_channels": F})


def test_adaptive_avg_pool_matches_torch(rng):
    from dfac_tpu.models.zoo import adaptive_avg_pool_1d

    x = rng.normal(size=(2, 17, 6)).astype(np.float32)
    for bins in (1, 2, 3, 5, 17):
        ref = tnn.AdaptiveAvgPool1d(bins)(torch.from_numpy(np.transpose(x, (0, 2, 1))))
        got = adaptive_avg_pool_1d(jnp.asarray(x), bins)  # (B, bins, C)
        np.testing.assert_allclose(
            np.asarray(got), np.transpose(ref.numpy(), (0, 2, 1)), atol=1e-6,
        )


def test_cnn1d_spatial_pool_bins_parity(rng):
    x = rng.normal(size=(B, T, F)).astype(np.float32)
    tm = TorchCNN1DSpatial(spatial=False)
    tm.pool = tnn.AdaptiveAvgPool1d(3)
    tm.classifier = tnn.Linear(256 * 3, 1)
    _compare("cnn1d_archive", tm, x, model_kw={"in_channels": F, "pool_bins": 3})
