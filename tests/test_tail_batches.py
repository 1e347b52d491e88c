"""Partial tail-batch exactness.

The reference trains on the true-size final batch of every epoch
(``src/train.py:31-91``): its BatchNorm batch statistics, running-stat
updates, loss normalization, and gradients all cover real rows only. These
tests pin the framework to the same semantics: with ``N % batch_size != 0``
(a) all three training paths — host-fed, device-resident indexed, and the
one-dispatch epoch scan — produce identical parameters and BN running
stats given the same batch memberships, and (b) the tail step's BN math
matches PyTorch train mode on the same rows.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfac_tpu.data.pipeline import ArrayDataset, batch_iterator
from dfac_tpu.models import build_model
from dfac_tpu.train.loop import (
    TrainState,
    make_epoch_scan,
    make_indexed_train_step,
    make_train_step,
)
from dfac_tpu.train.optim import build_optimizer

N, BS, F, T = 22, 8, 12, 20  # 22 % 8 = 6-row tail


def _dataset(rng, n=N):
    feats = rng.normal(size=(n, F, T)).astype(np.float32)
    labels = (np.arange(n) % 2).astype(np.int32)
    return ArrayDataset(uttids=[f"u{i}" for i in range(n)], features=feats, labels=labels)


def _init_state(model, tx, t=T, f=F):
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(0)},
        jnp.zeros((1, t, f)),
    )
    return TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        key=jax.random.key(1),
    )


def test_batch_iterator_true_size_tail(rng):
    ds = _dataset(rng)
    sizes = [len(b.weights) for b in batch_iterator(ds, BS, pad_tail=False)]
    assert sizes == [8, 8, 6]
    for b in batch_iterator(ds, BS, pad_tail=False):
        assert b.features.shape[0] == len(b.labels) == len(b.index)
        assert (b.weights == 1.0).all()  # no phantom rows anywhere
    # padded mode unchanged (eval paths)
    sizes = [len(b.weights) for b in batch_iterator(ds, BS, pad_tail=True)]
    assert sizes == [8, 8, 8]


def _tree_allclose(a, b, atol=1e-6, rtol=1e-6):
    flat_a, _ = jax.tree.flatten(a)
    flat_b, _ = jax.tree.flatten(b)
    assert len(flat_a) == len(flat_b)
    for xa, xb in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), atol=atol, rtol=rtol)


def test_epoch_paths_identical_with_ragged_tail(rng):
    """Epoch scan == indexed steps == host-fed steps, bit-level (same batch
    memberships, same PRNG chain), including BN running stats after the
    6-row tail batch."""
    ds = _dataset(rng)
    feats_d = jnp.asarray(ds.features)
    labels_d = jnp.asarray(ds.labels.astype(np.float32))
    seed = 987

    def fresh():
        model = build_model("cnn1d", in_channels=F, base_channels=4, dropout=0.2)
        tx = build_optimizer("cnn1d", 1e-3)
        return model, tx, _init_state(model, tx)

    # 1) one-dispatch epoch scan (device permutation)
    model, tx, state = fresh()
    scan = make_epoch_scan(model, tx, True, 0.05, None, n_examples=N, batch_size=BS)
    s_scan, loss_scan, count_scan = scan(state, feats_d, labels_d, np.int64(seed))
    assert int(count_scan) == N

    # the same permutation the scan drew on device
    perm = np.asarray(jax.random.permutation(jax.random.key(seed), N)).astype(np.int32)

    # 2) per-batch indexed steps (true-size tail)
    model, tx, state = fresh()
    istep = make_indexed_train_step(model, tx, True, 0.05, None)
    s_idx, loss_idx, count_idx = state, jnp.zeros(()), 0.0
    for start in range(0, N, BS):
        idx = perm[start : start + BS]
        s_idx, ls, c = istep(s_idx, feats_d, labels_d, jnp.asarray(idx), jnp.ones(len(idx), jnp.float32))
        loss_idx, count_idx = loss_idx + ls, count_idx + float(c)

    # 3) host-fed steps on the exact rows
    model, tx, state = fresh()
    step = make_train_step(model, tx, True, 0.05, None)
    s_host, loss_host = state, jnp.zeros(())
    for start in range(0, N, BS):
        idx = perm[start : start + BS]
        s_host, ls, _ = step(
            s_host, jnp.asarray(ds.features[idx]),
            jnp.asarray(ds.labels[idx].astype(np.float32)),
            jnp.ones(len(idx), jnp.float32),
        )
        loss_host = loss_host + ls

    assert count_idx == N
    _tree_allclose(s_scan.params, s_idx.params)
    _tree_allclose(s_scan.params, s_host.params)
    _tree_allclose(s_scan.batch_stats, s_idx.batch_stats)
    _tree_allclose(s_scan.batch_stats, s_host.batch_stats)
    np.testing.assert_allclose(float(loss_scan), float(loss_idx), rtol=1e-6)
    np.testing.assert_allclose(float(loss_scan), float(loss_host), rtol=1e-6)


def test_trainer_ragged_equals_manual_stepping(rng):
    """Trainer.train_epoch (host-fed, pad_tail=False) reproduces manual
    stepping over the same shuffled batches — the public API drives the
    exact-tail semantics, not just the building blocks."""
    from dfac_tpu.train.loop import TrainConfig, Trainer

    ds = _dataset(rng)
    cfg = TrainConfig(model="cnn1d", batch_size=BS, epochs=1, lr=1e-3,
                      in_features=F, label_smoothing=0.05, seed=4)
    trainer = Trainer(cfg)
    trainer.init_state(ds.features[:BS])
    state0 = trainer.state
    train_loss = trainer.train_epoch(ds, epoch=1)

    order = np.arange(N)
    np.random.default_rng(cfg.seed * 100003 + 1).shuffle(order)
    step = make_train_step(trainer.model, trainer.tx, True, 0.05, trainer.augment_fn)
    st, total, cnt = state0, 0.0, 0.0
    for start in range(0, N, BS):
        idx = order[start : start + BS]
        st, ls, c = step(
            st, jnp.asarray(ds.features[idx]),
            jnp.asarray(ds.labels[idx].astype(np.float32)),
            jnp.ones(len(idx), jnp.float32),
        )
        total, cnt = total + float(ls), cnt + float(c)
    assert cnt == N
    np.testing.assert_allclose(train_loss, total / cnt, rtol=1e-6)
    _tree_allclose(trainer.state.params, st.params)
    _tree_allclose(trainer.state.batch_stats, st.batch_stats)


def test_tail_batch_bn_stats_match_torch(rng):
    """Full batch then a 6-row tail: BN running stats and losses equal
    PyTorch train mode on the same rows (lr=0 isolates the BN/loss math)."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    from dfac_tpu.utils.torch_import import torch_to_flax

    class TorchCNN1D(tnn.Module):
        def __init__(self, cin=F, bc=4):
            super().__init__()
            self.conv = tnn.Sequential(
                tnn.Conv1d(cin, bc, 3, padding=1), tnn.BatchNorm1d(bc), tnn.ReLU(), tnn.Dropout(0.0),
                tnn.Conv1d(bc, bc * 2, 3, padding=1), tnn.BatchNorm1d(bc * 2), tnn.ReLU(), tnn.Dropout(0.0),
                tnn.Conv1d(bc * 2, bc * 4, 3, padding=1), tnn.BatchNorm1d(bc * 4), tnn.ReLU(),
            )
            self.pool = tnn.AdaptiveAvgPool1d(1)
            self.classifier = tnn.Linear(bc * 4, 1)

        def forward(self, x):
            x = self.conv(x.transpose(1, 2))
            return self.classifier(self.pool(x).flatten(1))

    tm = TorchCNN1D()
    tm.train()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = torch_to_flax("cnn1d", sd)
    model = build_model("cnn1d", in_channels=F, base_channels=4, dropout=0.0)

    import optax

    tx = optax.sgd(0.0)  # no param movement: isolate BN/loss semantics
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        key=jax.random.key(0),
    )
    step = make_train_step(model, tx, True, 0.0, None)

    ds = _dataset(rng, n=14)  # batches of 8 and 6
    criterion = torch.nn.BCEWithLogitsLoss()
    for start in (0, 8):
        rows = ds.features[start : start + 8]
        labs = ds.labels[start : start + 8].astype(np.float32)
        state, loss_sum, count = step(
            state, jnp.asarray(rows), jnp.asarray(labs), jnp.ones(len(labs), jnp.float32)
        )
        with torch.no_grad():
            # swap_tf: model consumes (B, T, F); torch mirror transposes inside
            t_logits = tm(torch.from_numpy(rows.transpose(0, 2, 1)))
            t_loss = criterion(t_logits.squeeze(-1), torch.from_numpy(labs))
        np.testing.assert_allclose(
            float(loss_sum) / float(count), float(t_loss), atol=2e-6, rtol=1e-5
        )

    for i, tmod in ((1, tm.conv[1]), (2, tm.conv[5]), (3, tm.conv[9])):
        np.testing.assert_allclose(
            np.asarray(state.batch_stats[f"bn{i}"]["mean"]),
            tmod.running_mean.numpy(), atol=1e-5, rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(state.batch_stats[f"bn{i}"]["var"]),
            tmod.running_var.numpy(), atol=1e-5, rtol=1e-4,
        )


def test_cae_epoch_scan_matches_stepwise_ragged(rng):
    """CAE one-dispatch epoch scan == stepwise training on the same
    permutation with a true-size tail (N=13, bs=4 -> tail of 1)."""
    from dfac_tpu.data.normalizer import FeatureNormalizer
    from dfac_tpu.train.cae_loop import make_cae_epoch_scan, make_cae_train_step

    import optax

    n, bs, f, t = 13, 4, 16, 24
    feats = rng.normal(size=(n, f, t)).astype(np.float32)
    mean = jnp.zeros((f,))
    std = jnp.ones((f,))
    model = build_model("cae", base_channels=4)
    # SGD, deliberately: this test checks the DATA-PATH semantics (batch
    # membership, true-size tail, BN stats) shared by the scan and stepwise
    # programs. With Adam, the conv biases feeding BN — whose true gradient
    # is mathematically zero (BN subtracts the batch mean) — turn f32
    # reassociation noise between the two compilations into +-lr-sized
    # updates, which then perturb every later step. SGD keeps noise at
    # noise level so the paths compare at 1e-6.
    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=1e-2)

    def fresh_state():
        variables = model.init(
            {"params": jax.random.key(0)}, jnp.zeros((1, t, f))
        )
        return TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            key=jax.random.key(1),
        )

    seed = 55
    scan = make_cae_epoch_scan(model, tx, mean, std, n_examples=n, batch_size=bs)
    s_scan, loss_scan, count_scan = scan(fresh_state(), jnp.asarray(feats), np.int64(seed))
    assert int(count_scan) == n

    perm = np.asarray(jax.random.permutation(jax.random.key(seed), n)).astype(np.int32)
    step = make_cae_train_step(model, tx, mean, std)
    st, total = fresh_state(), 0.0
    for start in range(0, n, bs):
        idx = perm[start : start + bs]
        st, ls, _ = step(st, jnp.asarray(feats[idx]), jnp.ones(len(idx), jnp.float32))
        total += float(ls)
    _tree_allclose(s_scan.params, st.params)
    _tree_allclose(s_scan.batch_stats, st.batch_stats)
    np.testing.assert_allclose(float(loss_scan), total, rtol=1e-6)


def test_detector_ragged_fit_true_rows_only(rng):
    """Detector training with N % batch_size != 0 sees only real rows: the
    loss of the tail step equals pos_weight BCE over exactly the tail rows."""
    from dfac_tpu.train.detector_loop import DetectorConfig, DetectorTrainer

    n, f, t = 10, 8, 16
    feats = rng.normal(size=(n, f, t)).astype(np.float32)
    labels = (np.arange(n) % 2).astype(np.int32)
    feats[labels == 1, : f // 2] += 2.0
    ds = ArrayDataset(uttids=[f"u{i}" for i in range(n)], features=feats, labels=labels)
    cfg = DetectorConfig(epochs=2, batch_size=4, hidden=8, patience=10, seed=0)
    out = DetectorTrainer(cfg, in_channels=f).fit(ds, ds)
    assert np.isfinite(out["best_eer"])
    for row in out["history"]:
        assert np.isfinite(row["train_loss"])
