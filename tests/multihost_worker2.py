"""Worker for tests/test_multihost.py round-4 compositions — one process of
a 2-process cluster.

Usage: python multihost_worker2.py <port> <process_id>

Round 3 proved the per-batch multi-host paths; this worker proves the
LARGE-PROGRAM x multi-host compositions that stop pod training from
regressing to one dispatch per batch (docs/architecture.md rule 1):

* chunked streaming training (``--resident-chunk-batches``) on all three
  trainers — each process gathers its row slice of every chunk batch, the
  chunk scan runs one global GSPMD/shard_map program per chunk;
* the GSPMD device-resident epoch scan (``--device-resident``) — corpus
  replicated per host, batches sharding-constrained onto the pod's 'data'
  axis, one dispatch per epoch;
* the fused whole-run fit (``--fused-fit``) — ONE dispatch for the entire
  run across the pod, exact-EER parity vs the single-device fused fit;
* mid-run ReduceLROnPlateau updates (host-local leaves injected into
  opt_state) must not de-globalize state across epochs.

Both processes build identical synthetic corpora from the same seed, so
every single-device reference is computable locally. Prints
"ALL OK <pid>" and exits 0 on success.
"""

from __future__ import annotations

import sys

port, pid = sys.argv[1], int(sys.argv[2])

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

from dfac_tpu.parallel import multihost as mh  # noqa: E402

mh.initialize(f"localhost:{port}", num_processes=2, process_id=pid)

import dataclasses  # noqa: E402

import numpy as np  # noqa: E402

from dfac_tpu.data.pipeline import ArrayDataset  # noqa: E402
from dfac_tpu.train.loop import TrainConfig, Trainer  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, jax.devices()

f_dim, t_dim = 16, 24
rng = np.random.default_rng(0)  # identical on both processes


def mk_ds(n: int, prefix: str) -> ArrayDataset:
    feats = rng.normal(size=(n, f_dim, t_dim)).astype(np.float32)
    labels = (np.arange(n) % 2).astype(np.int32)
    feats[labels == 1, : f_dim // 2, :] += 2.0
    return ArrayDataset(
        uttids=[f"{prefix}{i}" for i in range(n)], features=feats, labels=labels
    )


# B=16 over 8 devices -> 2 full batches + an 8-row tail: exercises the
# full-chunk scan, a tail-only final chunk, AND the sharded true-size tail
train_ds = mk_ds(40, "t")
dev_ds = mk_ds(16, "d")


def close_history(hist_a, hist_b, rtol):
    assert len(hist_a) == len(hist_b) and hist_a, (hist_a, hist_b)
    for a, b in zip(hist_a, hist_b):
        # the multi-host step (shard_map / GSPMD-constrained) reassociates
        # float sums differently from the single-device step and the drift
        # compounds through Adam over epochs (measured ~1e-3 rel by epoch
        # 2-3); feeding/placement bugs move losses by 1e-2..1e-1
        np.testing.assert_allclose(a.train_loss, b.train_loss, rtol=rtol)
        if a.dev_eer is not None or b.dev_eer is not None:
            assert a.dev_eer == b.dev_eer, (a.dev_eer, b.dev_eer)


# --- supervised chunked x multihost (+ mid-run LR updates): the plateau
# threshold 0.5 (relative) makes a reduction fire deterministically after
# epoch 2, so the host-local LR leaf gets injected into opt_state mid-run
# and the next epoch's re-replication must heal it on every process
cfg_mh = TrainConfig(
    model="cnn2d", batch_size=16, epochs=3, lr=1e-3, in_features=f_dim,
    seed=0, label_smoothing=0.05, dropout=0.0,
    lr_scheduler="plateau", lr_scheduler_patience=0, lr_scheduler_threshold=0.5,
    data_parallel=8, multihost=True, resident_chunk_batches=2,
)
tr_mh = Trainer(cfg_mh)
tr_mh.fit(train_ds, dev_ds)
cfg_sd = dataclasses.replace(cfg_mh, data_parallel=0, multihost=False)
tr_sd = Trainer(cfg_sd)
tr_sd.fit(train_ds, dev_ds)
close_history(tr_mh.history, tr_sd.history, rtol=5e-3)
for a, b in zip(tr_mh.history, tr_sd.history):
    assert a.learning_rate == b.learning_rate, (a.learning_rate, b.learning_rate)
assert tr_mh.history[-1].learning_rate < cfg_mh.lr, (
    "plateau reduction never fired — the mid-run LR re-replication path "
    "was not exercised"
)

# --- GSPMD device-resident epoch scan x multihost: corpus replicated per
# host, one dispatch per epoch, batches sharding-constrained over the pod
cfg_res_mh = TrainConfig(
    model="cnn2d", batch_size=8, epochs=2, lr=1e-3, in_features=f_dim,
    seed=0, label_smoothing=0.05, dropout=0.0,
    data_parallel=8, multihost=True, device_resident=True,
)
tr_res_mh = Trainer(cfg_res_mh)
tr_res_mh.fit(train_ds, dev_ds)
cfg_res_sd = dataclasses.replace(cfg_res_mh, data_parallel=0, multihost=False)
tr_res_sd = Trainer(cfg_res_sd)
tr_res_sd.fit(train_ds, dev_ds)
# both sides run the SAME hand-scheduled CNN2D step + epoch scan (the GSPMD
# path only adds sharding constraints), so the band is reassociation-only
close_history(tr_res_mh.history, tr_res_sd.history, rtol=5e-3)

# --- fused whole-run fit x multihost: ONE dispatch for the entire run
# across the pod; exact-EER parity with the single-device fused fit
cfg_f_mh = dataclasses.replace(
    cfg_res_mh, epochs=3,
    lr_scheduler="plateau", lr_scheduler_patience=0, lr_scheduler_threshold=0.5,
)
tr_f_mh = Trainer(cfg_f_mh)
rf_mh = tr_f_mh.fit_fused(train_ds, dev_ds)
cfg_f_sd = dataclasses.replace(cfg_f_mh, data_parallel=0, multihost=False)
rf_sd = Trainer(cfg_f_sd).fit_fused(train_ds, dev_ds)
assert rf_mh["best_eer"] == rf_sd["best_eer"], (rf_mh["best_eer"], rf_sd["best_eer"])
np.testing.assert_allclose(
    rf_mh["best_train_loss"], rf_sd["best_train_loss"], rtol=5e-3,
    err_msg="multihost fused best train loss must match single-device fused",
)
for a, b in zip(rf_mh["history"], rf_sd["history"]):
    assert a.learning_rate == b.learning_rate, (a.learning_rate, b.learning_rate)
    assert a.is_best == b.is_best
# the fused run's best snapshot must be writable from every process (the
# coordinator persists it): fully-replicated global leaves convert locally
if rf_mh["best_variables"] is not None:
    leaf = jax.tree.leaves(rf_mh["best_variables"])[0]
    np.asarray(leaf)  # raises if non-addressable/non-replicated

# --- CAE chunked x multihost vs single-device chunked
from dfac_tpu.train.cae_loop import CAEConfig, CAETrainer  # noqa: E402

n_cae = 40  # B=16 -> 2 full + 8-row tail
cae_train = ArrayDataset(
    uttids=[f"c{i}" for i in range(n_cae)],
    features=rng.normal(size=(n_cae, f_dim, t_dim)).astype(np.float32),
    labels=np.ones(n_cae, np.int32),
)
cae_dev = ArrayDataset(
    uttids=[f"cd{i}" for i in range(16)],
    features=rng.normal(size=(16, f_dim, t_dim)).astype(np.float32),
    labels=np.ones(16, np.int32),
)
cae_cfg = CAEConfig(
    batch_size=16, epochs=2, base_channels=4, seed=0,
    data_parallel=8, multihost=True, resident_chunk_batches=2,
)
cae_mh = CAETrainer(cae_cfg).fit(cae_train, cae_dev)
cae_sd = CAETrainer(
    dataclasses.replace(cae_cfg, data_parallel=0, multihost=False)
).fit(cae_train, cae_dev)
np.testing.assert_allclose(
    cae_mh["best_val_mse"], cae_sd["best_val_mse"], rtol=1e-4,
    err_msg="multihost chunked CAE val MSE must match single-device chunked",
)
np.testing.assert_allclose(
    cae_mh["history"][0].train_loss, cae_sd["history"][0].train_loss, rtol=1e-4
)

# --- CAE GSPMD resident + fused x multihost vs single-device
cae_res_cfg = dataclasses.replace(
    cae_cfg, resident_chunk_batches=0, device_resident=True, epochs=2
)
cae_res_mh = CAETrainer(cae_res_cfg).fit(cae_train, cae_dev)
cae_res_sd = CAETrainer(
    dataclasses.replace(cae_res_cfg, data_parallel=0, multihost=False)
).fit(cae_train, cae_dev)
np.testing.assert_allclose(
    cae_res_mh["best_val_mse"], cae_res_sd["best_val_mse"], rtol=1e-4,
    err_msg="multihost GSPMD-resident CAE val MSE must match single-device",
)
cae_f_mh = CAETrainer(cae_res_cfg).fit_fused(cae_train, cae_dev)
cae_f_sd = CAETrainer(
    dataclasses.replace(cae_res_cfg, data_parallel=0, multihost=False)
).fit_fused(cae_train, cae_dev)
np.testing.assert_allclose(
    cae_f_mh["best_val_mse"], cae_f_sd["best_val_mse"], rtol=1e-4,
    err_msg="multihost fused CAE val MSE must match single-device fused",
)
np.testing.assert_allclose(
    [m.train_loss for m in cae_f_mh["history"]],
    [m.train_loss for m in cae_f_sd["history"]], rtol=1e-4,
)

# --- detector chunked x multihost vs single-device chunked
from dfac_tpu.train.detector_loop import DetectorConfig, DetectorTrainer  # noqa: E402

det_cfg = DetectorConfig(
    epochs=2, batch_size=16, hidden=16, dropout=0.0, specaug=False,
    ema=True, seed=3, data_parallel=8, multihost=True,
    resident_chunk_batches=2,
)
det_mh = DetectorTrainer(det_cfg, in_channels=f_dim).fit(train_ds, dev_ds)
det_sd = DetectorTrainer(
    dataclasses.replace(det_cfg, data_parallel=0, multihost=False),
    in_channels=f_dim,
).fit(train_ds, dev_ds)
for h_mh, h_sd in zip(det_mh["history"], det_sd["history"]):
    np.testing.assert_allclose(
        h_mh["train_loss"], h_sd["train_loss"], rtol=5e-3,
        err_msg="multihost chunked detector loss must match single-device chunked",
    )
assert det_mh["best_eer"] == det_sd["best_eer"], (
    det_mh["best_eer"], det_sd["best_eer"],
)

# --- detector GSPMD resident + fused x multihost vs single-device
det_res_cfg = dataclasses.replace(
    det_cfg, resident_chunk_batches=0, device_resident=True
)
det_res_mh = DetectorTrainer(det_res_cfg, in_channels=f_dim).fit(train_ds, dev_ds)
det_res_sd = DetectorTrainer(
    dataclasses.replace(det_res_cfg, data_parallel=0, multihost=False),
    in_channels=f_dim,
).fit(train_ds, dev_ds)
np.testing.assert_allclose(
    det_res_mh["history"][0]["train_loss"], det_res_sd["history"][0]["train_loss"],
    rtol=5e-3, err_msg="multihost GSPMD-resident detector loss must match",
)
assert det_res_mh["best_eer"] == det_res_sd["best_eer"]

det_f_mh = DetectorTrainer(det_res_cfg, in_channels=f_dim).fit_fused(train_ds, dev_ds)
det_f_sd = DetectorTrainer(
    dataclasses.replace(det_res_cfg, data_parallel=0, multihost=False),
    in_channels=f_dim,
).fit_fused(train_ds, dev_ds)
np.testing.assert_allclose(
    [h["train_loss"] for h in det_f_mh["history"]],
    [h["train_loss"] for h in det_f_sd["history"]], rtol=5e-3,
    err_msg="multihost fused detector losses must match single-device fused",
)
assert det_f_mh["best_eer"] == det_f_sd["best_eer"], (
    det_f_mh["best_eer"], det_f_sd["best_eer"],
)

# --- hybrid serving with a CNN1D supervised leg across the cluster
# (dfac-predict-hybrid --fast --multihost --cnn-model cnn1d): both folded
# legs per shard from one batch-sharded feature tensor, parity vs the
# single-device fast chains
import jax.numpy as jnp  # noqa: E402

from dfac_tpu.models import build_model  # noqa: E402
from dfac_tpu.models.fast_infer import (  # noqa: E402
    cae_fast_mse,
    cnn1d_fast_scores,
    fold_cae,
    fold_cnn1d,
)
from dfac_tpu.parallel.mesh import make_mesh  # noqa: E402
from dfac_tpu.parallel.serving import make_sharded_hybrid_scorer  # noqa: E402

mesh = make_mesh()  # all 8 global devices on 'data'
hyb_T = 33  # T must survive the CAE's four (2,2) pools (33 -> 16 -> 8 -> 4 -> 2)
hyb_B = 16
hyb_feats = rng.normal(size=(hyb_B, f_dim, hyb_T)).astype(np.float32)
m1 = build_model("cnn1d", in_channels=f_dim)
v1 = m1.init({"params": jax.random.key(9)}, jnp.zeros((1, hyb_T, f_dim)))
cae_m = build_model("cae", base_channels=4)
cae_v = cae_m.init({"params": jax.random.key(10)}, jnp.zeros((1, hyb_T, f_dim)))
folded_sup, folded_cae = fold_cnn1d(v1), fold_cae(cae_v)
nrm_mean = jnp.zeros((f_dim,), jnp.float32)
nrm_std = jnp.ones((f_dim,), jnp.float32)
hyb = make_sharded_hybrid_scorer(mesh, compute_dtype=jnp.float32, model="cnn1d")
hlo, hhi = mh.local_row_range(mesh, hyb_B)
sup_sh, mse_sh = hyb(
    mh.replicate_tree(folded_sup, mesh), mh.replicate_tree(folded_cae, mesh),
    nrm_mean, nrm_std,
    mh.batch_from_local(hyb_feats[hlo:hhi], mesh, global_rows=hyb_B),
)
np.testing.assert_allclose(
    mh.gather_rows(sup_sh),
    np.asarray(cnn1d_fast_scores(
        folded_sup, jnp.asarray(hyb_feats), compute_dtype=jnp.float32
    )),
    atol=1e-5, err_msg="multihost cnn1d hybrid sup leg must match single-device",
)
np.testing.assert_allclose(
    mh.gather_rows(mse_sh),
    np.asarray(cae_fast_mse(
        folded_cae, jnp.asarray(hyb_feats), nrm_mean, nrm_std,
        compute_dtype=jnp.float32,
    )),
    rtol=1e-5, atol=1e-6,
    err_msg="multihost cnn1d hybrid CAE leg must match single-device",
)

mh.sync("done2")
jax.distributed.shutdown()
print(f"ALL OK {pid}", flush=True)
