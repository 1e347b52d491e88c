"""Worker for tests/test_multihost.py — one process of a 2-process cluster.

Usage: python multihost_worker.py <port> <process_id>

Joins a 2-process x 4-virtual-CPU-device JAX cluster (gloo cross-process
collectives) and asserts numeric parity of every multi-host path in
dfac_tpu.parallel.multihost against single-device references. Both
processes build the synthetic batch from the same seed, so the full-batch
reference is computable locally on each.

Prints "ALL OK <pid>" and exits 0 on success; any assertion or hang is the
test failure signal.
"""

from __future__ import annotations

import sys

port, pid = sys.argv[1], int(sys.argv[2])

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

from dfac_tpu.parallel import multihost as mh  # noqa: E402

mh.initialize(f"localhost:{port}", num_processes=2, process_id=pid)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dfac_tpu.features.lfcc import LFCCConfig, lfcc_features  # noqa: E402
from dfac_tpu.models import build_model  # noqa: E402
from dfac_tpu.models.fast_infer import cnn2d_fast_scores_tf, fold_cnn2d  # noqa: E402
from dfac_tpu.parallel.data_parallel import (  # noqa: E402
    make_shard_map_train_step,
    make_sharded_eval_step,
)
from dfac_tpu.parallel.mesh import make_mesh, shard_train_state  # noqa: E402
from dfac_tpu.parallel.serving import make_sharded_fast_scorer  # noqa: E402
from dfac_tpu.train.loop import TrainState, make_train_step  # noqa: E402
from dfac_tpu.train.optim import build_optimizer  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, jax.devices()
assert len(jax.local_devices()) == 4
assert mh.is_coordinator() == (pid == 0)

f_dim, t_dim, batch = 16, 24, 16
rng = np.random.default_rng(0)  # identical on both processes
feats = rng.normal(size=(batch, f_dim, t_dim)).astype(np.float32)
labels = (np.arange(batch) % 2).astype(np.float32)
weights = np.ones((batch,), np.float32)

mesh = make_mesh()  # all 8 global devices on 'data'

lo, hi = mh.local_row_range(mesh, batch)
assert (lo, hi) == (pid * (batch // 2), (pid + 1) * (batch // 2)), (lo, hi)


def init_state(axis_name):
    model = build_model(
        "cnn2d", in_features=f_dim, base_channels=4,
        axis_name=axis_name, dropout=0.0,
    )
    tx = build_optimizer("cnn2d", 1e-3)
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, t_dim, f_dim))
    )
    return model, tx, TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        key=jax.random.key(1),
    )


def shards_match(global_arr, reference_rows, **tol):
    """Each addressable shard of a leading-axis-sharded global array must
    equal its slice of the locally computed full reference."""
    for s in global_arr.addressable_shards:
        np.testing.assert_allclose(
            np.asarray(s.data), reference_rows[s.index[0]], **tol
        )


# --- single-device reference step (dedicated state: donation-safe)
model_ref, tx_ref, state_ref = init_state(None)
ref_step = make_train_step(
    model_ref, tx_ref, swap_tf=True, label_smoothing=0.05, augment_fn=None
)
_, ref_loss_sum, ref_count = ref_step(
    state_ref, jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(weights)
)
ref_loss_sum, ref_count = float(ref_loss_sum), int(ref_count)

# --- GSPMD train step over the multi-host mesh, batch fed per-process
model, tx, state = init_state(None)
gstate = shard_train_state(state, mesh, min_shard_elems=64, placer=mh.put_global)
step = make_train_step(
    model, tx, swap_tf=True, label_smoothing=0.05, augment_fn=None
)
gf = mh.batch_from_local(feats[lo:hi], mesh, global_rows=batch)
gl = mh.batch_from_local(labels[lo:hi], mesh, global_rows=batch)
gw = mh.batch_from_local(weights[lo:hi], mesh, global_rows=batch)
_, g_loss_sum, g_count = step(gstate, gf, gl, gw)
np.testing.assert_allclose(
    float(mh.fetch_replicated(g_loss_sum)), ref_loss_sum, rtol=1e-5,
    err_msg="multi-host GSPMD step loss must match single-device",
)
assert int(mh.fetch_replicated(g_count)) == ref_count == batch

# --- explicit shard_map DP step (axis-synced BatchNorm) over two hosts
model_dp, tx_dp, state_dp = init_state("data")
dp_step = make_shard_map_train_step(
    model_dp, tx_dp, mesh, swap_tf=True, label_smoothing=0.05
)
dp_state = mh.replicate_tree(state_dp, mesh)
dp_state_out, dp_loss_sum, dp_count = dp_step(dp_state, gf, gl, gw)
np.testing.assert_allclose(
    float(mh.fetch_replicated(dp_loss_sum)), ref_loss_sum, rtol=1e-5,
    err_msg="multi-host shard_map DP loss must match single-device",
)
assert int(mh.fetch_replicated(dp_count)) == batch

# --- sharded eval: per-shard logits equal the local full-batch forward
eval_step = make_sharded_eval_step(model_dp, mesh, swap_tf=True)
dp_vars = {"params": dp_state_out.params}
if dp_state_out.batch_stats:
    dp_vars["batch_stats"] = dp_state_out.batch_stats
logits = eval_step(dp_vars, gf)
host_vars = jax.tree.map(mh.fetch_replicated, dp_vars)
ref_logits = np.asarray(
    model_dp.apply(host_vars, jnp.transpose(jnp.asarray(feats), (0, 2, 1)))
).reshape(-1)
shards_match(logits, ref_logits, rtol=2e-5, atol=1e-6)

# --- folded fast serving chain sharded over both hosts
cfg = LFCCConfig(win_length=32, hop_length=16, n_fft=64, n_filters=16, n_ceps=8)
e2e_model = build_model("cnn2d", in_features=cfg.feature_dim, base_channels=4)
n_frames = 12
waves = rng.normal(size=(batch, cfg.num_samples(n_frames))).astype(np.float32)
e2e_vars = e2e_model.init(
    {"params": jax.random.key(2)}, jnp.zeros((1, n_frames, cfg.feature_dim))
)
folded = fold_cnn2d(e2e_vars)
scorer = make_sharded_fast_scorer(mesh, cfg=cfg, frontend="fft")
scores = scorer(
    mh.replicate_tree(folded, mesh),
    mh.batch_from_local(waves[lo:hi], mesh, global_rows=batch),
)
feats_tf = jnp.swapaxes(lfcc_features(jnp.asarray(waves), cfg, use_pallas=False), -1, -2)
fast_ref = np.asarray(cnn2d_fast_scores_tf(folded, feats_tf))
shards_match(scores, fast_ref, atol=1e-6)

# --- full Trainer.fit across the cluster: the multihost DP trainer must
# walk the same per-epoch loss/EER trajectory as a single-device Trainer
# on the same corpus (identical shuffle seeds and batch partition), and
# only the coordinator may write checkpoints
import dataclasses  # noqa: E402
import os  # noqa: E402
import tempfile  # noqa: E402

from dfac_tpu.data.pipeline import ArrayDataset  # noqa: E402
from dfac_tpu.train.loop import TrainConfig, Trainer  # noqa: E402

n_tr, n_dev = 24, 16
tr_feats = rng.normal(size=(n_tr, f_dim, t_dim)).astype(np.float32)
tr_labels = (np.arange(n_tr) % 2).astype(np.int32)
tr_feats[tr_labels == 1, : f_dim // 2, :] += 2.0
dv_feats = rng.normal(size=(n_dev, f_dim, t_dim)).astype(np.float32)
dv_labels = (np.arange(n_dev) % 2).astype(np.int32)
dv_feats[dv_labels == 1, : f_dim // 2, :] += 2.0
train_ds = ArrayDataset(
    uttids=[f"t{i}" for i in range(n_tr)], features=tr_feats, labels=tr_labels
)
dev_ds = ArrayDataset(
    uttids=[f"d{i}" for i in range(n_dev)], features=dv_feats, labels=dv_labels
)
cfg_mh = TrainConfig(
    model="cnn2d", batch_size=8, epochs=2, lr=1e-3, in_features=f_dim,
    seed=0, label_smoothing=0.05, dropout=0.0,
    data_parallel=8, multihost=True,
)
ckpt_dir = os.path.join(tempfile.mkdtemp(prefix=f"mh_ckpt_{pid}_"), "out")
trainer_mh = Trainer(cfg_mh)
trainer_mh.fit(train_ds, dev_ds, checkpoint_dir=ckpt_dir)

cfg_sd = dataclasses.replace(cfg_mh, data_parallel=0, multihost=False)
trainer_sd = Trainer(cfg_sd)
trainer_sd.fit(train_ds, dev_ds)

assert len(trainer_mh.history) == len(trainer_sd.history) == 2
for m_mh, m_sd in zip(trainer_mh.history, trainer_sd.history):
    # the single-device CNN2D step runs the hand-scheduled backward while
    # the DP step runs flax AD — same math, different reassociation, and
    # the float drift compounds across the 2-epoch trajectory (measured
    # ~1e-3 rel by epoch 2; placement bugs — wrong row slice, missing BN
    # sync — move losses by 1e-2..1e-1, far outside this band)
    np.testing.assert_allclose(
        m_mh.train_loss, m_sd.train_loss, rtol=5e-3,
        err_msg="multihost epoch train loss must match single-device",
    )
    np.testing.assert_allclose(m_mh.dev_loss, m_sd.dev_loss, rtol=5e-3)
    assert m_mh.dev_eer == m_sd.dev_eer, (m_mh.dev_eer, m_sd.dev_eer)

wrote = os.path.isdir(ckpt_dir) and bool(os.listdir(ckpt_dir))
assert wrote == (pid == 0), (
    f"checkpoints must come from the coordinator only (pid={pid}, wrote={wrote})"
)

# --- multihost resume: the checkpoint exists ONLY on the coordinator's
# filesystem; restore() must broadcast it instead of every process opening
# the path (which does not exist for pid 1)
resume_path = os.path.join(ckpt_dir, "cnn2d_last.ckpt")
assert os.path.exists(resume_path) == (pid == 0)
tr_resumed = Trainer(dataclasses.replace(cfg_mh, epochs=3))
tr_resumed.fit(train_ds, dev_ds, resume_from=resume_path)
assert [m.epoch for m in tr_resumed.history] == [3], tr_resumed.history
assert np.isfinite(tr_resumed.history[-1].train_loss)

# --- CAE trainer in multihost mode (1 epoch) vs single-device
from dfac_tpu.train.cae_loop import CAEConfig, CAETrainer  # noqa: E402

n_cae = 32  # bonafide count must tile into dp-divisible batches
cae_feats = rng.normal(size=(n_cae, f_dim, t_dim)).astype(np.float32)
cae_train = ArrayDataset(
    uttids=[f"c{i}" for i in range(n_cae)], features=cae_feats,
    labels=np.ones(n_cae, np.int32),
)
cae_dev = ArrayDataset(
    uttids=[f"cd{i}" for i in range(16)],
    features=rng.normal(size=(16, f_dim, t_dim)).astype(np.float32),
    labels=np.ones(16, np.int32),
)
cae_cfg = CAEConfig(
    batch_size=8, epochs=1, base_channels=4, seed=0,
    data_parallel=8, multihost=True,
)
cae_res = CAETrainer(cae_cfg).fit(cae_train, cae_dev)
cae_res_sd = CAETrainer(
    dataclasses.replace(cae_cfg, data_parallel=0, multihost=False)
).fit(cae_train, cae_dev)
np.testing.assert_allclose(
    cae_res["best_val_mse"], cae_res_sd["best_val_mse"], rtol=1e-4,
    err_msg="multihost CAE val MSE must match single-device",
)
np.testing.assert_allclose(
    cae_res["history"][0].train_loss, cae_res_sd["history"][0].train_loss,
    rtol=1e-4,
)

# --- detector trainer in multihost mode (1 epoch) vs single-device
from dfac_tpu.train.detector_loop import DetectorConfig, DetectorTrainer  # noqa: E402

det_cfg = DetectorConfig(
    epochs=1, batch_size=8, hidden=16, dropout=0.0, specaug=False,
    ema=True, seed=3, data_parallel=8, multihost=True,
)
det_res = DetectorTrainer(det_cfg, in_channels=f_dim).fit(train_ds, dev_ds)
det_res_sd = DetectorTrainer(
    dataclasses.replace(det_cfg, data_parallel=0, multihost=False),
    in_channels=f_dim,
).fit(train_ds, dev_ds)
np.testing.assert_allclose(
    det_res["history"][0]["train_loss"], det_res_sd["history"][0]["train_loss"],
    # psum'd shard sums reassociate differently from single-device sums and
    # the drift compounds through Adam's sqrt(v) normalization over the
    # epoch's updates (measured ~2e-3 rel); feeding/sync bugs move the loss
    # by orders of magnitude more
    rtol=5e-3, err_msg="multihost detector train loss must match single-device",
)
assert det_res["best_eer"] == det_res_sd["best_eer"], (
    det_res["best_eer"], det_res_sd["best_eer"],
)

# --- the dfac-predict --fast --multihost composition: sharded feature
# scorer fed per-process row slices, scores allgathered on every host
from dfac_tpu.models.fast_infer import cnn2d_fast_scores  # noqa: E402
from dfac_tpu.parallel.serving import make_sharded_cnn2d_feature_scorer  # noqa: E402
from dfac_tpu.train.evaluate import collect_masked_scores  # noqa: E402

pm = build_model("cnn2d", in_features=f_dim, base_channels=4)
pv = pm.init({"params": jax.random.key(8)}, jnp.zeros((1, t_dim, f_dim)))
folded_p = fold_cnn2d(pv)
scorer_p = make_sharded_cnn2d_feature_scorer(
    mesh, swap_tf=True, apply_sigmoid=True, compute_dtype=jnp.float32
)
folded_pg = mh.replicate_tree(folded_p, mesh)
B = 8
plo, phi = mh.local_row_range(mesh, B)
scores_mh = collect_masked_scores(
    lambda f: scorer_p(folded_pg, f), train_ds, B,
    prepare_batch=lambda b: mh.batch_from_local(
        np.asarray(b.features[plo:phi]), mesh, global_rows=B
    ),
    gather=mh.gather_rows,
)
pred_ref = np.asarray(
    cnn2d_fast_scores(
        folded_p, jnp.asarray(tr_feats), apply_sigmoid=True,
        compute_dtype=jnp.float32,
    )
)
np.testing.assert_allclose(
    scores_mh, pred_ref, atol=1e-6,
    err_msg="multihost predict scores must match the single-device fast chain",
)

# --- --ingest-int8 x --multihost: each process quantizes only ITS row
# slice; sharded q8 scorer == single-device q8 chain exactly (per-row
# scales are row-local, so the host split cannot change the math)
from dfac_tpu.io.fastcast import quant_i8  # noqa: E402
from dfac_tpu.models.fast_infer import cnn2d_fast_scores_q8  # noqa: E402

scorer_q8 = make_sharded_cnn2d_feature_scorer(
    mesh, swap_tf=True, apply_sigmoid=True, compute_dtype=jnp.float32,
    ingest_int8=True,
)


def _prepare_q8(b):
    q, scales = quant_i8(np.ascontiguousarray(b.features[plo:phi]))
    return (
        mh.batch_from_local(q, mesh, global_rows=B),
        mh.batch_from_local(scales, mesh, global_rows=B),
    )


scores_q8_mh = collect_masked_scores(
    lambda qs: scorer_q8(folded_pg, qs[0], qs[1]), train_ds, B,
    prepare_batch=_prepare_q8, gather=mh.gather_rows,
)
q_all, s_all = quant_i8(np.ascontiguousarray(tr_feats))
q8_ref = np.asarray(
    cnn2d_fast_scores_q8(
        folded_p, jnp.asarray(q_all), jnp.asarray(s_all),
        apply_sigmoid=True, compute_dtype=jnp.float32,
    )
)
np.testing.assert_allclose(
    scores_q8_mh, q8_ref, atol=1e-6,
    err_msg="multihost q8 predict scores must match the single-device q8 chain",
)

mh.sync("done")
jax.distributed.shutdown()
print(f"ALL OK {pid}", flush=True)
