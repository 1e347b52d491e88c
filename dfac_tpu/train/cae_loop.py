"""CAE (anomaly) training + evaluation.

Feature-parity targets:

* Trainer — reference ``src/train_cae.py``: bonafide-only MSE reconstruction
  training on normalized, swapped (T, F) spectrograms; AdamW lr=1e-4
  wd=1e-4; ReduceLROnPlateau(patience=7) on validation MSE; early stop 10;
  best = min bonafide-dev reconstruction MSE; artifacts ``cae_best`` /
  ``cae_last`` / normalizer sidecar.
* Evaluator — reference ``src/evaluation_cae.py``: per-sample MSE over
  (T, F); **dual scoring convention** (EER computed for both -MSE and +MSE,
  keep the better; on this corpus fakes reconstruct *better*, so +MSE is the
  bonafide score — ``results/cae_v7_dev_eval.txt:16-18``); per-class mean
  MSE and spoof/bonafide ratio report.

The train step (normalize -> forward -> masked MSE -> update) is one jit'd
program; scoring batches the whole corpus on device.
"""

from __future__ import annotations

import dataclasses
import functools
import time


import jax
import jax.numpy as jnp
import numpy as np
import optax

from dfac_tpu.data.normalizer import FeatureNormalizer, build_normalizer
from dfac_tpu.data.pipeline import ArrayDataset, batch_iterator
from dfac_tpu.models import build_model
from dfac_tpu.models.cae import reconstruction_mse
from dfac_tpu.utils.rng import train_key
from dfac_tpu.obs.base import BatchMetrics, EpochMetrics, TrainingConfig, TrainingVisualizer
from dfac_tpu.obs.noop import NoOpVisualizer
from dfac_tpu.ops.eer import eer_device
from dfac_tpu.train import checkpoint as ckpt_lib
from dfac_tpu.train.loop import TrainState, _set_opt_lr
from dfac_tpu.train.optim import PlateauScheduler


@dataclasses.dataclass
class CAEConfig:
    """Reference train_cae.py defaults (``src/train_cae.py:114-126``)."""

    batch_size: int = 32
    epochs: int = 80
    lr: float = 1e-4
    weight_decay: float = 1e-4
    lr_scheduler_patience: int = 7
    lr_scheduler_factor: float = 0.5
    early_stop: int = 10
    base_channels: int = 32
    seed: int = 0
    swap_tf: bool = True
    eval_batch_size: int | None = None
    device_resident: bool = False  # corpus in HBM; epoch = one scan program
    data_parallel: int = 0  # shard_map DP over N devices (0/1 = single device)
    # stream the epoch in chunks of N batches (one dispatch per chunk,
    # upload overlapped) — for bonafide corpora larger than HBM; 0 = off
    resident_chunk_batches: int = 0
    # chunked-upload compression: f32 | bf16 | int8 (see TrainConfig)
    chunk_ingest: str = "f32"
    # fast-numerics recipe: freeze every BatchNorm (encoder + decoder;
    # running-stats forward, no stat updates) for epochs AFTER
    # round(epochs * frac); 0 disables. The CAE has no dropout, so the
    # freeze tail IS its whole --train-fast recipe. Quality gate:
    # results/alt_trainer_fast_ab.md
    bn_freeze_after_frac: float = 0.0
    # multi-host pod training (one process per host, jax.distributed
    # initialized): host-loop DP with per-process batch feeding
    multihost: bool = False
    checkpoint_format: str = "pickle"  # pickle (single file) | orbax (directory)

    def __post_init__(self):
        if self.data_parallel > 1 and self.batch_size % self.data_parallel != 0:
            raise ValueError("batch_size must divide evenly over data_parallel shards")
        if self.multihost and self.data_parallel <= 1:
            raise ValueError(
                "multihost CAE training is data-parallel over the pod — "
                "set data_parallel to the GLOBAL device count"
            )
        # multihost + device_resident is the GSPMD resident/fused path
        # (corpus replicated per host, batches sharding-constrained)
        if self.resident_chunk_batches < 0:
            raise ValueError("resident_chunk_batches must be >= 0")
        if self.resident_chunk_batches and self.device_resident:
            raise ValueError(
                "resident_chunk_batches streams the corpus in chunks; it is "
                "the larger-than-HBM alternative to device_resident — set one"
            )
        from dfac_tpu.train.chunked import INGEST_MODES

        if self.chunk_ingest not in INGEST_MODES:
            raise ValueError(f"chunk_ingest must be one of {INGEST_MODES}")
        if self.chunk_ingest != "f32" and not self.resident_chunk_batches:
            raise ValueError(
                "chunk_ingest compresses the chunked-streaming upload — it "
                "needs resident_chunk_batches > 0"
            )
        if not (0.0 <= self.bn_freeze_after_frac <= 1.0):
            raise ValueError("bn_freeze_after_frac must be in [0, 1]")
        # chunked + data_parallel composes (a G-batch scan of the shard_map
        # DP step); the tail-divisibility check needs the bonafide corpus
        # length, so it lives in fit()


def make_cae_train_step(model, tx, mean, std, bn_frozen: bool = False):
    """``bn_frozen=True`` builds the freeze-tail variant: every BatchNorm
    (encoder + decoder) runs on its running stats and the stat-update
    traffic disappears (same recipe contract as
    :func:`dfac_tpu.train.loop.make_train_step`)."""
    @jax.jit
    def train_step(state: TrainState, feats, weights):
        next_key, drop_key = jax.random.split(state.key)
        x = (jnp.transpose(feats, (0, 2, 1)) - mean) / std  # swap + normalize on device

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            (recon, _), mutated = model.apply(
                variables, x, train=True, bn_frozen=bn_frozen,
                mutable=["batch_stats"], rngs={"dropout": drop_key},
            )
            per = reconstruction_mse(recon, x)  # (B,)
            denom = jnp.maximum(jnp.sum(weights), 1.0)
            return jnp.sum(per * weights) / denom, mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        count = jnp.sum(weights)
        return (
            state.replace(
                params=new_params,
                batch_stats=mutated.get("batch_stats", state.batch_stats),
                opt_state=new_opt_state,
                key=next_key,
            ),
            loss * count,
            count,
        )

    return train_step


def make_cae_dp_train_step(model, tx, mean, std, mesh, axis_name: str = "data",
                           bn_frozen: bool = False):
    """shard_map data-parallel CAE train step over ``mesh``'s 'data' axis.

    Mirrors :func:`dfac_tpu.parallel.data_parallel.make_shard_map_train_step`
    (reference trainer: ``src/train_cae.py:58-82``, single-device): the
    bonafide batch splits over shards, BatchNorm batch statistics sync with
    ``lax.pmean`` (the model must be built with ``axis_name='data'``), and
    gradients come out of shard_map's AD as the gradient of the *global*
    weighted sum (params enter replicated, so cross-shard psum on their
    cotangents is automatic); one division by the global count yields the
    exact global-batch mean gradient. Dropout keys fold in the shard index
    so each shard draws independent masks.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def per_shard(state, feats, weights):
        next_key, drop_key = jax.random.split(state.key)
        drop_key = jax.random.fold_in(drop_key, jax.lax.axis_index(axis_name))
        x = (jnp.transpose(feats, (0, 2, 1)) - mean) / std

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            (recon, _), mutated = model.apply(
                variables, x, train=True, bn_frozen=bn_frozen,
                mutable=["batch_stats"], rngs={"dropout": drop_key},
            )
            per = reconstruction_mse(recon, x)
            return jnp.sum(per * weights), mutated

        (local_sum, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        count = jax.lax.psum(jnp.sum(weights), axis_name)
        grads = jax.tree.map(lambda g: g / jnp.maximum(count, 1.0), grads)
        loss_sum = jax.lax.psum(local_sum, axis_name)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                params=new_params,
                batch_stats=mutated.get("batch_stats", state.batch_stats),
                opt_state=new_opt_state,
                key=next_key,
            ),
            loss_sum,
            count,
        )

    return jax.jit(
        shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P(axis_name), P(axis_name)),
            out_specs=(P(), P(), P()),
        )
    )


def make_cae_indexed_step(model, tx, mean, std, bn_frozen: bool = False):
    """Device-resident per-batch variant: the corpus lives in HBM and each
    step receives only an int32 index vector (mirrors
    :func:`dfac_tpu.train.loop.make_indexed_train_step`). Used when a live
    batch UI needs per-step updates but the corpus should stay resident."""
    step = make_cae_train_step(model, tx, mean, std, bn_frozen=bn_frozen)
    base = step.__wrapped__ if hasattr(step, "__wrapped__") else step

    @jax.jit
    def indexed_step(state: TrainState, feats_all, idx, weights):
        feats = jnp.take(feats_all, idx, axis=0)
        return base(state, feats, weights)

    return indexed_step


def make_cae_epoch_scan(model, tx, mean, std, n_examples: int, batch_size: int,
                        mesh=None, bn_frozen: bool = False):
    """One jit program per CAE epoch over a device-resident bonafide corpus
    (device-side shuffle, no per-epoch host transfers; mirrors
    :func:`dfac_tpu.train.loop.make_epoch_scan`). With ``mesh``, every
    batch is sharding-constrained onto the mesh's 'data' axis — the GSPMD
    data-parallel epoch program (multi-host pods included: corpus
    replicated per host, compute sharded, outputs replicated)."""
    from dfac_tpu.parallel.mesh import batch_constrainer, replicated_jit

    constrain = batch_constrainer(mesh)
    step = make_cae_train_step(model, tx, mean, std, bn_frozen=bn_frozen)
    base = step.__wrapped__ if hasattr(step, "__wrapped__") else step
    n_full = n_examples // batch_size
    tail = n_examples % batch_size

    def epoch_scan(state: TrainState, feats_all, epoch_seed):
        perm = jax.random.permutation(jax.random.key(epoch_seed), n_examples).astype(jnp.int32)
        idx_mat = perm[: n_full * batch_size].reshape(n_full, batch_size)
        ones = constrain(jnp.ones((batch_size,), jnp.float32))

        def body(carry, idx):
            st, loss_acc, count_acc = carry
            feats = constrain(jnp.take(feats_all, idx, axis=0))
            st, loss_sum, count = base(st, feats, ones)
            return (st, loss_acc + loss_sum, count_acc + count), None

        (state_out, loss, count), _ = jax.lax.scan(
            body, (state, jnp.zeros(()), jnp.zeros(())), idx_mat
        )
        if tail:
            # true-size tail step in the same program: no pad rows in BN stats
            feats = constrain(jnp.take(feats_all, perm[n_full * batch_size :], axis=0))
            state_out, tail_loss, tail_count = base(
                state_out, feats, constrain(jnp.ones((tail,), jnp.float32))
            )
            loss, count = loss + tail_loss, count + tail_count
        return state_out, loss, count

    return replicated_jit(epoch_scan, mesh)


def make_cae_chunk_scan(model, tx, mean, std):
    """``lax.scan`` of the CAE train step over a chunk of pre-batched rows:
    ``feats (g, B, F, T) -> state', loss_sum, count`` — the building block
    of chunked streaming CAE training for bonafide corpora larger than HBM
    (mirrors :func:`dfac_tpu.train.loop.make_chunk_scan`; same batches and
    ``state.key`` chain as the per-batch host loop, floats up to XLA
    reassociation)."""
    from dfac_tpu.train.chunked import chunk_scan_over

    return chunk_scan_over(
        make_cae_train_step(model, tx, mean, std),
        append_ones=True, track_count=True,
    )


def make_cae_dp_chunk_scan(model, tx, mean, std, mesh):
    """Chunked streaming x data parallelism for the CAE: a ``lax.scan``
    over the shard_map DP step (each chunk batch dim sharded over 'data';
    mirrors :func:`dfac_tpu.train.loop.make_dp_chunk_scan`)."""
    from dfac_tpu.train.chunked import chunk_scan_over

    return chunk_scan_over(
        make_cae_dp_train_step(model, tx, mean, std, mesh),
        append_ones=True, track_count=True,
    )


def make_fused_cae_fit(
    model, tx, cfg: CAEConfig, mean, std, n_train: int, n_dev: int, mesh=None
):
    """Whole CAE training run as ONE dispatch (mirrors
    :func:`dfac_tpu.train.fused_fit.make_fused_fit` with the CAE recipe:
    best = min bonafide-dev reconstruction MSE, ReduceLROnPlateau on val
    MSE, early stop on no-improve epochs — reference ``src/train_cae.py``
    defaults lr 1e-4 / plateau 7 / stop 10).

    Returns ``fused(state, train_feats, dev_feats, dev_idx, dev_w) ->
    (final_state, best_vars, aux, history)``; history rows are
    (train_loss, val_mse, lr, is_best, stopped) device arrays.

    With ``mesh`` the program is GSPMD data-parallel over 'data' (train +
    validation batches constrained, outputs replicated) — one dispatch per
    RUN across a multi-host pod, fed replicated corpora on every host.
    """
    from dfac_tpu.parallel.mesh import batch_constrainer, replicated_jit

    constrain = batch_constrainer(mesh)
    epoch_scan = make_cae_epoch_scan(
        model, tx, mean, std, n_examples=n_train, batch_size=cfg.batch_size,
        mesh=mesh,
    )
    # BN freeze tail inside the one-dispatch program (same boundary rule as
    # fit()'s per-epoch selection and train/fused_fit.py)
    freeze_frac = cfg.bn_freeze_after_frac
    frozen_scan = None
    if freeze_frac:
        frozen_scan = make_cae_epoch_scan(
            model, tx, mean, std, n_examples=n_train,
            batch_size=cfg.batch_size, mesh=mesh, bn_frozen=True,
        )
    freeze_epoch = round(cfg.epochs * freeze_frac)
    bs = cfg.eval_batch_size or cfg.batch_size
    base_seed = cfg.seed * 100003
    # plateau constants come from the host scheduler so the fused and
    # per-epoch trajectories cannot drift if its defaults change
    threshold = PlateauScheduler.threshold
    min_lr = PlateauScheduler.min_lr
    loss_eps = 0.0  # best = strict min val MSE (reference ``:277-283``)
    set_lr = _set_opt_lr

    def fused(state: TrainState, tf, df, didx, dw):
        def variables_of(st):
            v = {"params": st.params}
            if st.batch_stats:
                v["batch_stats"] = st.batch_stats
            return v

        def validate(st):
            def body(acc, args):
                idx, w = args
                feats_b = constrain(jnp.take(df, idx, axis=0))
                x = (jnp.transpose(feats_b, (0, 2, 1)) - mean) / std
                recon, _ = model.apply(variables_of(st), x)
                per = reconstruction_mse(recon, x)
                return acc + jnp.sum(per * constrain(w)), None

            total, _ = jax.lax.scan(body, jnp.zeros(()), (didx, dw))
            return total / n_dev

        def run_epoch(carry, epoch):
            (state, best_vars, best_opt, best_sched, best_val, best_epoch,
             no_improve, sched_best, sched_bad, lr, stopped) = carry
            state = state.replace(opt_state=set_lr(state.opt_state, lr))
            if frozen_scan is None:
                state, loss_sum, count = epoch_scan(state, tf, base_seed + epoch)
            else:
                state, loss_sum, count = jax.lax.cond(
                    epoch > freeze_epoch,
                    lambda st: frozen_scan(st, tf, base_seed + epoch),
                    lambda st: epoch_scan(st, tf, base_seed + epoch),
                    state,
                )
            train_loss = loss_sum / jnp.maximum(count, 1.0)
            val = validate(state)

            first = jnp.isinf(best_val)
            is_best = jnp.logical_or(first, val < best_val - loss_eps)
            best_val = jnp.where(is_best, val, best_val)
            best_epoch = jnp.where(is_best, epoch, best_epoch)
            no_improve = jnp.where(is_best, 0, no_improve + 1)
            best_vars = jax.tree.map(
                lambda b, c: jnp.where(is_best, c, b), best_vars, variables_of(state)
            )
            # optimizer + scheduler snapshot at the best epoch, matching the
            # per-epoch trainer's save point: opt_state AFTER this epoch's
            # updates, scheduler counters BEFORE this epoch's plateau step
            best_opt = jax.tree.map(
                lambda b, c: jnp.where(is_best, c, b), best_opt, state.opt_state
            )
            best_sched = jax.tree.map(
                lambda b, c: jnp.where(is_best, c, b),
                best_sched, (sched_best, sched_bad, lr),
            )

            sched_first = jnp.isinf(sched_best)
            improved = jnp.logical_or(sched_first, val < sched_best * (1.0 - threshold))
            sched_best = jnp.where(improved, val, sched_best)
            sched_bad = jnp.where(improved, 0, sched_bad + 1)
            reduce_now = sched_bad > cfg.lr_scheduler_patience
            lr = jnp.where(
                reduce_now, jnp.maximum(lr * cfg.lr_scheduler_factor, min_lr), lr
            )
            sched_bad = jnp.where(reduce_now, 0, sched_bad)

            stopped = jnp.logical_or(
                stopped, (no_improve >= cfg.early_stop) if cfg.early_stop else False
            )
            carry = (state, best_vars, best_opt, best_sched, best_val,
                     best_epoch, no_improve, sched_best, sched_bad, lr, stopped)
            return carry, (train_loss, val, lr, is_best, stopped)

        def skip_epoch(carry, epoch):
            del epoch
            nan = jnp.float32(jnp.nan)
            return carry, (nan, nan, carry[9], jnp.asarray(False), jnp.asarray(True))

        def body(carry, epoch):
            if not cfg.early_stop:
                # early stop disabled -> `stopped` can never become True;
                # dropping the dead lax.cond lets XLA pipeline across the
                # epoch boundary (see train/fused_fit.py, same finding)
                return run_epoch(carry, epoch)
            return jax.lax.cond(carry[-1], skip_epoch, run_epoch, carry, epoch)

        init = (
            state,
            jax.tree.map(jnp.copy, variables_of(state)),
            jax.tree.map(jnp.copy, state.opt_state),
            (jnp.float32(jnp.inf), jnp.int32(0), jnp.float32(cfg.lr)),
            jnp.float32(jnp.inf),   # best_val
            jnp.int32(0),           # best_epoch
            jnp.int32(0),           # no_improve
            jnp.float32(jnp.inf),   # sched_best
            jnp.int32(0),           # sched_bad
            jnp.float32(cfg.lr),
            jnp.asarray(False),
        )
        carry, history = jax.lax.scan(body, init, jnp.arange(1, cfg.epochs + 1))
        (final_state, best_vars, best_opt, best_sched, best_val, best_epoch,
         no_improve, sched_best, sched_bad, lr, _stopped) = carry
        aux = {
            "best_val": best_val, "best_epoch": best_epoch,
            "no_improve": no_improve, "sched_best": sched_best,
            "sched_bad": sched_bad, "lr": lr,
            "best_sched_best": best_sched[0], "best_sched_bad": best_sched[1],
            "best_lr": best_sched[2],
        }
        return final_state, best_vars, best_opt, aux, history

    # dev batching layout shared with cae_mse_scores' padded iteration
    n_b = -(-n_dev // bs)
    idx = np.full((n_b * bs,), 0, np.int32)
    idx[:n_dev] = np.arange(n_dev)
    w = np.zeros((n_b * bs,), np.float32)
    w[:n_dev] = 1.0
    return (
        replicated_jit(fused, mesh),
        jnp.asarray(idx.reshape(n_b, bs)),
        jnp.asarray(w.reshape(n_b, bs)),
    )


@functools.partial(jax.jit, static_argnames=("model",))
def _cae_score_step(model, variables, feats, mean, std):
    x = (jnp.transpose(feats, (0, 2, 1)) - mean) / std
    recon, _ = model.apply(variables, x)
    return reconstruction_mse(recon, x)


def cae_mse_scores(
    model, variables, ds: ArrayDataset, normalizer: FeatureNormalizer, batch_size: int = 128
) -> np.ndarray:
    """Per-utterance reconstruction MSE, dataset order."""
    mean = jnp.asarray(normalizer.mean)
    std = jnp.asarray(normalizer.std)
    out = []
    for batch in batch_iterator(ds, batch_size):
        mse = _cae_score_step(model, variables, jnp.asarray(batch.features), mean, std)
        out.append(np.asarray(mse)[batch.weights > 0])
    return np.concatenate(out) if out else np.zeros((0,), np.float32)


def evaluate_cae(
    model, variables, ds: ArrayDataset, normalizer: FeatureNormalizer, batch_size: int = 128
) -> dict:
    """Dual-convention CAE evaluation (reference ``src/evaluation_cae.py:50-87``)."""
    if ds.labels is None:
        raise ValueError("evaluate_cae needs labels")
    mse = cae_mse_scores(model, variables, ds, normalizer, batch_size)
    labels = np.asarray(ds.labels)
    eer_neg, thr_neg = eer_device(-mse, labels)
    eer_pos, thr_pos = eer_device(mse, labels)
    if eer_pos <= eer_neg:
        convention, eer, thr = "+mse", eer_pos, thr_pos
    else:
        convention, eer, thr = "-mse", eer_neg, thr_neg
    bona = mse[labels == 1]
    spoof = mse[labels == 0]
    return {
        "eer": eer,
        "threshold": thr,
        "convention": convention,
        "eer_pos_mse": eer_pos,
        "eer_neg_mse": eer_neg,
        "bonafide_mean_mse": float(bona.mean()) if len(bona) else None,
        "spoof_mean_mse": float(spoof.mean()) if len(spoof) else None,
        "spoof_bonafide_ratio": (
            float(spoof.mean() / bona.mean()) if len(bona) and len(spoof) else None
        ),
        "scores": mse,
    }


class CAETrainer:
    def __init__(self, cfg: CAEConfig, visualizer: TrainingVisualizer | None = None):
        self.cfg = cfg
        self.visualizer = visualizer or NoOpVisualizer()
        if cfg.multihost:
            from dfac_tpu.parallel import multihost as mh

            if not mh.is_coordinator():
                # one progress UI per pod, not one per host process
                self.visualizer = NoOpVisualizer()
        model_kwargs = {}
        # multihost + device_resident is the GSPMD resident/fused path: no
        # axis_name (GSPMD computes global BN stats from the sharded batch
        # by semantics; an axis_name only resolves inside shard_map)
        self._gspmd_resident = cfg.multihost and cfg.device_resident
        if cfg.data_parallel > 1 and not self._gspmd_resident:
            # BatchNorm stats must sync over the mesh in the shard_map path
            model_kwargs["axis_name"] = "data"
        self.model = build_model("cae", base_channels=cfg.base_channels, **model_kwargs)
        self.mesh = None
        if cfg.data_parallel > 1:
            from dfac_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(n_data=cfg.data_parallel)
        self.tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=cfg.lr, weight_decay=cfg.weight_decay
        )
        self.scheduler = PlateauScheduler(
            factor=cfg.lr_scheduler_factor, patience=cfg.lr_scheduler_patience
        )
        self.state: TrainState | None = None
        self.normalizer: FeatureNormalizer | None = None
        self._lr = cfg.lr
        self.history: list[EpochMetrics] = []

    def variables(self) -> dict:
        v = {"params": self.state.params}
        if self.state.batch_stats:
            v["batch_stats"] = self.state.batch_stats
        return v

    def _validate(self, ds: ArrayDataset) -> float:
        """Bonafide-dev mean reconstruction MSE (reference ``:85-105``)."""
        scores = cae_mse_scores(
            self.model, self.variables(), ds, self.normalizer,
            self.cfg.eval_batch_size or self.cfg.batch_size,
        )
        return float(scores.mean()) if len(scores) else float("nan")

    def _resident_put(self):
        """Corpus placer for the resident paths: plain ``device_put``
        single-process; REPLICATED over every host's devices in the GSPMD
        multihost mode (mirrors ``loop.Trainer._resident_put``)."""
        if self.cfg.multihost:
            from dfac_tpu.parallel import multihost as mh
            from dfac_tpu.parallel.mesh import replicate

            rep = replicate(self.mesh)
            return lambda x: mh.put_global(np.asarray(x), rep)
        return lambda x: jax.device_put(jnp.asarray(x))

    def _make_resident_validator(self, bona_dev, mean, std):
        """One-dispatch bonafide-dev mean reconstruction MSE over a
        device-resident dev split. ``cae_mse_scores`` re-uploads the dev
        features every epoch — the same per-epoch host->device cost the
        resident epoch scan eliminates for training; here the split is
        uploaded once and each validation is a single dispatch (GSPMD
        data-parallel over the mesh in the multihost resident mode)."""
        from dfac_tpu.parallel.mesh import batch_constrainer, replicated_jit

        bs = self.cfg.eval_batch_size or self.cfg.batch_size
        n = len(bona_dev)
        if n == 0:
            return lambda variables: float("nan")
        mesh = self.mesh if self._gspmd_resident else None
        constrain = batch_constrainer(mesh)
        feats = self._resident_put()(bona_dev.features)
        n_b = -(-n // bs)
        idx = np.full((n_b * bs,), -1, np.int32)
        idx[:n] = np.arange(n)
        w = np.zeros((n_b * bs,), np.float32)
        w[:n] = 1.0
        idx_mat = jnp.asarray(idx.reshape(n_b, bs))
        w_mat = jnp.asarray(w.reshape(n_b, bs))
        model = self.model

        # the dev corpus MUST be a jit argument, not a closure: a closed-over
        # device array is baked into the lowered module as a literal constant,
        # and serializing a ~GB constant breaks remote-compile transports
        # (measured: deterministic broken pipe on the bench-rig relay at
        # bona-dev 4096x[180,321]; the epoch scan already passes feats_all
        # as an argument for the same reason)
        def run(variables, mean, std, feats_all):
            def body(acc, xs):
                ii, ww = xs
                x = constrain(jnp.take(feats_all, jnp.maximum(ii, 0), axis=0))
                xn = (jnp.transpose(x, (0, 2, 1)) - mean) / std
                recon, _ = model.apply(variables, xn)
                return acc + jnp.sum(reconstruction_mse(recon, xn) * constrain(ww)), None

            tot, _ = jax.lax.scan(body, jnp.zeros(()), (idx_mat, w_mat))
            return tot

        run = replicated_jit(run, mesh)
        return lambda variables: float(run(variables, mean, std, feats)) / n

    def fit(
        self,
        train_ds: ArrayDataset,
        dev_ds: ArrayDataset,
        checkpoint_dir: str | None = None,
        normalizer: FeatureNormalizer | None = None,
    ) -> dict:
        """``train_ds``/``dev_ds`` are full labeled datasets; bonafide-only
        filtering and normalizer fitting happen here (reference
        ``src/train_cae.py:176-194``)."""
        cfg = self.cfg
        bona_train = train_ds.filter_label(1) if train_ds.labels is not None else train_ds
        bona_dev = dev_ds.filter_label(1) if dev_ds.labels is not None else dev_ds

        self.normalizer = normalizer or build_normalizer(
            train_ds.features, train_ds.labels, swap_tf=cfg.swap_tf,
            lengths=train_ds.lengths,
        )
        mean = jnp.asarray(self.normalizer.mean)
        std = jnp.asarray(self.normalizer.std)
        dp = cfg.data_parallel
        if dp > 1:
            tail = len(bona_train) % cfg.batch_size
            if tail % dp != 0:
                raise ValueError(
                    f"data-parallel CAE training needs every batch (including "
                    f"the {tail}-row tail of the {len(bona_train)}-row bonafide "
                    f"corpus) to divide over {dp} shards — pick a batch_size "
                    "with tail % data_parallel == 0, or truncate the corpus"
                )
        # step construction, parameterized on the BN-freeze-tail recipe:
        # frozen variants build lazily the first epoch past the boundary
        freeze_epoch = (
            round(cfg.epochs * cfg.bn_freeze_after_frac)
            if cfg.bn_freeze_after_frac else None
        )

        def bn_frozen_at(epoch: int) -> bool:
            return freeze_epoch is not None and epoch > freeze_epoch

        def build_step(frozen: bool):
            if dp > 1:
                # GSPMD resident mode: the epoch scan handles every epoch;
                # the shard_map step would be WRONG here (the model carries
                # no axis_name, so its BN stats would be per-shard only)
                return (
                    None if self._gspmd_resident
                    else make_cae_dp_train_step(
                        self.model, self.tx, mean, std, self.mesh,
                        bn_frozen=frozen,
                    )
                )
            return make_cae_train_step(
                self.model, self.tx, mean, std, bn_frozen=frozen
            )

        _step_cache: dict = {}

        def step_for(frozen: bool):
            if frozen not in _step_cache:
                _step_cache[frozen] = build_step(frozen)
            return _step_cache[frozen]

        train_step = step_for(False)

        init_key, _ = jax.random.split(jax.random.key(cfg.seed))
        state_key = train_key(cfg.seed)  # TPU-fast rbg chain for dropout
        x0 = jnp.transpose(jnp.asarray(bona_train.features[:1]), (0, 2, 1))
        variables = self.model.init({"params": init_key, "dropout": init_key}, x0)
        self.state = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]),
            key=state_key,
        )

        import os

        if cfg.multihost and checkpoint_dir:
            from dfac_tpu.parallel import multihost as mh

            if not mh.is_coordinator():
                # exactly one process writes artifacts; state is replicated
                checkpoint_dir = None
        best_path = last_path = norm_path = None
        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)
            best_path = os.path.join(checkpoint_dir, "cae_best.ckpt")
            last_path = os.path.join(checkpoint_dir, "cae_last.ckpt")
            norm_path = os.path.join(checkpoint_dir, "normalizer.npz")
            self.normalizer.save(norm_path)

        self.visualizer.on_training_start(
            TrainingConfig(
                device=str(jax.devices()[0]).lower(), model="cae", epochs=cfg.epochs,
                batch_size=cfg.batch_size, learning_rate=cfg.lr,
                weight_decay=cfg.weight_decay, early_stop_patience=cfg.early_stop,
            )
        )

        best_val = None
        epochs_no_improve = 0
        prev: EpochMetrics | None = None
        from dfac_tpu.data.pipeline import num_batches

        epoch_scan = None
        chunk_scan = None  # fit-local: closes over this fit's mean/std
        feats_resident = None
        resident = cfg.device_resident and (
            cfg.data_parallel <= 1 or self._gspmd_resident
        )
        if cfg.device_resident and not resident:
            import logging

            logging.getLogger(__name__).warning(
                "device_resident is ignored with data_parallel=%d: the CAE "
                "epoch falls back to per-batch host-fed dispatch (a "
                "host/relay round trip per step). Drop --data-parallel or "
                "--device-resident to silence this.", cfg.data_parallel,
            )
        resident_validate = None
        _scan_cache: dict = {}

        def epoch_scan_for(frozen: bool):
            if frozen not in _scan_cache:
                _scan_cache[frozen] = make_cae_epoch_scan(
                    self.model, self.tx, mean, std,
                    n_examples=len(bona_train), batch_size=cfg.batch_size,
                    mesh=self.mesh if self._gspmd_resident else None,
                    bn_frozen=frozen,
                )
            return _scan_cache[frozen]

        _indexed_cache: dict = {}

        def indexed_step_for(frozen: bool):
            if frozen not in _indexed_cache:
                _indexed_cache[frozen] = make_cae_indexed_step(
                    self.model, self.tx, mean, std, bn_frozen=frozen
                )
            return _indexed_cache[frozen]

        if resident:
            resident_validate = self._make_resident_validator(bona_dev, mean, std)
            feats_resident = self._resident_put()(bona_train.features)
            epoch_scan = epoch_scan_for(False)
            self._indexed_step = indexed_step_for(False)

        for epoch in range(1, cfg.epochs + 1):
            frozen = bn_frozen_at(epoch)
            train_step = step_for(frozen)
            if resident:
                epoch_scan = epoch_scan_for(frozen)
                self._indexed_step = indexed_step_for(frozen)
            t0 = time.perf_counter()
            total = jnp.zeros(())
            count = jnp.zeros(())
            with self.visualizer.on_epoch_start(
                epoch, num_batches(len(bona_train), cfg.batch_size)
            ) as batch_ctx:
                live_ui = batch_ctx is not None and getattr(batch_ctx, "wants_updates", True)
                # the GSPMD multihost mode always runs the scan — the
                # per-batch indexed fallback is a single-process program
                if epoch_scan is not None and (not live_ui or self._gspmd_resident):
                    if cfg.multihost:
                        from dfac_tpu.parallel import multihost as mh

                        # global state before the pod-wide program
                        # (idempotent; heals host-local LR-update leaves)
                        self.state = mh.replicate_tree(self.state, self.mesh)
                    # one dispatch per epoch; device-side shuffle
                    self.state, total, count = epoch_scan(
                        self.state, feats_resident, np.int64(cfg.seed * 100003 + epoch)
                    )
                elif resident:
                    # live UI wants per-batch updates: per-batch dispatch,
                    # but the corpus stays resident and each step gathers
                    # its batch on device via an int32 index vector only
                    # (mirrors loop.py's resident+live path).
                    n_ex = len(bona_train)
                    order = np.arange(n_ex)
                    np.random.default_rng(cfg.seed * 100003 + epoch).shuffle(order)
                    for i, start in enumerate(range(0, n_ex, cfg.batch_size)):
                        idx = order[start : start + cfg.batch_size]
                        self.state, loss_sum, n = self._indexed_step(
                            self.state, feats_resident,
                            jnp.asarray(idx.astype(np.int32)),
                            jnp.ones(len(idx), jnp.float32),
                        )
                        total = total + loss_sum
                        count = count + n
                        if float(count):
                            batch_ctx.update_batch(BatchMetrics(i, float(total) / float(count), int(n)))
                elif cfg.resident_chunk_batches > 0:
                    # chunked streaming (corpora larger than HBM): G-batch
                    # scan dispatches, chunk upload overlapped; same
                    # batches/PRNG chain as the host loop below. Composes
                    # with --multihost: each process gathers its row slice
                    # of every chunk batch, the scan runs one global
                    # program per chunk (see chunked.stream_chunks).
                    from dfac_tpu.train.chunked import (
                        check_dp_tail,
                        chunk_scan_over,
                        stream_chunks,
                        tail_ones,
                    )

                    n_ex = len(bona_train)
                    what = (
                        "multihost chunked CAE training" if cfg.multihost
                        else "chunked CAE training"
                    )
                    check_dp_tail(n_ex, cfg.batch_size, dp, what)
                    if cfg.multihost:
                        from dfac_tpu.parallel import multihost as mh

                        # global state before the pod-wide program (also
                        # heals host-local LR-update leaves; idempotent)
                        self.state = mh.replicate_tree(self.state, self.mesh)
                    if not isinstance(chunk_scan, dict):
                        chunk_scan = {}
                    if frozen not in chunk_scan:
                        # fit-LOCAL (like train_step): the scan closes over
                        # THIS fit's normalizer mean/std — caching it on
                        # self would silently train a second fit() with the
                        # first corpus's statistics
                        chunk_scan[frozen] = chunk_scan_over(
                            train_step, append_ones=True, track_count=True,
                            ingest=cfg.chunk_ingest,
                        )
                    order = np.arange(n_ex)
                    np.random.default_rng(cfg.seed * 100003 + epoch).shuffle(order)
                    chunks = stream_chunks(
                        bona_train.features, (), order, cfg.batch_size,
                        cfg.resident_chunk_batches,
                        mesh=self.mesh if dp > 1 else None,
                        multihost=cfg.multihost, ingest=cfg.chunk_ingest,
                    )
                    batches_done = 0  # the UI's unit is BATCHES, not chunks
                    for ci, full_b, tail_b in chunks:
                        nr = 0
                        if full_b is not None:
                            self.state, loss_sum, n = chunk_scan[frozen](self.state, *full_b)
                            total, count = total + loss_sum, count + n
                            nr = full_b[0].shape[1]
                            batches_done += full_b[0].shape[0]
                        if tail_b is not None:
                            (feats_t,) = tail_b
                            self.state, loss_sum, n = train_step(
                                self.state, feats_t,
                                tail_ones(feats_t.shape[0], self.mesh, cfg.multihost),
                            )
                            total, count = total + loss_sum, count + n
                            nr = feats_t.shape[0]
                            batches_done += 1
                        if live_ui and float(count):
                            batch_ctx.update_batch(
                                BatchMetrics(batches_done - 1, float(total) / float(count), nr)
                            )
                elif cfg.multihost:
                    # multi-host pod epoch: same shuffled batch order on
                    # every process, each feeding only its row slice
                    # (see loop.Trainer._multihost_epoch for the full story)
                    from dfac_tpu.parallel import multihost as mh
                    from dfac_tpu.train.chunked import check_dp_tail

                    n_ex = len(bona_train)
                    check_dp_tail(n_ex, cfg.batch_size, dp, "multihost CAE training")
                    self.state = mh.replicate_tree(self.state, self.mesh)
                    order = np.arange(n_ex)
                    np.random.default_rng(cfg.seed * 100003 + epoch).shuffle(order)
                    for i, (feats_g, w_g) in enumerate(
                        mh.stream_global_batches(
                            bona_train.features, (np.ones(n_ex, np.float32),),
                            order, cfg.batch_size, self.mesh,
                        )
                    ):
                        self.state, loss_sum, nb = train_step(self.state, feats_g, w_g)
                        total = total + loss_sum
                        count = count + nb
                        if live_ui and float(count):
                            batch_ctx.update_batch(
                                BatchMetrics(i, float(total) / float(count), int(nb))
                            )
                else:
                    from dfac_tpu.io.prefetch import prefetched

                    # host row gather overlaps device dispatch (one thread)
                    for i, batch in enumerate(
                        prefetched(batch_iterator(
                            bona_train, cfg.batch_size, shuffle=True,
                            seed=cfg.seed * 100003 + epoch, pad_tail=False,
                        ))
                    ):
                        self.state, loss_sum, n = train_step(
                            self.state, jnp.asarray(batch.features), jnp.asarray(batch.weights)
                        )
                        total = total + loss_sum  # lazy device accumulation
                        count = count + n
                        if live_ui and float(count):
                            batch_ctx.update_batch(BatchMetrics(i, float(total) / float(count), int(n)))
            count_f = float(count)
            train_loss = float(total) / count_f if count_f else None

            val_loss = (
                resident_validate(self.variables())
                if resident_validate is not None
                else self._validate(bona_dev)
            )
            elapsed = time.perf_counter() - t0

            is_best = best_val is None or val_loss < best_val
            if is_best:
                best_val = val_loss
                epochs_no_improve = 0
                if best_path:
                    ckpt_lib.save_checkpoint_fmt(
                        cfg.checkpoint_format,
                        best_path, self.variables(), opt_state=self.state.opt_state,
                        epoch=epoch, config=dataclasses.asdict(cfg),
                        scheduler_state=self.scheduler.state_dict(),
                    )
            else:
                epochs_no_improve += 1

            new_lr = self.scheduler.step(val_loss, self._lr)
            if new_lr != self._lr:
                self._lr = new_lr
                self.state = self.state.replace(opt_state=_set_opt_lr(self.state.opt_state, new_lr))

            metrics = EpochMetrics(
                epoch=epoch, train_loss=train_loss, dev_loss=val_loss, dev_eer=None,
                is_best=is_best, improved=is_best, epochs_no_improve=epochs_no_improve,
                learning_rate=self._lr, epoch_seconds=elapsed,
                throughput_utt_s=len(bona_train) / elapsed if elapsed > 0 else None,
            )
            self.visualizer.on_epoch_end(metrics, prev)
            self.history.append(metrics)
            prev = metrics

            if cfg.early_stop and epochs_no_improve >= cfg.early_stop:
                break

        self.visualizer.on_training_end(self.history)
        if last_path:
            ckpt_lib.save_checkpoint_fmt(
                cfg.checkpoint_format,
                last_path, self.variables(), opt_state=self.state.opt_state,
                epoch=self.history[-1].epoch if self.history else 0,
                config=dataclasses.asdict(cfg),
            )
        return {"best_val_mse": best_val, "history": self.history, "normalizer": self.normalizer}

    def fit_fused(
        self,
        train_ds: ArrayDataset,
        dev_ds: ArrayDataset,
        checkpoint_dir: str | None = None,
        normalizer: FeatureNormalizer | None = None,
    ) -> dict:
        """The whole CAE run (epochs + validation + best rule + plateau +
        early stop) as ONE dispatched program — the CAE counterpart of
        :func:`dfac_tpu.train.fused_fit.fit_fused`. Converges identically to
        :meth:`fit` with ``device_resident=True`` (same epoch-scan shuffle
        seeds, same scheduler semantics); artifacts (``cae_best``/
        ``cae_last``/normalizer) match the per-epoch trainer's."""
        import os

        cfg = self.cfg
        multihost = cfg.multihost
        if multihost and not self._gspmd_resident:
            raise ValueError(
                "multihost fused CAE fit requires device_resident=True in "
                "CAEConfig (the trainer then builds the GSPMD model; "
                "dfac-train-cae's --fused-fit flag sets it automatically)"
            )
        if cfg.data_parallel > 1 and not multihost:
            raise ValueError(
                "fit_fused with data_parallel is the MULTIHOST GSPMD path "
                "(--multihost --fused-fit); for single-process multi-chip "
                "CAE training use fit() with data_parallel (the shard_map "
                "DP step)"
            )
        bona_train = train_ds.filter_label(1) if train_ds.labels is not None else train_ds
        bona_dev = dev_ds.filter_label(1) if dev_ds.labels is not None else dev_ds
        self.normalizer = normalizer or build_normalizer(
            train_ds.features, train_ds.labels, swap_tf=cfg.swap_tf,
            lengths=train_ds.lengths,
        )
        mean = jnp.asarray(self.normalizer.mean)
        std = jnp.asarray(self.normalizer.std)

        init_key, _ = jax.random.split(jax.random.key(cfg.seed))
        x0 = jnp.transpose(jnp.asarray(bona_train.features[:1]), (0, 2, 1))
        variables = self.model.init({"params": init_key, "dropout": init_key}, x0)
        self.state = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]),
            key=train_key(cfg.seed),
        )

        fused, didx, dw = make_fused_cae_fit(
            self.model, self.tx, cfg, mean, std,
            n_train=len(bona_train), n_dev=len(bona_dev),
            mesh=self.mesh if multihost else None,
        )
        put = self._resident_put()
        tf = put(bona_train.features)
        df = put(bona_dev.features)
        if multihost:
            from dfac_tpu.parallel import multihost as mh

            # global state + coordinator-only artifacts for the pod run
            self.state = mh.replicate_tree(self.state, self.mesh)
            if not mh.is_coordinator():
                checkpoint_dir = None
        final_state, best_vars, best_opt, aux, history = fused(
            self.state, tf, df, didx, dw
        )
        self.state = final_state

        train_loss, val, lr, is_best, stopped = jax.device_get(history)
        aux = jax.device_get(aux)
        self.history = []
        no_improve = 0
        for e in range(cfg.epochs):
            if stopped[e] and np.isnan(train_loss[e]):
                break
            no_improve = 0 if is_best[e] else no_improve + 1
            self.history.append(
                EpochMetrics(
                    epoch=e + 1, train_loss=float(train_loss[e]),
                    dev_loss=float(val[e]), dev_eer=None,
                    is_best=bool(is_best[e]), improved=bool(is_best[e]),
                    epochs_no_improve=no_improve, learning_rate=float(lr[e]),
                )
            )
        self._lr = float(aux["lr"])
        sb = float(aux["sched_best"])
        self.scheduler.best = None if np.isinf(sb) else sb
        self.scheduler.num_bad_epochs = int(aux["sched_bad"])

        best_val = float(aux["best_val"]) if np.isfinite(aux["best_val"]) else None
        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)
            self.normalizer.save(os.path.join(checkpoint_dir, "normalizer.npz"))
        # cae_best only when an epoch actually improved (fit() and the
        # detector fused path save on improvement; with epochs=0 the carried
        # init snapshot must not masquerade as a trained best)
        if checkpoint_dir and best_val is not None:
            bv = {"params": best_vars["params"]}
            if best_vars.get("batch_stats"):
                bv["batch_stats"] = best_vars["batch_stats"]
            # best ckpt carries the BEST-epoch optimizer + scheduler
            # snapshot (what the per-epoch trainer saved at the moment of
            # improvement), not the end-of-run state
            bsb = float(aux["best_sched_best"])
            best_sched = PlateauScheduler(
                factor=cfg.lr_scheduler_factor, patience=cfg.lr_scheduler_patience,
            )
            best_sched.best = None if np.isinf(bsb) else bsb
            best_sched.num_bad_epochs = int(aux["best_sched_bad"])
            ckpt_lib.save_checkpoint_fmt(
                cfg.checkpoint_format,
                os.path.join(checkpoint_dir, "cae_best.ckpt"), bv,
                opt_state=best_opt, epoch=int(aux["best_epoch"]),
                config=dataclasses.asdict(cfg),
                scheduler_state=best_sched.state_dict(),
            )
        if checkpoint_dir:
            ckpt_lib.save_checkpoint_fmt(
                cfg.checkpoint_format,
                os.path.join(checkpoint_dir, "cae_last.ckpt"), self.variables(),
                opt_state=self.state.opt_state,
                epoch=self.history[-1].epoch if self.history else 0,
                config=dataclasses.asdict(cfg),
            )
        return {"best_val_mse": best_val, "history": self.history, "normalizer": self.normalizer}
