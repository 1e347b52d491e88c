"""Supervised training driver.

Feature-parity target: reference ``src/train.py`` (call stack SURVEY.md
§3.1). The epoch body — swap, augmentation, forward, label-smoothed BCE,
backward, optimizer update, BatchNorm stat update — is **one jit-compiled
train_step**; the host loop only orchestrates batches, evaluation, the
best-checkpoint rule, LR plateau scheduling, early stopping, and visualizer
events.

Exact reference semantics preserved:

* best-checkpoint rule (``src/train.py:484-518``): dev EER strictly lower
  wins; on an EER tie within 1e-4, both train loss and dev loss must
  improve by > 1e-6;
* early stop counts epochs without *EER* improvement only (``:556-561``);
* ReduceLROnPlateau monitors dev_eer or dev_loss (``:520-525``);
* loss averaging weights each batch by its true sample count (``:78-80``);
* the final partial batch trains at its TRUE size (one extra compiled
  shape) so its BatchNorm statistics cover real rows only, exactly like
  the reference's smaller final DataLoader batch.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from dfac_tpu.data.augment import AugmentConfig, build_augment_fn
from dfac_tpu.data.pipeline import ArrayDataset, batch_iterator, num_batches
from dfac_tpu.models import build_model
from dfac_tpu.obs.base import BatchMetrics, EpochMetrics, TrainingConfig, TrainingVisualizer
from dfac_tpu.obs.noop import NoOpVisualizer
from dfac_tpu.parallel.mesh import (
    batch_constrainer as _batch_constrainer,
    replicated_jit as _replicated_jit,
)
from dfac_tpu.train import checkpoint as ckpt_lib
from dfac_tpu.utils.rng import train_key
from dfac_tpu.train.evaluate import evaluate_classifier
from dfac_tpu.train.optim import PlateauScheduler, build_optimizer, smooth_labels


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    key: jax.Array


@dataclasses.dataclass
class TrainConfig:
    """The reference train.py flag surface (``src/train.py:94-246``)."""

    model: str = "cnn2d"
    batch_size: int = 32
    epochs: int = 10
    lr: float = 1e-3
    weight_decay: float = 0.0
    early_stop: int = 0
    lr_scheduler: str = "none"  # none | plateau
    lr_scheduler_metric: str = "dev_eer"  # dev_eer | dev_loss
    lr_scheduler_factor: float = 0.5
    lr_scheduler_patience: int = 2
    lr_scheduler_threshold: float = 1e-4
    lr_scheduler_min_lr: float = 1e-6
    in_features: int = 180
    hidden_dim: int = 128
    dropout: float = 0.2
    seed: int = 0
    label_smoothing: float = 0.0
    swap_tf: bool = True
    augment: AugmentConfig = dataclasses.field(default_factory=AugmentConfig)
    eval_batch_size: int | None = None
    compute_dtype: str | None = None  # None (f32) | "bfloat16"
    data_parallel: int = 0  # shard_map DP over N devices (0/1 = single device)
    device_resident: bool = False  # upload corpus once; gather batches on device
    # stream the epoch in chunks of N batches (one dispatch per chunk,
    # upload overlapped) — for corpora larger than HBM; 0 = off
    resident_chunk_batches: int = 0
    # host->device compression for chunked streaming: f32 (exact) | bf16
    # (half the link bytes, features bf16-rounded) | int8 (quarter the
    # bytes, per-(row, feature-dim) scales, dequant fused into the step).
    # The measured remedy for ingest-bound chunked training
    # (results/v5e_measurements.md round 4); EER impact gated in
    # tests/test_chunked.py
    chunk_ingest: str = "f32"
    checkpoint_format: str = "pickle"  # pickle (single file) | orbax (directory)
    # run the DP path over a multi-host mesh (one process per pod host,
    # jax.distributed initialized): each process feeds its row slice of
    # every global batch; checkpoints/UI stay on the coordinator
    multihost: bool = False
    # fast-numerics recipe: freeze BatchNorm (running-stats forward, no
    # stat updates) for the tail of the schedule — epochs AFTER
    # round(epochs * frac) train with frozen BN. 0 disables. Quality gate
    # and throughput rationale: results/train_fast_ab.md
    bn_freeze_after_frac: float = 0.0

    def __post_init__(self):
        if not (0.0 <= self.label_smoothing < 0.5):
            raise ValueError("label_smoothing must be in [0, 0.5)")
        if not (0.0 <= self.bn_freeze_after_frac <= 1.0):
            raise ValueError("bn_freeze_after_frac must be in [0, 1]")
        # bn_freeze_after_frac composes with every path: the per-epoch
        # paths (host loop, device_resident, chunked, shard_map DP,
        # multihost) switch to the frozen program at the boundary epoch,
        # and fit_fused branches on epoch > freeze_epoch inside its scan.
        if self.data_parallel > 1 and self.batch_size % self.data_parallel != 0:
            raise ValueError("batch_size must divide evenly over data_parallel shards")
        if self.multihost and self.data_parallel <= 1:
            raise ValueError(
                "multihost training is data-parallel over the pod — set "
                "data_parallel to the GLOBAL device count (all hosts' chips)"
            )
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
                "needs resident_chunk_batches > 0 (the resident and host-loop "
                "paths have their own ingest handling)"
            )
        # chunked + DP composes (a G-batch scan of the shard_map step);
        # batch_size % data_parallel == 0 is enforced above and the
        # tail-divisibility check (needs the corpus length) lives in
        # _chunked_epoch


def _model_kwargs(cfg: TrainConfig) -> dict:
    kw: dict[str, Any] = {
        "in_features": cfg.in_features,
        "dropout": cfg.dropout,
        "hidden_dim": cfg.hidden_dim,
        "in_channels": cfg.in_features,
    }
    if cfg.compute_dtype:
        kw["compute_dtype"] = jnp.dtype(cfg.compute_dtype)
    return kw


def make_indexed_train_step(
    model: Any,
    tx: optax.GradientTransformation,
    swap_tf: bool,
    label_smoothing: float,
    augment_fn: Callable | None,
    mesh=None,
    bn_frozen: bool = False,
):
    """Device-resident variant: the full corpus lives in HBM; each step
    receives only an int32 index vector and gathers its batch on device —
    no per-step host->device feature transfer (the hot-loop H2D copy of the
    reference's DataLoader, ``src/train.py:61-62``, disappears entirely).

    With ``mesh``, the gathered batch is constrained onto the mesh's 'data'
    axis and GSPMD data-parallelizes the step (the multi-host resident/fused
    path: corpus replicated per host, compute sharded across the pod)."""
    base = make_train_step(
        model, tx, swap_tf, label_smoothing, augment_fn, bn_frozen=bn_frozen
    )
    base = base.__wrapped__ if hasattr(base, "__wrapped__") else base
    constrain = _batch_constrainer(mesh)

    def indexed_step(state: TrainState, feats_all, labels_all, idx, weights):
        feats = constrain(jnp.take(feats_all, jnp.maximum(idx, 0), axis=0))
        labels = constrain(jnp.take(labels_all, jnp.maximum(idx, 0), axis=0))
        return base(state, feats, labels, constrain(weights))

    return _replicated_jit(indexed_step, mesh)


def make_epoch_scan(
    model: Any,
    tx: optax.GradientTransformation,
    swap_tf: bool,
    label_smoothing: float,
    augment_fn: Callable | None,
    n_examples: int,
    batch_size: int,
    mesh=None,
    bn_frozen: bool = False,
):
    """One jit program for a FULL epoch: shuffle + ``lax.scan`` over the
    batches of a device-resident corpus. A single dispatch per epoch with a
    scalar seed as the only input — no per-step launch overhead and no
    per-epoch host->device transfer at all (decisive on remote accelerators
    where every transfer/dispatch round-trips a relay). The shuffle is a
    device-side ``jax.random.permutation`` keyed by the epoch seed.

    The final partial batch (``n_examples % batch_size`` rows) runs as a
    separate traced step at its TRUE size inside the same program — still
    one dispatch, and no padded rows ever enter BatchNorm statistics
    (bit-exact reference smaller-final-batch semantics,
    ``src/train.py:31-91``).

    With ``mesh``, every batch inside the scan is sharding-constrained onto
    the mesh's 'data' axis: the GSPMD partitioner data-parallelizes the
    whole epoch program across the mesh (multi-host pods included — the
    pod's one-dispatch-per-epoch training path)."""
    step = make_indexed_train_step(
        model, tx, swap_tf, label_smoothing, augment_fn, mesh=mesh,
        bn_frozen=bn_frozen,
    )
    # reuse the jitted step's traced body inside scan via its wrapped fn
    base = step.__wrapped__ if hasattr(step, "__wrapped__") else step
    n_full = n_examples // batch_size
    tail = n_examples % batch_size

    def epoch_scan(state: TrainState, feats_all, labels_all, epoch_seed):
        perm = jax.random.permutation(jax.random.key(epoch_seed), n_examples).astype(jnp.int32)
        idx_mat = perm[: n_full * batch_size].reshape(n_full, batch_size)
        ones = jnp.ones((batch_size,), jnp.float32)

        def body(carry, idx):
            st, loss_acc, count_acc = carry
            st, loss_sum, count = base(st, feats_all, labels_all, idx, ones)
            return (st, loss_acc + loss_sum, count_acc + count), None

        (state_out, loss, count), _ = jax.lax.scan(
            body, (state, jnp.zeros(()), jnp.zeros(())), idx_mat
        )
        if tail:
            state_out, tail_loss, tail_count = base(
                state_out, feats_all, labels_all,
                perm[n_full * batch_size :], jnp.ones((tail,), jnp.float32),
            )
            loss, count = loss + tail_loss, count + tail_count
        return state_out, loss, count

    return _replicated_jit(epoch_scan, mesh)


def make_chunk_scan(
    model: Any,
    tx: optax.GradientTransformation,
    swap_tf: bool,
    label_smoothing: float,
    augment_fn: Callable | None,
):
    """``lax.scan`` of the train step over a CHUNK of pre-batched rows:
    ``feats (g, B, ...), labels (g, B) -> state', loss_sum, count``.

    The building block of chunked streaming training
    (:meth:`Trainer._chunked_epoch`) for corpora larger than HBM: the
    host gathers g consecutive shuffled batches, uploads them while the
    device scans the previous chunk, and each chunk costs ONE dispatch.
    Batch composition and the ``state.key`` split chain are identical to
    the per-batch host loop (test-enforced); float results agree up to
    XLA reassociation (the scan body and the standalone step compile as
    different programs, so grads differ at the 1e-8 level — Adam's
    sign-sensitive normalization then makes long runs drift, exactly as
    recompiling any step does)."""
    from dfac_tpu.train.chunked import chunk_scan_over

    base_jit = make_train_step(model, tx, swap_tf, label_smoothing, augment_fn)
    return chunk_scan_over(base_jit, append_ones=True, track_count=True)


def make_dp_chunk_scan(
    model: Any,
    tx: optax.GradientTransformation,
    mesh,
    swap_tf: bool,
    label_smoothing: float,
    augment_fn: Callable | None,
):
    """Chunked streaming x data parallelism: a ``lax.scan`` over the
    shard_map DP train step (``parallel.data_parallel``). Each chunk is a
    (g, B, ...) array sharded over the mesh's 'data' axis on its batch
    dim; every scan iteration runs one exact-global-batch DP step. For
    multi-chip training on corpora larger than (aggregate) HBM."""
    from dfac_tpu.parallel.data_parallel import make_shard_map_train_step
    from dfac_tpu.train.chunked import chunk_scan_over

    step_jit = make_shard_map_train_step(
        model, tx, mesh, swap_tf=swap_tf,
        label_smoothing=label_smoothing, augment_fn=augment_fn,
    )
    return chunk_scan_over(step_jit, append_ones=True, track_count=True)


def make_train_step(
    model: Any,
    tx: optax.GradientTransformation,
    swap_tf: bool,
    label_smoothing: float,
    augment_fn: Callable | None,
    bn_frozen: bool = False,
):
    """Build the jit'd supervised train step (one fused device program).

    For single-device CNN2D the step runs the hand-scheduled
    forward/backward (:mod:`dfac_tpu.ops.train_chain`) instead of
    ``jax.value_and_grad`` over ``model.apply`` — same math (parity-tested),
    but with the backward's pass structure under our control; it also
    regenerates dropout bytes in the backward rather than storing them
    (~0.7 GB/step less HBM traffic at B=512). The flax-AD path remains for
    every other model and for data-parallel BN (``axis_name`` sync).

    ``bn_frozen=True`` builds the freeze-tail variant (BatchNorm runs on
    its running stats and stops updating them — the ``--bn-freeze-after``
    recipe): flax-AD path, models that take the ``bn_frozen`` kwarg
    (CNN2D)."""
    from dfac_tpu.models.cnn2d import CNN2D

    if (
        isinstance(model, CNN2D)
        and model.axis_name is None
        and model.num_classes == 1
        and not bn_frozen
    ):
        from dfac_tpu.ops.train_chain import cnn2d_hand_loss_and_grad

        @jax.jit
        def hand_train_step(state: TrainState, feats, labels, weights):
            next_key, aug_key, drop_key = jax.random.split(state.key, 3)
            x = jnp.transpose(feats, (0, 2, 1)) if swap_tf else feats
            if augment_fn is not None:
                x = augment_fn(aug_key, x)
            drop_keys = jax.random.split(drop_key, 2)
            (loss, new_stats), grads = cnn2d_hand_loss_and_grad(
                state.params, state.batch_stats, x, drop_keys, labels,
                weights, dropout_rate=model.dropout,
                label_smoothing=label_smoothing,
                compute_dtype=model.compute_dtype,
            )
            updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt_state,
                key=next_key,
            )
            count = jnp.sum(weights)
            return new_state, loss * count, count

        return hand_train_step

    @jax.jit
    def train_step(state: TrainState, feats, labels, weights):
        next_key, aug_key, drop_key = jax.random.split(state.key, 3)
        x = jnp.transpose(feats, (0, 2, 1)) if swap_tf else feats
        if augment_fn is not None:
            x = augment_fn(aug_key, x)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            extra = {"bn_frozen": True} if bn_frozen else {}
            out, mutated = model.apply(
                variables, x, train=True, mutable=["batch_stats"],
                rngs={"dropout": drop_key}, **extra,
            )
            logits = (out[0] if isinstance(out, tuple) else out).reshape(-1)
            per = optax.sigmoid_binary_cross_entropy(logits, smooth_labels(labels, label_smoothing))
            denom = jnp.maximum(jnp.sum(weights), 1.0)
            loss = jnp.sum(per * weights) / denom
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=mutated.get("batch_stats", state.batch_stats),
            opt_state=new_opt_state,
            key=next_key,
        )
        count = jnp.sum(weights)
        return new_state, loss * count, count

    return train_step


def _set_opt_lr(opt_state, lr: float):
    """Functionally update the injected learning_rate hyperparameter."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hp)


class Trainer:
    """Host-side orchestration of the supervised training loop."""

    def __init__(
        self,
        cfg: TrainConfig,
        visualizer: TrainingVisualizer | None = None,
        model: Any | None = None,
    ):
        self.cfg = cfg
        self.visualizer = visualizer or NoOpVisualizer()
        if cfg.multihost:
            from dfac_tpu.parallel import multihost as mh

            if not mh.is_coordinator():
                # one progress UI per pod, not one per host process
                self.visualizer = NoOpVisualizer()
        model_kwargs = _model_kwargs(cfg)
        # multihost + device_resident is the GSPMD resident/fused path: the
        # replicated-corpus epoch scan with batch sharding constraints. The
        # model must NOT bind an axis_name there — GSPMD computes global
        # BatchNorm batch stats from the sharded batch by semantics, and an
        # axis_name is only resolvable inside shard_map.
        self._gspmd_resident = cfg.multihost and cfg.device_resident
        if cfg.data_parallel > 1 and not self._gspmd_resident:
            # BatchNorm stats must sync over the mesh in the shard_map path.
            model_kwargs["axis_name"] = "data"
        self.model = model if model is not None else build_model(cfg.model, **model_kwargs)
        self.tx = build_optimizer(cfg.model, cfg.lr, cfg.weight_decay)
        self.augment_fn = build_augment_fn(cfg.augment)
        self.scheduler = (
            PlateauScheduler(
                factor=cfg.lr_scheduler_factor,
                patience=cfg.lr_scheduler_patience,
                threshold=cfg.lr_scheduler_threshold,
                min_lr=cfg.lr_scheduler_min_lr,
            )
            if cfg.lr_scheduler == "plateau"
            else None
        )
        if cfg.data_parallel > 1:
            from dfac_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(n_data=cfg.data_parallel)
            if self._gspmd_resident:
                # GSPMD path: the plain step — sharding constraints in the
                # resident epoch scan/fused program do the parallelizing
                self._train_step = make_train_step(
                    self.model, self.tx, cfg.swap_tf, cfg.label_smoothing,
                    self.augment_fn,
                )
            else:
                from dfac_tpu.parallel.data_parallel import make_shard_map_train_step

                self._train_step = make_shard_map_train_step(
                    self.model, self.tx, self.mesh, swap_tf=cfg.swap_tf,
                    label_smoothing=cfg.label_smoothing, augment_fn=self.augment_fn,
                )
        else:
            self.mesh = None
            self._train_step = make_train_step(
                self.model, self.tx, cfg.swap_tf, cfg.label_smoothing, self.augment_fn
            )
        self._indexed_step = None
        self._epoch_scan = None
        self._chunk_scan = None
        # lazily built bn-frozen variants of the above (the freeze-tail
        # recipe switches programs at the boundary epoch)
        self._train_step_frozen = None
        self._indexed_step_frozen = None
        self._epoch_scan_frozen = None
        self._chunk_scan_frozen = None
        self.history: list[EpochMetrics] = []
        self.state: TrainState | None = None
        self._lr = cfg.lr

    def _bn_frozen_at(self, epoch: int) -> bool:
        """True when ``epoch`` trains with frozen BatchNorm under the
        ``bn_freeze_after_frac`` recipe (epochs after round(epochs*frac))."""
        frac = self.cfg.bn_freeze_after_frac
        return bool(frac) and epoch > round(self.cfg.epochs * frac)

    def _frozen_train_step(self):
        if self._train_step_frozen is None:
            cfg = self.cfg
            if cfg.data_parallel > 1 and not self._gspmd_resident:
                from dfac_tpu.parallel.data_parallel import make_shard_map_train_step

                self._train_step_frozen = make_shard_map_train_step(
                    self.model, self.tx, self.mesh, swap_tf=cfg.swap_tf,
                    label_smoothing=cfg.label_smoothing,
                    augment_fn=self.augment_fn, bn_frozen=True,
                )
            else:
                self._train_step_frozen = make_train_step(
                    self.model, self.tx, cfg.swap_tf, cfg.label_smoothing,
                    self.augment_fn, bn_frozen=True,
                )
        return self._train_step_frozen

    # -- state ------------------------------------------------------------
    def init_state(self, example_batch: np.ndarray) -> TrainState:
        cfg = self.cfg
        init_key, _ = jax.random.split(jax.random.key(cfg.seed))
        state_key = train_key(cfg.seed)  # TPU-fast rbg chain for dropout/augment
        x = jnp.asarray(example_batch[:1])
        if cfg.swap_tf:
            x = jnp.transpose(x, (0, 2, 1))
        variables = self.model.init({"params": init_key, "dropout": init_key}, x)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        self.state = TrainState(
            params=params, batch_stats=batch_stats, opt_state=opt_state, key=state_key
        )
        return self.state

    def variables(self) -> dict:
        v = {"params": self.state.params}
        if self.state.batch_stats:
            v["batch_stats"] = self.state.batch_stats
        return v

    def best_variables(self) -> dict:
        """Best-epoch {params, batch_stats} (populated by :func:`fit_fused`;
        falls back to the current variables). The BN running stats come from
        the SAME epoch as the params — a mixed snapshot would not be the
        model that achieved the best dev EER."""
        params = getattr(self, "_best_params", None)
        stats = getattr(self, "_best_batch_stats", None)
        v = {"params": params if params is not None else self.state.params}
        stats = stats if stats is not None else self.state.batch_stats
        if stats:
            v["batch_stats"] = stats
        return v

    def fit_fused(
        self, train_ds: ArrayDataset, dev_ds: ArrayDataset,
        resume_from: str | None = None,
    ) -> dict:
        """One-dispatch training: the whole run (epochs + eval + best rule +
        plateau + early stop) as a single compiled program. See
        :mod:`dfac_tpu.train.fused_fit`."""
        from dfac_tpu.train.fused_fit import fit_fused

        return fit_fused(self, train_ds, dev_ds, resume_from=resume_from)

    # -- loop -------------------------------------------------------------
    def _resident_dev_metrics(self, dev_ds: ArrayDataset) -> dict:
        """One-dispatch dev evaluation on a device-resident dev split."""
        from dfac_tpu.train.evaluate import make_resident_evaluator

        cfg = self.cfg
        bs = cfg.eval_batch_size or cfg.batch_size
        if getattr(self, "_dev_resident_ds", None) is not dev_ds:
            put = self._resident_put()
            self._dev_feats = put(dev_ds.features)
            self._dev_labels = put(dev_ds.labels.astype(np.float32))
            n = len(dev_ds)
            n_b = -(-n // bs)
            idx = np.full((n_b * bs,), -1, np.int32)
            idx[:n] = np.arange(n)
            w = np.zeros((n_b * bs,), np.float32)
            w[:n] = 1.0
            self._dev_idx = jnp.asarray(idx.reshape(n_b, bs))
            self._dev_w = jnp.asarray(w.reshape(n_b, bs))
            self._dev_eval = make_resident_evaluator(
                self.model, swap_tf=cfg.swap_tf, label_smoothing=cfg.label_smoothing,
                mesh=self.mesh if self._gspmd_resident else None,
            )
            # hold the reference: CPython reuses id() after GC, so a key
            # of id(ds) alone can silently alias a NEW dataset to the OLD
            # device arrays
            self._dev_resident_ds = dev_ds

        loss_sum, _scores, counts = self._dev_eval(
            self.variables(), self._dev_feats, self._dev_labels, self._dev_idx, self._dev_w
        )
        # single host fetch for everything the epoch loop needs
        loss_sum, (far_num, frr_num, ns, nb, thr) = jax.device_get((loss_sum, counts))
        n = len(dev_ds)
        if ns == 0 or nb == 0:
            eer = 0.0
            thr = 0.0
        else:
            eer = (float(far_num) / int(ns) + float(frr_num) / int(nb)) / 2.0
        return {
            "avg_loss": float(loss_sum) / n if n else None,
            "eer": eer,
            "threshold": float(thr),
        }

    def _resident_put(self):
        """Corpus placer for the resident paths: a plain ``device_put``
        single-process; on a multi-host mesh the corpus is placed REPLICATED
        over every host's devices (each process holds the full value — the
        epoch scan's on-device gather-by-index needs all rows everywhere,
        and the batch sharding constraints parallelize the compute)."""
        if self.cfg.multihost:
            from dfac_tpu.parallel import multihost as mh
            from dfac_tpu.parallel.mesh import replicate

            rep = replicate(self.mesh)
            return lambda x: mh.put_global(np.asarray(x), rep)
        return lambda x: jax.device_put(jnp.asarray(x))

    def _resident_arrays(self, ds: ArrayDataset):
        if getattr(self, "_resident_ds", None) is not ds:
            put = self._resident_put()
            self._resident_feats = put(ds.features)
            self._resident_labels = put(
                (ds.labels if ds.labels is not None else np.zeros(len(ds))).astype(np.float32)
            )
            # hold the reference (id() can be reused after GC) and drop any
            # epoch-scan program built for a different corpus length — a
            # stale scan would draw permutations over the OLD n_examples
            # and jnp.take would silently clamp out-of-range rows
            self._resident_ds = ds
            if getattr(self, "_epoch_scan_n", None) != len(ds):
                self._epoch_scan = None
                self._epoch_scan_frozen = None
            if self._indexed_step is None:
                self._indexed_step = make_indexed_train_step(
                    self.model, self.tx, self.cfg.swap_tf, self.cfg.label_smoothing,
                    self.augment_fn,
                    mesh=self.mesh if self._gspmd_resident else None,
                )
        return self._resident_feats, self._resident_labels

    def train_epoch(self, ds: ArrayDataset, epoch: int, batch_ctx=None) -> float | None:
        cfg = self.cfg
        resident = cfg.device_resident and (
            cfg.data_parallel <= 1 or self._gspmd_resident
        )
        # Loss accumulates as lazy device scalars; forcing a float per step
        # costs one device->host round trip per batch (ruinous on a remote
        # accelerator). Only a live progress UI pays that price.
        live_ui = batch_ctx is not None and getattr(batch_ctx, "wants_updates", True)
        total_loss = jnp.zeros(())
        total_count = jnp.zeros(())

        def after_step(i, loss_sum, count):
            nonlocal total_loss, total_count
            total_loss = total_loss + loss_sum
            total_count = total_count + count
            if live_ui:
                tc = float(total_count)
                if tc > 0:
                    batch_ctx.update_batch(
                        BatchMetrics(
                            batch_idx=i,
                            running_loss=float(total_loss) / tc,
                            batch_size=int(count),
                        )
                    )

        if cfg.resident_chunk_batches > 0:
            # accounting flows through after_step into the common return
            self._chunked_epoch(ds, epoch, after_step)
        elif resident:
            if live_ui and not getattr(self, "_warned_live_ui", False):
                # surfaced once per trainer: a silent 5-10x slowdown is the
                # worst kind (measured ~28 ms/batch relay round-trip per
                # float() sync, results/v5e_measurements.md)
                logging.getLogger(__name__).warning(
                    "device_resident with a live progress UI falls back to "
                    "per-batch dispatch (one host sync per batch for the "
                    "running-loss display) — typically 5-10x slower than the "
                    "one-dispatch epoch scan on remote TPUs. Use --quiet "
                    "(NoOpVisualizer) for full speed."
                )
                self._warned_live_ui = True
            feats_all, labels_all = self._resident_arrays(ds)
            if cfg.multihost:
                from dfac_tpu.parallel import multihost as mh

                # state leaves must be global arrays before the GSPMD
                # program (idempotent; also heals host-local LR updates)
                self.state = mh.replicate_tree(self.state, self.mesh)

            frozen = self._bn_frozen_at(epoch)
            if not live_ui:
                # whole epoch as one lax.scan program: a single dispatch
                # with a scalar seed — the shuffle permutation is drawn on
                # device, so nothing crosses the host boundary per epoch
                if frozen and self._epoch_scan_frozen is None:
                    self._epoch_scan_frozen = make_epoch_scan(
                        self.model, self.tx, cfg.swap_tf, cfg.label_smoothing,
                        self.augment_fn, n_examples=len(ds), batch_size=cfg.batch_size,
                        mesh=self.mesh if self._gspmd_resident else None,
                        bn_frozen=True,
                    )
                if not frozen and self._epoch_scan is None:
                    self._epoch_scan = make_epoch_scan(
                        self.model, self.tx, cfg.swap_tf, cfg.label_smoothing,
                        self.augment_fn, n_examples=len(ds), batch_size=cfg.batch_size,
                        mesh=self.mesh if self._gspmd_resident else None,
                    )
                self._epoch_scan_n = len(ds)
                scan = self._epoch_scan_frozen if frozen else self._epoch_scan
                self.state, total_loss, total_count = scan(
                    self.state, feats_all, labels_all,
                    np.int64(cfg.seed * 100003 + epoch),
                )
            else:
                # true-size tail batch (one extra compiled shape) — padded
                # rows must not enter BatchNorm statistics
                step = self._indexed_step
                if frozen:
                    if self._indexed_step_frozen is None:
                        self._indexed_step_frozen = make_indexed_train_step(
                            self.model, self.tx, cfg.swap_tf,
                            cfg.label_smoothing, self.augment_fn, bn_frozen=True,
                        )
                    step = self._indexed_step_frozen
                order = np.arange(len(ds))
                np.random.default_rng(cfg.seed * 100003 + epoch).shuffle(order)
                for i, start in enumerate(range(0, len(ds), cfg.batch_size)):
                    idx = order[start : start + cfg.batch_size]
                    self.state, loss_sum, count = step(
                        self.state, feats_all, labels_all,
                        jnp.asarray(idx.astype(np.int32)),
                        jnp.ones(len(idx), jnp.float32),
                    )
                    after_step(i, loss_sum, count)
        elif cfg.multihost:
            self._multihost_epoch(ds, epoch, after_step)
        else:
            from dfac_tpu.io.prefetch import prefetched

            step = (
                self._frozen_train_step() if self._bn_frozen_at(epoch)
                else self._train_step
            )
            # host batch assembly (shuffled row gather) overlaps the
            # previous step's device dispatch via a one-thread pipeline
            for i, batch in enumerate(
                prefetched(batch_iterator(
                    ds, cfg.batch_size, shuffle=True,
                    seed=cfg.seed * 100003 + epoch, pad_tail=False,
                ))
            ):
                self.state, loss_sum, count = step(
                    self.state,
                    jnp.asarray(batch.features),
                    jnp.asarray(batch.labels),
                    jnp.asarray(batch.weights),
                )
                after_step(i, loss_sum, count)

        tc = float(total_count)
        return (float(total_loss) / tc) if tc else None

    def _multihost_epoch(self, ds: ArrayDataset, epoch: int, after_step) -> None:
        """Host-loop DP epoch on a multi-host mesh (one process per pod
        host, ``jax.distributed`` initialized).

        Every process walks the SAME shuffled batch sequence (identical
        permutation seed — exactly :func:`batch_iterator`'s), but gathers
        and uploads only its own row slice of each global batch
        (:func:`dfac_tpu.parallel.multihost.batch_from_local` — a
        memmap-backed corpus pages in only each host's rows); the shard_map
        DP step then runs as ONE global program over every host's devices,
        with gradient/BatchNorm psums riding ICI/DCN. Host gather of batch
        k+1 overlaps the device step on batch k (same prefetch pipeline as
        the single-host loop). Parity with the single-device step on the
        global batch is asserted in ``tests/multihost_worker.py``."""
        from dfac_tpu.parallel import multihost as mh
        from dfac_tpu.train.chunked import check_dp_tail

        cfg = self.cfg
        n = len(ds)
        check_dp_tail(n, cfg.batch_size, cfg.data_parallel, "multihost training")
        # state leaves must be GLOBAL arrays before they meet the multi-host
        # program; re-placing each epoch also heals host-local leaves the
        # scheduler's LR update injects (idempotent, and tiny next to an
        # epoch for these model sizes)
        self.state = mh.replicate_tree(self.state, self.mesh)
        step = (
            self._frozen_train_step() if self._bn_frozen_at(epoch)
            else self._train_step
        )
        order = np.arange(n)
        np.random.default_rng(cfg.seed * 100003 + epoch).shuffle(order)
        labels_all = np.asarray(
            ds.labels if ds.labels is not None else np.zeros(n), np.float32
        )
        for i, (feats_g, labels_g, w_g) in enumerate(
            mh.stream_global_batches(
                ds.features, (labels_all, np.ones(n, np.float32)),
                order, cfg.batch_size, self.mesh,
            )
        ):
            self.state, loss_sum, count = step(
                self.state, feats_g, labels_g, w_g
            )
            after_step(i, loss_sum, count)

    def _chunked_epoch(self, ds: ArrayDataset, epoch: int, after_step) -> None:
        """Streamed epoch for corpora larger than HBM (npy-store scale).

        The epoch's shuffled batch sequence is EXACTLY the per-batch host
        loop's (same permutation seed, same batch partition, same
        ``state.key`` split chain — test-enforced; floats agree up to
        XLA reassociation across the two compiled programs), but
        the device sees one dispatch per ``resident_chunk_batches``
        batches: the host gathers the chunk's rows (native threaded
        gather — memmap page-in parallelizes), uploads it in a prefetch
        thread while the device scans the previous chunk, and the tail
        partial batch runs at its true size (BatchNorm stats stay clean).
        Contrast: ``device_resident`` uploads the whole corpus once
        (fastest, needs it to fit in HBM); the plain host loop dispatches
        per batch. Reference analogue: DataLoader worker streaming,
        ``/root/reference/src/train.py:31-62``."""
        from dfac_tpu.train.chunked import (
            check_dp_tail,
            chunk_scan_over,
            stream_chunks,
            tail_ones,
        )

        cfg = self.cfg
        n, dp = len(ds), cfg.data_parallel
        what = "multihost chunked training" if cfg.multihost else "chunked training"
        check_dp_tail(n, cfg.batch_size, dp, what)
        if cfg.multihost:
            from dfac_tpu.parallel import multihost as mh

            # state leaves must be global before the multi-host program;
            # re-placing each epoch also heals host-local leaves the
            # scheduler's LR update injects (idempotent, tiny vs an epoch)
            self.state = mh.replicate_tree(self.state, self.mesh)
        order = np.arange(n)
        np.random.default_rng(cfg.seed * 100003 + epoch).shuffle(order)
        labels_all = np.asarray(
            ds.labels if ds.labels is not None else np.zeros(n), np.float32
        )
        frozen = self._bn_frozen_at(epoch)
        step = self._frozen_train_step() if frozen else self._train_step
        if frozen and self._chunk_scan_frozen is None:
            self._chunk_scan_frozen = chunk_scan_over(
                step, append_ones=True, track_count=True,
                ingest=cfg.chunk_ingest,
            )
        if not frozen and self._chunk_scan is None:
            # scan over the SAME step Trainer dispatches per batch —
            # self._train_step is already the shard_map DP step (dp>1) or
            # make_train_step; one construction, no divergence risk
            self._chunk_scan = chunk_scan_over(
                self._train_step, append_ones=True, track_count=True,
                ingest=cfg.chunk_ingest,
            )
        chunk_scan = self._chunk_scan_frozen if frozen else self._chunk_scan
        from dfac_tpu.io.prefetch import PrefetchStats

        stats = PrefetchStats()
        chunks = stream_chunks(
            ds.features, (labels_all,), order, cfg.batch_size,
            cfg.resident_chunk_batches, mesh=self.mesh if dp > 1 else None,
            multihost=cfg.multihost, stats=stats, ingest=cfg.chunk_ingest,
        )
        batches_done = 0  # the UI's progress unit is BATCHES, not chunks
        for ci, full, tail in chunks:
            if full is not None:
                self.state, loss_sum, count = chunk_scan(self.state, *full)
                batches_done += full[0].shape[0]
                after_step(batches_done - 1, loss_sum, count)
            if tail is not None:
                feats_t, labels_t = tail
                self.state, loss_sum, count = step(
                    self.state, feats_t, labels_t,
                    tail_ones(feats_t.shape[0], self.mesh, cfg.multihost),
                )
                batches_done += 1
                after_step(batches_done - 1, loss_sum, count)
        # epoch boundary forces a device sync anyway (loss fetch); a
        # host-bound epoch means the chunk gather, not the scan, set the
        # pace — surface it once (the fix is ingest-side, not model-side)
        if stats.host_bound() and not getattr(self, "_warned_host_bound", False):
            logging.getLogger(__name__).warning(
                "chunked training is ingest-bound: the device waited %.1fs "
                "on host chunk gathers (vs %.1fs gather-behind-scan). Raise "
                "DFAC_TPU_INGEST_THREADS, store the corpus as memory-mapped "
                ".npy (dfac-data-tools convert-to-npy), compress the upload "
                "with --chunk-ingest bf16|int8, or grow "
                "--resident-chunk-batches.",
                stats.host_wait_s, stats.device_wait_s,
            )
            self._warned_host_bound = True

    def restore(self, ckpt_path: str) -> dict:
        """Resume from a checkpoint: model variables, optimizer state,
        scheduler state, epoch and best-tracking counters.

        Goes beyond the reference, whose recovery is a manual re-run from
        ``*_last.pt`` with no trainer wiring (SURVEY.md §5).

        In multihost mode checkpoints exist only on the coordinator's
        filesystem (non-coordinators never write them, ``fit`` nulls their
        checkpoint_dir) — so the coordinator reads the file and the payload
        broadcasts to every process instead of each opening the path.
        """
        if self.cfg.multihost:
            from dfac_tpu.parallel import multihost as mh

            ckpt = ckpt_lib.load_checkpoint(ckpt_path) if mh.is_coordinator() else None
            ckpt = mh.broadcast_pyobj(ckpt)
        else:
            ckpt = ckpt_lib.load_checkpoint(ckpt_path)
        variables = ckpt["model_state"]
        if self.state is None:
            # build a state skeleton so opt_state structure exists
            self.state = TrainState(
                params=variables["params"],
                batch_stats=variables.get("batch_stats", {}),
                opt_state=self.tx.init(variables["params"]),
                key=train_key(self.cfg.seed + 1),
            )
        restored_opt = ckpt.get("optimizer_state")
        self.state = self.state.replace(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=restored_opt if restored_opt is not None else self.state.opt_state,
        )
        if self.scheduler is not None and ckpt.get("scheduler_state"):
            from dfac_tpu.train.optim import PlateauScheduler

            self.scheduler = PlateauScheduler.from_state_dict(ckpt["scheduler_state"])
        ts = ckpt.get("config", {}).get("_trainer_state", {})
        if ts.get("lr") is not None:
            self._lr = ts["lr"]
            self.state = self.state.replace(opt_state=_set_opt_lr(self.state.opt_state, self._lr))
        return {"epoch": ckpt.get("epoch", 0), "trainer_state": ts}

    def fit(
        self,
        train_ds: ArrayDataset,
        dev_ds: ArrayDataset,
        checkpoint_dir: str | None = None,
        config_snapshot: dict | None = None,
        resume_from: str | None = None,
    ) -> dict:
        cfg = self.cfg
        if cfg.multihost and checkpoint_dir:
            from dfac_tpu.parallel import multihost as mh

            if not mh.is_coordinator():
                # exactly one process writes artifacts; state is replicated
                # so the coordinator's copy IS the global model
                checkpoint_dir = None
        start_epoch = 1
        resumed_ts: dict = {}
        if resume_from:
            restored = self.restore(resume_from)
            start_epoch = restored["epoch"] + 1
            resumed_ts = restored["trainer_state"]
        if self.state is None:
            self.init_state(train_ds.features[: max(cfg.batch_size, 1)])

        self.visualizer.on_training_start(
            TrainingConfig(
                device=str(jax.devices()[0]).lower(),
                model=cfg.model,
                epochs=cfg.epochs,
                batch_size=cfg.batch_size,
                learning_rate=cfg.lr,
                weight_decay=cfg.weight_decay,
                early_stop_patience=cfg.early_stop,
                in_features=cfg.in_features,
                hidden_dim=cfg.hidden_dim,
                dropout=cfg.dropout,
            )
        )

        best_eer = resumed_ts.get("best_eer")
        best_train_loss = resumed_ts.get("best_train_loss")
        best_dev_loss = resumed_ts.get("best_dev_loss")
        prev_metrics: EpochMetrics | None = None
        epochs_no_improve = resumed_ts.get("epochs_no_improve", 0)
        eer_tie_eps = 1e-4
        loss_improve_eps = 1e-6
        best_path = last_path = None
        if checkpoint_dir:
            import os

            os.makedirs(checkpoint_dir, exist_ok=True)
            best_path = os.path.join(checkpoint_dir, f"{cfg.model}_best.ckpt")
            last_path = os.path.join(checkpoint_dir, f"{cfg.model}_last.ckpt")

        for epoch in range(start_epoch, cfg.epochs + 1):
            t0 = time.perf_counter()
            with self.visualizer.on_epoch_start(
                epoch, num_batches(len(train_ds), cfg.batch_size)
            ) as batch_ctx:
                train_loss = self.train_epoch(train_ds, epoch, batch_ctx)

            if (
                cfg.device_resident
                and (cfg.data_parallel <= 1 or self._gspmd_resident)
                and dev_ds.labels is not None
            ):
                dev_metrics = self._resident_dev_metrics(dev_ds)
            else:
                dev_metrics, _, _ = evaluate_classifier(
                    self.model,
                    self.variables(),
                    dev_ds,
                    batch_size=cfg.eval_batch_size or cfg.batch_size,
                    swap_tf=cfg.swap_tf,
                    label_smoothing=cfg.label_smoothing,
                )
            eer = dev_metrics["eer"]
            dev_loss = dev_metrics["avg_loss"]
            elapsed = time.perf_counter() - t0

            # best rule (reference src/train.py:484-518)
            is_best = False
            if eer is not None:
                if best_eer is None or eer < best_eer:
                    is_best = True
                    best_eer, best_train_loss, best_dev_loss = eer, train_loss, dev_loss
                    epochs_no_improve = 0
                else:
                    epochs_no_improve += 1
                    if (
                        abs(eer - best_eer) <= eer_tie_eps
                        and None not in (train_loss, dev_loss, best_train_loss, best_dev_loss)
                        and train_loss < best_train_loss - loss_improve_eps
                        and dev_loss < best_dev_loss - loss_improve_eps
                    ):
                        is_best = True
                        best_train_loss, best_dev_loss = train_loss, dev_loss
            if is_best:
                # keep the best-epoch snapshot in memory too (device-array
                # references, zero copy) so best_variables() reflects the
                # model that achieved best_eer even without a checkpoint_dir
                # — callers like the A/B CLIs score the test split with it
                self._best_params = self.state.params
                self._best_batch_stats = self.state.batch_stats

            if self.scheduler is not None:
                metric = dev_loss if cfg.lr_scheduler_metric == "dev_loss" else eer
                if metric is not None:
                    new_lr = self.scheduler.step(metric, self._lr)
                    if new_lr != self._lr:
                        self._lr = new_lr
                        self.state = self.state.replace(
                            opt_state=_set_opt_lr(self.state.opt_state, new_lr)
                        )

            improved = (
                prev_metrics is not None
                and prev_metrics.dev_eer is not None
                and eer is not None
                and eer < prev_metrics.dev_eer
            )
            metrics = EpochMetrics(
                epoch=epoch,
                train_loss=train_loss,
                dev_loss=dev_loss,
                dev_eer=eer,
                is_best=is_best,
                improved=improved,
                epochs_no_improve=epochs_no_improve,
                learning_rate=self._lr,
                epoch_seconds=elapsed,
                throughput_utt_s=len(train_ds) / elapsed if elapsed > 0 else None,
            )
            self.visualizer.on_epoch_end(metrics, prev_metrics)

            trainer_state = {
                "best_eer": best_eer, "best_train_loss": best_train_loss,
                "best_dev_loss": best_dev_loss,
                "epochs_no_improve": epochs_no_improve, "lr": self._lr,
            }
            if is_best and best_path:
                self._save(best_path, epoch, config_snapshot, trainer_state=trainer_state)
            if last_path:
                # refreshed every epoch so a crash resumes from the most
                # recent state (the reference writes its *_last only at exit)
                self._save(last_path, epoch, config_snapshot, trainer_state=trainer_state)
            self.history.append(metrics)
            prev_metrics = metrics

            if cfg.early_stop and epochs_no_improve >= cfg.early_stop:
                break

        self.visualizer.on_training_end(self.history)
        if last_path:
            # a resumed run with zero epochs left must not clobber the
            # restored epoch counter with 0 (the next resume would retrain
            # the full schedule on top of the trained weights)
            last_epoch = self.history[-1].epoch if self.history else start_epoch - 1
            self._save(
                last_path, last_epoch, config_snapshot,
                trainer_state={
                    "best_eer": best_eer, "best_train_loss": best_train_loss,
                    "best_dev_loss": best_dev_loss,
                    "epochs_no_improve": epochs_no_improve, "lr": self._lr,
                },
            )
        return {
            "best_eer": best_eer,
            "best_train_loss": best_train_loss,
            "best_dev_loss": best_dev_loss,
            "history": self.history,
        }

    def save_checkpoint_file(
        self,
        path: str,
        *,
        epoch: int,
        variables: dict | None = None,
        config_snapshot: dict | None = None,
        trainer_state: dict | None = None,
    ):
        """Format-dispatched checkpoint write (pickle or orbax per
        ``cfg.checkpoint_format``) with the ``_trainer_state`` embedding —
        the ONE place the checkpoint payload layout lives (the fused-fit
        CLI writes best/last through this too).

        When ``variables`` is supplied (a best-epoch snapshot written
        after training moved on), the optimizer and scheduler states are
        OMITTED: the trainer only holds their last-epoch values, and
        pairing best-epoch params with last-epoch Adam moments/LR counters
        would silently skew a resumed run. Resume from ``*_last.ckpt``
        (full state, in sync) for training; ``*_best.ckpt`` is the
        inference artifact."""
        snapshot = variables is not None
        config = dict(config_snapshot or dataclasses.asdict(self.cfg))
        if trainer_state is not None:
            config["_trainer_state"] = trainer_state
        save = (
            ckpt_lib.save_checkpoint_orbax
            if self.cfg.checkpoint_format == "orbax"
            else ckpt_lib.save_checkpoint
        )
        save(
            path,
            variables if snapshot else self.variables(),
            opt_state=None if snapshot else self.state.opt_state,
            epoch=epoch,
            config=config,
            scheduler_state=(
                None if snapshot or self.scheduler is None
                else self.scheduler.state_dict()
            ),
        )

    def _save(self, path: str, epoch: int, config_snapshot: dict | None, trainer_state: dict | None = None):
        self.save_checkpoint_file(
            path, epoch=epoch, config_snapshot=config_snapshot,
            trainer_state=trainer_state,
        )
