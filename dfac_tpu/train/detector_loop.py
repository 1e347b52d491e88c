"""DeepfakeDetector ("dlqueen") training runtime.

Feature-parity target: reference ``src/dlqueen_model.py:220-448`` — the
alternative trainer with its own recipe:

* class-balanced **weighted sampling with replacement** (inverse class
  frequency, reference ``compute_class_weights`` + WeightedRandomSampler);
* ``pos_weight`` BCE (neg/pos on the positive term only, torch semantics);
* AdamW(lr 1e-3, wd 1e-4) + **global-norm gradient clipping** at 5.0;
* per-sample SpecAugment on (T, C) (width-capped count masks);
* **EMA of weights** (decay 0.999), dev EER evaluated under EMA;
* best = min dev EER, patience-6 early stop;
* variable-length utterances as padded static-shape batches with a length
  mask (device-side masked StatsPool instead of pad_sequence).

The AMP/GradScaler machinery of the reference is replaced by bf16 compute
dtype — on TPU the MXU is bf16-native and loss scaling is unnecessary.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from dfac_tpu.data.augment import dlqueen_spec_augment
from dfac_tpu.data.pipeline import ArrayDataset, pad_to_batch
from dfac_tpu.models import build_model
from dfac_tpu.ops.eer import eer_device
from dfac_tpu.utils.rng import train_key


@dataclasses.dataclass
class DetectorConfig:
    epochs: int = 30
    batch_size: int = 32
    lr: float = 1e-3
    weight_decay: float = 1e-4
    grad_clip: float = 5.0
    hidden: int = 256
    dropout: float = 0.3
    specaug: bool = False
    time_mask_max: int = 30
    time_mask_n: int = 2
    freq_mask_max: int = 24
    freq_mask_n: int = 2
    ema: bool = False
    ema_decay: float = 0.999
    patience: int = 6
    seed: int = 42
    compute_dtype: str | None = None
    device_resident: bool = False  # corpus in HBM; epoch = one scan program
    data_parallel: int = 0  # shard_map DP over N devices (0/1 = single device)
    # stream the epoch in chunks of N batches (one dispatch per chunk,
    # upload overlapped) — for corpora larger than HBM; 0 = off
    resident_chunk_batches: int = 0
    # chunked-upload compression: f32 | bf16 | int8 (see TrainConfig)
    chunk_ingest: str = "f32"
    # encoder-block dropout (reference src/dlqueen_model.py ConvEncoder
    # default); --train-fast zeroes it together with the head dropout
    encoder_dropout: float = 0.2
    # fast-numerics recipe: freeze BatchNorm (running-stats forward, no
    # stat updates) for epochs AFTER round(epochs * frac); 0 disables.
    # Composes with EMA: the EMA keeps averaging params while the frozen
    # running stats stay exactly where the boundary epoch left them — the
    # eval pairing (EMA params + final stats) is therefore self-consistent
    # for the whole tail. Quality gate: results/alt_trainer_fast_ab.md
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
                "multihost detector training is data-parallel over the "
                "pod — set data_parallel to the GLOBAL device count"
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
        # DP step); the tail-divisibility check needs the corpus length, so
        # it lives in fit()


class DetectorState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    ema_params: Any
    opt_state: Any
    key: jax.Array


def compute_class_weights(labels: np.ndarray) -> tuple[float, float, float]:
    """(pos_weight, w0, w1) per reference ``src/dlqueen_model.py:253-262``."""
    pos = int((labels == 1).sum())
    neg = int((labels == 0).sum())
    return neg / max(pos, 1), 1.0 / max(neg, 1), 1.0 / max(pos, 1)


def pos_weight_bce_per(logits, labels, pos_weight: float):
    """Per-sample torch BCEWithLogitsLoss(pos_weight=...) terms."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * labels * log_p + (1.0 - labels) * log_not_p)


def pos_weight_bce(logits, labels, pos_weight: float):
    """torch BCEWithLogitsLoss(pos_weight=...): weight the positive term
    only, then plain mean."""
    return jnp.mean(pos_weight_bce_per(logits, labels, pos_weight))


def make_detector_train_step(
    model, tx, cfg: DetectorConfig, pos_weight: float, bn_frozen: bool = False
):
    """``bn_frozen=True`` builds the freeze-tail variant: BatchNorm runs on
    its running stats and the stat-update traffic disappears (same recipe
    contract as :func:`dfac_tpu.train.loop.make_train_step`)."""

    @jax.jit
    def train_step(state: DetectorState, feats, lengths, labels):
        next_key, aug_key, drop_key = jax.random.split(state.key, 3)
        x = jnp.transpose(feats, (0, 2, 1))  # (B, T, C)
        if cfg.specaug:
            x = dlqueen_spec_augment(
                aug_key, x, cfg.time_mask_max, cfg.time_mask_n,
                cfg.freq_mask_max, cfg.freq_mask_n,
            )

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            logits, mutated = model.apply(
                variables, x, lengths=lengths, train=True, bn_frozen=bn_frozen,
                mutable=["batch_stats"], rngs={"dropout": drop_key},
            )
            return pos_weight_bce(logits, labels, pos_weight), mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = (
            jax.tree.map(
                lambda e, p: cfg.ema_decay * e + (1.0 - cfg.ema_decay) * p,
                state.ema_params, new_params,
            )
            if cfg.ema
            else state.ema_params
        )
        return (
            state.replace(
                params=new_params,
                batch_stats=mutated.get("batch_stats", state.batch_stats),
                ema_params=new_ema,
                opt_state=new_opt_state,
                key=next_key,
            ),
            loss,
        )

    return train_step


def make_detector_dp_train_step(
    model, tx, cfg: DetectorConfig, pos_weight: float, mesh,
    axis_name: str = "data", bn_frozen: bool = False,
):
    """shard_map data-parallel detector train step over ``mesh``'s 'data'
    axis (reference trainer: ``src/dlqueen_model.py:332-395``, single-GPU
    AMP; here the batch splits over shards instead).

    Numerically equivalent to the single-device step on the concatenated
    global batch: BatchNorm stats pmean over shards (model built with
    ``axis_name='data'``), the masked StatsPool is per-sample so it shards
    cleanly, gradients emerge from shard_map AD as the global-sum gradient
    (replicated params), one division by the global count gives the exact
    global-mean gradient, and grad-clip/AdamW/EMA run replicated on the
    identical psum'd gradient. SpecAugment/dropout keys fold in the shard
    index for independent per-shard draws.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def per_shard(state: DetectorState, feats, lengths, labels, weights):
        next_key, aug_key, drop_key = jax.random.split(state.key, 3)
        shard_i = jax.lax.axis_index(axis_name)
        drop_key = jax.random.fold_in(drop_key, shard_i)
        x = jnp.transpose(feats, (0, 2, 1))  # (B/shards, T, C)
        if cfg.specaug:
            aug_key = jax.random.fold_in(aug_key, shard_i)
            x = dlqueen_spec_augment(
                aug_key, x, cfg.time_mask_max, cfg.time_mask_n,
                cfg.freq_mask_max, cfg.freq_mask_n,
            )

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            logits, mutated = model.apply(
                variables, x, lengths=lengths, train=True, bn_frozen=bn_frozen,
                mutable=["batch_stats"], rngs={"dropout": drop_key},
            )
            per = pos_weight_bce_per(logits.reshape(-1), labels, pos_weight)
            return jnp.sum(per * weights), mutated

        (local_sum, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        count = jax.lax.psum(jnp.sum(weights), axis_name)
        grads = jax.tree.map(lambda g: g / jnp.maximum(count, 1.0), grads)
        loss_sum = jax.lax.psum(local_sum, axis_name)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = (
            jax.tree.map(
                lambda e, p: cfg.ema_decay * e + (1.0 - cfg.ema_decay) * p,
                state.ema_params, new_params,
            )
            if cfg.ema
            else state.ema_params
        )
        new_state = state.replace(
            params=new_params,
            batch_stats=mutated.get("batch_stats", state.batch_stats),
            ema_params=new_ema,
            opt_state=new_opt_state,
            key=next_key,
        )
        # mean loss, like the single-device step's jnp.mean
        return new_state, loss_sum / jnp.maximum(count, 1.0)

    return jax.jit(
        shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P(axis_name), P(axis_name), P(axis_name), P(axis_name)),
            out_specs=(P(), P()),
        )
    )


def make_detector_chunk_scan(model, tx, cfg: DetectorConfig, pos_weight: float):
    """``lax.scan`` of the detector train step over a chunk of pre-batched
    rows: ``feats (g, B, C, T), lengths (g, B), labels (g, B) -> state',
    loss_sum`` — chunked streaming training for corpora larger than HBM
    (mirrors :func:`dfac_tpu.train.loop.make_chunk_scan`; same weighted
    sample sequence and ``state.key`` chain as the per-batch host loop,
    floats up to XLA reassociation)."""
    from dfac_tpu.train.chunked import chunk_scan_over

    step = make_detector_train_step(model, tx, cfg, pos_weight)
    return chunk_scan_over(step, append_ones=False, track_count=False)


def make_detector_dp_chunk_scan(model, tx, cfg: DetectorConfig, pos_weight: float, mesh):
    """Chunked streaming x data parallelism for the detector: a ``lax.scan``
    over the shard_map DP step (each chunk batch dim sharded over 'data';
    mirrors :func:`dfac_tpu.train.loop.make_dp_chunk_scan`)."""
    from dfac_tpu.train.chunked import chunk_scan_over

    step = make_detector_dp_train_step(model, tx, cfg, pos_weight, mesh)
    return chunk_scan_over(step, append_ones=True, track_count=False)


def make_detector_epoch_scan(
    model, tx, cfg: DetectorConfig, pos_weight: float, n_examples: int,
    batch_size: int, mesh=None, bn_frozen: bool = False,
):
    """One jit program per detector epoch over a device-resident corpus.

    The reference's class-balanced **weighted sampling with replacement**
    (``src/dlqueen_model.py`` WeightedRandomSampler) stays on the host — the
    per-epoch ``order`` index vector is the only upload — so the sampling
    distribution and numpy determinism are identical to the host-fed path;
    the gather + every train step run on device under ``lax.scan`` (mirrors
    :func:`dfac_tpu.train.loop.make_epoch_scan`). The tail batch runs
    true-size in the same program. With ``mesh``, batches are
    sharding-constrained onto 'data' (GSPMD data-parallel epochs — pods
    included) and outputs replicate.
    """
    from dfac_tpu.parallel.mesh import batch_constrainer, replicated_jit

    constrain = batch_constrainer(mesh)
    step = make_detector_train_step(model, tx, cfg, pos_weight, bn_frozen=bn_frozen)
    base = step.__wrapped__ if hasattr(step, "__wrapped__") else step
    n_full = n_examples // batch_size
    tail = n_examples % batch_size

    def epoch_scan(state: DetectorState, feats_all, lengths_all, labels_all, order):
        idx_mat = order[: n_full * batch_size].reshape(n_full, batch_size)

        def batch_of(idx):
            return (
                constrain(jnp.take(feats_all, idx, axis=0)),
                constrain(jnp.take(lengths_all, idx, axis=0)),
                constrain(jnp.take(labels_all, idx, axis=0)),
            )

        def body(carry, idx):
            st, loss_acc = carry
            st, loss = base(st, *batch_of(idx))
            return (st, loss_acc + loss), None

        (state_out, loss_sum), _ = jax.lax.scan(
            body, (state, jnp.zeros(())), idx_mat
        )
        if tail:
            state_out, tail_loss = base(
                state_out, *batch_of(order[n_full * batch_size :])
            )
            loss_sum = loss_sum + tail_loss
        return state_out, loss_sum

    return replicated_jit(epoch_scan, mesh)


def make_fused_detector_fit(
    model, tx, cfg: DetectorConfig, pos_weight: float,
    n_train: int, n_dev: int, mesh=None,
):
    """The whole detector run as ONE dispatched program: per-epoch weighted
    orders come in as a pre-sampled (epochs, N) matrix (host numpy keeps the
    reference's WeightedRandomSampler semantics and determinism), and the
    scan runs train epochs, EMA, dev EER under the eval variables, the
    min-EER best rule with patience, and early stopping on device.

    Returns ``fused(state, tf, tlen, tl, orders, df, dlen, dl, didx) ->
    (final_state, best_vars, aux, history)``. The best rule compares exact
    u64 EER numerators (``ops/wideint.py``), valid at any dev-split size.

    With ``mesh`` the program is GSPMD data-parallel over 'data' (train +
    dev batches sharding-constrained, outputs replicated) — one dispatch
    per RUN across a multi-host pod, fed replicated corpora on every host.
    """
    from dfac_tpu.ops import wideint as wi
    from dfac_tpu.ops.eer import eer_counts_jax
    from dfac_tpu.parallel.mesh import batch_constrainer, replicated_jit

    constrain = batch_constrainer(mesh)
    epoch_scan = make_detector_epoch_scan(
        model, tx, cfg, pos_weight, n_train, cfg.batch_size, mesh=mesh
    )
    # BN freeze tail inside the one-dispatch program: epochs after
    # round(epochs * frac) run a frozen-BN epoch body selected by lax.cond
    # (same boundary rule as fit()'s _bn_frozen_at and train/fused_fit.py)
    freeze_frac = cfg.bn_freeze_after_frac
    frozen_scan = None
    if freeze_frac:
        frozen_scan = make_detector_epoch_scan(
            model, tx, cfg, pos_weight, n_train, cfg.batch_size, mesh=mesh,
            bn_frozen=True,
        )
    freeze_epoch = round(cfg.epochs * freeze_frac)
    n_batches = -(-n_train // cfg.batch_size)

    def fused(state: DetectorState, tf, tlen, tl, orders, df, dlen, dl, didx):
        def eval_vars_of(st):
            params = st.ema_params if cfg.ema else st.params
            v = {"params": params}
            if st.batch_stats:
                v["batch_stats"] = st.batch_stats
            return v

        def dev_eer_num(st):
            v = eval_vars_of(st)

            def body(_, idx):
                x = jnp.transpose(constrain(jnp.take(df, idx, axis=0)), (0, 2, 1))
                logits = model.apply(
                    v, x, lengths=constrain(jnp.take(dlen, idx, axis=0))
                )
                return None, logits.reshape(-1)

            _, scores = jax.lax.scan(body, None, didx)
            # pad rows live only at the tail of the last batch (didx repeats
            # row 0 there): the first n_dev flattened scores are exactly the
            # dev rows in dataset order
            fa, fr, ns, nb, thr = eer_counts_jax(scores.reshape(-1)[:n_dev], dl)
            # EER numerator fa*nb + fr*ns in EXACT emulated u64
            # (ops/wideint.py): int32 products wrap past ns*nb >= 2^31 and
            # f32 sums lose 1-count resolution above 2^24, which would
            # wrongly advance the patience counter on large dev splits.
            p1 = wi.mul_u32(wi.to_u32(fa), wi.to_u32(nb))
            p2 = wi.mul_u32(wi.to_u32(fr), wi.to_u32(ns))
            num = wi.add_u64(*p1, *p2)
            denom2 = 2.0 * ns.astype(jnp.float32) * nb.astype(jnp.float32)
            return num, denom2, thr

        def run_epoch(carry, args):
            epoch, order = args
            (state, best_vars, best_num, best_epoch, bad, stopped) = carry
            if frozen_scan is None:
                state, loss_sum = epoch_scan(state, tf, tlen, tl, order)
            else:
                state, loss_sum = jax.lax.cond(
                    epoch > freeze_epoch,
                    lambda st: frozen_scan(st, tf, tlen, tl, order),
                    lambda st: epoch_scan(st, tf, tlen, tl, order),
                    state,
                )
            train_loss = loss_sum / n_batches

            (num_hi, num_lo), denom2, thr = dev_eer_num(state)
            first = jnp.logical_and(
                best_num[0] == jnp.uint32(0xFFFFFFFF),
                best_num[1] == jnp.uint32(0xFFFFFFFF),
            )
            better = wi.lt_u64(num_hi, num_lo, *best_num)
            is_best = jnp.logical_or(first, better)
            best_num = (
                jnp.where(is_best, num_hi, best_num[0]),
                jnp.where(is_best, num_lo, best_num[1]),
            )
            best_epoch = jnp.where(is_best, epoch, best_epoch)
            bad = jnp.where(is_best, 0, bad + 1)
            best_vars = jax.tree.map(
                lambda b, c: jnp.where(is_best, c, b), best_vars, eval_vars_of(state)
            )
            # patience fires only from the non-improvement branch, exactly
            # like fit(): with patience=0 an improving epoch must NOT stop
            # the run (bad==0 >= 0 would otherwise always trigger)
            stopped = jnp.logical_or(
                stopped, jnp.logical_and(~is_best, bad >= cfg.patience)
            )
            eer = wi.u64_to_f32(num_hi, num_lo) / denom2
            carry = (state, best_vars, best_num, best_epoch, bad, stopped)
            return carry, (train_loss, eer, is_best, stopped)

        def skip_epoch(carry, args):
            del args
            nan = jnp.float32(jnp.nan)
            return carry, (nan, nan, jnp.asarray(False), jnp.asarray(True))

        def body(carry, args):
            # keyed to the actual scan length (orders rows), not cfg.epochs:
            # a caller passing more order rows than cfg.epochs must keep the
            # early-stop cond alive
            if cfg.patience >= orders.shape[0]:
                # `bad` grows by at most 1 per epoch from 0, so it can never
                # reach patience within the run: stopping is impossible and
                # the lax.cond would be dead weight (see train/fused_fit.py)
                return run_epoch(carry, args)
            return jax.lax.cond(carry[-1], skip_epoch, run_epoch, carry, args)

        init = (
            state,
            jax.tree.map(jnp.copy, eval_vars_of(state)),
            (jnp.uint32(0xFFFFFFFF), jnp.uint32(0xFFFFFFFF)),  # best u64 numerator (unset)
            jnp.int32(0),
            jnp.int32(0),   # bad epochs
            jnp.asarray(False),
        )
        epochs = jnp.arange(1, orders.shape[0] + 1)
        carry, history = jax.lax.scan(body, init, (epochs, orders))
        final_state, best_vars, best_num, best_epoch, bad, _ = carry
        aux = {
            "best_num": best_num,
            "best_epoch": best_epoch, "bad": bad,
        }
        return final_state, best_vars, aux, history

    return replicated_jit(fused, mesh)


class DetectorTrainer:
    def __init__(self, cfg: DetectorConfig, in_channels: int = 180):
        self.cfg = cfg
        kw = {}
        if cfg.compute_dtype:
            kw["compute_dtype"] = jnp.dtype(cfg.compute_dtype)
        # multihost + device_resident is the GSPMD resident/fused path: no
        # axis_name (GSPMD computes global BN stats from the sharded batch
        # by semantics; an axis_name only resolves inside shard_map)
        self._gspmd_resident = cfg.multihost and cfg.device_resident
        if cfg.data_parallel > 1 and not self._gspmd_resident:
            # BatchNorm stats must sync over the mesh in the shard_map path
            kw["axis_name"] = "data"
        self.model = build_model(
            "detector", in_channels=in_channels, hidden=cfg.hidden,
            dropout=cfg.dropout, encoder_dropout=cfg.encoder_dropout, **kw
        )
        self.mesh = None
        if cfg.data_parallel > 1:
            from dfac_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(n_data=cfg.data_parallel)
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip) if cfg.grad_clip > 0 else optax.identity(),
            optax.adamw(cfg.lr, weight_decay=cfg.weight_decay),
        )
        self.state: DetectorState | None = None

    # -- helpers ----------------------------------------------------------
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

    def _lengths(self, ds: ArrayDataset) -> np.ndarray:
        if ds.lengths is not None:
            return ds.lengths
        return np.full(len(ds), ds.features.shape[2], np.int32)

    def eval_variables(self) -> dict:
        params = (
            self.state.ema_params if self.cfg.ema and self.state.ema_params is not None
            else self.state.params
        )
        return {"params": params, "batch_stats": self.state.batch_stats}

    def scores(self, ds: ArrayDataset, apply_sigmoid: bool = False) -> np.ndarray:
        variables = self.eval_variables()
        lengths = self._lengths(ds)
        return detector_scores(
            self.model, variables, ds, lengths, self.cfg.batch_size, apply_sigmoid
        )

    # -- loop -------------------------------------------------------------
    def fit(self, train_ds: ArrayDataset, dev_ds: ArrayDataset, ckpt_path: str | None = None) -> dict:
        cfg = self.cfg
        if cfg.multihost and ckpt_path:
            from dfac_tpu.parallel import multihost as mh

            if not mh.is_coordinator():
                # exactly one process writes artifacts; state is replicated
                ckpt_path = None
        rng = np.random.default_rng(cfg.seed)
        labels = np.asarray(train_ds.labels)
        pos_weight, w0, w1 = compute_class_weights(labels)
        sample_p = np.where(labels == 1, w1, w0).astype(np.float64)
        sample_p /= sample_p.sum()
        lengths = self._lengths(train_ds)

        init_key, _ = jax.random.split(jax.random.key(cfg.seed))
        state_key = train_key(cfg.seed)  # TPU-fast rbg chain for dropout/specaug
        t_dim = train_ds.features.shape[2]
        x0 = jnp.zeros((1, t_dim, train_ds.features.shape[1]))
        variables = self.model.init({"params": init_key, "dropout": init_key}, x0)
        self.state = DetectorState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            ema_params=variables["params"] if cfg.ema else None,
            opt_state=self.tx.init(variables["params"]),
            key=state_key,
        )
        n = len(train_ds)
        dp = cfg.data_parallel
        if dp > 1:
            tail = n % cfg.batch_size
            if tail % dp != 0:
                raise ValueError(
                    f"data-parallel detector training needs every batch "
                    f"(including the {tail}-row tail of the {n}-sample epoch) "
                    f"to divide over {dp} shards — pick a batch_size with "
                    "tail % data_parallel == 0"
                )
        # step construction, parameterized on the BN-freeze-tail recipe:
        # the frozen variants build lazily the first epoch past the
        # boundary (bn_freeze_after_frac; mirrors loop.Trainer)
        freeze_epoch = (
            round(cfg.epochs * cfg.bn_freeze_after_frac)
            if cfg.bn_freeze_after_frac else None
        )

        def bn_frozen_at(epoch: int) -> bool:
            return freeze_epoch is not None and epoch > freeze_epoch

        def build_steps(frozen: bool):
            if dp > 1:
                if self._gspmd_resident:
                    # GSPMD resident mode: the epoch scan handles every
                    # epoch; the shard_map step would be WRONG here (no
                    # axis_name -> per-shard-only BN stats)
                    return None, None
                dstep = make_detector_dp_train_step(
                    self.model, self.tx, cfg, pos_weight, self.mesh,
                    bn_frozen=frozen,
                )

                def tstep(state, feats, lens, labels, dstep=dstep):
                    return dstep(
                        state, feats, lens, labels,
                        jnp.ones((feats.shape[0],), jnp.float32),
                    )

                return tstep, dstep
            return (
                make_detector_train_step(
                    self.model, self.tx, cfg, pos_weight, bn_frozen=frozen
                ),
                None,
            )

        _step_cache: dict = {}

        def steps_for(frozen: bool):
            if frozen not in _step_cache:
                _step_cache[frozen] = build_steps(frozen)
            return _step_cache[frozen]

        train_step, dp_step = steps_for(False)

        n_batches_epoch = -(-n // cfg.batch_size)
        resident = cfg.device_resident and (dp <= 1 or self._gspmd_resident)
        epoch_scan = feats_d = lengths_d = labels_d = chunk_scan = None
        if cfg.device_resident and not resident:
            import logging

            logging.getLogger(__name__).warning(
                "device_resident is ignored with data_parallel=%d: the "
                "detector epoch falls back to per-batch host-fed dispatch "
                "(a host/relay round trip per step). Drop --data-parallel "
                "or --device-resident to silence this.", dp,
            )
        _scan_cache: dict = {}

        def epoch_scan_for(frozen: bool):
            if frozen not in _scan_cache:
                _scan_cache[frozen] = make_detector_epoch_scan(
                    self.model, self.tx, cfg, pos_weight, n, cfg.batch_size,
                    mesh=self.mesh if self._gspmd_resident else None,
                    bn_frozen=frozen,
                )
            return _scan_cache[frozen]

        if resident:
            put = self._resident_put()
            feats_d = put(train_ds.features)  # one upload, reused every epoch
            lengths_d = put(lengths)
            labels_d = put(labels.astype(np.float32))

        # inf, not 1.0: epoch 1 must always count as an improvement (and
        # save the checkpoint) even in the degenerate dev_eer == 1.0 case
        best_eer, bad, history = float("inf"), 0, []
        for epoch in range(1, cfg.epochs + 1):
            # weighted sampling WITH replacement, num_samples = N (reference)
            # — every process draws the SAME order (identically seeded rng)
            order = rng.choice(n, size=n, replace=True, p=sample_p)
            frozen = bn_frozen_at(epoch)
            train_step, dp_step = steps_for(frozen)
            if resident:
                epoch_scan = epoch_scan_for(frozen)
                if cfg.multihost:
                    from dfac_tpu.parallel import multihost as mh

                    # global state before the pod-wide program (idempotent)
                    self.state = mh.replicate_tree(self.state, self.mesh)
                self.state, total_loss = epoch_scan(
                    self.state, feats_d, lengths_d, labels_d,
                    jnp.asarray(order.astype(np.int32)),
                )
                total_loss, n_batches = float(total_loss), n_batches_epoch
            elif cfg.resident_chunk_batches > 0:
                # chunked streaming (corpora larger than HBM): G-batch scan
                # dispatches, chunk upload overlapped in a prefetch thread;
                # same weighted sample sequence as the host loop below.
                # Composes with --multihost: each process gathers its row
                # slice of every chunk batch; one global program per chunk.
                from dfac_tpu.train.chunked import (
                    check_dp_tail,
                    chunk_scan_over,
                    stream_chunks,
                    tail_ones,
                )

                what = (
                    "multihost chunked detector training" if cfg.multihost
                    else "chunked detector training"
                )
                check_dp_tail(n, cfg.batch_size, dp, what)
                if cfg.multihost:
                    from dfac_tpu.parallel import multihost as mh

                    # global state before the pod-wide program (idempotent)
                    self.state = mh.replicate_tree(self.state, self.mesh)
                if not isinstance(chunk_scan, dict):
                    chunk_scan = {}
                if frozen not in chunk_scan:
                    # scan over the SAME fit-local step the host loop
                    # dispatches (dp>1: the ones-appending DP wrapper) —
                    # one construction per recipe phase, no divergence risk
                    chunk_scan[frozen] = chunk_scan_over(
                        train_step, append_ones=False, track_count=False,
                        ingest=cfg.chunk_ingest,
                    )
                chunks = stream_chunks(
                    train_ds.features, (lengths, labels.astype(np.float32)),
                    order, cfg.batch_size, cfg.resident_chunk_batches,
                    mesh=self.mesh if dp > 1 else None,
                    multihost=cfg.multihost, ingest=cfg.chunk_ingest,
                )
                total_loss, n_batches = jnp.zeros(()), 0
                for ci, full_b, tail_b in chunks:
                    if full_b is not None:
                        self.state, loss_sum = chunk_scan[frozen](self.state, *full_b)
                        total_loss = total_loss + loss_sum  # lazy device accumulation
                        n_batches += full_b[0].shape[0]
                    if tail_b is not None:
                        if cfg.multihost:
                            # the wrapper's uncommitted jnp.ones cannot be
                            # committed to other hosts' devices — feed the
                            # DP step a global batch-sharded weights vector
                            self.state, loss = dp_step(
                                self.state, *tail_b,
                                tail_ones(tail_b[0].shape[0], self.mesh, True),
                            )
                        else:
                            self.state, loss = train_step(self.state, *tail_b)
                        total_loss = total_loss + loss
                        n_batches += 1
                total_loss = float(total_loss)
            elif cfg.multihost:
                # multi-host pod epoch: the weighted sample `order` is
                # identical on every process (seeded rng), each feeding only
                # its row slice (see loop.Trainer._multihost_epoch)
                from dfac_tpu.parallel import multihost as mh
                from dfac_tpu.train.chunked import check_dp_tail

                check_dp_tail(n, cfg.batch_size, dp, "multihost detector training")
                self.state = mh.replicate_tree(self.state, self.mesh)
                total_loss, n_batches = jnp.zeros(()), 0
                for feats_g, lens_g, labels_g, w_g in mh.stream_global_batches(
                    train_ds.features,
                    (lengths, labels.astype(np.float32), np.ones(n, np.float32)),
                    order, cfg.batch_size, self.mesh,
                ):
                    self.state, loss = dp_step(
                        self.state, feats_g, lens_g, labels_g, w_g
                    )
                    total_loss = total_loss + loss
                    n_batches += 1
                total_loss = float(total_loss)
            else:
                total_loss, n_batches = jnp.zeros(()), 0
                for start in range(0, n, cfg.batch_size):
                    # true-size tail batch (one extra compiled shape):
                    # fabricated pad rows would otherwise contribute
                    # gradients, the loss mean, and BatchNorm statistics —
                    # the reference's DataLoader batches contain only real
                    # rows (src/dlqueen_model.py)
                    idx = order[start : start + cfg.batch_size]
                    self.state, loss = train_step(
                        self.state,
                        jnp.asarray(train_ds.features[idx]),
                        jnp.asarray(lengths[idx]),
                        jnp.asarray(labels[idx].astype(np.float32)),
                    )
                    total_loss = total_loss + loss  # lazy device accumulation
                    n_batches += 1
                total_loss = float(total_loss)

            dev_scores = self.scores(dev_ds)
            dev_eer, _ = eer_device(dev_scores, dev_ds.labels)
            history.append(
                {"epoch": epoch, "train_loss": total_loss / max(n_batches, 1), "dev_eer": dev_eer}
            )

            if dev_eer < best_eer:
                best_eer, bad = dev_eer, 0
                if ckpt_path:
                    from dfac_tpu.train.checkpoint import save_checkpoint_fmt

                    save_checkpoint_fmt(
                        cfg.checkpoint_format,
                        ckpt_path, self.eval_variables(), epoch=epoch,
                        config=dataclasses.asdict(cfg),
                    )
            else:
                bad += 1
                if bad >= cfg.patience:
                    break

        return {"best_eer": best_eer, "history": history}

    def fit_fused(
        self, train_ds: ArrayDataset, dev_ds: ArrayDataset, ckpt_path: str | None = None
    ) -> dict:
        """The whole detector run as one dispatched program — same weighted
        sampling stream, EMA, eval-variables dev EER, min-EER best rule, and
        patience semantics as :meth:`fit` (the per-epoch orders are drawn
        from the identical numpy rng sequence and shipped as one (epochs, N)
        matrix)."""
        cfg = self.cfg
        multihost = cfg.multihost
        if multihost and not self._gspmd_resident:
            raise ValueError(
                "multihost fused detector fit requires device_resident=True "
                "in DetectorConfig (the trainer then builds the GSPMD model; "
                "the train_detector CLI's --fused-fit flag sets it)"
            )
        if cfg.data_parallel > 1 and not multihost:
            raise ValueError(
                "fit_fused with data_parallel is the MULTIHOST GSPMD path "
                "(--multihost --fused-fit); for single-process multi-chip "
                "detector training use fit() with data_parallel (the "
                "shard_map DP step)"
            )
        if cfg.epochs <= 0:
            return {"best_eer": float("inf"), "history": []}
        if multihost and ckpt_path:
            from dfac_tpu.parallel import multihost as mh

            if not mh.is_coordinator():
                # exactly one process writes artifacts; state is replicated
                ckpt_path = None
        rng = np.random.default_rng(cfg.seed)
        labels = np.asarray(train_ds.labels)
        pos_weight, w0, w1 = compute_class_weights(labels)
        sample_p = np.where(labels == 1, w1, w0).astype(np.float64)
        sample_p /= sample_p.sum()
        lengths = self._lengths(train_ds)
        dev_lengths = self._lengths(dev_ds)
        n, n_dev = len(train_ds), len(dev_ds)

        init_key, _ = jax.random.split(jax.random.key(cfg.seed))
        state_key = train_key(cfg.seed)
        t_dim = train_ds.features.shape[2]
        x0 = jnp.zeros((1, t_dim, train_ds.features.shape[1]))
        variables = self.model.init({"params": init_key, "dropout": init_key}, x0)
        self.state = DetectorState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            ema_params=variables["params"] if cfg.ema else None,
            opt_state=self.tx.init(variables["params"]),
            key=state_key,
        )

        orders = np.stack([
            rng.choice(n, size=n, replace=True, p=sample_p) for _ in range(cfg.epochs)
        ]).astype(np.int32)

        bs = cfg.batch_size
        n_b = -(-n_dev // bs)
        didx = np.zeros((n_b * bs,), np.int32)
        didx[:n_dev] = np.arange(n_dev)

        fused = make_fused_detector_fit(
            self.model, self.tx, cfg, pos_weight, n_train=n, n_dev=n_dev,
            mesh=self.mesh if multihost else None,
        )
        put = self._resident_put()
        if multihost:
            from dfac_tpu.parallel import multihost as mh

            # global state before the pod-wide one-dispatch program
            self.state = mh.replicate_tree(self.state, self.mesh)
        final_state, best_vars, aux, history = fused(
            self.state,
            put(train_ds.features), put(lengths),
            put(labels.astype(np.float32)),
            put(orders),
            put(dev_ds.features), put(dev_lengths),
            put(dev_ds.labels.astype(np.int32)),
            put(didx.reshape(n_b, bs)),
        )
        self.state = final_state
        self._best_eval_vars = jax.device_get(best_vars)

        train_loss, dev_eer, is_best, stopped = jax.device_get(history)
        out_history = []
        for e in range(cfg.epochs):
            if stopped[e] and np.isnan(train_loss[e]):
                break
            out_history.append({
                "epoch": e + 1, "train_loss": float(train_loss[e]),
                "dev_eer": float(dev_eer[e]),
            })
        best_eer = (
            float(min(h["dev_eer"] for h in out_history)) if out_history else float("inf")
        )
        if ckpt_path and out_history:
            from dfac_tpu.train.checkpoint import save_checkpoint_fmt

            save_checkpoint_fmt(
                cfg.checkpoint_format,
                ckpt_path, self._best_eval_vars, epoch=int(aux["best_epoch"]),
                config=dataclasses.asdict(cfg),
            )
        return {"best_eer": best_eer, "history": out_history}


import functools


@functools.partial(jax.jit, static_argnames=("model", "apply_sigmoid"))
def _detector_score_step(model, variables, feats, lens, apply_sigmoid):
    x = jnp.transpose(feats, (0, 2, 1))
    logits = model.apply(variables, x, lengths=lens)
    return jax.nn.sigmoid(logits) if apply_sigmoid else logits


def detector_scores(
    model, variables, ds: ArrayDataset, lengths: np.ndarray,
    batch_size: int = 128, apply_sigmoid: bool = False,
) -> np.ndarray:
    out = []
    n = len(ds)
    for start in range(0, n, batch_size):
        idx = np.arange(start, min(start + batch_size, n))
        feats = pad_to_batch(ds.features[idx], batch_size)
        lens = pad_to_batch(lengths[idx], batch_size, pad_value=1)
        scores = _detector_score_step(
            model, variables, jnp.asarray(feats), jnp.asarray(lens), apply_sigmoid
        )
        out.append(scores)
    if not out:
        return np.zeros((0,), np.float32)
    return np.asarray(jnp.concatenate(out))[:n]
