"""Whole-training-run-in-one-program: fully fused ``fit`` on device.

The logical endpoint of the epoch-as-one-program design: epochs, the
device-side shuffle, dev evaluation, the best-checkpoint rule (EER with the
reference's loss tie-break, ``src/train.py:484-518``), ReduceLROnPlateau,
and early stopping all execute inside ONE ``lax.scan`` over epochs — a
single dispatch trains the model end-to-end, and the host fetches the
history arrays plus the best/final variables once at the end. On remote
accelerators this removes every per-epoch host round trip; on directly
attached hosts it removes all launch overheads.

Exactness notes:
* EER comparisons use the integer crossing numerators (``fa*nb + fr*ns``,
  constant denominators across epochs), so best-rule decisions match the
  host trainer's float64 arithmetic exactly;
* early stop cannot break a scan, so stopped epochs become no-ops via
  ``lax.cond`` (semantics identical, trailing compute skipped);
* the best snapshot carries BOTH params and BatchNorm running stats from
  the best epoch (a params-only snapshot would pair best-epoch weights
  with final-epoch BN stats — not the model that achieved the best EER),
  plus the best epoch number and best train/dev losses, so fused runs
  checkpoint and resume exactly like per-epoch runs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dfac_tpu.obs.base import EpochMetrics
from dfac_tpu.ops import wideint as wi
from dfac_tpu.train.evaluate import make_resident_evaluator
from dfac_tpu.train.loop import TrainState, make_epoch_scan

# "no best yet" sentinel for the u64 best-EER numerator: larger than any
# real numerator (num <= 2*ns*nb < 2^63), so the first epoch always wins
_U64_UNSET = (0xFFFFFFFF, 0xFFFFFFFF)


def _u64_pair(value: int) -> tuple:
    return ((value >> 32) & 0xFFFFFFFF, value & 0xFFFFFFFF)


def make_fused_fit(
    model, tx, cfg, n_train: int, n_dev: int,
    start_epoch: int = 1, init_best: dict | None = None,
    mesh=None,
):
    """Build the one-dispatch trainer for a (train, dev) corpus pair.

    Returns ``fused(state, train_feats, train_labels, dev_feats, dev_labels,
    dev_idx, dev_w) -> (final_state, best_vars, aux, history)`` where
    ``best_vars`` is the {params, batch_stats} snapshot of the best epoch,
    ``aux`` carries the final best/scheduler scalars, and ``history`` holds
    per-epoch device arrays (train_loss, dev_loss, eer numerators, lr,
    is_best, stopped).

    ``start_epoch``/``init_best`` seed the carry for resume-into-fused:
    ``init_best`` keys (all optional): best_num (EER crossing numerator,
    -1 = unset), best_tl, best_dl, no_improve, sched_best, sched_bad, lr.

    With ``mesh`` the program is GSPMD data-parallel over the mesh's 'data'
    axis (train + eval batches sharding-constrained; outputs replicated) —
    the ONE-dispatch-per-RUN multi-chip/multi-host training path: on a pod,
    every process calls this with globally placed (replicated) corpora and
    XLA runs a single global program; per-batch dispatch overhead
    (docs/architecture.md rule 1) disappears for the whole run.
    """
    epoch_scan = make_epoch_scan(
        model, tx, cfg.swap_tf, cfg.label_smoothing, _augment(cfg),
        n_examples=n_train, batch_size=cfg.batch_size, mesh=mesh,
    )
    # BN freeze tail inside the one-dispatch program: epochs after
    # round(epochs * frac) run a second (frozen-BN) epoch body selected by
    # lax.cond — same boundary rule as the per-epoch trainer's
    # _bn_frozen_at, so --train-fast composes with --fused-fit
    freeze_frac = getattr(cfg, "bn_freeze_after_frac", 0.0)
    frozen_scan = None
    if freeze_frac:
        frozen_scan = make_epoch_scan(
            model, tx, cfg.swap_tf, cfg.label_smoothing, _augment(cfg),
            n_examples=n_train, batch_size=cfg.batch_size, mesh=mesh,
            bn_frozen=True,
        )
    freeze_epoch = round(cfg.epochs * freeze_frac)
    evaluator = make_resident_evaluator(
        model, swap_tf=cfg.swap_tf, label_smoothing=cfg.label_smoothing,
        mesh=mesh,
    )
    plateau_on = cfg.lr_scheduler == "plateau"
    eer_tie_eps = 1e-4
    loss_eps = 1e-6
    base_seed = cfg.seed * 100003
    ib = init_best or {}

    def set_lr(opt_state, lr):
        hp = dict(opt_state.hyperparams)
        hp["learning_rate"] = lr
        return opt_state._replace(hyperparams=hp)

    def fused(state: TrainState, tf, tl, df, dl, didx, dw):
        def variables_of(st):
            return {"params": st.params, "batch_stats": st.batch_stats}

        def run_epoch(carry, epoch):
            (state, best_vars, best_num, best_tl, best_dl, best_epoch,
             no_improve, sched_best, sched_bad, lr, stopped) = carry

            state = state.replace(opt_state=set_lr(state.opt_state, lr))
            if frozen_scan is None:
                state, loss_sum, count = epoch_scan(state, tf, tl, base_seed + epoch)
            else:
                state, loss_sum, count = jax.lax.cond(
                    epoch > freeze_epoch,
                    lambda st: frozen_scan(st, tf, tl, base_seed + epoch),
                    lambda st: epoch_scan(st, tf, tl, base_seed + epoch),
                    state,
                )
            train_loss = loss_sum / jnp.maximum(count, 1.0)

            ev_vars = {"params": state.params}
            if state.batch_stats:
                ev_vars["batch_stats"] = state.batch_stats
            dev_loss_sum, _scores, (fa, fr, ns, nb, thr) = evaluator(
                ev_vars, df, dl, didx, dw
            )
            dev_loss = dev_loss_sum / n_dev
            # EER numerator: eer = num / (2*ns*nb), with num = fa*nb + fr*ns
            # formed in EXACT emulated u64 (ops/wideint.py) — int32 products
            # wrap past ns*nb >= 2^31 and f32 sums lose integer resolution
            # above 2^24, where a 1-count EER improvement near a large
            # split's crossing would round to "equal" and wrongly advance
            # the no-improve counter (ADVICE r2). Comparisons against the
            # carried best are lexicographic u64, bit-exact at any size.
            p1_hi, p1_lo = wi.mul_u32(wi.to_u32(fa), wi.to_u32(nb))
            p2_hi, p2_lo = wi.mul_u32(wi.to_u32(fr), wi.to_u32(ns))
            num_hi, num_lo = wi.add_u64(p1_hi, p1_lo, p2_hi, p2_lo)
            ns_f, nb_f = ns.astype(jnp.float32), nb.astype(jnp.float32)
            denom2 = 2.0 * ns_f * nb_f
            eer = wi.u64_to_f32(num_hi, num_lo) / denom2

            best_hi, best_lo = best_num
            first = jnp.logical_and(
                best_hi == jnp.uint32(_U64_UNSET[0]),
                best_lo == jnp.uint32(_U64_UNSET[1]),
            )
            strictly_better = jnp.logical_or(
                first, wi.lt_u64(num_hi, num_lo, best_hi, best_lo)
            )
            # the tie BAND is a 1e-4-relative window — f32 of the exact u64
            # difference is accurate to 2^-24 relative, far inside the band
            d_hi, d_lo = wi.abs_diff_u64(num_hi, num_lo, best_hi, best_lo)
            tie = jnp.logical_and(
                wi.u64_to_f32(d_hi, d_lo) <= eer_tie_eps * denom2,
                jnp.logical_and(
                    train_loss < best_tl - loss_eps, dev_loss < best_dl - loss_eps
                ),
            )
            is_best = jnp.logical_or(strictly_better, jnp.logical_and(~first, tie))

            new_best_num = (
                jnp.where(strictly_better, num_hi, best_hi),
                jnp.where(strictly_better, num_lo, best_lo),
            )
            new_best_tl = jnp.where(is_best, train_loss, best_tl)
            new_best_dl = jnp.where(is_best, dev_loss, best_dl)
            best_epoch = jnp.where(is_best, epoch, best_epoch)
            no_improve = jnp.where(strictly_better, 0, no_improve + 1)
            best_vars = jax.tree.map(
                lambda b, c: jnp.where(is_best, c, b), best_vars, variables_of(state)
            )

            # ReduceLROnPlateau (mode=min, rel threshold), monitoring dev_eer
            # or dev_loss like the host trainer
            metric = dev_loss if cfg.lr_scheduler_metric == "dev_loss" else eer
            if plateau_on:
                sched_first = jnp.isinf(sched_best)
                improved = jnp.logical_or(
                    sched_first, metric < sched_best * (1.0 - cfg.lr_scheduler_threshold)
                )
                sched_best = jnp.where(improved, metric, sched_best)
                sched_bad = jnp.where(improved, 0, sched_bad + 1)
                reduce_now = sched_bad > cfg.lr_scheduler_patience
                lr = jnp.where(
                    reduce_now,
                    jnp.maximum(lr * cfg.lr_scheduler_factor, cfg.lr_scheduler_min_lr),
                    lr,
                )
                sched_bad = jnp.where(reduce_now, 0, sched_bad)

            stopped = jnp.logical_or(
                stopped,
                (no_improve >= cfg.early_stop) if cfg.early_stop else False,
            )
            carry = (state, best_vars, new_best_num, new_best_tl, new_best_dl,
                     best_epoch, no_improve, sched_best, sched_bad, lr, stopped)
            metrics = (train_loss, dev_loss, fa, fr, thr, lr, is_best, stopped)
            return carry, metrics

        def skip_epoch(carry, epoch):
            del epoch
            nan = jnp.float32(jnp.nan)
            return carry, (nan, nan, jnp.int32(0), jnp.int32(0), nan, carry[9],
                           jnp.asarray(False), jnp.asarray(True))

        def body(carry, epoch):
            if not cfg.early_stop:
                # early stop disabled -> `stopped` can never become True, so
                # the cond would be dead weight: XLA keeps BOTH branch
                # programs and the conditional boundary blocks pipelining
                # across the epoch body. Removing it recovered part of the
                # fused-fit gap (3,357 -> 3,836 utt/s on v5e at n=16k,
                # scripts/fused_fit_probe.py; per-epoch ran 5,262) — the
                # residual is the cond that remains whenever early_stop is
                # enabled, plus fused-program scheduling overhead; NB the
                # freeze-boundary cond below interacts unpredictably with
                # this (train-fast fused measured 4,286 with the dead cond
                # present, 2,739 without — receipts in
                # results/tpu_jobs/fusedfit.log). Fused is for dispatch
                # amortization; per-epoch resident is the throughput path.
                return run_epoch(carry, epoch)
            stopped = carry[-1]
            return jax.lax.cond(stopped, skip_epoch, run_epoch, carry, epoch)

        init_num = _u64_pair(int(ib["best_num"])) if "best_num" in ib else _U64_UNSET
        init = (
            state,
            jax.tree.map(jnp.copy, {"params": state.params, "batch_stats": state.batch_stats}),
            (jnp.uint32(init_num[0]), jnp.uint32(init_num[1])),
            jnp.float32(ib.get("best_tl", jnp.inf)),
            jnp.float32(ib.get("best_dl", jnp.inf)),
            jnp.int32(start_epoch - 1),  # best_epoch (start_epoch-1 = the resumed ckpt)
            jnp.int32(ib.get("no_improve", 0)),
            jnp.float32(ib.get("sched_best", jnp.inf)),
            jnp.int32(ib.get("sched_bad", 0)),
            jnp.float32(ib.get("lr", cfg.lr)),
            jnp.asarray(False),  # stopped
        )
        carry, history = jax.lax.scan(
            body, init, jnp.arange(start_epoch, cfg.epochs + 1)
        )
        (final_state, best_vars, best_num, best_tl, best_dl, best_epoch,
         no_improve, sched_best, sched_bad, lr, _stopped) = carry
        aux = {
            "best_num": best_num, "best_train_loss": best_tl,
            "best_dev_loss": best_dl, "best_epoch": best_epoch,
            "no_improve": no_improve, "sched_best": sched_best,
            "sched_bad": sched_bad, "lr": lr,
        }
        return final_state, best_vars, aux, history

    from dfac_tpu.parallel.mesh import replicated_jit

    return replicated_jit(fused, mesh)


def _augment(cfg):
    from dfac_tpu.data.augment import build_augment_fn

    return build_augment_fn(cfg.augment)


def fit_fused(trainer, train_ds, dev_ds, resume_from: str | None = None) -> dict:
    """One-dispatch fit through a :class:`dfac_tpu.train.loop.Trainer`.

    Uploads both splits once, runs the fused program, converts the fetched
    history into the standard EpochMetrics list, and leaves the trainer's
    state at the final epoch. If an epoch of THIS run became best,
    ``trainer.best_variables()`` afterwards holds that epoch's
    {params, batch_stats} snapshot and the result's ``best_variables`` is
    set; a resumed run that never improves leaves the trainer's best
    snapshot unset and returns ``best_variables=None`` (the earlier run's
    on-disk best checkpoint remains the best). The returned dict carries
    the true best epoch and best train/dev losses, and the trainer's plateau
    scheduler + lr reflect the end of the run — a fused run checkpoints and
    resumes exactly like a per-epoch run.

    ``resume_from`` restores model/optimizer/scheduler/best-counters from a
    checkpoint and continues the fused scan at the next epoch.
    """
    cfg = trainer.cfg
    multihost = cfg.multihost
    if multihost and not getattr(trainer, "_gspmd_resident", False):
        raise ValueError(
            "multihost fused fit requires device_resident=True in TrainConfig "
            "(the trainer then builds the GSPMD model/step; dfac-train's "
            "--fused-fit flag sets it automatically)"
        )
    if cfg.data_parallel > 1 and not multihost:
        raise ValueError(
            "fit_fused with data_parallel is the MULTIHOST GSPMD path "
            "(--multihost --fused-fit): the single-process trainer's "
            "shard_map-DP model syncs BatchNorm with an axis_name that is "
            "unbound outside shard_map. For single-process multi-chip fused "
            "training drop data_parallel (or see "
            "__graft_entry__.dryrun_multichip for the raw GSPMD program)"
        )
    start_epoch = 1
    init_best: dict = {}
    nb = int(np.sum(dev_ds.labels))
    n_dev = len(dev_ds)
    ns = n_dev - nb
    if resume_from:
        restored = trainer.restore(resume_from)
        start_epoch = restored["epoch"] + 1
        ts = restored["trainer_state"]
        if ts.get("best_eer") is not None:
            init_best["best_num"] = int(round(float(ts["best_eer"]) * 2.0 * ns * nb))
        if ts.get("best_train_loss") is not None:
            init_best["best_tl"] = ts["best_train_loss"]
        if ts.get("best_dev_loss") is not None:
            init_best["best_dl"] = ts["best_dev_loss"]
        init_best["no_improve"] = ts.get("epochs_no_improve", 0)
        init_best["lr"] = ts.get("lr", cfg.lr)
        if trainer.scheduler is not None:
            sd = trainer.scheduler.state_dict()
            if sd.get("best") is not None:
                init_best["sched_best"] = sd["best"]
            init_best["sched_bad"] = sd.get("num_bad_epochs", 0)
    if trainer.state is None:
        trainer.init_state(train_ds.features[: max(cfg.batch_size, 1)])
    feats_all, labels_all = trainer._resident_arrays(train_ds)

    # dev split resident layout (shared with the per-epoch resident path)
    bs = cfg.eval_batch_size or cfg.batch_size
    if multihost and bs % cfg.data_parallel != 0:
        raise ValueError(
            "multihost fused fit shards the eval batch over the pod — "
            f"eval batch size {bs} must divide over {cfg.data_parallel} devices"
        )
    n_b = -(-n_dev // bs)
    idx = np.full((n_b * bs,), -1, np.int32)
    idx[:n_dev] = np.arange(n_dev)
    w = np.zeros((n_b * bs,), np.float32)
    w[:n_dev] = 1.0
    put = trainer._resident_put()
    df = put(dev_ds.features)
    dl = put(dev_ds.labels.astype(np.float32))
    didx = jnp.asarray(idx.reshape(n_b, bs))
    dw = jnp.asarray(w.reshape(n_b, bs))
    if multihost:
        from dfac_tpu.parallel import multihost as mh

        # state leaves become global arrays before the pod-wide program
        trainer.state = mh.replicate_tree(trainer.state, trainer.mesh)

    fused_key = (len(train_ds), n_dev, start_epoch, tuple(sorted(init_best.items())))
    if getattr(trainer, "_fused_fn_key", None) != fused_key:
        trainer._fused_fn = make_fused_fit(
            trainer.model, trainer.tx, cfg, len(train_ds), n_dev,
            start_epoch=start_epoch, init_best=init_best,
            mesh=trainer.mesh if multihost else None,
        )
        trainer._fused_fn_key = fused_key
    final_state, best_vars, aux, history = trainer._fused_fn(
        trainer.state, feats_all, labels_all, df, dl, didx, dw
    )
    trainer.state = final_state

    (train_loss, dev_loss, fa, fr, thr, lr, is_best, stopped) = jax.device_get(history)
    aux = jax.device_get(aux)
    out_history: list[EpochMetrics] = []
    prev_eer = None
    n_epochs_traced = cfg.epochs - start_epoch + 1
    for e in range(n_epochs_traced):
        if stopped[e] and np.isnan(train_loss[e]):
            break  # post-early-stop no-op epochs
        eer = (float(fa[e]) / max(ns, 1) + float(fr[e]) / max(nb, 1)) / 2.0
        out_history.append(
            EpochMetrics(
                epoch=start_epoch + e,
                train_loss=float(train_loss[e]),
                dev_loss=float(dev_loss[e]),
                dev_eer=eer,
                is_best=bool(is_best[e]),
                improved=prev_eer is not None and eer < prev_eer,
                learning_rate=float(lr[e]),
            )
        )
        prev_eer = eer
    trainer.history = out_history

    # leave the trainer's host-side scheduler/lr where the device run ended,
    # so subsequent saves/resumes see the fused run's state
    trainer._lr = float(aux["lr"])
    if trainer.scheduler is not None:
        sb = float(aux["sched_best"])
        trainer.scheduler.best = None if np.isinf(sb) else sb
        trainer.scheduler.num_bad_epochs = int(aux["sched_bad"])

    # best_vars starts as a copy of the (possibly resumed) initial state and
    # is only overwritten when an epoch of THIS run becomes best. If no
    # epoch did (a resumed run that never improved), labeling the carried
    # snapshot "best" would pair the prior run's best EER with this run's
    # last-epoch weights — leave the trainer's best snapshot unset instead
    # (the on-disk best checkpoint from the earlier run is still the best).
    new_best = any(m.is_best for m in out_history)
    if new_best:
        trainer._best_params = best_vars["params"]
        trainer._best_batch_stats = best_vars["batch_stats"]

    num_hi, num_lo = (int(v) for v in aux["best_num"])
    best_num = (num_hi << 32) | num_lo
    have_best = (num_hi, num_lo) != _U64_UNSET and ns > 0 and nb > 0
    return {
        "best_eer": best_num / (2.0 * ns * nb) if have_best else None,
        "best_train_loss": float(aux["best_train_loss"]) if have_best else None,
        "best_dev_loss": float(aux["best_dev_loss"]) if have_best else None,
        "best_epoch": int(aux["best_epoch"]) if have_best else None,
        "epochs_no_improve": int(aux["no_improve"]),
        "history": out_history,
        "best_variables": (
            {"params": best_vars["params"], "batch_stats": best_vars["batch_stats"]}
            if new_best else None
        ),
    }
