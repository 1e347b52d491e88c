"""Whole-training-run-in-one-program: fully fused ``fit`` on device.

The logical endpoint of the epoch-as-one-program design: epochs, the
device-side shuffle, dev evaluation, the best-checkpoint rule (EER with the
reference's loss tie-break, ``src/train.py:484-518``), ReduceLROnPlateau,
and early stopping all execute inside ONE ``lax.scan`` over epochs — a
single dispatch trains the model end-to-end, and the host fetches the
history arrays plus the best/final parameters once at the end. On remote
accelerators this removes every per-epoch host round trip; on directly
attached hosts it removes all launch overheads.

Exactness notes:
* EER comparisons use the integer crossing numerators (``fa*nb + fr*ns``,
  constant denominators across epochs), so best-rule decisions match the
  host trainer's float64 arithmetic exactly;
* early stop cannot break a scan, so stopped epochs become no-ops via
  ``lax.cond`` (semantics identical, trailing compute skipped);
* best parameters are carried as a pytree snapshot updated with
  ``jnp.where`` on is_best.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dfac_tpu.obs.base import EpochMetrics
from dfac_tpu.train.evaluate import make_resident_evaluator
from dfac_tpu.train.loop import TrainState, make_epoch_scan


def make_fused_fit(model, tx, cfg, n_train: int, n_dev: int):
    """Build the one-dispatch trainer for a (train, dev) corpus pair.

    Returns ``fused(state, train_feats, train_labels, dev_feats, dev_labels,
    dev_idx, dev_w) -> (final_state, best_params, history)`` where history
    holds per-epoch device arrays (train_loss, dev_loss, eer numerators,
    lr, is_best, stopped).
    """
    epoch_scan = make_epoch_scan(
        model, tx, cfg.swap_tf, cfg.label_smoothing, _augment(cfg),
        n_examples=n_train, batch_size=cfg.batch_size,
    )
    evaluator = make_resident_evaluator(
        model, swap_tf=cfg.swap_tf, label_smoothing=cfg.label_smoothing
    )
    plateau_on = cfg.lr_scheduler == "plateau"
    eer_tie_eps = 1e-4
    loss_eps = 1e-6
    base_seed = cfg.seed * 100003

    def set_lr(opt_state, lr):
        hp = dict(opt_state.hyperparams)
        hp["learning_rate"] = lr
        return opt_state._replace(hyperparams=hp)

    @jax.jit
    def fused(state: TrainState, tf, tl, df, dl, didx, dw):
        def variables_of(st):
            v = {"params": st.params}
            if st.batch_stats:
                v["batch_stats"] = st.batch_stats
            return v

        def run_epoch(carry, epoch):
            (state, best_params, best_num, best_tl, best_dl, no_improve,
             sched_best, sched_bad, lr, stopped) = carry

            state = state.replace(opt_state=set_lr(state.opt_state, lr))
            state, loss_sum, count = epoch_scan(state, tf, tl, base_seed + epoch)
            train_loss = loss_sum / jnp.maximum(count, 1.0)

            dev_loss_sum, _scores, (fa, fr, ns, nb, thr) = evaluator(
                variables_of(state), df, dl, didx, dw
            )
            dev_loss = dev_loss_sum / n_dev
            # integer EER numerator: eer = num / (2*ns*nb); denominators are
            # epoch-invariant so ordering/ties compare exactly in ints
            num = (fa * nb + fr * ns).astype(jnp.float32)
            denom2 = (2 * ns * nb).astype(jnp.float32)
            eer = num / denom2

            first = best_num < 0
            strictly_better = jnp.logical_or(first, num < best_num)
            tie = jnp.logical_and(
                jnp.abs(num - best_num) <= eer_tie_eps * denom2,
                jnp.logical_and(
                    train_loss < best_tl - loss_eps, dev_loss < best_dl - loss_eps
                ),
            )
            is_best = jnp.logical_or(strictly_better, jnp.logical_and(~first, tie))

            new_best_num = jnp.where(strictly_better, num, best_num)
            new_best_tl = jnp.where(is_best, train_loss, best_tl)
            new_best_dl = jnp.where(is_best, dev_loss, best_dl)
            no_improve = jnp.where(strictly_better, 0, no_improve + 1)
            best_params = jax.tree.map(
                lambda b, p: jnp.where(is_best, p, b), best_params, state.params
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
            carry = (state, best_params, new_best_num, new_best_tl, new_best_dl,
                     no_improve, sched_best, sched_bad, lr, stopped)
            metrics = (train_loss, dev_loss, fa, fr, thr, lr, is_best, stopped)
            return carry, metrics

        def skip_epoch(carry, epoch):
            del epoch
            nan = jnp.float32(jnp.nan)
            return carry, (nan, nan, jnp.int32(0), jnp.int32(0), nan, carry[8],
                           jnp.asarray(False), jnp.asarray(True))

        def body(carry, epoch):
            stopped = carry[-1]
            return jax.lax.cond(stopped, skip_epoch, run_epoch, carry, epoch)

        init = (
            state,
            jax.tree.map(jnp.copy, state.params),  # best_params
            jnp.float32(-1.0),  # best eer numerator (-1 = unset)
            jnp.float32(jnp.inf),  # best train loss
            jnp.float32(jnp.inf),  # best dev loss
            jnp.int32(0),  # epochs_no_improve
            jnp.float32(jnp.inf),  # plateau best metric
            jnp.int32(0),  # plateau bad epochs
            jnp.float32(cfg.lr),  # lr
            jnp.asarray(False),  # stopped
        )
        carry, history = jax.lax.scan(body, init, jnp.arange(1, cfg.epochs + 1))
        final_state, best_params = carry[0], carry[1]
        return final_state, best_params, history

    return fused


def _augment(cfg):
    from dfac_tpu.data.augment import build_augment_fn

    return build_augment_fn(cfg.augment)


def fit_fused(trainer, train_ds, dev_ds) -> dict:
    """One-dispatch fit through a :class:`dfac_tpu.train.loop.Trainer`.

    Uploads both splits once, runs the fused program, converts the fetched
    history into the standard EpochMetrics list, and leaves the trainer's
    state at the final epoch (``trainer.best_variables()`` holds the
    best-epoch parameters).
    """
    cfg = trainer.cfg
    if trainer.state is None:
        trainer.init_state(train_ds.features[: max(cfg.batch_size, 1)])
    feats_all, labels_all = trainer._resident_arrays(train_ds)

    # dev split resident layout (shared with the per-epoch resident path)
    bs = cfg.eval_batch_size or cfg.batch_size
    n_dev = len(dev_ds)
    n_b = -(-n_dev // bs)
    idx = np.full((n_b * bs,), -1, np.int32)
    idx[:n_dev] = np.arange(n_dev)
    w = np.zeros((n_b * bs,), np.float32)
    w[:n_dev] = 1.0
    df = jax.device_put(jnp.asarray(dev_ds.features))
    dl = jax.device_put(jnp.asarray(dev_ds.labels.astype(np.float32)))
    didx = jnp.asarray(idx.reshape(n_b, bs))
    dw = jnp.asarray(w.reshape(n_b, bs))

    fused_key = (len(train_ds), n_dev)
    if getattr(trainer, "_fused_fn_key", None) != fused_key:
        trainer._fused_fn = make_fused_fit(trainer.model, trainer.tx, cfg, len(train_ds), n_dev)
        trainer._fused_fn_key = fused_key
    final_state, best_params, history = trainer._fused_fn(
        trainer.state, feats_all, labels_all, df, dl, didx, dw
    )
    trainer.state = final_state
    trainer._best_params = best_params

    (train_loss, dev_loss, fa, fr, thr, lr, is_best, stopped) = jax.device_get(history)
    nb = int(np.sum(dev_ds.labels))
    ns = n_dev - nb
    out_history: list[EpochMetrics] = []
    prev_eer = None
    for e in range(cfg.epochs):
        if stopped[e] and np.isnan(train_loss[e]):
            break  # post-early-stop no-op epochs
        eer = (float(fa[e]) / max(ns, 1) + float(fr[e]) / max(nb, 1)) / 2.0
        out_history.append(
            EpochMetrics(
                epoch=e + 1,
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
    best = min((m for m in out_history if m.dev_eer is not None),
               key=lambda m: m.dev_eer, default=None)
    return {
        "best_eer": best.dev_eer if best else None,
        "best_train_loss": None,
        "best_dev_loss": None,
        "history": out_history,
        "best_params": best_params,
    }
