#!/usr/bin/env python
"""Wall-clock receipt for the fused fit: whole-run-in-one-dispatch vs the
per-epoch device-resident loop, baseline numerics vs --train-fast.

The fused fit (`train/fused_fit.py`) is the framework's logical endpoint of
"epoch as one program" — ONE dispatch trains, evaluates, applies the best
rule / plateau LR / early stop for the whole run. Its convergence parity is
test-certified; this probe puts a measured utt/s next to it at production
geometry so results/v5e_measurements.md carries a hardware number for the
mode, including what it saves over per-epoch dispatch through a ~28 ms
relay (per-epoch metric fetches + E dispatches).

Run on the TPU:  python scripts/fused_fit_probe.py [--n 16384] [--epochs 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

F_DIM, T_DIM = 180, 321


def corpus(n: int, seed: int):
    from dfac_tpu.data.pipeline import ArrayDataset

    r = np.random.default_rng(seed)
    feats = r.normal(size=(n, F_DIM, T_DIM)).astype(np.float32)
    labels = (np.arange(n) % 2).astype(np.int32)
    feats[labels == 1, : F_DIM // 4, :] += 0.25
    return ArrayDataset([f"u{i}" for i in range(n)], feats, labels)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--n-dev", type=int, default=2048)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--recipes", default="baseline,train-fast",
                    help="comma subset — each recipe pays ~10-20 min of cold "
                         "relay-side compile, so re-runs can target one row")
    args = ap.parse_args()

    import jax

    # env JAX_PLATFORMS is ignored under the axon relay — honor it explicitly
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from dfac_tpu.train.loop import TrainConfig, Trainer

    print(f"devices: {jax.devices()}  n={args.n} dev={args.n_dev} "
          f"B={args.batch} E={args.epochs}")
    train_ds = corpus(args.n, 0)
    dev_ds = corpus(args.n_dev, 1)

    def timed_fit(cfg, fused: bool):
        # ONE trainer for all reps: the fused program is memoized on the
        # trainer (trainer._fused_fn) and the per-epoch programs live in the
        # jit cache, so rep 0 pays trace+compile and reps 1+ measure the
        # steady-state wall — what an 80-epoch production run amortizes to.
        # (A fresh Trainer per rep re-pays ~200s of relay-side compile: the
        # persistent compile cache does not apply across processes here.)
        trainer = Trainer(cfg)
        best, cold = float("inf"), 0.0
        for rep in range(args.reps + 1):  # rep 0 = compile warmup
            t0 = time.perf_counter()
            if fused:
                trainer.fit_fused(train_ds, dev_ds)
            else:
                trainer.fit(train_ds, dev_ds)
            dt = time.perf_counter() - t0
            if rep:
                best = min(best, dt)
            else:
                cold = dt
        return best, cold

    recipes = {
        "baseline": dict(dropout=0.2, bn_freeze_after_frac=0.0),
        "train-fast": dict(dropout=0.0, bn_freeze_after_frac=0.5),
    }
    wanted = [r.strip() for r in args.recipes.split(",") if r.strip()]
    unknown = set(wanted) - set(recipes)
    if unknown:
        raise SystemExit(f"unknown --recipes {sorted(unknown)}; have {list(recipes)}")
    recipes = {k: recipes[k] for k in wanted}
    for name, knobs in recipes.items():
        cfg = TrainConfig(
            batch_size=args.batch, epochs=args.epochs, lr=1e-3,
            in_features=F_DIM, device_resident=True, early_stop=0,
            compute_dtype="bfloat16", **knobs,
        )
        t_epoch, c_epoch = timed_fit(cfg, fused=False)
        t_fused, c_fused = timed_fit(cfg, fused=True)
        n_total = args.n * args.epochs
        print(
            f"{name:11s} per-epoch resident {t_epoch:7.3f}s ({n_total / t_epoch:7,.0f} utt/s)"
            f"   fused one-dispatch {t_fused:7.3f}s ({n_total / t_fused:7,.0f} utt/s)"
            f"   fused saves {t_epoch - t_fused:+.3f}s"
            f"   [cold incl. compile: per-epoch {c_epoch:.1f}s, fused {c_fused:.1f}s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
