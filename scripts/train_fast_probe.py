#!/usr/bin/env python
"""Training throughput of the fast-numerics recipes vs the baseline.

The round-3 byte-floor audit (results/v5e_measurements.md) proved the
exact-parity train step sits within ~5% of its HBM-traffic floor — but the
floor itself moves if the recipe changes. This probe measures the
device-resident epoch scan (the production single-chip mode) at production
geometry, per trainer (``--trainer cnn2d|detector|cae``):

* baseline        — full dropout, BN training stats every step
* dropout-free    — dropout 0 (cnn2d/detector; the CAE has none)
* bn-frozen       — dropout on, BatchNorm on running stats
* fast (combined) — the --train-fast recipe

Quality gates: results/train_fast_ab.md (cnn2d),
results/alt_trainer_fast_ab.md (detector/CAE). Corpora are generated
directly in HBM (the relay's h2d link is ~5 MB/s; a host-side corpus
would measure the upload). Run on the TPU:
python scripts/train_fast_probe.py [--trainer cnn2d] [--n 16384] [--batch 512]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trainer", choices=["cnn2d", "detector", "cae"], default="cnn2d")
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--f-dim", type=int, default=180)
    ap.add_argument("--t-dim", type=int, default=321)
    args = ap.parse_args()

    import jax

    # the axon sitecustomize pins jax_platforms; an env JAX_PLATFORMS=cpu
    # is silently ignored unless applied as an explicit config update
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from dfac_tpu.data.pipeline import ArrayDataset

    F, T, n = args.f_dim, args.t_dim, args.n
    print(f"devices: {jax.devices()}  trainer={args.trainer}  corpus n={n} "
          f"({n*F*T*4/1e9:.1f} GB f32, generated in HBM)")
    labels = (np.arange(n) % 2).astype(np.int32)
    feats = jax.jit(
        lambda key: jax.random.normal(key, (n, F, T), jnp.float32)
    )(jax.random.key(0))
    train_ds = ArrayDataset([f"u{i}" for i in range(n)], feats, labels)

    def barrier(tree):
        jax.block_until_ready(tree)
        np.asarray(jax.tree.leaves(tree)[0])  # relay barrier

    if args.trainer == "cnn2d":
        from dfac_tpu.train.loop import TrainConfig, Trainer

        def time_recipe(name, dropout, freeze):
            # bn_freeze_after_frac such that EVERY measured epoch is frozen
            cfg = TrainConfig(
                model="cnn2d", batch_size=args.batch, epochs=100, seed=0,
                in_features=F, compute_dtype="bfloat16", device_resident=True,
                dropout=dropout, bn_freeze_after_frac=0.001 if freeze else 0.0,
            )
            tr = Trainer(cfg)
            tr.state = tr.init_state(np.zeros((args.batch, F, T), np.float32))
            tr.train_epoch(train_ds, epoch=1)  # compile + warm
            times = []
            for e in range(2, 2 + args.epochs):
                t0 = time.perf_counter()
                tr.train_epoch(train_ds, epoch=e)
                barrier(tr.state.params)
                times.append(time.perf_counter() - t0)
            best = min(times)
            print(f"{name:24s} {best:7.3f}s/epoch  {n/best:9.0f} utt/s")
            return n / best

        base = time_recipe("baseline (drop 0.2)", 0.2, False)
        df = time_recipe("dropout-free", 0.0, False)
        bf = time_recipe("bn-frozen", 0.2, True)
        fast = time_recipe("fast (drop 0 + frozen)", 0.0, True)
        print(f"vs baseline: dropout-free {df/base:.3f}x  "
              f"bn-frozen {bf/base:.3f}x  fast {fast/base:.3f}x")
        return

    if args.trainer == "detector":
        from dfac_tpu.train.detector_loop import (
            DetectorState,
            make_detector_epoch_scan,
            DetectorConfig,
        )
        from dfac_tpu.models import build_model
        from dfac_tpu.utils.rng import train_key
        import optax

        lengths_d = jax.device_put(jnp.full((n,), T, jnp.int32))
        labels_d = jax.device_put(jnp.asarray(labels, jnp.float32))

        def time_recipe(name, drop, enc_drop, frozen):
            cfg = DetectorConfig(
                epochs=100, batch_size=args.batch, dropout=drop,
                encoder_dropout=enc_drop, ema=True, seed=0,
                compute_dtype="bfloat16", device_resident=True,
            )
            model = build_model(
                "detector", in_channels=F, hidden=cfg.hidden,
                dropout=drop, encoder_dropout=enc_drop,
                compute_dtype=jnp.bfloat16,
            )
            tx = optax.chain(
                optax.clip_by_global_norm(cfg.grad_clip), optax.adamw(cfg.lr)
            )
            x0 = jnp.zeros((1, T, F))
            variables = model.init(
                {"params": jax.random.key(0), "dropout": jax.random.key(0)}, x0
            )
            state = DetectorState(
                params=variables["params"],
                batch_stats=variables.get("batch_stats", {}),
                ema_params=variables["params"],
                opt_state=tx.init(variables["params"]),
                key=train_key(0),
            )
            scan = make_detector_epoch_scan(
                model, tx, cfg, 1.0, n, args.batch, bn_frozen=frozen
            )
            order = jnp.asarray(
                np.random.default_rng(0).choice(n, size=n).astype(np.int32)
            )
            state, _ = scan(state, feats, lengths_d, labels_d, order)  # warm
            barrier(state.params)
            times = []
            for _ in range(args.epochs):
                t0 = time.perf_counter()
                state, _ = scan(state, feats, lengths_d, labels_d, order)
                barrier(state.params)
                times.append(time.perf_counter() - t0)
            best = min(times)
            print(f"{name:28s} {best:7.3f}s/epoch  {n/best:9.0f} utt/s")
            return n / best

        base = time_recipe("baseline (drop .3/.2)", 0.3, 0.2, False)
        df = time_recipe("dropout-free", 0.0, 0.0, False)
        bf = time_recipe("bn-frozen", 0.3, 0.2, True)
        fast = time_recipe("fast (drop 0 + frozen)", 0.0, 0.0, True)
        print(f"vs baseline: dropout-free {df/base:.3f}x  "
              f"bn-frozen {bf/base:.3f}x  fast {fast/base:.3f}x")
        return

    # CAE: the freeze tail IS the fast recipe (no dropout)
    if args.batch > 128:
        # the CAE's 4-stage encoder/decoder at [180,321] OOMs past B~128
        args.batch = 128
        print("cae: clamping --batch to 128 (activation footprint)")
    from dfac_tpu.train.cae_loop import make_cae_epoch_scan
    from dfac_tpu.models import build_model
    from dfac_tpu.train.loop import TrainState
    from dfac_tpu.utils.rng import train_key
    import optax

    model = build_model("cae", base_channels=32, compute_dtype=jnp.bfloat16)
    tx = optax.adamw(1e-4)
    x0 = jnp.zeros((1, T, F))
    variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(0)}, x0)
    mean = jnp.zeros((F,), jnp.float32)
    std = jnp.ones((F,), jnp.float32)

    def time_recipe(name, frozen):
        state = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            key=train_key(0),
        )
        scan = make_cae_epoch_scan(
            model, tx, mean, std, n, args.batch, bn_frozen=frozen
        )
        state, _, _ = scan(state, feats, np.int64(7))  # warm
        barrier(state.params)
        times = []
        for e in range(args.epochs):
            t0 = time.perf_counter()
            state, _, _ = scan(state, feats, np.int64(8 + e))
            barrier(state.params)
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"{name:28s} {best:7.3f}s/epoch  {n/best:9.0f} utt/s")
        return n / best

    base = time_recipe("baseline (train-mode BN)", False)
    fast = time_recipe("fast (bn-frozen)", True)
    print(f"vs baseline: fast {fast/base:.3f}x")


if __name__ == "__main__":
    main()
