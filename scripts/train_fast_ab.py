#!/usr/bin/env python
"""Quality A/B of the fast-numerics training recipes — honest-gate edition.

The round-3 byte-floor audit proved ~5.2k utt/s is the training ceiling
*for the exact torch-parity recipe* (train-mode BN + dropout 0.2). The
quality contract is converged dev EER within 0.1% absolute (BASELINE.md) —
not trajectory bit-parity — so recipe-level relaxations are in play.

Round-4's version of this study was under-powered (384-utt corpus, baseline
seed-std 0.0198 — ~20x the contract) and its implemented gate (an OR) was
weaker than its documentation (an AND). This version fixes both:

* **Paired design.** Every recipe trains on the SAME corpus with the same
  seed; the gated statistic is the per-seed paired delta vs baseline
  (recipe noise cancels task+init noise it shares with baseline).
* **Gate (three-way, see ``gate_verdict``):** FAIL when confidently
  outside the contract (|mean paired Δ| − 2·SE > 0.001) regardless of
  power; PASS iff powered (SE(Δ) <= 0.001) AND |mean Δ| <= 0.001;
  INCONCLUSIVE otherwise — never a silent pass-through-noise, and never
  an inconclusive shrug at a recipe the data already rejects.
* **Negative control.** An intentionally degraded recipe (50x the
  learning rate: unstable Adam steps damage the converged margin) runs
  through the same gate and must FAIL — the committed report demonstrates
  the gate can reject, not just accept. (An undertrained 1/3-budget
  control was tried first and measured USELESS — this task converges to
  its Bayes-ish floor within ~4 epochs; results/train_fast_ab_calibration.md.)
* **Production geometry on TPU** (default): [180, 321] features, corpora
  sized so the dev-EER estimation noise sits at/below the contract
  (EER ~ p => SE ~ sqrt(p(1-p)/n_dev); the default n_dev = 12288 at
  p ~ 0.05 gives ~0.002 per seed, and the PAIRED per-seed deltas the gate
  consumes are far tighter — measured SE 0.0001-0.0002 across 5 seeds).
  `--toy` keeps the old CPU-scale smoke geometry.

Run on the TPU:   python scripts/train_fast_ab.py
Smoke on CPU:     JAX_PLATFORMS=cpu python scripts/train_fast_ab.py --toy --seeds 2
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

GATE_ABS = 0.001  # BASELINE.md: dev EER within 0.1% absolute
POWER_SE = 0.001  # study power requirement on SE of the paired delta


def gate_verdict(deltas) -> str:
    """Three-way verdict on a recipe's per-seed paired dev-EER deltas.

    * FAIL — confidently outside the contract: |mean Δ| - 2·SE > GATE_ABS.
      This applies even when the study is under-powered (SE > POWER_SE):
      low power blocks *certifying* a recipe, never *rejecting* one the
      data already places many SEs outside the gate (round-4's gate could
      only say INCONCLUSIVE about its own negative control).
    * INCONCLUSIVE — under-powered (SE > POWER_SE) and not confidently
      outside: the study must not certify a pass through noise.
    * PASS — powered and |mean Δ| <= GATE_ABS; FAIL otherwise.
    """
    d = np.asarray(deltas, dtype=np.float64)
    mean_d = float(d.mean())
    se_d = float(d.std(ddof=1) / np.sqrt(len(d))) if len(d) > 1 else float("inf")
    if abs(mean_d) - 2.0 * se_d > GATE_ABS:
        return "FAIL"
    if se_d > POWER_SE:
        return "INCONCLUSIVE"
    return "PASS" if abs(mean_d) <= GATE_ABS else "FAIL"

RECIPES = [
    # (name, dropout, bn_freeze_after_frac, lr_mult)
    ("baseline", 0.2, 0.0, 1.0),
    ("dropout-free", 0.0, 0.0, 1.0),
    ("dropout-0.05", 0.05, 0.0, 1.0),
    ("bn-freeze-tail", 0.2, 0.5, 1.0),
    ("fast (drop0+freeze)", 0.0, 0.5, 1.0),
    # the negative control MUST fail the gate: 50x the learning rate makes
    # Adam's steps unstable, damaging the converged decision margin. (An
    # undertrained control was tried first and measured USELESS here —
    # this task converges to its Bayes-ish error within ~4 epochs, so a
    # 1/3-budget run matches baseline to 4 decimals; calibration log in
    # results/train_fast_ab_calibration.md.)
    ("CONTROL lr-50x", 0.2, 0.0, 50.0),
]


def corpus(n: int, seed: int, f_dim: int, t_dim: int, delta: float,
           on_device: bool = False):
    """Synthetic overlapping-class corpus. ``on_device=True`` generates the
    feature tensor with jax.random directly in HBM — the bench-rig relay's
    host->device link measures ~5 MB/s, so uploading multi-GB host corpora
    dominates wall clock (first calibration attempt: >20 min in
    device_put); the device-resident trainer adopts pre-placed arrays
    without copying (``Trainer._resident_put`` is a no-op on them)."""
    from dfac_tpu.data.pipeline import ArrayDataset

    labels = (np.arange(n) % 2).astype(np.int32)
    if on_device:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def gen(key):
            k1, k2 = jax.random.split(key)
            feats = jax.random.normal(k1, (n, f_dim, t_dim), jnp.float32)
            gain = jax.random.uniform(k2, (n, 1, 1), jnp.float32)
            mask = jnp.asarray(labels == 1, jnp.float32)[:, None, None]
            band = (jnp.arange(f_dim) < f_dim // 4).astype(jnp.float32)[None, :, None]
            return feats + delta * gain * mask * band

        return ArrayDataset([f"u{i}" for i in range(n)], gen(jax.random.key(seed)), labels)
    r = np.random.default_rng(seed)
    feats = r.normal(size=(n, f_dim, t_dim)).astype(np.float32)
    mask = labels == 1
    # weak band shift with a per-row random gain: classes overlap, so the
    # converged EER sits above 0 with detectable headroom in both directions
    feats[mask, : f_dim // 4, :] += delta * r.random((mask.sum(), 1, 1)).astype(np.float32)
    return ArrayDataset([f"u{i}" for i in range(n)], feats, labels)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--toy", action="store_true", help="CPU-scale smoke geometry")
    ap.add_argument("--n-train", type=int, default=None)
    ap.add_argument("--n-dev", type=int, default=None)
    ap.add_argument("--delta", type=float, default=None, help="class-shift scale")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--calibrate", action="store_true",
                    help="one baseline run per --delta candidate, then exit")
    ap.add_argument("--out", default="results/train_fast_ab.md")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from dfac_tpu.models import build_model
    from dfac_tpu.train.loop import TrainConfig, Trainer

    if args.toy:
        f_dim, t_dim = 24, 40
        n_train = args.n_train or 384
        n_dev = args.n_dev or 192
        delta = args.delta if args.delta is not None else 0.8
        batch = args.batch_size or 32
        base_ch = 8
    else:
        # sized for one v5e's 16 GB HBM with f32 torch-parity training:
        # corpus 4.2 GB resident + B=128 f32 train activations (~5 GB);
        # B=512 f32 + 5.7 GB corpus measured RESOURCE_EXHAUSTED. At
        # baseline EER ~0.01 the dev estimation SE is
        # sqrt(p(1-p)/n_dev) ~ 0.0009 — at/below the 0.001 contract.
        f_dim, t_dim = 180, 321
        n_train = args.n_train or 6144
        n_dev = args.n_dev or 12288
        delta = args.delta if args.delta is not None else 0.16
        batch = args.batch_size or 128
        base_ch = 32

    print(f"devices: {jax.devices()}  geometry [{f_dim},{t_dim}] "
          f"train {n_train} / dev {n_dev}  delta {delta}  batch {batch}", flush=True)

    on_dev = not args.toy  # TPU: generate in HBM (relay h2d ~5 MB/s)
    tr_ds = dv_ds = None  # built after the --calibrate branch: calibration
    # pairs its own corpora per delta, and a shared pair generated first
    # would sit unused in HBM alongside them (two [n,180,321] f32 corpora
    # ~4.3 GB — real pressure against the 16 GB v5e ceiling this script's
    # sizing notes document)

    def run(name: str, drop: float, frac: float, epochs: int, seed: int,
            lr: float | None = None, ds_pair=None) -> float:
        cfg = TrainConfig(
            model="cnn2d", in_features=f_dim, batch_size=batch,
            epochs=epochs, lr=lr if lr is not None else args.lr,
            dropout=drop, seed=seed,
            device_resident=True, bn_freeze_after_frac=frac,
        )
        model = build_model("cnn2d", in_features=f_dim, base_channels=base_ch, dropout=drop)
        a, b = ds_pair if ds_pair is not None else (tr_ds, dv_ds)
        res = Trainer(cfg, model=model).fit(a, b)
        print(f"seed {seed}  {name:22s} best dev EER {res['best_eer']:.4f}", flush=True)
        return float(res["best_eer"])

    if args.calibrate:
        # sweep (delta, lr): target a baseline EER ~0.01 with a schedule
        # that actually needs the epoch budget (undertrained must be worse).
        # --delta / --lr, when given, narrow the sweep to those candidates.
        deltas = (delta,) if args.delta is not None else (0.30, 0.40)
        lrs = (args.lr,) if args.lr != ap.get_default("lr") else (3e-4, 1e-3)
        for d in deltas:
            pair = (
                corpus(n_train, 1000, f_dim, t_dim, d, on_device=not args.toy),
                corpus(n_dev, 2000, f_dim, t_dim, d, on_device=not args.toy),
            )
            for lr in lrs:
                e = run(f"base d={d} lr={lr}", 0.2, 0.0, args.epochs, 0, lr, pair)
                u = run(f"short d={d} lr={lr}", 0.2, 0.0,
                        max(args.epochs // 3, 1), 0, lr, pair)
                print(f"calib d={d} lr={lr}: baseline {e:.4f} undertrained {u:.4f}")
        return

    # ONE corpus pair shared by every (seed, recipe): seeds vary init/dropout/
    # shuffle only, and the paired deltas subtract the shared task draw.
    tr_ds = corpus(n_train, 1000, f_dim, t_dim, delta, on_device=on_dev)
    dv_ds = corpus(n_dev, 2000, f_dim, t_dim, delta, on_device=on_dev)

    results: dict[str, list[float]] = {name: [] for name, *_ in RECIPES}
    t_start = time.time()
    for seed in range(args.seeds):
        for name, drop, frac, lr_mult in RECIPES:
            results[name].append(
                run(name, drop, frac, args.epochs, seed, lr=args.lr * lr_mult)
            )

    base = np.asarray(results["baseline"])
    lines = [
        "# Fast-numerics training recipes — dev-EER A/B (paired, honest gate)",
        "",
        f"Torch-parity CNN2D (base_channels={base_ch}) on a synthetic",
        f"overlapping-class corpus ({n_train} train / {n_dev} dev,",
        f"[{f_dim},{t_dim}] features, class shift {delta} with per-row random",
        f"gain), {args.seeds} seeds x {args.epochs} epochs, device-resident",
        f"epoch scans on {jax.devices()[0].platform}. The reference ships no",
        "feature corpora (only predictions/checkpoints), so synthetic is the",
        "only reproducible data for this study.",
        "",
        "Design: every recipe trains on the SAME corpus as baseline with the",
        "same seed; the gated statistic is the per-seed PAIRED delta. Gate",
        f"(three-way): FAIL when |mean Δ| − 2·SE > {GATE_ABS} (confidently",
        "outside the BASELINE.md 0.1%-absolute contract, regardless of",
        f"power); PASS iff SE(Δ) <= {POWER_SE} AND |mean Δ| <= {GATE_ABS};",
        "INCONCLUSIVE otherwise — an under-powered study must not certify,",
        "but low power never shields a recipe the data already rejects.",
        "The CONTROL row is intentionally degraded (50x learning rate:",
        "unstable Adam steps) and must FAIL — it demonstrates the gate",
        "rejects.",
        "",
        "| recipe | per-seed best dev EER | mean ± std | paired Δ (mean ± SE) | gate |",
        "|---|---|---|---|---|",
    ]
    verdicts = {}
    for name, *_ in RECIPES:
        v = np.asarray(results[name])
        if name == "baseline":
            verdict = "—"
            dstr = "—"
        else:
            d = v - base
            mean_d = float(d.mean())
            se_d = float(d.std(ddof=1) / np.sqrt(len(d))) if len(d) > 1 else float("inf")
            verdict = gate_verdict(d)
            dstr = f"{mean_d:+.4f} ± {se_d:.4f}"
        verdicts[name] = verdict
        seeds_str = " ".join(f"{x:.4f}" for x in v)
        lines.append(
            f"| {name} | {seeds_str} | {v.mean():.4f} ± {v.std():.4f} | {dstr} | {verdict} |"
        )
    lines += [
        "",
        f"Baseline seed-std {base.std():.4f}; wall time {time.time() - t_start:.0f}s.",
        "",
        "Interpretation: a PASS certifies the recipe's converged dev EER is",
        "within the 0.1%-absolute contract of the torch-parity baseline on",
        "this task, with enough statistical power that a 0.5%-worse recipe",
        "would sit many SEs outside the gate (see the CONTROL row). The",
        "throughput side is measured on hardware by",
        "scripts/train_fast_probe.py (round 4: --train-fast 6,362 utt/s,",
        "1.19x the torch-parity baseline). `dfac-train --train-fast` enables",
        "the fastest PASSing recipe.",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), args.out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\nwrote {out}")
    for name, verdict in verdicts.items():
        print(f"{name:22s} {verdict}")
    control = verdicts.get("CONTROL lr-50x")
    if control != "FAIL":
        print(f"WARNING: negative control got {control}, not FAIL — the gate "
              "has no power on this corpus; recalibrate --delta/--epochs.",
              file=sys.stderr)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
