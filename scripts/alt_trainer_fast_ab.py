#!/usr/bin/env python
"""Quality A/B of the fast-numerics recipes on the ALT trainers (VERDICT r4
item 5): the detector (dropout-free + BN freeze tail, with EMA on — the
freeze x EMA interaction under test) and the CAE (BN freeze tail; it has no
dropout). Same paired design + honest gate as scripts/train_fast_ab.py:

* every recipe trains on the SAME corpus with the same seed; the gated
  statistic is the per-seed paired dev-EER delta vs that trainer's
  torch-parity baseline;
* three-way gate (shared ``gate_verdict`` from scripts/train_fast_ab.py):
  FAIL when |mean Δ| − 2·SE > 0.001 regardless of power; PASS iff powered
  (SE <= 0.001) and |mean Δ| <= 0.001; INCONCLUSIVE otherwise;
* a deliberately degraded CONTROL (50x learning rate) must FAIL.

Quality metric: dev EER of each trainer's own scoring path — detector
logits (reference ``src/dlqueen_model.py`` recipe), CAE per-sample
reconstruction MSE as the anomaly score (reference ``src/evaluation_cae.py``
convention: bonafide-only training, spoof reconstructs differently).

Run on the TPU:  python scripts/alt_trainer_fast_ab.py
Smoke on CPU:    JAX_PLATFORMS=cpu python scripts/alt_trainer_fast_ab.py --toy --seeds 2
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

GATE_ABS = 0.001
POWER_SE = 0.001

# one source of truth for the three-way verdict (FAIL when confidently
# outside the contract even under-powered; unit-tested in
# tests/test_train_fast_gate.py) and for the synthetic corpus construction
# (the paired A/Bs must measure the SAME task family or cross-report
# comparisons break)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from train_fast_ab import corpus, gate_verdict  # noqa: E402

# (name, head_dropout, encoder_dropout, bn_freeze_frac, lr_mult)
# The CONTROL is 50x the learning rate (unstable optimizer steps): an
# undertrained control is useless on these fast-converging synthetic
# tasks (see scripts/train_fast_ab.py calibration note).
DET_RECIPES = [
    ("baseline", 0.3, 0.2, 0.0, 1.0),
    ("dropout-free", 0.0, 0.0, 0.0, 1.0),
    ("bn-freeze-tail", 0.3, 0.2, 0.5, 1.0),
    ("fast (drop0+freeze)", 0.0, 0.0, 0.5, 1.0),
    ("CONTROL lr-50x", 0.3, 0.2, 0.0, 50.0),
]
# (name, bn_freeze_frac, lr_mult) — the CAE has no dropout
CAE_RECIPES = [
    ("baseline", 0.0, 1.0),
    ("fast (bn-freeze-tail)", 0.5, 1.0),
    ("CONTROL lr-50x", 0.0, 50.0),
]


def gate_rows(results, recipes, lines):
    base = np.asarray(results[recipes[0][0]])
    verdicts = {}
    for name, *_ in recipes:
        v = np.asarray(results[name])
        if name == recipes[0][0]:
            verdict, dstr = "—", "—"
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
    return verdicts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--toy", action="store_true")
    ap.add_argument("--trainers", default="detector,cae")
    ap.add_argument("--out", default="results/alt_trainer_fast_ab.md")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from dfac_tpu.ops.eer import calculate_eer
    from dfac_tpu.train.cae_loop import CAEConfig, CAETrainer
    from dfac_tpu.train.detector_loop import DetectorConfig, DetectorTrainer

    if args.toy:
        f_dim, t_dim, n_train, n_dev = 24, 40, 256, 256
        delta, batch, hidden, base_ch = 0.8, 32, 16, 4
    else:
        # v5e-sized: resident f32 corpora + detector/CAE activations
        f_dim, t_dim, n_train, n_dev = 180, 321, 4096, 8192
        delta, batch, hidden, base_ch = 0.16, 128, 256, 32

    print(f"devices: {jax.devices()}  geometry [{f_dim},{t_dim}] "
          f"train {n_train} / dev {n_dev}  delta {delta}", flush=True)
    on_dev = not args.toy
    tr_ds = corpus(n_train, 1000, f_dim, t_dim, delta, on_device=on_dev)
    dv_ds = corpus(n_dev, 2000, f_dim, t_dim, delta, on_device=on_dev)
    # ONE normalizer for every CAE run (the reference fits exactly one per
    # corpus); fitting it inside each run would fetch the device corpus to
    # host every time on the relay
    shared_normalizer = None
    if "cae" in args.trainers:
        from dfac_tpu.data.normalizer import build_normalizer

        shared_normalizer = build_normalizer(
            np.asarray(tr_ds.features), tr_ds.labels, swap_tf=True,
        )
    t_start = time.time()
    lines = [
        "# Fast-numerics recipes on the detector and CAE trainers — paired A/B",
        "",
        f"Synthetic overlapping-class corpus ({n_train} train / {n_dev} dev,",
        f"[{f_dim},{t_dim}]), {args.seeds} seeds x {args.epochs} epochs,",
        f"device-resident, on {jax.devices()[0].platform}. Paired design +",
        "three-way gate as in results/train_fast_ab.md: FAIL when",
        f"|mean Δ| − 2·SE > {GATE_ABS} regardless of power; PASS iff",
        f"SE(Δ) <= {POWER_SE} AND |mean Δ| <= {GATE_ABS}; INCONCLUSIVE",
        "otherwise. The CONTROL row (lr x50) must FAIL.",
    ]
    all_verdicts = {}

    if "detector" in args.trainers:
        det_results = {name: [] for name, *_ in DET_RECIPES}
        for seed in range(args.seeds):
            for name, drop, enc_drop, frac, lr_mult in DET_RECIPES:
                cfg = DetectorConfig(
                    epochs=args.epochs, lr=1e-3 * lr_mult,
                    batch_size=batch, hidden=hidden, dropout=drop,
                    encoder_dropout=enc_drop, bn_freeze_after_frac=frac,
                    ema=True, seed=seed, patience=10_000,
                    device_resident=True,
                )
                tr = DetectorTrainer(cfg, in_channels=f_dim)
                res = tr.fit(tr_ds, dv_ds)
                eer = min(h["dev_eer"] for h in res["history"])
                det_results[name].append(float(eer))
                print(f"det seed {seed}  {name:22s} best dev EER {eer:.4f}", flush=True)
        lines += [
            "", "## Detector (dlqueen recipe, EMA on)", "",
            "The freeze-tail x EMA interaction: the EMA keeps averaging",
            "params while the frozen running stats stay at the boundary",
            "value — eval pairs EMA params with those fixed stats.", "",
            "| recipe | per-seed best dev EER | mean ± std | paired Δ (mean ± SE) | gate |",
            "|---|---|---|---|---|",
        ]
        all_verdicts["detector"] = gate_rows(det_results, DET_RECIPES, lines)

    if "cae" in args.trainers:
        cae_results = {name: [] for name, *_ in CAE_RECIPES}
        for seed in range(args.seeds):
            for name, frac, lr_mult in CAE_RECIPES:
                cfg = CAEConfig(
                    epochs=args.epochs, lr=1e-4 * lr_mult,
                    batch_size=batch, base_channels=base_ch,
                    bn_freeze_after_frac=frac, seed=seed,
                    early_stop=10_000, device_resident=True,
                )
                tr = CAETrainer(cfg)
                tr.fit(tr_ds, dv_ds, normalizer=shared_normalizer)
                # anomaly EER: per-sample reconstruction MSE as the spoof
                # score over the MIXED dev split (reference convention)
                from dfac_tpu.train.cae_loop import cae_mse_scores

                mse = cae_mse_scores(
                    tr.model, tr.variables(), dv_ds, tr.normalizer,
                    batch_size=batch,
                )
                eer, _ = calculate_eer(np.asarray(mse), dv_ds.labels)
                cae_results[name].append(float(eer))
                print(f"cae seed {seed}  {name:22s} dev anomaly EER {eer:.4f}", flush=True)
        lines += [
            "", "## CAE (bonafide-only anomaly recipe)", "",
            "| recipe | per-seed dev anomaly EER | mean ± std | paired Δ (mean ± SE) | gate |",
            "|---|---|---|---|---|",
        ]
        all_verdicts["cae"] = gate_rows(cae_results, CAE_RECIPES, lines)

    lines += [
        "",
        f"Wall time: {time.time() - t_start:.0f}s.",
        "",
        "`dfac-train-detector --train-fast` enables the fastest PASSing",
        "detector recipe; `dfac-train-cae --train-fast` the CAE one.",
        "Throughput on hardware: scripts/train_fast_probe.py --trainer.",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), args.out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\nwrote {out}")
    bad = False
    for trainer, verdicts in all_verdicts.items():
        for name, verdict in verdicts.items():
            print(f"{trainer:9s} {name:22s} {verdict}")
            if name.startswith("CONTROL") and verdict != "FAIL":
                bad = True
    if bad:
        print("WARNING: a negative control did not FAIL — the gate has no "
              "power on this corpus; recalibrate.", file=sys.stderr)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
