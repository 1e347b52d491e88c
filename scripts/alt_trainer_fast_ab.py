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
* a deliberately degraded CONTROL (25% of the TRAIN labels flipped,
  class-balanced; dev labels stay clean) must FAIL.

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
# The CONTROL trains on a corpus with 25% of the TRAIN labels flipped
# (dev labels stay clean): a directionally certain degradation with a
# consistent per-seed sign. The first calibration used lr x50 (the CNN2D
# A/B's control) but the detector is robust to it — measured meanD +0.0027
# with SE 0.0019 and mixed per-seed signs (receipt: the 2026-08-20
# lr-50x rows in results/tpu_jobs/abalt.log), i.e. INCONCLUSIVE — and a
# control the gate cannot FAIL proves nothing, hence the switch.
DET_RECIPES = [
    ("baseline", 0.3, 0.2, 0.0, 1.0),
    ("dropout-free", 0.0, 0.0, 0.0, 1.0),
    ("bn-freeze-tail", 0.3, 0.2, 0.5, 1.0),
    ("fast (drop0+freeze)", 0.0, 0.0, 0.5, 1.0),
    ("CONTROL label-noise-25%", 0.3, 0.2, 0.0, 1.0),
]
# (name, bn_freeze_frac, lr_mult) — the CAE has no dropout. Its control
# is the same label corruption: flipped labels contaminate the
# bonafide-only training subset with ~25% spoof rows, so the AE learns to
# reconstruct spoof too and the MSE separation shrinks. The scoring
# pipeline (shared clean normalizer, clean dev labels) is identical to
# baseline's — only the training subset degrades.
CAE_RECIPES = [
    ("baseline", 0.0, 1.0),
    ("fast (bn-freeze-tail)", 0.5, 1.0),
    ("CONTROL label-noise-25%", 0.0, 1.0),
]


def cae_corpus(n: int, seed: int, f_dim: int, t_dim: int, on_device: bool = False):
    """CAE-phase corpus. The detector's shared ``corpus`` (white noise ± a
    small band mean-shift) carries NO reconstruction signal — an AE maps
    white noise to ~its mean for both classes, so anomaly MSE sits at
    chance (calibration receipt: baseline dev anomaly EER 0.548 / 0.496
    across seeds, results/tpu_jobs/abcae_calib.log), and a gate on a
    chance-level metric can neither PASS nor FAIL anything.

    Reconstruction anomaly detection measures what the DECODER learned, so
    the class difference must live in learnable, decodable structure: each
    class mixes a small bank of fixed smooth low-frequency [F,T] patterns
    (coarse white noise bilinearly upsampled 6x — representable through the
    4x-pooled bottleneck) + white noise. An AE trained bonafide-only stores
    the bonafide bank in its weights, so spoof mixtures reconstruct worse
    (the noise floor is common to both); the label-noise CONTROL
    contaminates training with spoof rows, the decoder learns the spoof
    bank too, and the MSE separation measurably shrinks — the degradation
    the gate must FAIL."""
    import jax
    import jax.numpy as jnp

    from dfac_tpu.data.pipeline import ArrayDataset

    labels = (np.arange(n) % 2).astype(np.int32)
    k_pat = 4

    @jax.jit
    def gen(key):
        kb, ks, kc, kn = jax.random.split(key, 4)

        def bank(k):
            coarse = jax.random.normal(
                k, (k_pat, max(f_dim // 6, 2), max(t_dim // 6, 2)), jnp.float32
            )
            pats = jax.image.resize(coarse, (k_pat, f_dim, t_dim), "linear")
            return pats / jnp.sqrt(jnp.mean(pats**2, axis=(1, 2), keepdims=True))

        p_b, p_s = bank(kb), bank(ks)
        coefs = jax.random.normal(kc, (n, k_pat), jnp.float32) / np.sqrt(k_pat)
        mask = jnp.asarray(labels == 1, jnp.float32)[:, None, None]
        mix_b = jnp.einsum("nk,kft->nft", coefs, p_b)
        mix_s = jnp.einsum("nk,kft->nft", coefs, p_s)
        noise = 0.3 * jax.random.normal(kn, (n, f_dim, t_dim), jnp.float32)
        return mask * mix_b + (1.0 - mask) * mix_s + noise

    feats = gen(jax.random.key(seed))
    if not on_device:
        feats = np.asarray(feats)
    return ArrayDataset([f"u{i}" for i in range(n)], feats, labels)


def noisy_view(ds, seed: int, frac: float = 0.25):
    """CONTROL corpus: flip ``frac`` of the TRAIN labels, class-balanced
    (the same count flipped in each direction), so the class prior and the
    bonafide-subset size are unchanged — the control isolates label
    corruption from corpus-size / prior shift. Features are shared with
    ``ds`` (no device copy; the resident trainers adopt pre-placed
    arrays). Dev labels are never touched."""
    from dfac_tpu.data.pipeline import ArrayDataset

    labels = np.asarray(ds.labels).copy()
    r = np.random.default_rng(seed)
    k = int(round(len(labels) * frac / 2.0))
    bona = np.nonzero(labels == 1)[0]
    spoof = np.nonzero(labels == 0)[0]
    labels[r.choice(bona, size=k, replace=False)] = 0
    labels[r.choice(spoof, size=k, replace=False)] = 1
    return ArrayDataset(ds.uttids, ds.features, labels, ds.lengths)


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
    # The CAE phase gets its own corpus (see cae_corpus docstring: the
    # detector corpus has no reconstruction signal — measured at-chance),
    # generated as ONE draw so train and dev share the class subspaces,
    # then split. ONE normalizer for every CAE run (the reference fits
    # exactly one per corpus); fitting it inside each run would fetch the
    # device corpus to host every time on the relay.
    cae_tr = cae_dv = shared_normalizer = None
    if "cae" in args.trainers:
        from dfac_tpu.data.pipeline import ArrayDataset
        from dfac_tpu.data.normalizer import build_normalizer

        cae_all = cae_corpus(n_train + n_dev, 3000, f_dim, t_dim, on_device=on_dev)
        cae_tr = ArrayDataset(
            cae_all.uttids[:n_train], cae_all.features[:n_train],
            cae_all.labels[:n_train],
        )
        cae_dv = ArrayDataset(
            cae_all.uttids[n_train:], cae_all.features[n_train:],
            cae_all.labels[n_train:],
        )
        shared_normalizer = build_normalizer(
            np.asarray(cae_tr.features), cae_tr.labels, swap_tf=True,
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
        "otherwise. The CONTROL row (25% of TRAIN labels flipped,",
        "class-balanced; dev labels clean) must FAIL. (The CNN2D A/B's",
        "lr-x50 control was tried first and measured INCONCLUSIVE on the",
        "detector — mean Δ +0.0027, SE 0.0019, mixed per-seed signs;",
        "see results/tpu_jobs/abalt.log — hence the switch.)",
    ]
    all_verdicts = {}

    if "detector" in args.trainers:
        det_results = {name: [] for name, *_ in DET_RECIPES}
        for seed in range(args.seeds):
            noisy_tr = noisy_view(tr_ds, 7000 + seed)
            for name, drop, enc_drop, frac, lr_mult in DET_RECIPES:
                cfg = DetectorConfig(
                    epochs=args.epochs, lr=1e-3 * lr_mult,
                    batch_size=batch, hidden=hidden, dropout=drop,
                    encoder_dropout=enc_drop, bn_freeze_after_frac=frac,
                    ema=True, seed=seed, patience=10_000,
                    device_resident=True,
                )
                tr = DetectorTrainer(cfg, in_channels=f_dim)
                train = noisy_tr if name.startswith("CONTROL") else tr_ds
                res = tr.fit(train, dv_ds)
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
            noisy_tr = noisy_view(cae_tr, 9000 + seed)
            for name, frac, lr_mult in CAE_RECIPES:
                cfg = CAEConfig(
                    epochs=args.epochs, lr=1e-4 * lr_mult,
                    batch_size=batch, base_channels=base_ch,
                    bn_freeze_after_frac=frac, seed=seed,
                    early_stop=10_000, device_resident=True,
                )
                tr = CAETrainer(cfg)
                train = noisy_tr if name.startswith("CONTROL") else cae_tr
                tr.fit(train, cae_dv, normalizer=shared_normalizer)
                # anomaly EER: per-sample reconstruction MSE as the spoof
                # score over the MIXED dev split (reference convention)
                from dfac_tpu.train.cae_loop import cae_mse_scores

                mse = cae_mse_scores(
                    tr.model, tr.variables(), cae_dv, tr.normalizer,
                    batch_size=batch,
                )
                # reference dual convention (src/evaluation_cae.py:61-75):
                # EER for -MSE and +MSE, keep the better — on the real data
                # spoof reconstructs BETTER (+MSE wins); on this corpus the
                # AE learns the bonafide subspace so -MSE wins
                mse_np = np.asarray(mse)
                eer = min(
                    calculate_eer(mse_np, cae_dv.labels)[0],
                    calculate_eer(-mse_np, cae_dv.labels)[0],
                )
                cae_results[name].append(float(eer))
                print(f"cae seed {seed}  {name:22s} dev anomaly EER {eer:.4f}", flush=True)
        lines += [
            "", "## CAE (bonafide-only anomaly recipe)", "",
            "Own corpus (same size/geometry): per-class low-rank smooth",
            "structure from different spatial subspaces + white noise — the",
            "detector corpus has no reconstruction signal (measured",
            "at-chance, results/tpu_jobs/abcae_calib.log; see cae_corpus in",
            "scripts/alt_trainer_fast_ab.py). Anomaly EER uses the reference",
            "dual +/-MSE convention (src/evaluation_cae.py:61-75). The",
            "label-noise CONTROL teaches the AE the spoof subspace too,",
            "shrinking the MSE separation.", "",
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
