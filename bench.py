#!/usr/bin/env python
"""Headline benchmark: end-to-end feature+CNN inference on one chip.

BASELINE.json metric: utterances/sec/chip for **feature + CNN inference** —
the full raw-waveform -> LFCC/delta/delta-delta -> CNN2D -> sigmoid chain,
which this framework runs as one jit program per batch: the GEMM-native
Pallas front-end (window/DFT/power/filterbank/log/DCT fused in VMEM) feeding
the bf16 CNN. Baseline target: 10,000 utt/s on one TPU v5e.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# persistent compile cache: repeated bench runs skip the 60-90s XLA compile
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

BASELINE_UTT_S = 10_000.0


def _probe_backend(timeout_s: float = 180.0) -> None:
    """Fail FAST (clear stderr + nonzero exit) when the accelerator relay
    is unreachable, instead of hanging forever inside backend init.

    ``jax.devices()`` through a dead PJRT relay blocks indefinitely and is
    not interruptible from Python once entered — so the probe runs in a
    SUBPROCESS with a hard timeout. A backend that answers in the child
    answers in the parent (same env)."""
    import subprocess
    import sys

    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
    except subprocess.TimeoutExpired:
        print(
            f"bench.py: accelerator backend unreachable (device probe hung "
            f"> {timeout_s:.0f}s — is the TPU relay up?). Last good TPU "
            "measurement: BENCH_r02.json (29,131.7 utt/s, 2.91x baseline); "
            "methodology + per-stage numbers in results/v5e_measurements.md. "
            "Re-run this script unchanged once the relay answers.",
            file=sys.stderr,
        )
        raise SystemExit(2)
    if proc.returncode != 0:
        print(
            "bench.py: device probe failed:\n" + proc.stdout.decode(errors="replace"),
            file=sys.stderr,
        )
        raise SystemExit(2)


def main() -> None:
    _probe_backend()
    import jax
    import jax.numpy as jnp

    from dfac_tpu.features.lfcc import LFCCConfig
    from dfac_tpu.models import build_model
    from dfac_tpu.models.fast_infer import cnn2d_fast_scores_tf, fold_cnn2d
    from dfac_tpu.ops.pallas.gemm_frontend import gemm_lfcc_features_tf

    cfg = LFCCConfig()
    n_corpus = 8192
    # B=128 is the measured throughput peak on v5e for this chain — small
    # enough that XLA overlaps consecutive batch dispatches and the conv
    # activations stay cache-friendly; swept 32..2048 in
    # results/v5e_measurements.md (B=512: 24.5k, B=128: 29.0k utt/s).
    batch = 128
    n_samples = cfg.num_samples(321)  # 51,520 (3.22 s at 16 kHz)

    model = build_model("cnn2d")
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 321, 180), jnp.float32)
    )
    # Serving path: folded BatchNorm + the transpose-free composition — the
    # GEMM front-end emits its natural (B, T, 180) layout straight into the
    # CNN2D-native grid (verified bit-compatible with model.apply in
    # tests/test_fast_infer.py).
    folded = fold_cnn2d(variables)
    # Synthesize the corpus ON DEVICE: the benchmark measures compute, and
    # host->device transfer through the remote PJRT relay is unreliable for
    # hundreds of MB. Pre-batched (n_batches, B, samples) layout: the whole
    # corpus scores as ONE lax.scan program — a single dispatch instead of
    # 64, measured +6% over per-batch dispatches through the relay.
    assert n_corpus % batch == 0, "pre-batched corpus would silently drop the tail"
    corpus = jax.jit(
        lambda key: jax.random.normal(
            key, (n_corpus // batch, batch, n_samples), jnp.float32
        ),
    )(jax.random.key(1))

    @jax.jit
    def score_corpus_scan(folded, corpus3d):
        def body(_, waves):
            feats = gemm_lfcc_features_tf(waves, cfg, compute_dtype=jnp.bfloat16)
            return None, cnn2d_fast_scores_tf(folded, feats)  # (B, 321, 180) per step

        _, out = jax.lax.scan(body, None, corpus3d)
        return out.reshape(-1)

    def score_corpus():
        # Host fetch is the only reliable execution barrier through the
        # remote PJRT relay (block_until_ready returns early there), so
        # fetching the result bounds the full corpus scoring time.
        return np.asarray(score_corpus_scan(folded, corpus))

    score_corpus()  # warmup / compile

    # Median over repeats, with the spread REPORTED: cross-session relay
    # variance measured up to ~4% between rounds (BENCH_r04 27,955 vs the
    # in-round 29,019 — reconciled in results/v5e_measurements.md), so a
    # bare point estimate can't distinguish relay weather from a real
    # regression. The JSON keeps the driver contract (metric/value/unit/
    # vs_baseline) and adds the within-session min/max and rep count.
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        score_corpus()
        times.append(time.perf_counter() - t0)
    rates = sorted(n_corpus / t for t in times)
    utt_s = rates[len(rates) // 2]  # median
    print(
        json.dumps(
            {
                "metric": "e2e_waveform_lfcc_cnn2d_inference",
                "value": round(utt_s, 1),
                "unit": "utt/s/chip",
                "vs_baseline": round(utt_s / BASELINE_UTT_S, 3),
                "min": round(rates[0], 1),
                "max": round(rates[-1], 1),
                "reps": len(rates),
            }
        )
    )


if __name__ == "__main__":
    main()
