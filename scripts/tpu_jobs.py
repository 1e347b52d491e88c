#!/usr/bin/env python
"""Run the queued TPU measurement jobs the moment the relay answers.

Born during the round-3 TPU relay outage (see results/round3_status.md) as
the recovery queue; now the standing one-command measurement suite for any
round. This runner executes the jobs SERIALLY — jax
processes must never share the relay concurrently — each in its own
subprocess with a hard timeout, captures stdout/stderr to
``results/tpu_jobs/<name>.log``, and prints a one-line verdict per job.
Safe to re-run: each job is idempotent and the compile cache
(.jax_cache/) makes repeats fast.

Usage (from the repo root, on a host that reaches the TPU):

    env -u XLA_FLAGS -u JAX_PLATFORMS python scripts/tpu_jobs.py
    # or a subset:
    env -u XLA_FLAGS -u JAX_PLATFORMS python scripts/tpu_jobs.py bench ingest

It probes the backend first (subprocess, 180 s cap) and exits 2 without
touching the jobs if the relay is still down. After a green run, fold the
numbers into results/v5e_measurements.md.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOBS = [
    # (name, argv, timeout_s)
    ("dryrun", [sys.executable, "__graft_entry__.py"], 3600),
    ("ingest", [sys.executable, "scripts/ingest_probe.py"], 3600),
    ("hybrid", [sys.executable, "scripts/hybrid_profile.py"], 3600),
    ("chunked", [sys.executable, "scripts/chunked_probe.py"], 3600),
    ("trainfast", [sys.executable, "scripts/train_fast_probe.py"], 3600),
    ("trainfastdet", [sys.executable, "scripts/train_fast_probe.py", "--trainer", "detector"], 3600),
    ("trainfastcae", [sys.executable, "scripts/train_fast_probe.py", "--trainer", "cae"], 3600),
    ("fusedfit", [sys.executable, "scripts/fused_fit_probe.py"], 3600),
    ("int8", [sys.executable, "scripts/int8_probe.py"], 3600),
    ("servingsweep", [sys.executable, "scripts/serving_sweep.py"], 3600),
    ("bench", [sys.executable, "bench.py"], 3600),
    ("h2d", [sys.executable, "scripts/h2d_probe.py"], 3600),
    # quality sweeps (longer; run after the perf probes)
    ("geometry", [sys.executable, "scripts/bench_geometry.py"], 7200),
    ("ab", [sys.executable, "scripts/train_fast_ab.py"], 10800),
    ("abalt", [sys.executable, "scripts/alt_trainer_fast_ab.py"], 10800),
]


def probe(timeout_s: float = 180.0) -> bool:
    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices())"],
            timeout=timeout_s, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return False
    return proc.returncode == 0


def main() -> int:
    want = set(sys.argv[1:])
    jobs = [j for j in JOBS if not want or j[0] in want]
    if not probe():
        print(
            "tpu_jobs: accelerator backend unreachable (probe hung/failed) "
            "— relay still down; nothing run.", file=sys.stderr,
        )
        return 2
    log_dir = os.path.join(REPO, "results", "tpu_jobs")
    os.makedirs(log_dir, exist_ok=True)
    failures = 0
    for name, argv, timeout_s in jobs:
        log_path = os.path.join(log_dir, f"{name}.log")
        t0 = time.time()
        with open(log_path, "w") as log:
            try:
                rc = subprocess.run(
                    argv, stdout=log, stderr=subprocess.STDOUT,
                    timeout=timeout_s, cwd=REPO,
                ).returncode
            except subprocess.TimeoutExpired:
                rc = -1
        dt = time.time() - t0
        status = "ok" if rc == 0 else ("TIMEOUT" if rc == -1 else f"rc={rc}")
        print(f"{name:8s} {status:8s} {dt:7.1f}s  -> {log_path}")
        failures += rc != 0
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
