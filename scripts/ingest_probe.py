#!/usr/bin/env python
"""Ingest-inclusive serving throughput: disk (npy store) -> scores.

Measures the production `predict --fast` composition end to end — memmap
slice -> host bf16 cast -> async device_put -> folded-BN chain -> one final
fetch — against the HBM-resident rate, and attributes the gap (VERDICT r2
weak item 3: the 29.1k utt/s headline only held for HBM-resident corpora).

Run on the TPU: python scripts/ingest_probe.py [--n 16384] [--batch 128]
"""

from __future__ import annotations

import argparse
import os
import shutil
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
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--store", default="/tmp/ingest_store")
    ap.add_argument("--keep-store", action="store_true")
    args = ap.parse_args()

    import jax

    # the axon sitecustomize pins jax_platforms; an env JAX_PLATFORMS=cpu
    # is silently ignored unless applied as an explicit config update
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from dfac_tpu.data.pipeline import ArrayDataset, load_dataset
    from dfac_tpu.io.npy_store import save_npy_dataset
    from dfac_tpu.models import build_model
    from dfac_tpu.models.fast_infer import cnn2d_fast_scores, fold_cnn2d, predict_scores_fast

    F, T = 180, 321
    n = args.n
    print(f"devices: {jax.devices()}  corpus n={n} ({n*F*T*4/1e9:.1f} GB f32)")

    if not os.path.exists(os.path.join(args.store, "features.npy")):
        rng = np.random.default_rng(0)
        feats = rng.normal(size=(n, F, T)).astype(np.float32)
        save_npy_dataset(
            ArrayDataset(uttids=[f"u{i}" for i in range(n)], features=feats, labels=None),
            args.store,
        )
        del feats
    ds = load_dataset(args.store)  # memmapped
    assert len(ds) == n

    model = build_model("cnn2d")
    variables = model.init({"params": jax.random.key(0)}, jnp.zeros((1, T, F)))
    folded = fold_cnn2d(variables)

    # --- HBM-resident reference rate (same chain, corpus pre-uploaded bf16)
    B = args.batch
    n_res = min(n, 4096)
    resident = jax.device_put(
        jnp.asarray(np.asarray(ds.features[:n_res])).astype(jnp.bfloat16)
    )

    @jax.jit
    def score_resident(folded, corpus):
        def body(_, feats):
            return None, cnn2d_fast_scores(folded, feats)
        _, out = jax.lax.scan(body, None, corpus.reshape(n_res // B, B, F, T))
        return out.reshape(-1)

    np.asarray(score_resident(folded, resident))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(score_resident(folded, resident))
    t_res = time.perf_counter() - t0
    print(f"HBM-resident: {n_res/t_res:10,.0f} utt/s ({t_res*1e3:.0f} ms / {n_res})")

    # --- disk -> scores through the streaming fast path
    warm_ds = ArrayDataset(
        uttids=ds.uttids[: 2 * B], features=np.asarray(ds.features[: 2 * B]), labels=None
    )
    for label, dtype, kw, row_bytes in (
        ("bf16 ingest", jnp.bfloat16, {}, F * T * 2),
        ("f32 ingest", jnp.float32, {}, F * T * 4),
        # int8 rows + one f32 scale per (utt, feature dim): half of bf16
        ("int8 ingest", jnp.bfloat16, {"ingest_int8": True}, F * T + F * 4),
    ):
        predict_scores_fast(variables, warm_ds, B, compute_dtype=dtype, **kw)  # compile
        t0 = time.perf_counter()
        scores = predict_scores_fast(variables, ds, B, compute_dtype=dtype, **kw)
        dt_s = time.perf_counter() - t0
        assert len(scores) == n
        bytes_moved = n * row_bytes
        print(
            f"disk->scores {label}: {n/dt_s:10,.0f} utt/s "
            f"({bytes_moved/dt_s/1e9:.2f} GB/s ingest, {dt_s:.1f} s / {n})"
        )

    if not args.keep_store:
        shutil.rmtree(args.store, ignore_errors=True)


if __name__ == "__main__":
    main()
