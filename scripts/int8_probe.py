#!/usr/bin/env python
"""w8a8 serving-chain probe: does int8 device compute beat the bf16 chain?

Round-4 pinned the bf16 folded chain at ~85% of its ~34k utt/s HBM
materialization floor — the next factor must come from narrower bytes on
device. This probe measures, on real hardware:

1. per-conv micro: bf16 vs int8xint8->int32 at the chain's block-2/3 shapes
   (does XLA's int8 conv run at/above the bf16 rate on this toolchain?);
2. the CNN chain on device-resident features, B sweep: bf16 control vs
   w8a8 (`dfac_tpu/models/fast_infer_int8.py`);
3. the full fused e2e bench configuration (waveform -> GEMM LFCC -> CNN),
   bf16 vs w8a8 — the number that moves BENCH_r05.json;
4. score agreement between the two chains on the same inputs.

Run on the TPU:  python scripts/int8_probe.py
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


def bench(run, reps=5):
    run()  # compile/warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[128, 256])
    ap.add_argument("--n-batches", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--skip-micro", action="store_true")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from dfac_tpu.features.lfcc import LFCCConfig
    from dfac_tpu.models import build_model
    from dfac_tpu.models.fast_infer import cnn2d_fast_scores_tf, fold_cnn2d
    from dfac_tpu.models.fast_infer_int8 import cnn2d_w8a8_scores_tf, fold_cnn2d_w8a8
    from dfac_tpu.ops.pallas.gemm_frontend import gemm_lfcc_features_tf

    print(f"devices: {jax.devices()}")
    cfg = LFCCConfig()
    n_samples = cfg.num_samples(321)
    model = build_model("cnn2d")
    variables = model.init({"params": jax.random.key(0)}, jnp.zeros((1, 321, 180), jnp.float32))
    folded = fold_cnn2d(variables)

    # ---- 1. per-conv micro: N conv iterations inside one scan, slope-timed
    if not args.skip_micro:
        B = 128
        shapes = [
            ("conv2", (B, 160, 180, 32), (3, 3, 32, 64)),
            ("conv3", (B, 80, 180, 64), (3, 3, 64, 128)),
        ]
        for name, xs, ws in shapes:
            for dt, acc in ((jnp.bfloat16, jnp.float32), (jnp.int8, jnp.int32)):
                if dt == jnp.int8:
                    x = jnp.array(np.random.randint(0, 100, xs), jnp.int8)
                    w = jnp.array(np.random.randint(-100, 100, ws), jnp.int8)
                else:
                    x = jnp.array(np.random.normal(size=xs), dt)
                    w = jnp.array(np.random.normal(size=ws), dt)

                def make(n, x=x, w=w, acc=acc, dt=dt):
                    @jax.jit
                    def prog(x, w):
                        def body(c, _):
                            y = jax.lax.conv_general_dilated(
                                c, w, (1, 1), "SAME",
                                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                preferred_element_type=acc,
                            )
                            # carry re-quantized/cast output so iterations chain
                            nxt = jnp.clip(y, -100, 100).astype(dt) if dt == jnp.int8 \
                                else y.astype(dt) * jnp.asarray(1e-3, dt)
                            return nxt[:, :, :, : x.shape[-1]], y[0, 0, 0, 0]
                        _, outs = jax.lax.scan(body, x, None, length=n)
                        return outs
                    return lambda: np.asarray(prog(x, w))

                t8 = bench(make(8), args.reps)
                t24 = bench(make(24), args.reps)
                per = (t24 - t8) / 16.0
                flops = 2 * np.prod(xs) * ws[0] * ws[1] * ws[3]
                print(f"micro {name} {np.dtype(dt).name}: {per * 1e3:7.2f} ms/conv"
                      f"  ({flops / per / 1e12:6.1f} T{'OP' if dt == jnp.int8 else 'F'}/s)",
                      flush=True)

    # ---- calibration batch through the f32 chain (host features)
    calib = np.random.default_rng(0).normal(size=(256, 321, 180)).astype(np.float32)
    f8 = fold_cnn2d_w8a8(variables, calib, swap_tf=False)

    # ---- 4. score agreement
    feats = jnp.asarray(calib[:128])
    s_bf16 = np.asarray(cnn2d_fast_scores_tf(folded, feats))
    s_w8a8 = np.asarray(cnn2d_w8a8_scores_tf(f8, feats))
    print(f"agreement: max|d|={np.max(np.abs(s_bf16 - s_w8a8)):.4f} "
          f"mean|d|={np.mean(np.abs(s_bf16 - s_w8a8)):.4f} "
          f"rank-rho={np.corrcoef(np.argsort(np.argsort(s_bf16)), np.argsort(np.argsort(s_w8a8)))[0, 1]:.4f}")

    # ---- 2 + 3. chain sweeps
    for B in args.batches:
        n_corpus = args.n_batches * B
        featsd = jax.jit(
            lambda key, B=B: jax.random.normal(key, (args.n_batches, B, 321, 180), jnp.float32)
        )(jax.random.key(1))
        waves = jax.jit(
            lambda key, B=B: jax.random.normal(key, (args.n_batches, B, n_samples), jnp.float32)
        )(jax.random.key(2))

        pool_bf16_chain = variant_pool_bf16(jnp, jax)
        for label, params, score in (
            ("bf16 ", folded, cnn2d_fast_scores_tf),
            ("w8a8 ", f8, cnn2d_w8a8_scores_tf),
            ("w8a8p", f8, pool_bf16_chain),  # bf16 pools, quant after pool
        ):
            @jax.jit
            def cnn_prog(p, f3, score=score):
                def body(_, f):
                    return None, score(p, f)
                _, out = jax.lax.scan(body, None, f3)
                return out.reshape(-1)

            t = bench(lambda: np.asarray(cnn_prog(params, featsd)), args.reps)
            print(f"B={B:4d} CNN-only {label}: {n_corpus / t:10,.0f} utt/s", flush=True)

            @jax.jit
            def e2e_prog(p, w3, score=score):
                def body(_, wv):
                    feats = gemm_lfcc_features_tf(wv, cfg, compute_dtype=jnp.bfloat16)
                    return None, score(p, feats)
                _, out = jax.lax.scan(body, None, w3)
                return out.reshape(-1)

            t = bench(lambda: np.asarray(e2e_prog(params, waves)), args.reps)
            print(f"B={B:4d} e2e      {label}: {n_corpus / t:10,.0f} utt/s", flush=True)




def variant_pool_bf16(jnp, jax):
    """w8a8 variant: pools stay bf16 depthwise (quant fused into the POOL's
    epilogue instead of the conv's) — isolates whether the grouped int8
    pool conv lowering is what loses."""
    from dfac_tpu.models.fast_infer import _depthwise_avg_pool
    from dfac_tpu.models.fast_infer_int8 import _quant_act
    import functools

    @functools.partial(jax.jit, static_argnames=())
    def chain(f8, feats_tf):
        dt = jnp.bfloat16
        h = feats_tf.astype(dt)[..., None]
        h = jax.lax.conv_general_dilated(
            h, f8["w1"].astype(dt), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        h = jnp.maximum(h + f8["b1"], 0.0).astype(dt)
        h = _depthwise_avg_pool(h, (2, 1))
        q = _quant_act(h.astype(jnp.float32), f8["inv_s1"])
        acc = jax.lax.conv_general_dilated(
            q, f8["w2q"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        h = jnp.maximum(acc.astype(jnp.float32) * f8["deq2"] + f8["b2"], 0.0).astype(dt)
        h = _depthwise_avg_pool(h, (2, 1))
        q = _quant_act(h.astype(jnp.float32), f8["inv_s2"])
        acc = jax.lax.conv_general_dilated(
            q, f8["w3q"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        h = jnp.maximum(acc.astype(jnp.float32) * f8["deq3"] + f8["b3"], 0.0)
        hm = jnp.mean(h, axis=1)
        emb = jnp.swapaxes(hm, 1, 2).reshape(hm.shape[0], -1)
        logits = emb.astype(dt) @ f8["w_cls"].astype(dt) + f8["b_cls"]
        return jax.nn.sigmoid(logits[:, 0].astype(jnp.float32))

    return chain


if __name__ == "__main__":
    main()
