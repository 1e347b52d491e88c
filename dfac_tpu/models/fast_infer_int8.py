"""w8a8 int8 serving chain for CNN2D: quantized device COMPUTE, not just
quantized transfer.

Round-4 measurements pinned the bf16 folded serving chain at ~85% of its
HBM **materialization floor** (~34k utt/s on one v5e; see
``results/v5e_measurements.md``) — further bf16 scheduling is a measured
dead end, so the next factor must come from narrower bytes *on device*.
This module runs blocks 2-3 of the folded CNN2D as int8 x int8 -> int32
convolutions with int8 activations materialized between blocks:

* **conv1 stays bf16.** Its input is raw LFCC cepstra whose dynamic range
  is dominated by c0 (log-energy), so a per-tensor int8 quantization of
  the *input* would burn most of the 8 bits on one coefficient; and with
  C_in = 1 the first conv is <10% of the chain's FLOPs. The folded
  BN+ReLU epilogue then quantizes conv1's OUTPUT — post-BN activations
  are per-channel normalized, where per-tensor int8 is well conditioned.
* **Activations quantize to int8 with static (calibrated) scales** —
  dynamic per-batch amax would need a second pass over the largest
  activations, re-materializing exactly the f32 intermediates the design
  removes. Scales come from one calibration batch through the f32 chain
  (:func:`calibrate_cnn2d`); clipping saturates at 127 for anything the
  calibration did not cover.
* **Pools run in the int8 domain** as stride-2 depthwise convolutions
  with unit taps accumulating in int32, then ``(a + b + 1) >> 1`` back
  to int8 (post-ReLU values are non-negative). The full-resolution
  activations — the chain's dominant HBM traffic — are therefore int8
  end to end: half the bytes of the bf16 chain on every boundary.
* **Weights quantize per-output-channel** (symmetric, ``amax/127``);
  the dequantization scale ``s_act * s_w[c]`` folds with the conv's
  int32 accumulator into one fused epilogue multiply, followed by the
  folded-BN bias and ReLU.

Scores differ from the bf16 chain by the quantization step; EER parity is
gated exactly like ``--bf16`` ingest (``tests/test_fast_infer_int8.py``,
0.1%-absolute contract of BASELINE.md). Reference scoring contract:
``src/predict.py:100-111``.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from dfac_tpu.models.fast_infer import fold_cnn2d

_QMAX = 127.0


def _quant_weight_per_channel(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 weight quantization.

    ``w`` is an HWIO kernel; the output channel is the last axis. Returns
    ``(w_q int8, s (C,) f32)`` with ``w ~= w_q * s``. All-zero channels get
    scale 1 so the dequant multiply stays finite.
    """
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))
    s = jnp.where(amax > 0, amax / _QMAX, 1.0)
    w_q = jnp.clip(jnp.round(w / s), -128, 127).astype(jnp.int8)
    return w_q, s


def _quant_act(h: jax.Array, inv_s: jax.Array) -> jax.Array:
    """Post-ReLU activation -> int8 with static scale (h >= 0, so the
    quantized range is [0, 127]); fuses into the producing conv's epilogue."""
    return jnp.minimum(jnp.round(h * inv_s), _QMAX).astype(jnp.int8)


def _pool2_int8(q: jax.Array, time_axis: int) -> jax.Array:
    """Stride-2 average pool over ``time_axis`` in the int8 domain.

    Unit-tap depthwise convolution accumulating int32 (exact sum a+b),
    then round-half-up halving back to int8 — post-ReLU quantized values
    are in [0, 127] so a+b+1 <= 255 never overflows and the result keeps
    the SAME scale as its input. Differs from the f32 average by at most
    half a quantization step.
    """
    c = q.shape[-1]
    window = (2, 1) if time_axis == 1 else (1, 2)
    taps = jnp.ones((*window, 1, c), jnp.int8)
    acc = jax.lax.conv_general_dilated(
        q, taps, window, "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.int32,
    )
    return ((acc + 1) // 2).astype(jnp.int8)


def calibrate_cnn2d(folded: dict, feats: jax.Array, swap_tf: bool = True) -> tuple[float, float]:
    """Run the f32 folded chain on a calibration batch and return the
    post-ReLU amax of blocks 1 and 2 — the static activation scales'
    inputs. ``feats`` is (B, F, T) stored orientation when ``swap_tf``
    (reference ``src/predict.py:100-111`` semantics), else (B, T, F)."""

    @jax.jit
    def amaxes(folded, x):
        h = x[..., None]  # grid per orientation
        outs = []
        for i in (1, 2):
            k = jnp.asarray(folded[f"w{i}"], jnp.float32)
            if swap_tf:
                k = jnp.swapaxes(k, 0, 1)  # FT grid: spatially transposed kernel
            h = jax.lax.conv_general_dilated(
                h, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            h = jnp.maximum(h + folded[f"b{i}"], 0.0)
            outs.append(jnp.max(h))
            # f32 average pool stands in for the int8 pool: same scale domain
            window = (1, 2) if swap_tf else (2, 1)
            c = h.shape[-1]
            taps = jnp.full((*window, 1, c), 0.5, jnp.float32)
            h = jax.lax.conv_general_dilated(
                h, taps, window, "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c,
            )
        return outs

    a1, a2 = amaxes(folded, jnp.asarray(feats, jnp.float32))
    return float(a1), float(a2)


def fold_cnn2d_w8a8(
    variables: dict,
    calib_feats: jax.Array | np.ndarray,
    swap_tf: bool = True,
    margin: float = 1.0,
    num_blocks: int = 3,
    eps: float = 1e-5,
) -> dict:
    """Fold BN + quantize for the w8a8 serving chain.

    Starts from :func:`~dfac_tpu.models.fast_infer.fold_cnn2d` (eval-mode
    BN folded into conv kernels/biases), then quantizes the block-2/3
    kernels per-output-channel to int8 and calibrates the two activation
    scales on ``calib_feats`` (one representative batch; ``margin``
    head-rooms the amax). The returned dict drives
    :func:`cnn2d_w8a8_scores` / :func:`cnn2d_w8a8_scores_tf`.
    """
    folded = fold_cnn2d(variables, num_blocks=num_blocks, eps=eps)
    a1, a2 = calibrate_cnn2d(folded, jnp.asarray(calib_feats), swap_tf=swap_tf)
    s1 = max(a1 * margin, 1e-12) / _QMAX
    s2 = max(a2 * margin, 1e-12) / _QMAX

    w2q, sw2 = _quant_weight_per_channel(folded["w2"])
    w3q, sw3 = _quant_weight_per_channel(folded["w3"])
    return {
        "w1": jnp.asarray(folded["w1"], jnp.float32),
        "b1": folded["b1"],
        "w2q": w2q,
        "b2": folded["b2"],
        "deq2": (jnp.float32(s1) * sw2).astype(jnp.float32),  # (C2,)
        "w3q": w3q,
        "b3": folded["b3"],
        "deq3": (jnp.float32(s2) * sw3).astype(jnp.float32),  # (C3,)
        "inv_s1": jnp.float32(1.0 / s1),
        "inv_s2": jnp.float32(1.0 / s2),
        "w_cls": folded["w_cls"],
        "b_cls": folded["b_cls"],
    }


def _w8a8_chain(f8: dict, h: jax.Array, apply_sigmoid: bool, dt, time_axis: int):
    """Shared w8a8 chain body. ``h`` is (B, T, F, 1) when ``time_axis=1``
    (TF grid) or (B, F, T, 1) when ``time_axis=2`` (stored FT grid); the
    int8 kernels quantize in stored orientation, so the FT grid swaps
    their spatial dims at use time (weights are tiny; the swap is free
    relative to the conv)."""

    def spatial(k):
        return jnp.swapaxes(k, 0, 1) if time_axis == 2 else k

    # block 1: bf16 conv, f32 epilogue, int8 quantized output
    h = jax.lax.conv_general_dilated(
        h.astype(dt), spatial(f8["w1"]).astype(dt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    q = _quant_act(jnp.maximum(h + f8["b1"], 0.0), f8["inv_s1"])
    q = _pool2_int8(q, time_axis)

    # block 2: int8 x int8 -> int32, fused dequant+bias+ReLU+quant epilogue
    acc = jax.lax.conv_general_dilated(
        q, spatial(f8["w2q"]), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    h = jnp.maximum(acc.astype(jnp.float32) * f8["deq2"] + f8["b2"], 0.0)
    q = _pool2_int8(_quant_act(h, f8["inv_s2"]), time_axis)

    # block 3: int8 conv, f32 head (no further quantization)
    acc = jax.lax.conv_general_dilated(
        q, spatial(f8["w3q"]), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    h = jnp.maximum(acc.astype(jnp.float32) * f8["deq3"] + f8["b3"], 0.0)

    hm = jnp.mean(h, axis=time_axis)  # (B, F, C) either way
    emb = jnp.swapaxes(hm, 1, 2).reshape(hm.shape[0], -1)  # channel-major
    logits = emb.astype(dt) @ f8["w_cls"].astype(dt) + f8["b_cls"]
    logits = logits[:, 0].astype(jnp.float32)
    return jax.nn.sigmoid(logits) if apply_sigmoid else logits


@functools.partial(jax.jit, static_argnames=("apply_sigmoid", "compute_dtype"))
def cnn2d_w8a8_scores(
    f8: dict,
    feats_stored: jax.Array,
    apply_sigmoid: bool = True,
    compute_dtype: Any = jnp.bfloat16,
):
    """Stored-orientation (B, F, T) features -> (B,) scores through the
    w8a8 chain (int8 compute for blocks 2-3, int8 pools, bf16 block 1)."""
    h = feats_stored.astype(compute_dtype)[..., None]
    return _w8a8_chain(f8, h, apply_sigmoid, compute_dtype, time_axis=2)


@functools.partial(
    jax.jit, static_argnames=("swap_tf", "apply_sigmoid", "compute_dtype")
)
def cnn2d_w8a8_scores_q8(
    f8: dict,
    q: jax.Array,
    scales: jax.Array,
    swap_tf: bool = True,
    apply_sigmoid: bool = True,
    compute_dtype: Any = jnp.bfloat16,
):
    """int8-quantized INGEST rows -> (B,) scores through the w8a8 chain:
    the transfer quantization (:func:`~dfac_tpu.io.fastcast.quant_i8`,
    per-row scales) dequantizes fused into block 1, then blocks 2-3 run
    int8 compute — both int8 levers in one program."""
    from dfac_tpu.models.fast_infer import _dequant8

    h = _dequant8(q, scales, compute_dtype)[..., None]
    return _w8a8_chain(
        f8, h, apply_sigmoid, compute_dtype, time_axis=2 if swap_tf else 1
    )


@functools.partial(jax.jit, static_argnames=("apply_sigmoid", "compute_dtype"))
def cnn2d_w8a8_scores_tf(
    f8: dict,
    feats_tf: jax.Array,
    apply_sigmoid: bool = True,
    compute_dtype: Any = jnp.bfloat16,
):
    """(B, T, F)-orientation features -> (B,) scores through the w8a8
    chain; composes transpose-free with the GEMM LFCC front-end exactly
    like :func:`~dfac_tpu.models.fast_infer.cnn2d_fast_scores_tf`."""
    h = feats_tf.astype(compute_dtype)[..., None]
    return _w8a8_chain(f8, h, apply_sigmoid, compute_dtype, time_axis=1)


def predict_scores_w8a8(
    variables: dict,
    ds,
    batch_size: int = 512,
    swap_tf: bool = True,
    apply_sigmoid: bool = True,
    compute_dtype: Any = jnp.bfloat16,
    stats=None,
    calib_batches: int = 1,
    margin: float = 1.0,
    ingest_int8: bool = False,
):
    """Score a whole dataset through the w8a8 chain; (N,) f32 in order.

    The int8-compute counterpart of
    :func:`~dfac_tpu.models.fast_infer.predict_scores_fast` (the
    ``dfac-predict --fast --int8`` serving path). Calibration uses the
    first ``calib_batches`` batches of ``ds`` — deterministic, so repeated
    runs produce identical scores. ``ingest_int8`` composes: rows upload
    quantized (:func:`~dfac_tpu.models.fast_infer._ingest_q8`) and
    dequantize fused into block 1, while blocks 2-3 still compute int8.
    """
    from dfac_tpu.models.fast_infer import _ingest, _ingest_q8
    from dfac_tpu.train.evaluate import collect_masked_scores

    n_cal = min(max(batch_size * calib_batches, 1), len(ds.features))
    calib = np.asarray(ds.features[:n_cal], np.float32)
    f8 = fold_cnn2d_w8a8(variables, calib, swap_tf=swap_tf, margin=margin)
    score = cnn2d_w8a8_scores if swap_tf else cnn2d_w8a8_scores_tf

    if ingest_int8:
        return collect_masked_scores(
            lambda qs: cnn2d_w8a8_scores_q8(
                f8, qs[0], qs[1], swap_tf=swap_tf,
                apply_sigmoid=apply_sigmoid, compute_dtype=compute_dtype,
            ),
            ds, batch_size,
            prepare_batch=lambda b: _ingest_q8(b.features),
            stats=stats,
        )

    return collect_masked_scores(
        lambda feats: score(
            f8, feats, apply_sigmoid=apply_sigmoid, compute_dtype=compute_dtype
        ),
        ds, batch_size,
        prepare_batch=lambda b: _ingest(b.features, compute_dtype),
        stats=stats,
    )
