"""Optimized CNN2D inference path: folded BatchNorm, no input transpose.

Serving-oriented reformulation of the flagship model with identical math:

* **BatchNorm folding** — at eval time BN is an affine map, so it folds
  into the conv kernel and bias (``W' = W * scale/sqrt(var+eps)``,
  ``b' = (b - mean) * scale/sqrt(var+eps) + shift``). Removes three full
  elementwise passes over the biggest activations.
* **No transpose** — convolution on the stored ``(B, F, T)`` orientation
  with a spatially-transposed kernel is identical to convolving the
  swapped ``(B, T, F)`` grid; pooling (2,1)-over-time becomes (1,2), and
  the mean-over-time head becomes a mean over axis 2. The input HBM
  round-trip for the transpose disappears.
* **Depthwise-conv pooling** — the (2,1) time-pool expressed as a
  stride-(2,1) depthwise convolution with constant 0.5 taps. On TPU this
  stays inside XLA's convolution layout domain and measures ~20% faster
  end-to-end than ``reduce_window`` (v5e, B=512; see
  ``results/v5e_measurements.md``). In f32 it is bit-identical to
  ``avg_pool`` (``0.5a + 0.5b`` and ``(a+b) * 0.5`` round identically);
  in bf16 it accumulates in f32, differing from bf16 ``reduce_window``
  only at the bf16 LSB.
* bf16 activations with f32 accumulation; the classifier matmul fuses the
  channel-major flatten.

Output is bit-compatible with ``CNN2D.apply`` in eval mode (to bf16
rounding); verified in ``tests/test_fast_infer.py``.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _depthwise_avg_pool(h: jax.Array, window: tuple[int, int]) -> jax.Array:
    """(2,1)/(1,2) avg-pool as a stride-``window`` depthwise convolution.

    Identical math to ``nn.avg_pool(h, window, window, "VALID")`` (bit-exact
    in f32; in bf16 the MXU still accumulates the two taps in f32 before the
    single bf16 round) but ~20% faster inside conv chains on TPU:
    reduce_window forces a layout change on C-minor activations, while a
    depthwise conv stays in XLA's convolution layout domain. Differentiable
    in f32 only: the explicit f32 ``preferred_element_type`` (kept for the
    serving chain's exactness) makes lax.conv's transpose rule reject the
    mixed f32-cotangent/bf16-operand combination in bf16 — the training
    path uses :func:`dfac_tpu.models.common.avg_pool` (no
    preferred_element_type) for exactly that reason.
    """
    c = h.shape[-1]
    taps = jnp.full((*window, 1, c), 1.0 / (window[0] * window[1]), h.dtype)
    return jax.lax.conv_general_dilated(
        h, taps, window, "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        # explicit, so the f32 accumulation promised above holds on every
        # backend, not just the TPU MXU (free there — same accumulator)
        preferred_element_type=jnp.float32,
    ).astype(h.dtype)


def _fold_bn(kernel, bias, bn_params, bn_stats, eps):
    """``W' = W * inv`` and ``b' = (b - mean) * inv + shift`` with
    ``inv = scale * rsqrt(var + eps)`` — the ONE copy of the eval-mode
    BatchNorm folding algebra (the scale broadcasts on the kernel's last
    axis, so it is rank-agnostic: 1-D, 2-D and transposed kernels alike)."""
    k = jnp.asarray(kernel, jnp.float32)
    b = jnp.asarray(bias, jnp.float32)
    inv = jnp.asarray(bn_params["scale"], jnp.float32) * jax.lax.rsqrt(
        jnp.asarray(bn_stats["var"], jnp.float32) + eps
    )
    shift = jnp.asarray(bn_params["bias"], jnp.float32)
    mean = jnp.asarray(bn_stats["mean"], jnp.float32)
    return k * inv, (b - mean) * inv + shift


def fold_cnn2d(variables: dict, num_blocks: int = 3, eps: float = 1e-5) -> dict:
    """Fold BN stats into conv kernels/biases; returns a compact param dict."""
    p = variables["params"]
    bs = variables["batch_stats"]
    folded = {}
    for i in range(1, num_blocks + 1):
        folded[f"w{i}"], folded[f"b{i}"] = _fold_bn(
            p[f"conv{i}"]["conv"]["kernel"], p[f"conv{i}"]["conv"]["bias"],
            p[f"bn{i}"], bs[f"bn{i}"], eps,
        )
    folded["w_cls"] = jnp.asarray(p["classifier"]["dense"]["kernel"], jnp.float32)
    folded["b_cls"] = jnp.asarray(p["classifier"]["dense"]["bias"], jnp.float32)
    return folded


def _cnn2d_chain_scores(folded, h, apply_sigmoid, dt):
    """The FT-grid folded chain body: ``h`` is (B, F, T, 1) in ``dt``."""
    for i in (1, 2, 3):
        # swapped-grid convolution: transpose the kernel's spatial dims
        k = jnp.swapaxes(folded[f"w{i}"], 0, 1).astype(dt)
        h = jax.lax.conv_general_dilated(
            h, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        h = jnp.maximum(h + folded[f"b{i}"], 0.0)
        if i < 3:
            h = _depthwise_avg_pool(h.astype(dt), (1, 2))  # pool T (axis 2)
        else:
            h = h.astype(dt)
    hm = jnp.mean(h.astype(jnp.float32), axis=2)  # mean over time -> (B, F, C)
    # channel-major flatten to match the reference embedding layout
    emb = jnp.swapaxes(hm, 1, 2).reshape(hm.shape[0], -1)
    logits = emb.astype(dt) @ folded["w_cls"].astype(dt) + folded["b_cls"]
    logits = logits[:, 0].astype(jnp.float32)
    return jax.nn.sigmoid(logits) if apply_sigmoid else logits


@functools.partial(jax.jit, static_argnames=("apply_sigmoid", "compute_dtype"))
def cnn2d_fast_scores(
    folded: dict,
    feats_stored: jax.Array,
    apply_sigmoid: bool = True,
    compute_dtype: Any = jnp.bfloat16,
):
    """Stored-orientation (B, F, T) features -> (B,) scores.

    Equivalent to ``sigmoid(CNN2D.apply(vars, transpose(feats)))`` with BN
    in eval mode.
    """
    dt = compute_dtype
    h = feats_stored.astype(dt)[..., None]  # (B, F, T, 1): grid is (F, T)
    return _cnn2d_chain_scores(folded, h, apply_sigmoid, dt)


def _dequant8(q: jax.Array, scales: jax.Array, dt) -> jax.Array:
    """int8 rows + per-group scales -> ``dt`` features: ``q * scales``
    broadcast over the group (last) axis, f32 multiply then one cast —
    the device half of :func:`dfac_tpu.io.fastcast.quant_i8`. Fuses into
    whatever consumes it under jit (one elementwise op before the first
    conv — no extra HBM round trip)."""
    return (q.astype(jnp.float32) * scales[..., None].astype(jnp.float32)).astype(dt)


@functools.partial(
    jax.jit, static_argnames=("swap_tf", "apply_sigmoid", "compute_dtype")
)
def cnn2d_fast_scores_q8(
    folded: dict,
    q: jax.Array,
    scales: jax.Array,
    swap_tf: bool = True,
    apply_sigmoid: bool = True,
    compute_dtype: Any = jnp.bfloat16,
):
    """int8-quantized features -> (B,) scores through the folded chain.

    ``q``/``scales`` come from :func:`dfac_tpu.io.fastcast.quant_i8` on
    the host: ``swap_tf=True`` means rows are stored-orientation
    (B, F, T) with one scale per (utterance, feature dim); False means
    (B, T, F) rows scaled per (utterance, frame). Halves the bytes over
    the host->device link vs bf16 ingest; the dequantize fuses into the
    first conv. Scores differ from the bf16 chain only by the ~amax/254
    per-group quantization step (EER parity test-gated,
    ``tests/test_fast_infer.py``)."""
    dt = compute_dtype
    h = _dequant8(q, scales, dt)[..., None]
    if swap_tf:
        return _cnn2d_chain_scores(folded, h, apply_sigmoid, dt)
    return _cnn2d_chain_scores_tf(folded, h, apply_sigmoid, dt)


def predict_scores_fast(
    variables: dict,
    ds,
    batch_size: int = 512,
    swap_tf: bool = True,
    apply_sigmoid: bool = True,
    compute_dtype: Any = jnp.bfloat16,
    stats=None,
    ingest_int8: bool = False,
):
    """Score a whole :class:`~dfac_tpu.data.pipeline.ArrayDataset` through
    the folded-BN serving chain; returns (N,) float32 in dataset order.

    The fast counterpart of
    :func:`dfac_tpu.train.evaluate.predict_scores` for CNN2D checkpoints
    (the production serving path used by ``bench.py``; ~28.6k utt/s on one
    v5e at the B=128 sweet spot measured end-to-end with the LFCC
    front-end — see ``results/v5e_measurements.md``). ``swap_tf``
    mirrors the reference predict CLI semantics (``src/predict.py:100-111``):
    True means features are stored (F, T) and the model sees the transposed
    grid — here realized transpose-free via the swapped-kernel formulation.
    ``ingest_int8`` uploads int8-quantized rows + per-group scales (half
    the link bytes of bf16) and dequantizes fused into the first conv —
    for transfer-bound hosts; scores shift by the quantization step only.
    """
    from dfac_tpu.train.evaluate import collect_masked_scores

    folded = fold_cnn2d(variables)
    if ingest_int8:
        return collect_masked_scores(
            lambda qs: cnn2d_fast_scores_q8(
                folded, qs[0], qs[1], swap_tf=swap_tf,
                apply_sigmoid=apply_sigmoid, compute_dtype=compute_dtype,
            ),
            ds, batch_size,
            prepare_batch=lambda b: _ingest_q8(b.features),
            stats=stats,
        )
    score = cnn2d_fast_scores if swap_tf else cnn2d_fast_scores_tf
    return collect_masked_scores(
        lambda feats: score(
            folded, feats,
            apply_sigmoid=apply_sigmoid, compute_dtype=compute_dtype,
        ),
        ds, batch_size,
        # host stage (memmap pull + bf16 cast + async upload) runs in the
        # prefetch thread, overlapping device scoring of the prior batch
        prepare_batch=lambda b: _ingest(b.features, compute_dtype),
        stats=stats,
    )


def _ingest(feats_np, compute_dtype, sharding=None):
    """Host -> device upload of a feature batch for the fast chains.

    When the chain computes in bf16 its FIRST op is ``astype(bf16)`` — so
    casting on the HOST first is bit-identical and halves the bytes moved
    over PCIe/the relay (the ingest bottleneck of disk -> scores serving;
    see results/v5e_measurements.md round 3). The transfer is async
    (``device_put`` returns immediately), so upload of batch k+1 overlaps
    scoring of batch k inside ``collect_masked_scores``'s dispatch queue.
    ``sharding`` (e.g. ``batch_sharding(mesh)``) lands slices directly on
    their chips for the data-parallel scorers — the ONE copy of the
    ingest logic for single-chip and sharded serving alike.
    """
    if compute_dtype == jnp.bfloat16:
        from dfac_tpu.io.fastcast import cast_bf16

        # multithreaded native cast (bit-exact with ml_dtypes astype,
        # numpy fallback inside) — the cast reads straight from the
        # memmap view, so page faults parallelize too
        return jax.device_put(cast_bf16(np.asarray(feats_np)), sharding)
    return jax.device_put(np.ascontiguousarray(feats_np), sharding)


def _ingest_q8(feats_np, sharding=None):
    """int8 host -> device upload: quantize rows per (utterance, group)
    on the host (native multithreaded kernel) and upload ``(q, scales)``
    — half the link bytes of the bf16 :func:`_ingest`, for
    transfer-bound hosts (thin PCIe, the bench rig's relay). Both
    uploads are async; ``sharding`` (batch-axis) applies to both arrays
    (scales shard on the same leading utterance axis)."""
    from dfac_tpu.io.fastcast import quant_i8

    q, scales = quant_i8(np.asarray(feats_np))
    return jax.device_put(q, sharding), jax.device_put(scales, sharding)


def fold_cnn1d(variables: dict, num_blocks: int = 3, eps: float = 1e-5) -> dict:
    """Fold BatchNorm1d stats into the CNN1D conv kernels/biases
    (reference eval path ``src/model_cnn1d.py:37-46``). The folding
    algebra is rank-agnostic (the scale broadcasts on the kernel's last
    axis), so this is :func:`fold_cnn2d` applied to (K, CI, CO) kernels."""
    return fold_cnn2d(variables, num_blocks=num_blocks, eps=eps)
@functools.partial(jax.jit, static_argnames=("swap_tf", "apply_sigmoid", "compute_dtype"))
def cnn1d_fast_scores(
    folded: dict,
    feats: jax.Array,
    swap_tf: bool = True,
    apply_sigmoid: bool = True,
    compute_dtype: Any = jnp.bfloat16,
):
    """CNN1D serving chain with folded BN: features -> (B,) scores.

    ``swap_tf=True`` means ``feats`` is stored-orientation (B, F, T) and
    the 180 feature dims are the conv channels (reference
    ``src/predict.py:100-111`` transpose semantics). Equivalent to
    ``sigmoid(CNN1D.apply(vars, swap(feats)))`` with BN in eval mode;
    dropout is inert at eval so the chain is conv -> bias -> ReLU x3,
    mean over time, classifier matmul — one fused program.
    """
    dt = compute_dtype
    h = (jnp.swapaxes(feats, 1, 2) if swap_tf else feats).astype(dt)  # (B, T, F)
    return _cnn1d_chain_scores(folded, h, apply_sigmoid, dt)


def _cnn1d_chain_scores(folded, h, apply_sigmoid, dt):
    """The folded CNN1D chain body: ``h`` is (B, T, F) in ``dt``."""
    for i in (1, 2, 3):
        h = jax.lax.conv_general_dilated(
            h, folded[f"w{i}"].astype(dt), (1,), "SAME",
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32,
        )
        h = jnp.maximum(h + folded[f"b{i}"], 0.0).astype(dt)
    hm = jnp.mean(h.astype(jnp.float32), axis=1)  # (B, C)
    logits = hm.astype(dt) @ folded["w_cls"].astype(dt) + folded["b_cls"]
    logits = logits[:, 0].astype(jnp.float32)
    return jax.nn.sigmoid(logits) if apply_sigmoid else logits


@functools.partial(
    jax.jit, static_argnames=("swap_tf", "apply_sigmoid", "compute_dtype")
)
def cnn1d_fast_scores_q8(
    folded: dict,
    q: jax.Array,
    scales: jax.Array,
    swap_tf: bool = True,
    apply_sigmoid: bool = True,
    compute_dtype: Any = jnp.bfloat16,
):
    """int8-quantized features -> (B,) scores through the folded CNN1D
    chain (see :func:`cnn2d_fast_scores_q8` for the quantization
    contract). The dequantize happens in the QUANTIZED orientation, then
    the swap — scales always broadcast over the axis they grouped."""
    dt = compute_dtype
    x = _dequant8(q, scales, dt)
    h = jnp.swapaxes(x, 1, 2) if swap_tf else x  # (B, T, F)
    return _cnn1d_chain_scores(folded, h, apply_sigmoid, dt)


def fold_cae(variables: dict, eps: float = 1e-5) -> dict:
    """Fold the ConvAutoencoder's eval-mode BatchNorms into its conv /
    conv-transpose kernels and biases.

    Encoder blocks 1-4 (``enc_conv{i}`` + ``enc_bn{i}``) fold exactly like
    the classifier convs. Decoder blocks 1-3 (``dec_convt{i}`` +
    ``dec_bn{i}``): the transposed-conv's ``output_padding`` rows carry
    only the bias pre-BN, and the folded bias ``(b - mean)*inv + shift``
    reproduces BN(bias) on those rows too, so folding stays exact. Block 4
    has no BN (reference ``src/model_cae.py:61-81``) and passes through.
    """
    p = variables["params"]
    bs = variables["batch_stats"]
    folded = {}
    for i in range(1, 5):
        folded[f"enc_w{i}"], folded[f"enc_b{i}"] = _fold_bn(
            p[f"enc_conv{i}"]["conv"]["kernel"], p[f"enc_conv{i}"]["conv"]["bias"],
            p[f"enc_bn{i}"], bs[f"enc_bn{i}"], eps,
        )
    for i in range(1, 5):
        if i < 4:
            folded[f"dec_w{i}"], folded[f"dec_b{i}"] = _fold_bn(
                p[f"dec_convt{i}"]["convt"]["kernel"], p[f"dec_convt{i}"]["bias"],
                p[f"dec_bn{i}"], bs[f"dec_bn{i}"], eps,
            )
        else:
            folded[f"dec_w{i}"] = jnp.asarray(p[f"dec_convt{i}"]["convt"]["kernel"], jnp.float32)
            folded[f"dec_b{i}"] = jnp.asarray(p[f"dec_convt{i}"]["bias"], jnp.float32)
    return folded


@functools.partial(jax.jit, static_argnames=("swap_tf", "compute_dtype"))
def cae_fast_mse(
    folded: dict,
    feats: jax.Array,
    mean: jax.Array,
    std: jax.Array,
    swap_tf: bool = True,
    compute_dtype: Any = jnp.bfloat16,
):
    """Normalize -> folded encoder/decoder -> per-sample MSE as ONE program.

    The CAE leg of the hybrid submission path (reference
    ``src/predict_hybrid.py:66-78``: ``NormedFeatureDataset`` + per-sample
    ``MSE(CAE(norm(x^T)))``), with eval-mode BN folded into the convs and
    the floor-mode (2,2) pools as stride-2 depthwise convolutions. Returns
    (B,) float32 per-sample reconstruction MSE over (T, F).
    """
    dt = compute_dtype
    x = jnp.swapaxes(feats, 1, 2) if swap_tf else feats  # (B, T, F)
    if x.shape[1] < 16 or x.shape[2] < 16:
        # same contract as ConvAutoencoder.__call__: the 4-stage floor-pool
        # chain needs a nonempty bottleneck
        raise ValueError(
            "cae_fast_mse needs T >= 16 and F >= 16 so the 4-stage "
            f"floor-pool chain keeps a nonempty bottleneck; got {x.shape[1:]}."
        )
    x = (x.astype(jnp.float32) - mean) / std
    t_orig = x.shape[1]
    h = x[..., None].astype(dt)

    t_sizes, f_sizes = [], []
    for i in (1, 2, 3, 4):
        h = jax.lax.conv_general_dilated(
            h, folded[f"enc_w{i}"].astype(dt), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        h = jnp.maximum(h + folded[f"enc_b{i}"], 0.0).astype(dt)
        t_sizes.append(h.shape[1])
        f_sizes.append(h.shape[2])
        h = _depthwise_avg_pool(h, (2, 2))

    # decoder output_padding from the encoder shape trace — THE rule from
    # models/cae.py (T's output stage stays 0: emit-then-pad semantics)
    from dfac_tpu.models.cae import decoder_output_paddings

    t_pads, f_pads = decoder_output_paddings(t_sizes, f_sizes)
    for i, (op_t, op_f) in enumerate(zip(t_pads, f_pads), start=1):
        h = jax.lax.conv_transpose(
            h, folded[f"dec_w{i}"].astype(dt), (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        if op_t or op_f:
            h = jnp.pad(h, ((0, 0), (0, op_t), (0, op_f), (0, 0)))
        h = h + folded[f"dec_b{i}"]
        if i < 4:
            h = jnp.maximum(h, 0.0)
        h = h.astype(dt)

    t_recon = h.shape[1]
    if t_recon < t_orig:
        h = jnp.pad(h, ((0, 0), (0, t_orig - t_recon), (0, 0), (0, 0)))
    elif t_recon > t_orig:
        h = h[:, :t_orig]
    recon = h[..., 0].astype(jnp.float32)  # (B, T, F)
    return jnp.mean(jnp.square(recon - x), axis=(1, 2))


def predict_scores_fast_cnn1d(
    variables: dict,
    ds,
    batch_size: int = 512,
    swap_tf: bool = True,
    apply_sigmoid: bool = True,
    compute_dtype: Any = jnp.bfloat16,
    stats=None,
    ingest_int8: bool = False,
):
    """Whole-dataset CNN1D scoring through the folded-BN chain; (N,) f32.

    ``ingest_int8`` as in :func:`predict_scores_fast`."""
    from dfac_tpu.train.evaluate import collect_masked_scores

    folded = fold_cnn1d(variables)
    if ingest_int8:
        return collect_masked_scores(
            lambda qs: cnn1d_fast_scores_q8(
                folded, qs[0], qs[1], swap_tf=swap_tf,
                apply_sigmoid=apply_sigmoid, compute_dtype=compute_dtype,
            ),
            ds, batch_size,
            prepare_batch=lambda b: _ingest_q8(b.features),
            stats=stats,
        )
    return collect_masked_scores(
        lambda feats: cnn1d_fast_scores(
            folded, feats, swap_tf=swap_tf,
            apply_sigmoid=apply_sigmoid, compute_dtype=compute_dtype,
        ),
        ds, batch_size,
        prepare_batch=lambda b: _ingest(b.features, compute_dtype),
        stats=stats,
    )


def cae_mse_scores_fast(
    variables: dict,
    ds,
    normalizer,
    batch_size: int = 128,
    swap_tf: bool = True,
    compute_dtype: Any = jnp.bfloat16,
):
    """Whole-dataset CAE per-sample MSE through the folded one-program
    chain (the fast counterpart of
    :func:`dfac_tpu.train.cae_loop.cae_mse_scores`); (N,) f32 in order."""
    from dfac_tpu.train.evaluate import collect_masked_scores

    folded = fold_cae(variables)
    mean = jnp.asarray(normalizer.mean)
    std = jnp.asarray(normalizer.std)
    return collect_masked_scores(
        lambda feats: cae_fast_mse(
            folded, feats, mean, std,
            swap_tf=swap_tf, compute_dtype=compute_dtype,
        ),
        ds, batch_size,
        # f32 upload, NOT the bf16 _ingest cast: cae_fast_mse normalizes
        # and forms its per-sample MSE TARGET in f32 from the raw input
        # (only the encoder/decoder run in compute_dtype) — pre-quantizing
        # the input would silently shift every score
        prepare_batch=lambda b: jax.device_put(np.ascontiguousarray(b.features)),
    )


@functools.partial(jax.jit, static_argnames=("apply_sigmoid", "compute_dtype"))
def cnn2d_fast_scores_tf(
    folded: dict,
    feats_tf: jax.Array,
    apply_sigmoid: bool = True,
    compute_dtype: Any = jnp.bfloat16,
):
    """Swapped-orientation (B, T, F) features -> (B,) scores.

    The CNN2D-native grid (reference ``src/model.py:33-42`` after its
    transpose): kernels used as stored, pooling (2, 1) over time, mean over
    axis 1. Composes with the GEMM front-end's natural (B, T, 180) output
    (:func:`dfac_tpu.ops.pallas.gemm_frontend.gemm_lfcc_features_tf`) so the
    end-to-end serving chain contains NO transposes at all. Same math as
    ``sigmoid(CNN2D.apply(vars, feats_tf))`` with BN folded.
    """
    dt = compute_dtype
    h = feats_tf.astype(dt)[..., None]  # (B, T, F, 1): grid is (T, F)
    return _cnn2d_chain_scores_tf(folded, h, apply_sigmoid, dt)


def _cnn2d_chain_scores_tf(folded, h, apply_sigmoid, dt):
    """The TF-grid folded chain body: ``h`` is (B, T, F, 1) in ``dt``."""
    for i in (1, 2, 3):
        h = jax.lax.conv_general_dilated(
            h, folded[f"w{i}"].astype(dt), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        h = jnp.maximum(h + folded[f"b{i}"], 0.0)
        if i < 3:
            h = _depthwise_avg_pool(h.astype(dt), (2, 1))  # pool T (axis 1)
        else:
            h = h.astype(dt)
    hm = jnp.mean(h.astype(jnp.float32), axis=1)  # mean over time -> (B, F, C)
    emb = jnp.swapaxes(hm, 1, 2).reshape(hm.shape[0], -1)  # channel-major
    logits = emb.astype(dt) @ folded["w_cls"].astype(dt) + folded["b_cls"]
    logits = logits[:, 0].astype(jnp.float32)
    return jax.nn.sigmoid(logits) if apply_sigmoid else logits


def fold_detector(variables: dict, eps: float = 1e-5) -> dict:
    """Fold the detector's three BatchNorm1d layers into the encoder conv
    kernels/biases (eval-mode affine algebra, same as :func:`fold_cnn2d`).
    ``variables`` is the eval variable dict (EMA params when the trainer
    ran with ``--ema``). Reference eval chain: ``src/dlqueen_model.py:131-173``.
    """
    p, bs = variables["params"], variables["batch_stats"]
    folded = {}
    for i in (1, 2, 3):
        folded[f"w{i}"], folded[f"b{i}"] = _fold_bn(
            p[f"enc_conv{i}"]["conv"]["kernel"], p[f"enc_conv{i}"]["conv"]["bias"],
            p[f"enc_bn{i}"], bs[f"enc_bn{i}"], eps,
        )
    for j in (1, 2):
        folded[f"fc{j}_w"] = jnp.asarray(p[f"head_fc{j}"]["dense"]["kernel"], jnp.float32)
        folded[f"fc{j}_b"] = jnp.asarray(p[f"head_fc{j}"]["dense"]["bias"], jnp.float32)
    return folded


@functools.partial(jax.jit, static_argnames=("swap_tf", "apply_sigmoid", "compute_dtype"))
def detector_fast_scores(
    folded: dict,
    feats: jax.Array,
    lengths: jax.Array,
    swap_tf: bool = True,
    apply_sigmoid: bool = False,
    compute_dtype: Any = jnp.bfloat16,
):
    """Detector serving chain with folded BN: features -> (B,) logits/scores.

    ``swap_tf=True`` means ``feats`` is stored-orientation (B, C, T); the
    masked StatsPool and the exact-GELU head run in f32 exactly as the
    model does. Equivalent to ``DeepfakeDetector.apply`` in eval mode
    (dropout inert): conv -> folded-BN bias -> GELU x3, masked mean+std
    pool, fc1 -> GELU -> fc2 — one fused program, no separate BN passes.
    """
    from dfac_tpu.models.detector import stats_pool

    dt = compute_dtype
    h = (jnp.swapaxes(feats, 1, 2) if swap_tf else feats).astype(dt)  # (B, T, C)
    for i in (1, 2, 3):
        h = jax.lax.conv_general_dilated(
            h, folded[f"w{i}"].astype(dt), (1,), "SAME",
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32,
        )
        h = jax.nn.gelu(h + folded[f"b{i}"], approximate=False).astype(dt)
    z = stats_pool(h.astype(jnp.float32), lengths)  # (B, 2*hidden), f32
    z = jax.nn.gelu(
        z.astype(dt) @ folded["fc1_w"].astype(dt) + folded["fc1_b"],
        approximate=False,
    )
    logits = z.astype(dt) @ folded["fc2_w"].astype(dt) + folded["fc2_b"]
    logits = logits[:, 0].astype(jnp.float32)
    return jax.nn.sigmoid(logits) if apply_sigmoid else logits


def detector_scores_fast(
    variables: dict,
    ds,
    lengths: np.ndarray,
    batch_size: int = 128,
    swap_tf: bool = True,
    apply_sigmoid: bool = False,
    compute_dtype: Any = jnp.bfloat16,
):
    """Score a whole dataset through the folded detector chain; (N,) f32 in
    dataset order. The fast counterpart of
    :func:`dfac_tpu.train.detector_loop.detector_scores`, routed through
    the shared :func:`collect_masked_scores` batching/prefetch contract —
    host ingest (memmap pull + bf16 cast + async upload) runs in the
    prefetch thread, per-batch results stay on device until one final
    fetch, pad rows drop via the weight mask."""
    from dfac_tpu.train.evaluate import collect_masked_scores

    folded = fold_detector(variables)
    lengths = np.asarray(lengths)

    def prepare(b):
        # pad rows (index -1) borrow row 0's length; the weight mask drops
        # their scores before the caller sees them
        lens = lengths[np.maximum(b.index, 0)]
        return (
            _ingest(b.features, compute_dtype),
            jax.device_put(jnp.asarray(lens)),
        )

    return collect_masked_scores(
        lambda fl: detector_fast_scores(
            folded, fl[0], fl[1], swap_tf=swap_tf,
            apply_sigmoid=apply_sigmoid, compute_dtype=compute_dtype,
        ),
        ds, batch_size, prepare_batch=prepare,
    )
