"""Import PyTorch reference checkpoints into the flax model zoo.

Weight-layout conversions (torch -> flax NHWC/channels-last):

* Conv2d ``(O, I, kh, kw)`` -> ``(kh, kw, I, O)``
* Conv1d ``(O, I, k)`` -> ``(k, I, O)``
* ConvTranspose2d ``(I, O, kh, kw)`` -> ``(kh, kw, O, I)`` with spatial flip
  (lax.conv_transpose correlates where torch's gradient-of-conv flips)
* Linear ``(O, I)`` -> ``(I, O)``
* BatchNorm ``weight/bias/running_mean/running_var`` ->
  ``scale/bias`` params + ``mean/var`` batch_stats
* GRU ``weight_ih_l0`` row-blocks ``[r; z; n]`` -> GRUCell ``ir/iz/in``
  kernels; torch's duplicated gate biases ``b_ir + b_hr`` fold into the
  flax input-side bias (an exact reparametrization).

Every architecture in the registry has a mapping table, so any reference
``*_best.pt`` (wrapped dict or raw state_dict, reference
``src/training/checkpoint.py:42-71``) loads into the corresponding flax
model with bit-equivalent inference semantics (verified by
``tests/test_torch_parity.py``).
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _conv2d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _conv1d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 1, 0))


def _convt2d(w: np.ndarray) -> np.ndarray:
    # torch (I, O, kh, kw); flax ConvTranspose kernel is (kh, kw, I, O) and
    # lax.conv_transpose does not flip the kernel, while torch's transposed
    # conv is the gradient of a correlation => flip spatially.
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))


def _linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.ascontiguousarray(value.astype(np.float32))


# Mapping entry kinds: conv2d | conv1d | convt2d | linear | bn | convt_bias
def _conv_block(torch_idx: int, flax_name: str, kind: str, prefix: str = "conv"):
    return [(f"{prefix}.{torch_idx}", kind, (flax_name, "conv"))]


def _bn(torch_idx: int, flax_name: str, prefix: str = "conv"):
    return [(f"{prefix}.{torch_idx}", "bn", (flax_name,))]


def _mapping(model_name: str) -> list[tuple[str, str, tuple[str, ...]]]:
    m: list[tuple[str, str, tuple[str, ...]]] = []
    if model_name in ("cnn2d", "cnn2d_spatial"):
        for i, (ci, bi) in enumerate([(0, 1), (5, 6), (10, 11)], 1):
            m += _conv_block(ci, f"conv{i}", "conv2d") + _bn(bi, f"bn{i}")
        m.append(("classifier", "linear", ("classifier", "dense")))
    elif model_name == "cnn1d":
        for i, (ci, bi) in enumerate([(0, 1), (4, 5), (8, 9)], 1):
            m += _conv_block(ci, f"conv{i}", "conv1d") + _bn(bi, f"bn{i}")
        m.append(("classifier", "linear", ("classifier", "dense")))
    elif model_name in ("cnn1d_spatial", "cnn1d_archive"):
        for i, (ci, bi) in enumerate([(0, 1), (4, 5), (8, 9)], 1):
            m += _conv_block(ci, f"conv{i}", "conv1d") + _bn(bi, f"bn{i}")
        m.append(("classifier", "linear", ("classifier", "dense")))
    elif model_name == "cae":
        for i, (ci, bi) in enumerate([(0, 1), (4, 5), (8, 9), (12, 13)], 1):
            m += _conv_block(ci, f"enc_conv{i}", "conv2d", prefix="encoder")
            m += _bn(bi, f"enc_bn{i}", prefix="encoder")
        for i, ti in enumerate([0, 3, 6, 9], 1):
            m.append((f"decoder.{ti}", "convt2d", (f"dec_convt{i}",)))
        for i, bi in enumerate([1, 4, 7], 1):
            m += _bn(bi, f"dec_bn{i}", prefix="decoder")
    elif model_name == "detector":
        for i, (ci, bi) in enumerate([(0, 1), (4, 5), (8, 9)], 1):
            m += _conv_block(ci, f"enc_conv{i}", "conv1d", prefix="enc.net")
            m += _bn(bi, f"enc_bn{i}", prefix="enc.net")
        m.append(("head.0", "linear", ("head_fc1", "dense")))
        m.append(("head.3", "linear", ("head_fc2", "dense")))
    elif model_name in ("meanpool_mlp", "statspool_mlp"):
        for i, li in enumerate([0, 3, 6], 1):
            m.append((f"feature_extractor.{li}", "linear", (f"fc{i}", "dense")))
    elif model_name == "cnn2d_robust":
        for b in range(1, 4):
            for j, (ci, bi) in enumerate([(0, 1), (3, 4)], 1):
                m += _conv_block(ci, f"block{b}_conv{j}", "conv2d", prefix=f"block{b}")
                m += _bn(bi, f"block{b}_bn{j}", prefix=f"block{b}")
        m.append(("se.1", "conv2d", ("se_fc1", "conv")))
        m.append(("se.3", "conv2d", ("se_fc2", "conv")))
        m.append(("attention_pool", "linear", ("attention_pool", "dense")))
        m.append(("classifier.1", "linear", ("head_fc1", "dense")))
        m.append(("classifier.4", "linear", ("head_fc2", "dense")))
    elif model_name in ("crnn", "crnn2"):
        for i, (ci, bi) in enumerate([(0, 1), (5, 6)], 1):
            m += _conv_block(ci, f"conv{i}", "conv2d") + _bn(bi, f"bn{i}")
        num_layers = 2 if model_name == "crnn2" else 1
        for layer in range(num_layers):
            m.append((f"rnn#l{layer}", "gru", (f"gru{layer + 1}", "cell")))
        m.append(("classifier", "linear", ("classifier", "dense")))
    else:
        raise ValueError(f"no torch import mapping for model '{model_name}'")
    return m


def torch_to_flax(model_name: str, state_dict: dict[str, np.ndarray]) -> dict[str, Any]:
    """Convert a torch state_dict into flax ``{'params': ..., 'batch_stats': ...}``."""
    params: dict = {}
    batch_stats: dict = {}
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    for torch_prefix, kind, flax_path in _mapping(model_name):
        if kind == "bn":
            _set(params, flax_path + ("scale",), sd[f"{torch_prefix}.weight"])
            _set(params, flax_path + ("bias",), sd[f"{torch_prefix}.bias"])
            _set(batch_stats, flax_path + ("mean",), sd[f"{torch_prefix}.running_mean"])
            _set(batch_stats, flax_path + ("var",), sd[f"{torch_prefix}.running_var"])
        elif kind == "linear":
            _set(params, flax_path + ("kernel",), _linear(sd[f"{torch_prefix}.weight"]))
            if f"{torch_prefix}.bias" in sd:
                _set(params, flax_path + ("bias",), sd[f"{torch_prefix}.bias"])
        elif kind in ("conv2d", "conv1d"):
            conv = _conv2d if kind == "conv2d" else _conv1d
            _set(params, flax_path + ("kernel",), conv(sd[f"{torch_prefix}.weight"]))
            if f"{torch_prefix}.bias" in sd:
                _set(params, flax_path + ("bias",), sd[f"{torch_prefix}.bias"])
        elif kind == "convt2d":
            _set(params, flax_path + ("convt", "kernel"), _convt2d(sd[f"{torch_prefix}.weight"]))
            if f"{torch_prefix}.bias" in sd:
                _set(params, flax_path + ("bias",), sd[f"{torch_prefix}.bias"])
        elif kind == "gru":
            base, layer = torch_prefix.split("#l")
            w_ih = sd[f"{base}.weight_ih_l{layer}"]
            w_hh = sd[f"{base}.weight_hh_l{layer}"]
            b_ih = sd.get(f"{base}.bias_ih_l{layer}")
            b_hh = sd.get(f"{base}.bias_hh_l{layer}")
            h = w_hh.shape[1]
            blocks_i = {g: w_ih[i * h : (i + 1) * h] for i, g in enumerate("rzn")}
            blocks_h = {g: w_hh[i * h : (i + 1) * h] for i, g in enumerate("rzn")}
            bias_i = {g: b_ih[i * h : (i + 1) * h] for i, g in enumerate("rzn")} if b_ih is not None else None
            bias_h = {g: b_hh[i * h : (i + 1) * h] for i, g in enumerate("rzn")} if b_hh is not None else None
            for g, iname, hname in (("r", "ir", "hr"), ("z", "iz", "hz"), ("n", "in", "hn")):
                _set(params, flax_path + (iname, "kernel"), _linear(blocks_i[g]))
                _set(params, flax_path + (hname, "kernel"), _linear(blocks_h[g]))
                if bias_i is not None:
                    # hr/hz have no flax bias: fold b_hh into the input-side
                    # bias for r/z; for n the recurrent bias lives on hn
                    # (multiplied by the reset gate, exactly as in torch).
                    if g == "n":
                        _set(params, flax_path + (iname, "bias"), bias_i[g])
                        if bias_h is not None:
                            _set(params, flax_path + (hname, "bias"), bias_h[g])
                    else:
                        b = bias_i[g] + (bias_h[g] if bias_h is not None else 0)
                        _set(params, flax_path + (iname, "bias"), b)
        else:  # pragma: no cover
            raise ValueError(f"unknown mapping kind {kind}")

    out: dict[str, Any] = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def load_reference_checkpoint(model_name: str, path: str) -> dict[str, Any]:
    """One-call import: read a reference ``.pt`` and return flax variables."""
    from dfac_tpu.utils.torch_checkpoint import extract_state_dict, load_torch_checkpoint

    return torch_to_flax(model_name, extract_state_dict(load_torch_checkpoint(path)))
