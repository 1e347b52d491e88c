"""Export flax model variables to a PyTorch-compatible state_dict.

The inverse of :mod:`dfac_tpu.utils.torch_import`: models trained in this
framework can be handed back to reference-project tooling (its predict /
eval / ensemble scripts load raw ``state_dict`` checkpoints). The mapping
tables are shared with the importer, so export∘import is the identity and
layout conversions stay in one place.
"""

from __future__ import annotations

import numpy as np

from dfac_tpu.utils.torch_import import _mapping


def _get(tree: dict, path: tuple[str, ...]) -> np.ndarray:
    node = tree
    for p in path:
        node = node[p]
    return np.asarray(node)


def flax_to_torch(model_name: str, variables: dict) -> dict[str, np.ndarray]:
    """flax ``{'params', 'batch_stats'}`` -> flat torch-style state_dict
    (numpy values; pass through ``torch.save`` after ``torch.from_numpy``
    if a .pt file is needed)."""
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    sd: dict[str, np.ndarray] = {}

    for torch_prefix, kind, flax_path in _mapping(model_name):
        if kind == "bn":
            sd[f"{torch_prefix}.weight"] = _get(params, flax_path + ("scale",))
            sd[f"{torch_prefix}.bias"] = _get(params, flax_path + ("bias",))
            sd[f"{torch_prefix}.running_mean"] = _get(batch_stats, flax_path + ("mean",))
            sd[f"{torch_prefix}.running_var"] = _get(batch_stats, flax_path + ("var",))
            sd[f"{torch_prefix}.num_batches_tracked"] = np.asarray(0, np.int64)
        elif kind == "linear":
            k = _get(params, flax_path + ("kernel",))
            sd[f"{torch_prefix}.weight"] = np.ascontiguousarray(k.T)
            sd[f"{torch_prefix}.bias"] = _get(params, flax_path + ("bias",))
        elif kind == "conv2d":
            k = _get(params, flax_path + ("kernel",))  # (kh,kw,I,O)
            sd[f"{torch_prefix}.weight"] = np.ascontiguousarray(np.transpose(k, (3, 2, 0, 1)))
            sd[f"{torch_prefix}.bias"] = _get(params, flax_path + ("bias",))
        elif kind == "conv1d":
            k = _get(params, flax_path + ("kernel",))  # (k,I,O)
            sd[f"{torch_prefix}.weight"] = np.ascontiguousarray(np.transpose(k, (2, 1, 0)))
            sd[f"{torch_prefix}.bias"] = _get(params, flax_path + ("bias",))
        elif kind == "convt2d":
            k = _get(params, flax_path + ("convt", "kernel"))  # (kh,kw,I,O) flipped
            sd[f"{torch_prefix}.weight"] = np.ascontiguousarray(
                np.transpose(k, (2, 3, 0, 1))[:, :, ::-1, ::-1]
            )
            sd[f"{torch_prefix}.bias"] = _get(params, flax_path + ("bias",))
        elif kind == "gru":
            base, layer = torch_prefix.split("#l")
            rows_i, rows_h, bias_i, bias_h = [], [], [], []
            for g, iname, hname in (("r", "ir", "hr"), ("z", "iz", "hz"), ("n", "in", "hn")):
                rows_i.append(_get(params, flax_path + (iname, "kernel")).T)
                rows_h.append(_get(params, flax_path + (hname, "kernel")).T)
                bias_i.append(_get(params, flax_path + (iname, "bias")))
                if g == "n":
                    bias_h.append(_get(params, flax_path + (hname, "bias")))
                else:
                    # torch splits the gate bias across b_ih/b_hh; flax folds
                    # them — put the whole bias on the input side, zero on hh
                    bias_h.append(np.zeros_like(bias_i[-1]))
            sd[f"{base}.weight_ih_l{layer}"] = np.ascontiguousarray(np.concatenate(rows_i, 0))
            sd[f"{base}.weight_hh_l{layer}"] = np.ascontiguousarray(np.concatenate(rows_h, 0))
            sd[f"{base}.bias_ih_l{layer}"] = np.concatenate(bias_i)
            sd[f"{base}.bias_hh_l{layer}"] = np.concatenate(bias_h)
        else:  # pragma: no cover
            raise ValueError(kind)
    return sd


def save_torch_checkpoint(model_name: str, variables: dict, path: str) -> None:
    """Write a ``.pt`` loadable by reference consumers (requires torch)."""
    import torch

    sd = flax_to_torch(model_name, variables)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v).copy()) if np.ndim(v) else torch.tensor(v)
                for k, v in sd.items()}, path)
