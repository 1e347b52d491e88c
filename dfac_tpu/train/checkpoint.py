"""Checkpoint subsystem.

Feature-parity target: reference ``src/training/checkpoint.py`` — a single
file holding ``{model_state, optimizer_state, epoch, config,
scheduler_state?}`` with a ~17-field hyperparameter snapshot
(``build_config_dict``, reference ``:8-39``), plus the tolerance rule that
consumers accept both wrapped dicts and raw model states
(``src/evaluation.py:197-200``).

Format: a pickled dict whose arrays are host numpy (device-independent,
readable without jax). ``load_model_variables`` additionally accepts
reference PyTorch ``.pt`` checkpoints and converts them through
:mod:`dfac_tpu.utils.torch_import`, so trained reference models drop
straight into the TPU inference path.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda a: np.asarray(jax.device_get(a)), tree)


def build_config_dict(args: Any) -> dict:
    """Snapshot hyperparameters from an argparse Namespace / dataclass
    (reference ``src/training/checkpoint.py:8-39``)."""
    fields = [
        "model", "batch_size", "epochs", "lr", "weight_decay", "early_stop",
        "lr_scheduler", "lr_scheduler_metric", "lr_scheduler_factor",
        "lr_scheduler_patience", "lr_scheduler_threshold", "lr_scheduler_min_lr",
        "in_features", "hidden_dim", "dropout", "seed", "label_smoothing",
        "swap_tf", "spec_augment",
    ]
    src = vars(args) if not isinstance(args, dict) else args
    return {k: src[k] for k in fields if k in src}


def save_checkpoint(
    path: str,
    variables: dict,
    opt_state: Any = None,
    epoch: int = 0,
    config: dict | None = None,
    scheduler_state: dict | None = None,
) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {
        "format": "dfac_tpu.v1",
        "model_state": _to_numpy(variables),
        "optimizer_state": None if opt_state is None else _to_numpy(opt_state),
        "epoch": int(epoch),
        "config": config or {},
    }
    if scheduler_state is not None:
        payload["scheduler_state"] = scheduler_state
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_checkpoint(path: str) -> dict:
    if os.path.isdir(path):  # orbax checkpoint directory
        return load_checkpoint_orbax(path)
    with open(path, "rb") as f:
        ckpt = pickle.load(f)
    if isinstance(ckpt, dict) and "model_state" in ckpt:
        return ckpt
    # raw variables pytree (params/batch_stats) — wrap it
    return {"model_state": ckpt, "optimizer_state": None, "epoch": 0, "config": {}}


def save_checkpoint_fmt(fmt: str, path: str, variables: dict, **kw) -> None:
    """Format-dispatched save: ``"pickle"`` (single file, reference-style)
    or ``"orbax"`` (atomic checkpoint directory). Same payload either way;
    :func:`load_checkpoint` auto-detects on read."""
    if fmt == "orbax":
        return save_checkpoint_orbax(path, variables, **kw)
    if fmt != "pickle":
        raise ValueError(f"unknown checkpoint format {fmt!r} (pickle | orbax)")
    return save_checkpoint(path, variables, **kw)


def save_checkpoint_orbax(
    path: str,
    variables: dict,
    opt_state: Any = None,
    epoch: int = 0,
    config: dict | None = None,
    scheduler_state: dict | None = None,
) -> None:
    """Orbax-format checkpoint (atomic directory writes, ecosystem-standard
    pytree layout) — the production alternative to the single-file pickle
    format, carrying the SAME full train state (model variables, optimizer
    state, epoch, config snapshot, scheduler state). ``path`` becomes a
    checkpoint *directory*.

    The optimizer state's array leaves ride in the orbax tree; its pytree
    structure (optax namedtuples) is stored as a pickled treedef sidecar and
    re-applied on load, so a restored checkpoint feeds straight back into
    ``optax`` updates.
    """
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    tree = {"model_state": _to_numpy(variables)}
    opt_treedef = None
    if opt_state is not None:
        leaves, opt_treedef = jax.tree.flatten(_to_numpy(opt_state))
        tree["opt_leaves"] = {f"{i:05d}": leaf for i, leaf in enumerate(leaves)}
    with ocp.StandardCheckpointer() as ckptr:
        # StandardCheckpointer handles array pytrees; scalar/string metadata
        # rides in a JSON sidecar inside the checkpoint directory.
        ckptr.save(path, tree, force=True)
    meta = {"epoch": int(epoch), "config": config or {}}
    if scheduler_state is not None:
        meta["scheduler_state"] = scheduler_state
    with open(os.path.join(path, "dfac_metadata.json"), "w") as f:
        json.dump(meta, f)
    if opt_treedef is not None:
        with open(os.path.join(path, "opt_treedef.pkl"), "wb") as f:
            pickle.dump(opt_treedef, f)


def load_checkpoint_orbax(path: str) -> dict:
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(path)
    if "model_state" in tree:
        model_state = tree["model_state"]
    else:  # round-1 layout: the variables tree saved bare
        model_state = tree
    opt_state = None
    treedef_path = os.path.join(path, "opt_treedef.pkl")
    if "opt_leaves" in tree and os.path.exists(treedef_path):
        with open(treedef_path, "rb") as f:
            opt_treedef = pickle.load(f)
        leaves = [tree["opt_leaves"][k] for k in sorted(tree["opt_leaves"])]
        opt_state = jax.tree.unflatten(opt_treedef, leaves)
    meta = {"epoch": 0, "config": {}}
    meta_path = os.path.join(path, "dfac_metadata.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return {"model_state": model_state, "optimizer_state": opt_state, **meta}


def load_model_variables(path: str, model_name: str | None = None) -> dict:
    """Load flax model variables from a dfac_tpu pickle checkpoint, an
    orbax checkpoint directory, or a reference PyTorch ``.pt`` file
    (auto-detected)."""
    if os.path.isdir(path):
        return load_checkpoint_orbax(path)["model_state"]
    with open(path, "rb") as f:
        head = f.read(4)
    if head[:2] == b"PK" or path.endswith(".pt"):  # torch zipfile / legacy
        if model_name is None:
            raise ValueError("model_name is required to import a torch checkpoint")
        from dfac_tpu.utils.torch_import import load_reference_checkpoint

        return load_reference_checkpoint(model_name, path)
    return load_checkpoint(path)["model_state"]
