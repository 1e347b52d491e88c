"""Shared CLI plumbing: flag groups mirroring the reference scripts."""

from __future__ import annotations

import argparse
import random

import numpy as np


def add_data_args(p: argparse.ArgumentParser, train: bool = True) -> None:
    if train:
        p.add_argument("--train-features", default="data/train/features.pkl")
        p.add_argument("--train-labels", default="data/train/labels.pkl")
    p.add_argument("--dev-features", default="data/dev/features.pkl")
    p.add_argument("--dev-labels", default="data/dev/labels.pkl")


def add_swap_tf_args(p: argparse.ArgumentParser, default: bool = True) -> None:
    """Mutually-exclusive --swap-tf/--no-swap-tf pair (reference
    ``src/train.py:232-245``; default swap **on**)."""
    g = p.add_mutually_exclusive_group()
    g.add_argument("--swap-tf", dest="swap_tf", action="store_true",
                   help="swap time and feature dimensions (T <-> F) (default)")
    g.add_argument("--no-swap-tf", dest="swap_tf", action="store_false",
                   help="disable time/feature swap")
    p.set_defaults(swap_tf=default)


def add_multihost_args(p: argparse.ArgumentParser, extra_help: str = "") -> None:
    """The --multihost flag group shared by every trainer/serving CLI."""
    p.add_argument("--multihost", action="store_true",
                   help="multi-host pod execution: run one copy of this CLI per "
                        "host (jax.distributed auto-detects on TPU pods; see the "
                        "--coordinator-* flags for CPU/GPU clusters). DP over ALL "
                        "global devices; artifacts from the coordinator only"
                        + (". " + extra_help if extra_help else ""))
    p.add_argument("--coordinator-address", default=None, metavar="HOST:PORT",
                   help="with --multihost off TPU pods: the rank-0 coordinator")
    p.add_argument("--num-processes", type=int, default=None,
                   help="with --coordinator-address: total process count")
    p.add_argument("--process-id", type=int, default=None,
                   help="with --coordinator-address: this process's rank")


def init_multihost(args) -> None:
    """Join the cluster (must run before anything touches the backend) and
    default ``args.data_parallel`` to the GLOBAL device count."""
    from dfac_tpu.parallel import multihost as mh

    mh.initialize(args.coordinator_address, args.num_processes, args.process_id)
    if not args.data_parallel:
        import jax

        args.data_parallel = len(jax.devices())


def add_augment_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--spec-augment", action="store_true",
                   help="enable SpecAugment during training")
    p.add_argument("--time-mask-ratio", type=float, default=0.2)
    p.add_argument("--feature-mask-ratio", type=float, default=0.1)
    p.add_argument("--feature-mask", action="store_true",
                   help="enable feature masking in addition to time masking")
    p.add_argument("--time-shift", action="store_true")
    p.add_argument("--time-shift-ratio", type=float, default=0.1)
    p.add_argument("--channel-drop", action="store_true")
    p.add_argument("--channel-drop-prob", type=float, default=0.1)
    p.add_argument("--gaussian-jitter", action="store_true")
    p.add_argument("--gaussian-jitter-std", type=float, default=0.01)


def augment_config_from_args(args) -> "AugmentConfig":
    from dfac_tpu.data.augment import AugmentConfig

    return AugmentConfig(
        spec_augment=args.spec_augment,
        time_mask_ratio=args.time_mask_ratio,
        feature_mask_ratio=args.feature_mask_ratio,
        feature_mask=args.feature_mask,
        time_shift=args.time_shift,
        time_shift_ratio=args.time_shift_ratio,
        channel_drop=args.channel_drop,
        channel_drop_prob=args.channel_drop_prob,
        gaussian_jitter=args.gaussian_jitter,
        gaussian_jitter_std=args.gaussian_jitter_std,
    )


def set_seed(seed: int) -> None:
    """Host-side seeding (device-side randomness is explicit PRNG keys)."""
    random.seed(seed)
    np.random.seed(seed)


def resolve_device(name: str | None = None) -> str:
    """Informational device resolve (jax picks the backend; this mirrors the
    reference's cuda->mps->cpu fallback as tpu->cpu)."""
    import jax

    if name:
        jax.config.update("jax_platforms", name)
    return jax.default_backend()
