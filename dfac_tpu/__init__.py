"""deep-fake-audio-classifier-tpu: TPU-native audio anti-spoofing framework.

A brand-new JAX/XLA/Pallas framework with the full capability surface of the
reference PyTorch project (kingdomseed/Deep-Fake-Audio-Classifier): binary
bonafide-vs-deepfake classification of utterances from LFCC+delta+delta-delta
features of shape [180, 321], scored by Equal Error Rate (EER).

Layered design (bottom-up):
  io        pickled-DataFrame contract (uttid / features / labels / predictions)
  features  raw-waveform -> LFCC/delta/delta-delta front-end (XLA + Pallas)
  data      device-side batching, normalization, PRNG-keyed augmentation
  models    flax model zoo (CNN2D, CNN1D, ConvAutoencoder, DeepfakeDetector, archive)
  ops       device-side metrics (EER) and Pallas TPU kernels
  train     jit train steps, optimizer policy, plateau scheduling, checkpoints
  parallel  jax.sharding Mesh construction + shard_map data/tensor parallelism
  ensemble  score averaging, hybrid CNN+CAE fusion, embedding anomaly scoring
  obs       training visualizers (rich / tqdm / noop event hooks)
  cli       argparse entry points mirroring the reference scripts
"""

__version__ = "0.1.0"

from dfac_tpu.ops.eer import calculate_eer, confusion_at_threshold, eer_device  # noqa: F401


def __getattr__(name):
    # lazy re-exports of the primary library surface (keeps `import
    # dfac_tpu` light; jax/flax load on first use)
    lazy = {
        "build_model": ("dfac_tpu.models", "build_model"),
        "load_dataset": ("dfac_tpu.data.pipeline", "load_dataset"),
        "create_datasets": ("dfac_tpu.data.pipeline", "create_datasets"),
        "Trainer": ("dfac_tpu.train.loop", "Trainer"),
        "TrainConfig": ("dfac_tpu.train.loop", "TrainConfig"),
        "LFCCConfig": ("dfac_tpu.features.lfcc", "LFCCConfig"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'dfac_tpu' has no attribute '{name}'")
