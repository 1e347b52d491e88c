"""Per-feature-dim z-score corpus normalizer.

Feature-parity target: reference ``src/dataset_cae.py:20-52`` — stats are
computed over the concatenated time frames of **bonafide-only** training
utterances in (T, F) orientation: ``mean``/``std`` of shape (F,), std is the
*unbiased* (N-1) estimator clamped to >= 1e-8; ``transform`` broadcasts over
(T, F) or (B, T, F).

The TPU build computes the stats in one vectorized pass over the dense
corpus array (no per-row Python loop) and applies ``transform`` on device
inside jit. Persistence is ``.npz``; the reference's torch ``normalizer.pt``
sidecar loads through the torch-free checkpoint reader.
"""

from __future__ import annotations

import numpy as np


class FeatureNormalizer:
    """mean/std over (F,), fit on (N, T, F) or a list of (T, F) arrays."""

    def __init__(self, mean: np.ndarray | None = None, std: np.ndarray | None = None):
        self.mean = None if mean is None else np.asarray(mean, np.float32)
        self.std = None if std is None else np.asarray(std, np.float32)

    def fit(self, features) -> "FeatureNormalizer":
        """``features``: (N, T, F) array or list of (T, F) arrays (the frames
        of all utterances are pooled along time, exactly like torch.cat)."""
        if isinstance(features, (list, tuple)):
            stacked = np.concatenate([np.asarray(f, np.float64) for f in features], axis=0)
        else:
            arr = np.asarray(features, np.float64)
            stacked = arr.reshape(-1, arr.shape[-1])
        self.mean = stacked.mean(axis=0).astype(np.float32)
        # unbiased std (torch .std default), clamped like the reference
        self.std = np.maximum(stacked.std(axis=0, ddof=1), 1e-8).astype(np.float32)
        return self

    def transform(self, x):
        if self.mean is None:
            raise RuntimeError("Call .fit() first")
        return (x - self.mean) / self.std

    def inverse_transform(self, x):
        if self.mean is None:
            raise RuntimeError("Call .fit() first")
        return x * self.std + self.mean

    # -- persistence ------------------------------------------------------
    def save(self, path: str) -> None:
        np.savez(path if path.endswith(".npz") else path + ".npz", mean=self.mean, std=self.std)

    @classmethod
    def load(cls, path: str) -> "FeatureNormalizer":
        if path.endswith(".pt"):
            return cls.load_torch(path)
        with np.load(path if path.endswith(".npz") else path + ".npz") as data:
            return cls(mean=data["mean"], std=data["std"])

    @classmethod
    def load_torch(cls, path: str) -> "FeatureNormalizer":
        """Read the reference's ``normalizer.pt`` {mean, std} sidecar
        (``src/dataset_cae.py:43-52``) without torch."""
        from dfac_tpu.utils.torch_checkpoint import load_torch_checkpoint

        data = load_torch_checkpoint(path)
        return cls(mean=np.asarray(data["mean"]), std=np.asarray(data["std"]))


def apply_utterance_norm(features: np.ndarray, scheme: str) -> np.ndarray:
    """Per-utterance normalization schemes of the normalization A/B study
    (reference ``src/compare_normalization.py:38-65``), applied on the
    stored (N, F, T) orientation over the time axis:

    * ``raw``  — identity;
    * ``cmn``  — cepstral mean subtraction: x - mean_t(x) per feature row;
    * ``cvmn`` — mean+variance normalization: (x - mean_t) / (std_t + 1e-8).
    """
    if scheme == "raw":
        return features
    mean = features.mean(axis=-1, keepdims=True)
    if scheme == "cmn":
        return features - mean
    if scheme == "cvmn":
        std = features.std(axis=-1, keepdims=True)
        return (features - mean) / (std + 1e-8)
    raise ValueError(f"unknown normalization scheme '{scheme}' (raw|cmn|cvmn)")


def build_normalizer(features: np.ndarray, labels: np.ndarray | None, swap_tf: bool = True) -> FeatureNormalizer:
    """Fit on bonafide-only rows of a stored-orientation (N, F, T) corpus.

    Mirrors reference ``src/dataset_cae.py:120-141``: with ``swap_tf`` the
    stats are per feature dim (computed in (T, F) orientation).
    ``labels=None`` means the corpus is already bonafide-only (the CAE
    trainers accept unlabeled corpora on that contract) — fitting on
    everything, instead of on ``features[None == 1]`` == an empty slice
    whose mean/std are NaN.
    """
    bona = features if labels is None else features[np.asarray(labels) == 1]
    if swap_tf:
        bona = np.transpose(bona, (0, 2, 1))  # (N, T, F)
    return FeatureNormalizer().fit(bona)
