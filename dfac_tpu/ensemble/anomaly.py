"""Embedding-space anomaly detection.

Feature-parity target: reference ``src/embedding_anomaly.py`` — use a
trained CNN2D as a frozen feature extractor (its 23,040-dim mean-over-time
embedding via ``return_embedding``), then score utterances as anomalies
with classical one-class models fit on bonafide-train embeddings only:

* StandardScaler -> OneClassSVM(nu=0.05, rbf), ``decision_function`` score
  (reference ``:134-142``);
* StandardScaler -> PCA(256) -> 8-component full-covariance GaussianMixture,
  ``score_samples`` score (reference ``:144-163``).

Embedding extraction is batched on TPU; the classical models run on host
(sklearn), gated behind an optional import.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from dfac_tpu.data.pipeline import ArrayDataset, batch_iterator
from dfac_tpu.ops.eer import calculate_eer


@functools.partial(jax.jit, static_argnames=("model", "swap_tf"))
def _embed_step(model, variables, feats, swap_tf):
    x = jnp.transpose(feats, (0, 2, 1)) if swap_tf else feats
    _, emb = model.apply(variables, x, return_embedding=True)
    return emb


def extract_embeddings(
    model: Any, variables: dict, ds: ArrayDataset, batch_size: int = 128, swap_tf: bool = True
) -> np.ndarray:
    out = []
    for batch in batch_iterator(ds, batch_size):
        emb = _embed_step(model, variables, jnp.asarray(batch.features), swap_tf)
        out.append(np.asarray(emb)[batch.weights > 0])
    return np.concatenate(out) if out else np.zeros((0, 0), np.float32)


def ocsvm_anomaly_scores(
    train_embeddings: np.ndarray, eval_embeddings: np.ndarray, nu: float = 0.05
) -> np.ndarray:
    """OneClassSVM decision_function (higher = more bonafide)."""
    from sklearn.preprocessing import StandardScaler
    from sklearn.svm import OneClassSVM

    scaler = StandardScaler().fit(train_embeddings)
    svm = OneClassSVM(nu=nu, kernel="rbf").fit(scaler.transform(train_embeddings))
    return svm.decision_function(scaler.transform(eval_embeddings))


def gmm_anomaly_scores(
    train_embeddings: np.ndarray,
    eval_embeddings: np.ndarray,
    n_components: int = 8,
    pca_dims: int = 256,
    seed: int = 42,  # reference src/embedding_anomaly.py:149-157
    reg_covar: float = 1e-4,
) -> np.ndarray:
    """PCA -> full-covariance GMM log-likelihood (higher = more bonafide)."""
    from sklearn.decomposition import PCA
    from sklearn.mixture import GaussianMixture
    from sklearn.preprocessing import StandardScaler

    scaler = StandardScaler().fit(train_embeddings)
    tr = scaler.transform(train_embeddings)
    pca_dims = min(pca_dims, tr.shape[0], tr.shape[1])
    pca = PCA(n_components=pca_dims, random_state=seed).fit(tr)
    n_components = min(n_components, tr.shape[0])
    gmm = GaussianMixture(
        n_components=n_components, covariance_type="full", random_state=seed,
        reg_covar=reg_covar,
    ).fit(pca.transform(tr))
    return gmm.score_samples(pca.transform(scaler.transform(eval_embeddings)))


def embedding_anomaly_report(
    model: Any,
    variables: dict,
    train_ds: ArrayDataset,
    eval_ds: ArrayDataset,
    batch_size: int = 128,
    swap_tf: bool = True,
    nu: float = 0.05,
    gmm_components: int = 8,
    pca_dims: int = 256,
    reg_covar: float = 1e-4,
) -> dict:
    """Full pipeline: embeddings -> OC-SVM + GMM scores -> EER for both."""
    if eval_ds.labels is None:
        raise ValueError(
            "embedding_anomaly_report needs a LABELED eval dataset (the "
            "report is an EER over its labels)"
        )
    bona_train = train_ds.filter_label(1)
    if len(bona_train) == 0:
        raise ValueError("train_ds has no bonafide (label 1) rows to fit on")
    tr_emb = extract_embeddings(model, variables, bona_train, batch_size, swap_tf)
    ev_emb = extract_embeddings(model, variables, eval_ds, batch_size, swap_tf)
    labels = np.asarray(eval_ds.labels)

    svm_scores = ocsvm_anomaly_scores(tr_emb, ev_emb, nu=nu)
    svm_eer, svm_thr = calculate_eer(svm_scores, labels)
    gmm_scores = gmm_anomaly_scores(tr_emb, ev_emb, gmm_components, pca_dims, reg_covar=reg_covar)
    gmm_eer, gmm_thr = calculate_eer(gmm_scores, labels)
    return {
        "ocsvm": {"eer": svm_eer, "threshold": svm_thr, "scores": svm_scores},
        "gmm": {"eer": gmm_eer, "threshold": gmm_thr, "scores": gmm_scores},
        "embedding_dim": int(tr_emb.shape[1]),
        "n_bonafide_train": len(bona_train),
    }
