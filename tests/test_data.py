"""Data layer tests: normalizer, augmentations, batch pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dfac_tpu.data import (
    AugmentConfig,
    FeatureNormalizer,
    build_augment_fn,
    build_normalizer,
    channel_drop,
    compose,
    feature_mask,
    gaussian_jitter,
    spec_augment,
    time_mask,
    time_shift,
)
from dfac_tpu.data.pipeline import ArrayDataset, batch_iterator, load_dataset, num_batches

B, T, F = 4, 60, 24


# -- normalizer ------------------------------------------------------------


def test_normalizer_zero_mean_unit_std(rng):
    feats = rng.normal(loc=3.0, scale=2.5, size=(20, T, F)).astype(np.float32)
    norm = FeatureNormalizer().fit(feats)
    out = norm.transform(feats.reshape(-1, F))
    np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(out.std(axis=0, ddof=1), 1.0, atol=1e-4)
    back = norm.inverse_transform(out)
    np.testing.assert_allclose(back, feats.reshape(-1, F), rtol=1e-4, atol=1e-4)


def test_normalizer_matches_torch_reference_semantics(rng):
    """unbiased std + 1e-8 clamp, stats over concatenated (T,F) frames."""
    torch = pytest.importorskip("torch")
    feats = [rng.normal(size=(T, F)).astype(np.float32) for _ in range(5)]
    feats[0][:, 0] = 7.0  # constant feature dim -> std clamp path
    all_t = torch.cat([torch.from_numpy(f) for f in feats], dim=0)
    ref_mean = all_t.mean(dim=0)
    ref_std = all_t.std(dim=0).clamp(min=1e-8)
    norm = FeatureNormalizer().fit(feats)
    np.testing.assert_allclose(norm.mean, ref_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(norm.std, ref_std.numpy(), rtol=1e-4, atol=1e-6)


def test_build_normalizer_bonafide_only(rng):
    feats = rng.normal(size=(10, F, T)).astype(np.float32)  # stored orientation
    labels = np.array([1, 0, 1, 0, 1, 0, 1, 0, 1, 0])
    norm = build_normalizer(feats, labels, swap_tf=True)
    expect = FeatureNormalizer().fit(np.transpose(feats[labels == 1], (0, 2, 1)))
    np.testing.assert_allclose(norm.mean, expect.mean)
    np.testing.assert_allclose(norm.std, expect.std)


def test_normalizer_roundtrip_npz(tmp_path, rng):
    norm = FeatureNormalizer().fit(rng.normal(size=(5, T, F)))
    p = str(tmp_path / "norm.npz")
    norm.save(p)
    norm2 = FeatureNormalizer.load(p)
    np.testing.assert_array_equal(norm.mean, norm2.mean)
    np.testing.assert_array_equal(norm.std, norm2.std)


def test_normalizer_loads_torch_sidecar(tmp_path, rng):
    torch = pytest.importorskip("torch")
    mean = rng.normal(size=F).astype(np.float32)
    std = (rng.random(F) + 0.5).astype(np.float32)
    p = str(tmp_path / "normalizer.pt")
    torch.save({"mean": torch.from_numpy(mean), "std": torch.from_numpy(std)}, p)
    norm = FeatureNormalizer.load(p)
    np.testing.assert_allclose(norm.mean, mean)
    np.testing.assert_allclose(norm.std, std)


# -- augmentations ---------------------------------------------------------


def _x(rng):
    return jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))


def test_time_shift_is_circular(rng):
    x = _x(rng)
    y = time_shift(jax.random.key(1), x, max_shift_ratio=0.1)
    assert y.shape == x.shape
    # circular: content preserved as a multiset along time
    np.testing.assert_allclose(np.sort(np.asarray(y), axis=1), np.sort(np.asarray(x), axis=1), atol=1e-6)


def test_time_mask_contiguous_segment(rng):
    x = jnp.ones((B, T, F))
    y = np.asarray(time_mask(jax.random.key(2), x, max_mask_ratio=0.2, min_mask_ratio=0.05))
    zero_rows = np.nonzero(y[0, :, 0] == 0)[0]
    assert 1 <= len(zero_rows) <= int(0.2 * T) + 1
    assert np.all(np.diff(zero_rows) == 1)  # contiguous
    # same mask for whole batch (reference semantics)
    for b in range(B):
        np.testing.assert_array_equal(y[b, :, 0] == 0, y[0, :, 0] == 0)
    # masked fraction within declared bounds across many keys
    for k in range(20):
        yk = np.asarray(time_mask(jax.random.key(k), x))
        frac = (yk[0, :, 0] == 0).mean()
        assert 0 < frac <= 0.2 + 1 / T


def test_feature_mask_bounds(rng):
    x = jnp.ones((B, T, F))
    for k in range(20):
        y = np.asarray(feature_mask(jax.random.key(k), x, max_mask_ratio=0.1, min_mask_ratio=0.02))
        cols = np.nonzero(y[0, 0] == 0)[0]
        assert 1 <= len(cols) <= max(int(0.1 * F), 1)
        assert np.all(np.diff(cols) == 1)


def test_channel_drop_broadcast(rng):
    x = jnp.ones((B, T, F))
    y = np.asarray(channel_drop(jax.random.key(3), x, drop_prob=0.5))
    dropped = y[0, 0] == 0
    # whole batch and all time steps share the channel mask
    np.testing.assert_array_equal(y == 0, np.broadcast_to(dropped, y.shape))


def test_gaussian_jitter_statistics(rng):
    x = jnp.zeros((B, T, F))
    y = np.asarray(gaussian_jitter(jax.random.key(4), x, std=0.01))
    assert abs(float(y.std()) - 0.01) < 0.002


def test_augment_noop_params(rng):
    x = _x(rng)
    k = jax.random.key(0)
    np.testing.assert_array_equal(np.asarray(time_shift(k, x, 0.0)), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(channel_drop(k, x, 0.0)), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(gaussian_jitter(k, x, 0.0)), np.asarray(x))


def test_compose_and_config_and_jit(rng):
    cfg = AugmentConfig(spec_augment=True, feature_mask=True, time_shift=True,
                        channel_drop=True, gaussian_jitter=True)
    fn = build_augment_fn(cfg)
    assert cfg.any_enabled
    x = _x(rng)
    y = jax.jit(fn)(jax.random.key(0), x)
    assert y.shape == x.shape
    # deterministic per key
    y2 = jax.jit(fn)(jax.random.key(0), x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))
    assert build_augment_fn(AugmentConfig()) is None


def test_spec_augment_feature_mask_off_by_default(rng):
    x = jnp.ones((B, T, F))
    y = np.asarray(spec_augment(jax.random.key(1), x))
    assert (y[0].sum(axis=0) == 0).sum() == 0  # no fully-zero feature column
    assert (y[0].sum(axis=1) == 0).sum() > 0  # some fully-zero time rows


# -- pipeline --------------------------------------------------------------


def test_batch_iterator_padding_and_weights(rng):
    n = 10
    ds = ArrayDataset(
        uttids=[f"u{i}" for i in range(n)],
        features=rng.normal(size=(n, F, T)).astype(np.float32),
        labels=np.arange(n) % 2,
    )
    batches = list(batch_iterator(ds, 4))
    assert len(batches) == num_batches(n, 4) == 3
    assert all(b.features.shape == (4, F, T) for b in batches)
    last = batches[-1]
    np.testing.assert_array_equal(last.weights, [1, 1, 0, 0])
    np.testing.assert_array_equal(last.index[2:], [-1, -1])
    # all real rows covered exactly once
    idx = np.concatenate([b.index[b.weights > 0] for b in batches])
    np.testing.assert_array_equal(np.sort(idx), np.arange(n))


def test_batch_iterator_shuffle_deterministic(rng):
    ds = ArrayDataset(
        uttids=[f"u{i}" for i in range(8)],
        features=rng.normal(size=(8, F, T)).astype(np.float32),
        labels=np.zeros(8, np.int32),
    )
    o1 = np.concatenate([b.index for b in batch_iterator(ds, 4, shuffle=True, seed=7)])
    o2 = np.concatenate([b.index for b in batch_iterator(ds, 4, shuffle=True, seed=7)])
    o3 = np.concatenate([b.index for b in batch_iterator(ds, 4, shuffle=True, seed=8)])
    np.testing.assert_array_equal(o1, o2)
    assert not np.array_equal(o1, o3)


def test_load_dataset_and_filter(synthetic_corpus):
    ds = load_dataset(synthetic_corpus["features_path"], synthetic_corpus["labels_path"])
    assert len(ds) == len(synthetic_corpus["uttids"])
    np.testing.assert_array_equal(ds.labels, synthetic_corpus["labels"])
    bona = ds.filter_label(1)
    assert len(bona) == int((synthetic_corpus["labels"] == 1).sum())
    assert all(ds.labels[ds.uttids.index(u)] == 1 for u in bona.uttids)


def test_create_datasets_trio(synthetic_corpus):
    from dfac_tpu.data.pipeline import create_datasets

    train, dev, test = create_datasets(
        synthetic_corpus["features_path"], synthetic_corpus["labels_path"],
        synthetic_corpus["features_path"], synthetic_corpus["labels_path"],
        synthetic_corpus["features_path"],  # label-free test split
    )
    assert train.labels is not None and dev.labels is not None
    assert test is not None and test.labels is None
    _, _, no_test = create_datasets(
        synthetic_corpus["features_path"], synthetic_corpus["labels_path"],
        synthetic_corpus["features_path"], synthetic_corpus["labels_path"],
    )
    assert no_test is None


def test_build_normalizer_unlabeled_corpus(rng):
    """labels=None means bonafide-only by contract (the CAE trainers accept
    unlabeled corpora) — stats must be finite, fit on every row."""
    from dfac_tpu.data.normalizer import build_normalizer

    feats = rng.normal(size=(6, 8, 10)).astype(np.float32)
    norm = build_normalizer(feats, None)
    assert np.isfinite(norm.mean).all() and np.isfinite(norm.std).all()
    ref = build_normalizer(feats, np.ones(6, np.int32))
    np.testing.assert_allclose(norm.mean, ref.mean)


def test_normalizer_lengths_exclude_pad_frames(rng):
    """Padded variable-length corpus: only true frames enter the stats —
    equivalent to the reference's concatenation of true-length tensors
    (src/dataset_cae.py:120-141)."""
    from dfac_tpu.data.normalizer import FeatureNormalizer

    n, t, f = 6, 12, 5
    feats = np.zeros((n, t, f), np.float32)
    lengths = rng.integers(3, t + 1, size=(n,)).astype(np.int32)
    rows = []
    for i in range(n):
        real = rng.normal(loc=2.0, size=(lengths[i], f)).astype(np.float32)
        feats[i, : lengths[i]] = real
        rows.append(real)
    masked = FeatureNormalizer().fit(feats, lengths=lengths)
    ref = FeatureNormalizer().fit(rows)  # list input == true frames only
    np.testing.assert_allclose(masked.mean, ref.mean, rtol=1e-6)
    np.testing.assert_allclose(masked.std, ref.std, rtol=1e-6)
    # and the pad frames WOULD have changed the stats
    unmasked = FeatureNormalizer().fit(feats)
    assert not np.allclose(unmasked.mean, ref.mean)


def test_normalizer_fit_streams_from_memmap(rng, tmp_path):
    """Slab-streamed two-moment fit: memmap == in-RAM == list-of-rows."""
    from dfac_tpu.data.normalizer import FeatureNormalizer

    arr = rng.normal(loc=1.5, scale=3.0, size=(40, 9, 7)).astype(np.float32)
    p = tmp_path / "corpus.npy"
    np.save(p, arr)
    mm = np.load(p, mmap_mode="r")
    a = FeatureNormalizer().fit(arr)
    b = FeatureNormalizer().fit(mm)
    c = FeatureNormalizer().fit(list(arr))
    np.testing.assert_array_equal(a.mean, b.mean)
    np.testing.assert_array_equal(a.std, b.std)
    np.testing.assert_allclose(a.mean, c.mean, rtol=1e-6)
    np.testing.assert_allclose(a.std, c.std, rtol=1e-6)


def test_cvmn_matches_torch_semantics(rng):
    """cvmn divides by torch's UNBIASED std clamped at 1e-8
    (reference src/compare_normalization.py:56-62)."""
    torch = pytest.importorskip("torch")

    from dfac_tpu.data.normalizer import apply_utterance_norm

    x = rng.normal(loc=2.0, size=(3, 6, 21)).astype(np.float32)
    got = apply_utterance_norm(x, "cvmn")
    feat = torch.from_numpy(x)
    mean = feat.mean(dim=2, keepdim=True)
    std = feat.std(dim=2, keepdim=True).clamp(min=1e-8)
    want = ((feat - mean) / std).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
