"""CAE trainer + dual-convention evaluator tests (tiny shapes).

Shapes chosen so the fixed 4-pool encoder / ConvTranspose decoder chain
reproduces the reference's 321/180 shape arithmetic in miniature:
T=49 (odd: floor-pool chain + zero-pad-back path), F=36 (exercises the
output_padding=(0,1) recovery 9 from 4, like 45 from 22 at full size).
"""

import numpy as np
import pytest

from dfac_tpu.data.pipeline import ArrayDataset
from dfac_tpu.train.cae_loop import CAEConfig, CAETrainer, cae_mse_scores, evaluate_cae
from dfac_tpu.train.checkpoint import load_model_variables
from dfac_tpu.data.normalizer import FeatureNormalizer

T_, F_ = 49, 36


def _cae_corpus(rng, n=20):
    labels = (np.arange(n) % 2).astype(np.int32)
    feats = rng.normal(size=(n, F_, T_)).astype(np.float32)
    # spoof rows get extra high-variance structure -> harder to reconstruct
    feats[labels == 0] *= 2.5
    return ArrayDataset([f"u{i}" for i in range(n)], feats, labels)


@pytest.fixture(scope="module")
def trained_cae(tmp_path_factory):
    rng = np.random.default_rng(0)
    train_ds = _cae_corpus(rng, 24)
    dev_ds = _cae_corpus(np.random.default_rng(1), 16)
    ckdir = str(tmp_path_factory.mktemp("cae_ck"))
    cfg = CAEConfig(batch_size=8, epochs=2, base_channels=4, early_stop=0)
    trainer = CAETrainer(cfg)
    result = trainer.fit(train_ds, dev_ds, checkpoint_dir=ckdir)
    return trainer, result, train_ds, dev_ds, ckdir


def test_cae_shapes_and_training(trained_cae):
    trainer, result, _, dev_ds, ckdir = trained_cae
    assert result["best_val_mse"] is not None and np.isfinite(result["best_val_mse"])
    assert len(result["history"]) == 2
    import os

    assert os.path.exists(os.path.join(ckdir, "cae_best.ckpt"))
    assert os.path.exists(os.path.join(ckdir, "cae_last.ckpt"))
    assert os.path.exists(os.path.join(ckdir, "normalizer.npz"))


def test_cae_normalizer_is_bonafide_only(trained_cae):
    trainer, _, train_ds, _, _ = trained_cae
    from dfac_tpu.data.normalizer import build_normalizer

    expect = build_normalizer(train_ds.features, train_ds.labels)
    np.testing.assert_allclose(trainer.normalizer.mean, expect.mean)
    np.testing.assert_allclose(trainer.normalizer.std, expect.std)


def test_cae_scores_and_dual_convention(trained_cae):
    trainer, _, _, dev_ds, _ = trained_cae
    scores = cae_mse_scores(trainer.model, trainer.variables(), dev_ds, trainer.normalizer, 8)
    assert scores.shape == (len(dev_ds),)
    assert np.all(scores >= 0)

    report = evaluate_cae(trainer.model, trainer.variables(), dev_ds, trainer.normalizer, 8)
    assert report["convention"] in ("+mse", "-mse")
    assert report["eer"] == min(report["eer_pos_mse"], report["eer_neg_mse"])
    # the two conventions are complementary around the crossing
    assert report["spoof_bonafide_ratio"] is not None
    # scores deterministic
    scores2 = cae_mse_scores(trainer.model, trainer.variables(), dev_ds, trainer.normalizer, 8)
    np.testing.assert_array_equal(scores, scores2)


def test_cae_checkpoint_reload_same_scores(trained_cae):
    trainer, _, _, dev_ds, ckdir = trained_cae
    import os

    variables = load_model_variables(os.path.join(ckdir, "cae_last.ckpt"))
    norm = FeatureNormalizer.load(os.path.join(ckdir, "normalizer.npz"))
    s1 = cae_mse_scores(trainer.model, variables, dev_ds, norm, 8)
    s2 = cae_mse_scores(trainer.model, trainer.variables(), dev_ds, trainer.normalizer, 8)
    np.testing.assert_allclose(s1, s2, atol=1e-6)


def test_cae_device_resident_training():
    """Resident epoch-scan CAE training converges like the host-fed path."""
    rng = np.random.default_rng(7)
    train_ds = _cae_corpus(rng, 24)
    dev_ds = _cae_corpus(np.random.default_rng(8), 16)
    results = {}
    for resident in (False, True):
        cfg = CAEConfig(batch_size=8, epochs=2, base_channels=4, early_stop=0,
                        device_resident=resident, seed=1)
        trainer = CAETrainer(cfg)
        results[resident] = trainer.fit(train_ds, dev_ds)
    for resident, res in results.items():
        assert np.isfinite(res["best_val_mse"]), resident
        assert len(res["history"]) == 2
    # same order of magnitude (different shuffles, same data/seeds)
    a, b = results[False]["best_val_mse"], results[True]["best_val_mse"]
    assert abs(a - b) / max(a, b) < 0.5


def test_cae_generalized_geometry():
    """Per-stage output_padding is derived from the encoder shape trace:
    any F >= 16 reconstructs to the exact input (T, F); sub-16 spatial
    dims raise instead of collapsing the bottleneck to size 0."""
    import jax
    import jax.numpy as jnp

    from dfac_tpu.models.cae import ConvAutoencoder

    m = ConvAutoencoder(base_channels=2)
    for t, f in ((49, 36), (321, 180), (16, 17), (33, 100), (50, 36), (30, 100)):
        x = jnp.ones((2, t, f))
        variables = m.init(jax.random.PRNGKey(0), x, train=True)
        recon, latent = m.apply(variables, x, train=False)
        assert recon.shape == (2, t, f), (t, f, recon.shape)
        assert all(d >= 1 for d in latent.shape), (t, f, latent.shape)
        # the inner decoder stages carry trace-derived T output_padding, so
        # at most T's parity (the reference's emit-320-pad-to-321 frame)
        # can be forced to zero — never a multi-frame zero tail
        zero_tail = 0
        r = np.asarray(recon[0])
        while zero_tail < t and np.all(r[t - 1 - zero_tail] == 0.0):
            zero_tail += 1
        assert zero_tail <= t % 2, (t, f, zero_tail)

    with pytest.raises(ValueError, match="floor-pool"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 12)), train=True)


def test_cae_fused_fit_matches_resident_fit(tmp_path):
    """The one-dispatch CAE run trains identically to the per-epoch
    device-resident trainer (same epoch-scan shuffle seeds, same plateau /
    best-rule semantics), and writes the same artifact set."""
    import os

    rng = np.random.default_rng(21)
    train_ds = _cae_corpus(rng, 24)
    dev_ds = _cae_corpus(np.random.default_rng(22), 16)
    cfg = CAEConfig(batch_size=8, epochs=3, base_channels=4, early_stop=0,
                    device_resident=True, seed=5)

    ref_tr = CAETrainer(cfg)
    ref = ref_tr.fit(train_ds, dev_ds)

    ckdir = str(tmp_path / "fused_ck")
    fused_tr = CAETrainer(cfg)
    got = fused_tr.fit_fused(train_ds, dev_ds, checkpoint_dir=ckdir)

    assert len(got["history"]) == len(ref["history"])
    for a, b in zip(ref["history"], got["history"]):
        assert b.train_loss == pytest.approx(a.train_loss, rel=1e-5)
        assert b.dev_loss == pytest.approx(a.dev_loss, rel=1e-5)
        assert b.is_best == a.is_best
        assert b.learning_rate == pytest.approx(a.learning_rate, rel=1e-6)
    assert got["best_val_mse"] == pytest.approx(ref["best_val_mse"], rel=1e-5)
    for f in ("cae_best.ckpt", "cae_last.ckpt", "normalizer.npz"):
        assert os.path.exists(os.path.join(ckdir, f)), f

    # scoring through the fused trainer's final state matches the reference
    s_ref = cae_mse_scores(ref_tr.model, ref_tr.variables(), dev_ds, ref_tr.normalizer, 8)
    s_got = cae_mse_scores(fused_tr.model, fused_tr.variables(), dev_ds, fused_tr.normalizer, 8)
    np.testing.assert_allclose(s_got, s_ref, rtol=1e-4, atol=1e-6)


def test_cae_orbax_checkpoint_format(tmp_path):
    """checkpoint_format='orbax' writes checkpoint DIRECTORIES whose payload
    round-trips through the auto-detecting loader with the full state."""
    from dfac_tpu.train.checkpoint import load_checkpoint

    rng = np.random.default_rng(3)
    cfg = CAEConfig(batch_size=8, epochs=1, base_channels=4,
                    checkpoint_format="orbax")
    trainer = CAETrainer(cfg)
    ckdir = str(tmp_path / "ck")
    trainer.fit(_cae_corpus(rng, 16), _cae_corpus(np.random.default_rng(4), 8),
                checkpoint_dir=ckdir)
    import os

    best = os.path.join(ckdir, "cae_best.ckpt")
    assert os.path.isdir(best)  # orbax layout, not a pickle file
    import jax

    ckpt = load_checkpoint(best)
    got = jax.tree.leaves(ckpt["model_state"]["params"])
    want = jax.tree.leaves(jax.device_get(trainer.variables()["params"]))
    # 1 epoch: best == final state
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    assert ckpt["optimizer_state"] is not None
