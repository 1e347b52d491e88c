"""Visualizer framework tests: hooks fire, factory falls back, display-only."""

import numpy as np
import pytest

from dfac_tpu.data.pipeline import ArrayDataset
from dfac_tpu.obs import BatchMetrics, EpochMetrics, TrainingConfig, create_visualizer
from dfac_tpu.obs.noop import NoOpVisualizer
from dfac_tpu.train.loop import TrainConfig, Trainer


def _ds(seed, n=16, f=12, t=16):
    rng = np.random.default_rng(seed)
    labels = (np.arange(n) % 2).astype(np.int32)
    feats = rng.normal(size=(n, f, t)).astype(np.float32)
    feats[labels == 1, :6] += 2.0
    return ArrayDataset([f"u{i}" for i in range(n)], feats, labels)


def test_factory_kinds():
    assert isinstance(create_visualizer("noop"), NoOpVisualizer)
    # rich and tqdm are installed in this env; factory returns live backends
    assert type(create_visualizer("rich")).__name__ == "RichVisualizer"
    assert type(create_visualizer("tqdm")).__name__ == "TqdmVisualizer"
    with pytest.raises(ValueError):
        create_visualizer("bogus")


@pytest.mark.parametrize("kind", ["rich", "tqdm", "noop"])
def test_training_with_each_visualizer(kind, capsys):
    """A tiny fit drives every hook on every backend without crashing, and
    visualizers remain display-only (results identical across backends)."""
    cfg = TrainConfig(model="meanpool_mlp", batch_size=8, epochs=2, in_features=16, lr=1e-2)
    trainer = Trainer(cfg, visualizer=create_visualizer(kind))
    result = trainer.fit(_ds(0), _ds(1))
    assert len(result["history"]) == 2
    capsys.readouterr()  # drain UI output


def test_event_sequence_recorded():
    events = []

    class Recorder(NoOpVisualizer):
        def on_training_start(self, config):
            events.append(("start", config.model))

        def on_epoch_start(self, epoch, num_batches):
            events.append(("epoch_start", epoch, num_batches))
            return super().on_epoch_start(epoch, num_batches)

        def on_epoch_end(self, metrics, prev):
            events.append(("epoch_end", metrics.epoch, metrics.dev_eer is not None))

        def on_training_end(self, history):
            events.append(("end", len(history)))

    cfg = TrainConfig(model="meanpool_mlp", batch_size=8, epochs=2, in_features=16)
    Trainer(cfg, visualizer=Recorder()).fit(_ds(2), _ds(3))
    assert events[0] == ("start", "meanpool_mlp")
    assert ("epoch_start", 1, 2) in events and ("epoch_start", 2, 2) in events
    assert ("epoch_end", 1, True) in events
    assert events[-1] == ("end", 2)


def test_verify_uttid_alignment(synthetic_corpus, tmp_path):
    import pandas as pd

    from dfac_tpu.io.pickle_io import verify_uttid_alignment

    verify_uttid_alignment(synthetic_corpus["features_path"], synthetic_corpus["labels_path"])
    bad = tmp_path / "bad_labels.pkl"
    pd.DataFrame({"uttid": ["zzz"], "label": [1]}).to_pickle(bad)
    with pytest.raises(ValueError, match="uttid mismatch"):
        verify_uttid_alignment(synthetic_corpus["features_path"], str(bad))


def test_cae_dashboard_factory_kinds():
    from dfac_tpu.obs.cae_dashboard import (
        CAEDashboard,
        CAEPlainDashboard,
        create_cae_visualizer,
    )

    assert isinstance(create_cae_visualizer("rich"), CAEDashboard)
    assert isinstance(create_cae_visualizer("plain"), CAEPlainDashboard)
    assert isinstance(create_cae_visualizer("noop"), NoOpVisualizer)
    with pytest.raises(ValueError):
        create_cae_visualizer("bogus")


@pytest.mark.parametrize("kind,resident", [("rich", False), ("plain", False), ("rich", True)])
def test_cae_training_with_dashboard(kind, resident, capsys):
    """CAE fit drives the dedicated dashboard end to end; the rolling table /
    per-epoch lines render without crashing and stay display-only. With
    --device-resident, the live batch bar must not silently defeat the
    resident corpus: the per-batch path gathers on device via the indexed
    step (cae_loop.make_cae_indexed_step)."""
    from dfac_tpu.obs.cae_dashboard import create_cae_visualizer
    from dfac_tpu.train.cae_loop import CAEConfig, CAETrainer

    rng = np.random.default_rng(0)
    n, f, t = 12, 16, 16
    labels = np.ones(n, np.int32)  # all bonafide
    feats = rng.normal(size=(n, f, t)).astype(np.float32)
    ds = ArrayDataset([f"u{i}" for i in range(n)], feats, labels)

    cfg = CAEConfig(
        batch_size=4, epochs=2, base_channels=2, early_stop=5,
        device_resident=resident,
    )
    trainer = CAETrainer(cfg, visualizer=create_cae_visualizer(kind))
    result = trainer.fit(ds, ds)
    assert np.isfinite(result["best_val_mse"])
    out = capsys.readouterr().out
    if kind == "plain":
        assert "train_mse=" in out and "val_mse=" in out
    else:
        assert "CAE Training" in out


def test_cae_rolling_table_window():
    """The live table shows at most the last 20 epochs (reference
    src/train_cae.py:147)."""
    from dfac_tpu.obs.cae_dashboard import ROLLING_ROWS, CAEDashboard

    dash = CAEDashboard()
    dash._early_stop = 10
    dash.history = [
        EpochMetrics(epoch=i, train_loss=0.1, dev_loss=0.2, dev_eer=None,
                     learning_rate=1e-4, epochs_no_improve=0)
        for i in range(1, 31)
    ]
    table = dash._build_table()
    assert table.row_count == ROLLING_ROWS
