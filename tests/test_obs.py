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
