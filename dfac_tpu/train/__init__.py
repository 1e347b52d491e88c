from dfac_tpu.train.optim import PlateauScheduler, build_optimizer  # noqa: F401
from dfac_tpu.train.loop import TrainState, Trainer, TrainConfig  # noqa: F401
from dfac_tpu.train.evaluate import evaluate_classifier, predict_scores  # noqa: F401
from dfac_tpu.train.checkpoint import (  # noqa: F401
    load_checkpoint,
    load_model_variables,
    save_checkpoint,
)
from dfac_tpu.train.cae_loop import CAEConfig, CAETrainer, evaluate_cae  # noqa: F401
from dfac_tpu.train.detector_loop import DetectorConfig, DetectorTrainer  # noqa: F401
