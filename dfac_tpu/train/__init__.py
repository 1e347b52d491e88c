from dfac_tpu.train.optim import PlateauScheduler, build_optimizer  # noqa: F401
from dfac_tpu.train.loop import TrainState, Trainer, TrainConfig  # noqa: F401
from dfac_tpu.train.evaluate import evaluate_classifier  # noqa: F401
from dfac_tpu.train.checkpoint import load_checkpoint, save_checkpoint  # noqa: F401
