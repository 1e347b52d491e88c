from dfac_tpu.ensemble.mean import ensemble_scores, score_checkpoints  # noqa: F401
from dfac_tpu.ensemble.hybrid import (  # noqa: F401
    fuse_scores,
    min_max_normalize,
    sweep_alpha,
)
