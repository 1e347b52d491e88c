from dfac_tpu.ops.eer import (  # noqa: F401
    calculate_eer,
    confusion_at_threshold,
    eer_device,
    eer_jax,
)
