from dfac_tpu.data.augment import (  # noqa: F401
    AugmentConfig,
    build_augment_fn,
    channel_drop,
    compose,
    feature_mask,
    gaussian_jitter,
    spec_augment,
    time_mask,
    time_shift,
)
from dfac_tpu.data.normalizer import FeatureNormalizer, build_normalizer  # noqa: F401
from dfac_tpu.data.pipeline import (  # noqa: F401
    ArrayDataset,
    batch_iterator,
    load_dataset,
    pad_to_batch,
)
