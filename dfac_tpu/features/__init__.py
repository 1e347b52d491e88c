from dfac_tpu.features.lfcc import LFCCConfig, lfcc_features, lfcc_features_batch  # noqa: F401
