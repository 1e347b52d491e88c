from dfac_tpu.io.pickle_io import (  # noqa: F401
    load_features,
    load_labels,
    load_predictions,
    read_pickle_torchfree,
    write_predictions,
)
from dfac_tpu.io.submission import (  # noqa: F401
    generate_submission,
    validate_prediction_frame,
)
