from dfac_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    shard_model_params,
)
from dfac_tpu.parallel.data_parallel import make_shard_map_train_step  # noqa: F401
from dfac_tpu.parallel import multihost  # noqa: F401
