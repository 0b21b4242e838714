from tmv_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    shard_batch,
    replicate,
)
from tmv_tpu.parallel.inference import (  # noqa: F401
    make_sharded_batched_predictor,
    shard_predict,
)
from tmv_tpu.parallel.spatial import (  # noqa: F401
    SpatialDataParallel,
    spatial_spec,
)
