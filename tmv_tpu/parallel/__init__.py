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
from tmv_tpu.parallel.pipeline import (  # noqa: F401
    PipelineParallel,
    pipeline_apply,
    stack_stage_params,
)
from tmv_tpu.parallel.tensor import (  # noqa: F401
    TensorParallel,
    tensor_shardings,
    tensor_spec,
)
from tmv_tpu.parallel.fsdp import (  # noqa: F401
    FullyShardedDataParallel,
    fsdp_shardings,
    fsdp_spec,
)
