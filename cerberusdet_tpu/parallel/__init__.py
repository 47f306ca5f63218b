from cerberusdet_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    pad_batch_to,
    replicate,
    shard_batch,
    shard_task_batches,
)
from cerberusdet_tpu.parallel.spatial import (  # noqa: F401
    check_spatial_shape,
    make_data_spatial_mesh,
    make_spatial_forward,
    make_spatial_mesh,
)
