from cerberusdet_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    pad_batch_to,
    replicate,
    shard_batch,
    shard_task_batches,
)
