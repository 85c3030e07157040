from unidefense_tpu.parallel.mesh import (
    DATA_AXIS,
    create_mesh,
    shard_train_step,
    shard_eval_step,
    split_device_batch,
)

__all__ = [
    "DATA_AXIS",
    "create_mesh",
    "shard_train_step",
    "shard_eval_step",
    "split_device_batch",
]
