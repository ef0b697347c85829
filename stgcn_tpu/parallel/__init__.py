from stgcn_tpu.parallel.mesh import (
    AXES,
    AXIS_DATA,
    AXIS_MODEL,
    AXIS_TIME,
    batch_spec,
    make_mesh,
    param_partition_specs,
    validate_time_sharding,
)
from stgcn_tpu.parallel.train import (
    create_sharded_train_state,
    make_sharded_eval_step,
    make_sharded_train_step,
    shard_batch,
)
from stgcn_tpu.parallel.launcher import heartbeat, initialize_distributed, is_primary
