from cor_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    batch_sharding,
    pad_batch,
    replicated,
    shard_batch,
)
from cor_tpu.parallel.sharding import (
    opt_state_sharding_tree,
    param_sharding_rules,
    shard_opt_state,
    shard_params,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "batch_sharding",
    "pad_batch",
    "replicated",
    "shard_batch",
    "opt_state_sharding_tree",
    "param_sharding_rules",
    "shard_opt_state",
    "shard_params",
]
