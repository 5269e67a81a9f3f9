from cor_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    STAGE_AXIS,
    make_mesh,
    batch_sharding,
    pad_batch,
    replicated,
    shard_batch,
)
from cor_tpu.parallel.pipeline import (
    gpipe,
    pipelined_sam_encoder,
    shard_stage_params,
    split_stages,
)
from cor_tpu.parallel.sharding import (
    opt_state_sharding_tree,
    param_sharding_rules,
    seq_shard_constraint,
    set_activation_mesh,
    shard_opt_state,
    shard_params,
    stage_stacked_tp_specs,
    stage_tp_constraint,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "STAGE_AXIS",
    "gpipe",
    "pipelined_sam_encoder",
    "shard_stage_params",
    "split_stages",
    "make_mesh",
    "batch_sharding",
    "pad_batch",
    "replicated",
    "shard_batch",
    "opt_state_sharding_tree",
    "param_sharding_rules",
    "seq_shard_constraint",
    "set_activation_mesh",
    "shard_opt_state",
    "shard_params",
    "stage_stacked_tp_specs",
    "stage_tp_constraint",
]
