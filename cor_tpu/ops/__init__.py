from cor_tpu.ops.common import (
    dense,
    init_dense,
    conv2d,
    init_conv2d,
    layer_norm,
    init_layer_norm,
    mlp_block,
    init_mlp_block,
    gelu,
    dropout,
)
from cor_tpu.ops.resize import resize_bilinear, avg_pool_same

__all__ = [
    "dense",
    "init_dense",
    "conv2d",
    "init_conv2d",
    "layer_norm",
    "init_layer_norm",
    "mlp_block",
    "init_mlp_block",
    "gelu",
    "dropout",
    "resize_bilinear",
    "avg_pool_same",
]
