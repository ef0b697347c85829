from stgcn_tpu.ops.batchnorm import batchnorm, fold_batchnorm_eval, init_batchnorm
from stgcn_tpu.ops.block import block_forward, effective_adjacency, init_block
from stgcn_tpu.ops.common import dropout, global_avg_pool, init_linear, linear
from stgcn_tpu.ops.spatial_conv import init_spatial_conv, spatial_conv, spatial_conv_flops
from stgcn_tpu.ops.temporal_conv import (
    init_pointwise_conv,
    init_temporal_conv,
    pointwise_conv,
    temporal_conv,
)
