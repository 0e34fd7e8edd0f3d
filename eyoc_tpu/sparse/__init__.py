from eyoc_tpu.sparse.types import VoxelizedCloud
from eyoc_tpu.sparse.voxelize import voxelize
from eyoc_tpu.sparse.bricks import BrickLevel, BrickPyramid, build_pyramid
from eyoc_tpu.sparse.brick_conv import (
    conv1x1,
    conv_down,
    conv_same,
    conv_up,
    halo,
)
from eyoc_tpu.sparse.norm import (
    BatchNormState,
    init_bn_state,
    masked_batch_norm,
    masked_instance_norm,
)
