from eyoc_tpu.sparse.types import VoxelizedCloud, SparseLevel, SparsePyramid
from eyoc_tpu.sparse.keys import pack_coords, INVALID_KEY
from eyoc_tpu.sparse.voxelize import voxelize
from eyoc_tpu.sparse.pyramid import build_pyramid, kernel_offsets
from eyoc_tpu.sparse.conv import sparse_conv, masked_gather
from eyoc_tpu.sparse.norm import BatchNormState, masked_batch_norm
