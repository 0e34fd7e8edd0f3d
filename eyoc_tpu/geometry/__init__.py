from eyoc_tpu.geometry.se3 import (
    transform_points,
    integrate_trans,
    inverse_trans,
    decompose_trans,
    rotation_from_axis_angle,
)
from eyoc_tpu.geometry.svd3 import jacobi_eigh, kabsch, kabsch_qcp
from eyoc_tpu.geometry.robust import est_quad_linear_robust
from eyoc_tpu.geometry.metrics import (
    pdist2,
    rte,
    rre_deg,
    registration_success,
    hit_ratio,
    corr_dist,
)
