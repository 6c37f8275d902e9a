from .resize import resize_bilinear, resize_nearest, interp_matrix
from .pool import adaptive_avg_pool, global_avg_pool
from .point_sample import point_sample, uncertainty_top2

__all__ = [
    "resize_bilinear",
    "resize_nearest",
    "interp_matrix",
    "adaptive_avg_pool",
    "global_avg_pool",
    "point_sample",
    "uncertainty_top2",
]
