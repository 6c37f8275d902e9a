from .resize import resize_bilinear, resize_nearest, interp_matrix
from .pool import adaptive_avg_pool, global_avg_pool

__all__ = [
    "resize_bilinear",
    "resize_nearest",
    "interp_matrix",
    "adaptive_avg_pool",
    "global_avg_pool",
]
