from .registry import Registry
from .logger import setup_logger, get_logger
from .score import SegmentationMetric, confusion_matrix_update
from .distributed import (
    get_world_size,
    get_rank,
    is_main_process,
    synchronize,
    create_mesh,
    batch_sharding,
    replicate_sharding,
    shard_batch,
    make_data_sampler,
)
from .env import seed_all_rng, collect_env_info
from .flops import count_params, model_flops, show_flops_params
from .filesystem import makedirs
from .options import parse_args
from .visualize import get_color_pallete, show_colorful_images
