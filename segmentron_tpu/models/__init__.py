from .model_zoo import MODEL_REGISTRY, get_segmentation_model
from .segbase import SegBaseModel
from . import fcn  # noqa: F401
from . import pspnet  # noqa: F401
from . import deeplabv3_plus  # noqa: F401
from . import hrnet_seg  # noqa: F401
from . import ocnet  # noqa: F401
from . import danet  # noqa: F401
from . import fast_scnn  # noqa: F401
from . import unet  # noqa: F401
from . import bisenet  # noqa: F401
from . import icnet  # noqa: F401
from . import denseaspp  # noqa: F401
from . import cgnet  # noqa: F401
from . import ccnet  # noqa: F401
from . import dunet  # noqa: F401
from . import lednet  # noqa: F401
from . import encnet  # noqa: F401
from . import espnetv2  # noqa: F401
from . import hardnet  # noqa: F401
from . import dfanet  # noqa: F401
from . import pointrend  # noqa: F401
from . import translab  # noqa: F401

__all__ = ["MODEL_REGISTRY", "get_segmentation_model", "SegBaseModel"]
