"""Single-image inference demo (reference: ``tools/demo.py``).

Usage:
    python tools/demo.py --config-file configs/X.yaml --input-img img.jpg
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from segmentron_tpu.config import cfg
from segmentron_tpu.engine.steps import make_predict_fn
from segmentron_tpu.models import get_segmentation_model
from segmentron_tpu.utils import get_color_pallete, get_logger, parse_args
from segmentron_tpu.utils.checkpoint import CheckpointManager
from segmentron_tpu.utils.default_setup import default_setup


def main():
    args = parse_args()
    if args.config_file:
        cfg.update_from_file(args.config_file)
    cfg.update_from_list(args.opts or [])
    cfg.PHASE = "visual"
    default_setup(args)
    logger = get_logger()

    model = get_segmentation_model()
    img = Image.open(args.input_img).convert("RGB")
    mean = np.asarray(cfg.DATASET.MEAN, np.float32)
    std = np.asarray(cfg.DATASET.STD, np.float32)
    arr = (np.asarray(img, np.float32) / 255.0 - mean) / std
    x = jnp.asarray(arr[None])

    template = model.init(jax.random.PRNGKey(0), x)
    path = cfg.TEST.TEST_MODEL_PATH
    if path:
        restored = CheckpointManager(path).restore_raw()
        if restored is not None and "params" in restored:
            template = {
                "params": restored["params"],
                "batch_stats": restored.get("batch_stats", {}) or {},
            }
    predict = make_predict_fn(
        model, compute_dtype=jnp.dtype(cfg.TPU.COMPUTE_DTYPE)
    )
    logits = predict(template, x)
    pred = np.asarray(jnp.argmax(logits[0], -1))

    out_dir = cfg.VISUAL.OUTPUT_DIR
    os.makedirs(out_dir, exist_ok=True)
    out_name = os.path.splitext(os.path.basename(args.input_img))[0] + "_mask.png"
    mask_img = get_color_pallete(pred, cfg.DATASET.NAME.lower() or "pascal_voc")
    mask_img.save(os.path.join(out_dir, out_name))
    logger.info("Saved %s", os.path.join(out_dir, out_name))


if __name__ == "__main__":
    main()
