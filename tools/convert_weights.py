"""Convert torch backbone checkpoints to flax .npz trees (and back).

The reference ships ImageNet backbones as torch .pth files (SURVEY.md
§2.2 download row, §2.5 build row); this CLI converts them once so the
trainer can load the portable .npz directly (NHWC/HWIO layouts, flax
scope names).

Usage:
    python tools/convert_weights.py --backbone resnet50 \
        --input ~/.cache/segmentron_tpu/resnet50.pth \
        --output ~/.cache/segmentron_tpu/resnet50.npz
    python tools/convert_weights.py --backbone resnet50 --reverse \
        --input converted.npz --output back.pth

Supported backbones: resnet18/34/50/101/152, mobilenet_v2, every hrnet_*
variant, xception65/71 (flax-scope-named .pth — see docs/PRETRAINED.md),
or ``generic`` for any dot-named state_dict whose module names equal the
flax scopes. ``--reverse`` (resnet only) emits a torchvision-named .pth
from a converted tree for users moving checkpoints back.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from segmentron_tpu.utils.torch_convert import (  # noqa: E402
    convert_backbone_state,
    load_flax_npz,
    load_torch_state_dict,
    resnet_state_from_flax,
    save_flax_npz,
)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--backbone", required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--reverse", action="store_true",
                    help="flax .npz -> torchvision-named .pth (resnet only)")
    args = ap.parse_args()

    if args.reverse:
        if not args.backbone.startswith("resnet"):
            ap.error("--reverse currently supports resnet backbones only")
        import torch

        tree = load_flax_npz(args.input)
        state = resnet_state_from_flax(tree["params"], tree["batch_stats"])
        torch.save({k: torch.from_numpy(v) for k, v in state.items()},
                   args.output)
        print(f"Wrote torch state_dict ({len(state)} tensors) to {args.output}")
        return

    state = load_torch_state_dict(args.input)
    tree = convert_backbone_state(args.backbone, state)
    save_flax_npz(tree, args.output)
    n = sum(1 for _ in _leaves(tree))
    print(f"Converted {args.backbone}: {n} arrays -> {args.output}")


def _leaves(node):
    for v in node.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
