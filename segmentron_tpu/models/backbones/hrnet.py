"""HRNet backbones (reference: ``segmentron/models/backbones/hrnet.py``).

4-stage multi-resolution network: parallel branches at strides
{4, 8, 16, 32}, each stage's modules run BasicBlocks per branch and then
exchange information through a fuse layer (1x1 conv + bilinear upsample
for low->high, chains of strided 3x3s for high->low). The segmentation
tap is the 4-branch pyramid; heads concat-upsample it ("HRNetV2").

TPU notes: the whole multi-branch graph is static Python — XLA sees one
flat graph and fuses the exchange adds; upsampling uses the exact
align-corners bilinear (matmul) op shared with the rest of the stack.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import flax.linen as nn

from ...modules.basic import ConvBNReLU, conv2d
from ...modules.batch_norm import NormConfig
from ...ops import resize_bilinear
from .build import BACKBONE_REGISTRY
from .resnet import BasicBlock, Bottleneck

__all__ = ["HRNet", "HRNET_SPECS"]

# (num_modules, num_branches, block, num_blocks, num_channels) per stage
HRNET_SPECS: Dict[str, dict] = {
    "hrnet_w18_small_v1": dict(
        stage1=(1, 1, "BOTTLENECK", (1,), (32,)),
        stage2=(1, 2, "BASIC", (2, 2), (16, 32)),
        stage3=(1, 3, "BASIC", (2, 2, 2), (16, 32, 64)),
        stage4=(1, 4, "BASIC", (2, 2, 2, 2), (16, 32, 64, 128)),
    ),
    "hrnet_w18_small_v2": dict(
        stage1=(1, 1, "BOTTLENECK", (2,), (64,)),
        stage2=(1, 2, "BASIC", (2, 2), (18, 36)),
        stage3=(3, 3, "BASIC", (2, 2, 2), (18, 36, 72)),
        stage4=(2, 4, "BASIC", (2, 2, 2, 2), (18, 36, 72, 144)),
    ),
}
for _w in (18, 30, 32, 40, 44, 48, 64):
    HRNET_SPECS[f"hrnet_w{_w}"] = dict(
        stage1=(1, 1, "BOTTLENECK", (4,), (64,)),
        stage2=(1, 2, "BASIC", (4, 4), (_w, 2 * _w)),
        stage3=(4, 3, "BASIC", (4, 4, 4), (_w, 2 * _w, 4 * _w)),
        stage4=(3, 4, "BASIC", (4, 4, 4, 4), (_w, 2 * _w, 4 * _w, 8 * _w)),
    )

_BLOCKS = {"BASIC": BasicBlock, "BOTTLENECK": Bottleneck}


class HRModule(nn.Module):
    """One exchange module: per-branch blocks then full fuse."""

    num_branches: int
    block: str
    num_blocks: Sequence[int]
    num_channels: Sequence[int]
    multi_scale_output: bool = True
    norm: NormConfig = NormConfig()

    @nn.compact
    def __call__(self, xs: List, train: bool = False) -> List:
        block = _BLOCKS[self.block]
        outs = []
        for b in range(self.num_branches):
            x = xs[b]
            out_ch = self.num_channels[b] * block.expansion
            for k in range(self.num_blocks[b]):
                x = block(
                    self.num_channels[b],
                    stride=1,
                    use_downsample=(k == 0 and x.shape[-1] != out_ch),
                    norm=self.norm,
                    name=f"branch{b}_block{k}",
                )(x, train)
            outs.append(x)
        if self.num_branches == 1:
            return outs

        n_out = self.num_branches if self.multi_scale_output else 1
        fused = []
        for i in range(n_out):
            acc = None
            size_i = outs[i].shape[1:3]
            ch_i = self.num_channels[i] * block.expansion
            for j in range(self.num_branches):
                y = outs[j]
                if j > i:
                    y = conv2d(ch_i, 1, 1, 0, name=f"fuse{i}_{j}_conv")(y)
                    y = self.norm.make(f"fuse{i}_{j}_bn")(
                        y, use_running_average=not train
                    )
                    y = resize_bilinear(y, size_i, align_corners=True)
                elif j < i:
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = ch_i if last else self.num_channels[j] * block.expansion
                        y = conv2d(ch, 3, 2, 1, name=f"fuse{i}_{j}_down{k}_conv")(y)
                        y = self.norm.make(f"fuse{i}_{j}_down{k}_bn")(
                            y, use_running_average=not train
                        )
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            fused.append(nn.relu(acc))
        return fused


class HRNet(nn.Module):
    spec_name: str = "hrnet_w18"
    norm: NormConfig = NormConfig()
    # diagnostic truncation for tools/hrnet_map.py prefix bisection:
    # "" = full network; "stem" | "stage1" | "stage2" | "stage3" return
    # the branch pyramid right after that stage (module names are
    # unchanged, so truncated params are a prefix of the full tree)
    stop_stage: str = ""

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple:
        spec = HRNET_SPECS[self.spec_name]

        x = ConvBNReLU(64, 3, 2, norm=self.norm, name="stem1")(x, train)
        x = ConvBNReLU(64, 3, 2, norm=self.norm, name="stem2")(x, train)
        if self.stop_stage == "stem":
            return (x,)

        # stage 1 — single branch of bottlenecks
        n_mod, n_br, blk, n_blocks, n_ch = spec["stage1"]
        block = _BLOCKS[blk]
        out_ch = n_ch[0] * block.expansion
        for k in range(n_blocks[0]):
            x = block(
                n_ch[0],
                use_downsample=(k == 0 and x.shape[-1] != out_ch),
                norm=self.norm,
                name=f"layer1_{k}",
            )(x, train)
        xs = [x]
        prev_channels = [out_ch]
        if self.stop_stage == "stage1":
            return tuple(xs)

        for stage_idx, stage_key in enumerate(("stage2", "stage3", "stage4"), start=2):
            n_mod, n_br, blk, n_blocks, n_ch = spec[stage_key]
            block = _BLOCKS[blk]
            stage_channels = [c * block.expansion for c in n_ch]
            # transition: adapt existing branches / create new ones
            new_xs = []
            for b in range(n_br):
                if b < len(xs):
                    if prev_channels[b] != stage_channels[b]:
                        y = ConvBNReLU(
                            stage_channels[b],
                            3,
                            1,
                            norm=self.norm,
                            name=f"transition{stage_idx}_{b}",
                        )(xs[b], train)
                    else:
                        y = xs[b]
                else:
                    # new branch: strided conv from the lowest-res branch
                    y = ConvBNReLU(
                        stage_channels[b],
                        3,
                        2,
                        norm=self.norm,
                        name=f"transition{stage_idx}_{b}",
                    )(xs[-1], train)
                new_xs.append(y)
            xs = new_xs
            for m in range(n_mod):
                xs = HRModule(
                    num_branches=n_br,
                    block=blk,
                    num_blocks=n_blocks,
                    num_channels=n_ch,
                    multi_scale_output=True,
                    norm=self.norm,
                    name=f"{stage_key}_module{m}",
                )(xs, train)
            prev_channels = stage_channels
            if self.stop_stage == stage_key:
                return tuple(xs)

        # (c1..c4) = the four-branch pyramid at strides 4/8/16/32
        return tuple(xs)


def _register_hrnets():
    for name in HRNET_SPECS:
        def _ctor(norm: NormConfig, name=None, _name=name):
            return HRNet(spec_name=_name, norm=norm, name=name)

        BACKBONE_REGISTRY.register(name=name)(_ctor)


_register_hrnets()
