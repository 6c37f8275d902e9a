"""Torch nn.Module replicas of the flax backbones/heads for whole-model
numerical parity tests (SURVEY.md §4 item 1, VERDICT r1 'Next round' #1).

Two naming conventions:

- torchvision/official naming (``TorchResNet``, ``TorchMobileNetV2``,
  ``TorchHRNet``): ``state_dict()`` feeds the REAL production converters
  (``convert_resnet_state`` / ``convert_mobilenet_state`` /
  ``convert_hrnet_state``), so the tests cover the exact pretrained
  import path end to end.
- flax-scope naming (``TorchXception65`` and the head replicas): module
  attributes mirror the flax scope names, so ``convert_generic_state``
  maps ``state_dict()`` onto the flax tree mechanically — this is also
  the canonical layout ``tools/convert_weights.py`` emits.

Each replica's forward mirrors the flax module semantics exactly
(padding = dilation*(k-1)//2, align_corners=True bilinear, relu
placement); weight randomization helpers give BNs non-trivial running
stats so mean/var mix-ups can't cancel out.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def conv3x3(cin, cout, stride=1, dilation=1):
    return nn.Conv2d(cin, cout, 3, stride, padding=dilation, dilation=dilation,
                     bias=False)


def conv1x1(cin, cout, stride=1, bias=False):
    return nn.Conv2d(cin, cout, 1, stride, bias=bias)


def randomize(model: nn.Module, seed: int = 0) -> nn.Module:
    """Random conv/linear weights + NON-trivial BN affine/running stats.

    0-d parameters (the attention residual ``gamma``s, zero-init like
    the flax originals) are set NONZERO so the attention OUTPUT path
    (value projection -> affinity matmul -> residual add) actually
    contributes to the compared logits — with gamma=0 a broken
    attention branch would pass full-model parity.
    """
    rng = np.random.RandomState(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.Conv2d):
                fan_in = m.in_channels * m.kernel_size[0] * m.kernel_size[1]
                w = rng.randn(*m.weight.shape) / np.sqrt(fan_in)
                m.weight.copy_(torch.from_numpy(w.astype(np.float32)))
                if m.bias is not None:
                    m.bias.copy_(torch.from_numpy(
                        rng.randn(*m.bias.shape).astype(np.float32) * 0.1))
            elif isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
                c = m.num_features
                m.weight.copy_(torch.from_numpy(
                    (rng.rand(c) + 0.5).astype(np.float32)))
                m.bias.copy_(torch.from_numpy(
                    (rng.randn(c) * 0.1).astype(np.float32)))
                m.running_mean.copy_(torch.from_numpy(
                    (rng.randn(c) * 0.1).astype(np.float32)))
                m.running_var.copy_(torch.from_numpy(
                    (rng.rand(c) + 0.5).astype(np.float32)))
            elif isinstance(m, nn.Linear):
                w = rng.randn(*m.weight.shape) / np.sqrt(m.in_features)
                m.weight.copy_(torch.from_numpy(w.astype(np.float32)))
                if m.bias is not None:
                    m.bias.copy_(torch.from_numpy(
                        rng.randn(*m.bias.shape).astype(np.float32) * 0.1))
        for name, p in sorted(model.named_parameters()):
            if p.ndim == 0:  # attention gamma
                p.copy_(torch.tensor(float(rng.rand() * 0.5 + 0.25)))
            elif p.ndim == 1 and name.endswith("prelu"):
                # bare PReLU slopes (CGNet/EESPNet): randomize away from
                # the shared 0.25 init so a dropped/mismapped leaf can't
                # silently pass (flax would fall back to the same init)
                p.copy_(torch.from_numpy(
                    (rng.rand(p.shape[0]) * 0.4 + 0.05).astype(np.float32)))
    model.eval()
    return model


# ================================================================== ResNet
class TorchBasicBlock(nn.Module):
    def __init__(self, cin, c, stride=1, dilation=1, previous_dilation=1,
                 downsample=False):
        super().__init__()
        self.conv1 = conv3x3(cin, c, stride, dilation)
        self.bn1 = nn.BatchNorm2d(c)
        self.conv2 = conv3x3(c, c, 1, previous_dilation)
        self.bn2 = nn.BatchNorm2d(c)
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                conv1x1(cin, c, stride), nn.BatchNorm2d(c))

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + identity)


class TorchBottleneck(nn.Module):
    def __init__(self, cin, c, stride=1, dilation=1, previous_dilation=1,
                 downsample=False):
        super().__init__()
        self.conv1 = conv1x1(cin, c)
        self.bn1 = nn.BatchNorm2d(c)
        self.conv2 = conv3x3(c, c, stride, dilation)
        self.bn2 = nn.BatchNorm2d(c)
        self.conv3 = conv1x1(c, c * 4)
        self.bn3 = nn.BatchNorm2d(c * 4)
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                conv1x1(cin, c * 4, stride), nn.BatchNorm2d(c * 4))

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + identity)


class TorchResNet(nn.Module):
    """torchvision-named dilated ResNet mirroring flax backbones/resnet.py.

    ``multi_dilation`` (DANet multi-grid) applies the flax rule to
    layer4: d = md[b % len(md)] * max(stage_dilation // 2, 1).
    """

    def __init__(self, block, layers, output_stride=16, multi_dilation=None):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        if output_stride == 8:
            strides, dilations = (1, 2, 1, 1), (1, 1, 2, 4)
        elif output_stride == 16:
            strides, dilations = (1, 2, 2, 1), (1, 1, 1, 2)
        else:
            strides, dilations = (1, 2, 2, 2), (1, 1, 1, 1)
        expansion = 4 if block is TorchBottleneck else 1
        cin = 64
        for li, (feats, blocks) in enumerate(
                zip((64, 128, 256, 512), layers), start=1):
            mods = []
            out_ch = feats * expansion
            for b in range(blocks):
                s = strides[li - 1] if b == 0 else 1
                dilation = dilations[li - 1]
                # flax _make_layer dilation rule
                if li == 4 and multi_dilation is not None:
                    d = multi_dilation[b % len(multi_dilation)] * max(
                        dilation // 2, 1
                    )
                elif dilation in (1, 2) or b > 0:
                    d = dilation
                else:
                    d = dilation // 2
                need_ds = b == 0 and (strides[li - 1] != 1 or cin != out_ch)
                mods.append(block(cin, feats, s, d, dilation, need_ds))
                cin = out_ch
            setattr(self, f"layer{li}", nn.Sequential(*mods))

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        c1 = self.layer1(x)
        c2 = self.layer2(c1)
        c3 = self.layer3(c2)
        c4 = self.layer4(c3)
        return c1, c2, c3, c4


# ============================================================= MobileNetV2
def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _cbr6(cin, cout, k, stride, dilation=1, groups=1):
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, stride, padding=dilation * (k - 1) // 2,
                  dilation=dilation, groups=groups, bias=False),
        nn.BatchNorm2d(cout),
        nn.ReLU6(inplace=False),
    )


class _TorchInvertedResidual(nn.Module):
    def __init__(self, cin, cout, stride, expand_ratio, dilation=1):
        super().__init__()
        hidden = int(round(cin * expand_ratio))
        self.use_res = stride == 1 and cin == cout
        mods = []
        if expand_ratio != 1:
            mods.append(_cbr6(cin, hidden, 1, 1))
        mods.append(_cbr6(hidden, hidden, 3, stride, dilation, groups=hidden))
        mods.append(nn.Conv2d(hidden, cout, 1, bias=False))
        mods.append(nn.BatchNorm2d(cout))
        self.conv = nn.Sequential(*mods)

    def forward(self, x):
        y = self.conv(x)
        return x + y if self.use_res else y


_MBV2_SETTINGS = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
                  (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))


class TorchMobileNetV2(nn.Module):
    """torchvision-named dilated MobileNetV2 mirroring flax mobilenet.py."""

    def __init__(self, output_stride=16, width_mult=1.0):
        super().__init__()
        cin = _make_divisible(32 * width_mult)
        features = [_cbr6(3, cin, 3, 2)]
        current_stride, dilation = 2, 1
        self.taps = []  # feature indices to tap after
        for si, (t, c, n, s) in enumerate(_MBV2_SETTINGS):
            out_ch = _make_divisible(c * width_mult)
            for bi in range(n):
                stride = s if bi == 0 else 1
                if stride == 2 and current_stride >= output_stride:
                    stride = 1
                    dilation *= 2
                    block_dilation = max(dilation // 2, 1)
                else:
                    block_dilation = dilation
                if stride == 2:
                    current_stride *= 2
                features.append(_TorchInvertedResidual(
                    cin, out_ch, stride, t, block_dilation))
                cin = out_ch
            if si in (1, 2, 4, 6):
                self.taps.append(len(features) - 1)
        self.features = nn.Sequential(*features)

    def forward(self, x):
        taps = []
        for i, m in enumerate(self.features):
            x = m(x)
            if i in self.taps:
                taps.append(x)
        return tuple(taps)


# ==================================================================== HRNet
class _TorchHRModule(nn.Module):
    def __init__(self, n_br, block, n_blocks, n_ch, in_ch):
        super().__init__()
        expansion = 4 if block is TorchBottleneck else 1
        self.n_br = n_br
        self.out_ch = [c * expansion for c in n_ch]
        branches = []
        for b in range(n_br):
            mods = []
            cin = in_ch[b]
            for k in range(n_blocks[b]):
                mods.append(block(cin, n_ch[b], 1, 1, 1, cin != self.out_ch[b]))
                cin = self.out_ch[b]
            branches.append(nn.Sequential(*mods))
        self.branches = nn.ModuleList(branches)
        fuse = []
        for i in range(n_br):
            row = []
            for j in range(n_br):
                if j > i:
                    row.append(nn.Sequential(
                        conv1x1(self.out_ch[j], self.out_ch[i]),
                        nn.BatchNorm2d(self.out_ch[i])))
                elif j < i:
                    chain = []
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.out_ch[i] if last else self.out_ch[j]
                        mods = [conv3x3(self.out_ch[j], ch, 2),
                                nn.BatchNorm2d(ch)]
                        if not last:
                            mods.append(nn.ReLU(inplace=False))
                        chain.append(nn.Sequential(*mods))
                    row.append(nn.Sequential(*chain))
                else:
                    row.append(None)
            fuse.append(nn.ModuleList(row))
        self.fuse_layers = nn.ModuleList(fuse)

    def forward(self, xs):
        outs = [branch(x) for branch, x in zip(self.branches, xs)]
        if self.n_br == 1:
            return outs
        fused = []
        for i in range(self.n_br):
            size_i = outs[i].shape[2:]
            acc = None
            for j in range(self.n_br):
                y = outs[j]
                if j > i:
                    y = self.fuse_layers[i][j](y)
                    y = F.interpolate(y, size=size_i, mode="bilinear",
                                      align_corners=True)
                elif j < i:
                    y = self.fuse_layers[i][j](y)
                acc = y if acc is None else acc + y
            fused.append(F.relu(acc))
        return fused


class TorchHRNet(nn.Module):
    """Official-HRNet-named replica mirroring flax backbones/hrnet.py."""

    def __init__(self, spec):
        super().__init__()
        self.spec = spec
        self.conv1 = conv3x3(3, 64, 2)
        self.bn1 = nn.BatchNorm2d(64)
        self.conv2 = conv3x3(64, 64, 2)
        self.bn2 = nn.BatchNorm2d(64)

        _, _, blk1, n_blocks1, ch1 = spec["stage1"]
        block1 = TorchBottleneck if blk1 == "BOTTLENECK" else TorchBasicBlock
        exp1 = 4 if blk1 == "BOTTLENECK" else 1
        mods, cin = [], 64
        for k in range(n_blocks1[0]):
            mods.append(block1(cin, ch1[0], 1, 1, 1, cin != ch1[0] * exp1))
            cin = ch1[0] * exp1
        self.layer1 = nn.Sequential(*mods)

        prev_ch = [cin]
        for sidx, key in enumerate(("stage2", "stage3", "stage4"), start=2):
            n_mod, n_br, blk, n_blocks, n_ch = spec[key]
            block = TorchBottleneck if blk == "BOTTLENECK" else TorchBasicBlock
            exp = 4 if blk == "BOTTLENECK" else 1
            stage_ch = [c * exp for c in n_ch]
            trans = []
            for b in range(n_br):
                if b < len(prev_ch):
                    if prev_ch[b] != stage_ch[b]:
                        trans.append(nn.Sequential(
                            conv3x3(prev_ch[b], stage_ch[b], 1),
                            nn.BatchNorm2d(stage_ch[b])))
                    else:
                        trans.append(None)
                else:
                    trans.append(nn.Sequential(nn.Sequential(
                        conv3x3(prev_ch[-1], stage_ch[b], 2),
                        nn.BatchNorm2d(stage_ch[b]))))
            setattr(self, f"transition{sidx - 1}", nn.ModuleList(trans))
            mods = []
            in_ch = list(stage_ch)
            for m in range(n_mod):
                mods.append(_TorchHRModule(n_br, block, n_blocks, n_ch, in_ch))
                in_ch = mods[-1].out_ch
            setattr(self, key, nn.Sequential(*mods))
            prev_ch = stage_ch

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        xs = [self.layer1(x)]
        for sidx, key in enumerate(("stage2", "stage3", "stage4"), start=2):
            trans = getattr(self, f"transition{sidx - 1}")
            new_xs = []
            for b, t in enumerate(trans):
                src = xs[b] if b < len(xs) else xs[-1]
                new_xs.append(F.relu(t(src)) if t is not None else src)
            xs = getattr(self, key)(new_xs)
        return tuple(xs)


# ========================================== flax-scope-named building blocks
class ConvBN(nn.Module):
    """flax ConvBNReLU twin: attrs .conv/.bn; act in {True/'relu',
    'relu6', False/None}; groups for depthwise variants."""

    def __init__(self, cin, cout, k=3, stride=1, dilation=1, padding=None,
                 act=True, groups=1):
        super().__init__()
        if padding is None:
            padding = dilation * (k - 1) // 2
        self.conv = nn.Conv2d(cin, cout, k, stride, padding,
                              dilation=dilation, groups=groups, bias=False)
        self.bn = nn.BatchNorm2d(cout)
        self.act = act

    def forward(self, x):
        y = self.bn(self.conv(x))
        if self.act == "relu6":
            return F.relu6(y)
        return F.relu(y) if self.act else y


class TorchSeparableConv2d(nn.Module):
    """flax SeparableConv2d twin (scopes depthwise/dw_bn/pointwise/pw_bn)."""

    def __init__(self, cin, cout, stride=1, dilation=1, relu_first=True):
        super().__init__()
        self.relu_first = relu_first
        self.depthwise = nn.Conv2d(cin, cin, 3, stride, padding=dilation,
                                   dilation=dilation, groups=cin, bias=False)
        self.dw_bn = nn.BatchNorm2d(cin)
        self.pointwise = nn.Conv2d(cin, cout, 1, bias=False)
        self.pw_bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        if self.relu_first:
            x = F.relu(x)
        return self.pw_bn(self.pointwise(self.dw_bn(self.depthwise(x))))


class TorchXceptionBlock(nn.Module):
    def __init__(self, cin, channels, stride=1, dilation=1, skip_type="conv",
                 relu_first=True):
        super().__init__()
        self.skip_type = skip_type
        c = cin
        for i, ch in enumerate(channels):
            s = stride if i == len(channels) - 1 else 1
            setattr(self, f"sep{i + 1}",
                    TorchSeparableConv2d(c, ch, s, dilation, relu_first))
            c = ch
        self.n = len(channels)
        if skip_type == "conv":
            self.skip_conv = conv1x1(cin, channels[-1], stride)
            self.skip_bn = nn.BatchNorm2d(channels[-1])

    def forward(self, x):
        y = x
        for i in range(self.n):
            y = getattr(self, f"sep{i + 1}")(y)
        if self.skip_type == "conv":
            y = y + self.skip_bn(self.skip_conv(x))
        elif self.skip_type == "sum":
            y = y + x
        return y


class TorchXception65(nn.Module):
    """flax-scope-named Aligned Xception-65 mirroring backbones/xception.py."""

    def __init__(self, output_stride=16, middle_blocks=16):
        super().__init__()
        self.middle_blocks = middle_blocks
        if output_stride == 16:
            entry3_stride, middle_d, exit_d = 2, 1, (1, 2)
        elif output_stride == 8:
            entry3_stride, middle_d, exit_d = 1, 2, (2, 4)
        else:
            raise ValueError(output_stride)
        self.conv1 = ConvBN(3, 32, 3, 2)
        self.conv2 = ConvBN(32, 64, 3, 1)
        self.block1 = TorchXceptionBlock(64, (128, 128, 128), 2,
                                         relu_first=False)
        self.block2 = TorchXceptionBlock(128, (256, 256, 256), 2)
        self.block3 = TorchXceptionBlock(256, (728, 728, 728), entry3_stride)
        for i in range(middle_blocks):
            setattr(self, f"middle{i + 1}",
                    TorchXceptionBlock(728, (728, 728, 728), 1, middle_d,
                                       skip_type="sum"))
        self.exit1 = TorchXceptionBlock(728, (728, 1024, 1024), 1, exit_d[0])
        self.exit_sep1 = TorchSeparableConv2d(1024, 1536, 1, exit_d[1],
                                              relu_first=False)
        self.exit_sep2 = TorchSeparableConv2d(1536, 1536, 1, exit_d[1],
                                              relu_first=False)
        self.exit_sep3 = TorchSeparableConv2d(1536, 2048, 1, exit_d[1],
                                              relu_first=False)

    def forward(self, x):
        x = self.conv2(self.conv1(x))
        c1 = self.block1(x)
        c2 = self.block2(c1)
        x = self.block3(c2)
        for i in range(self.middle_blocks):
            x = getattr(self, f"middle{i + 1}")(x)
        c3 = x
        x = self.exit1(x)
        for i in (1, 2, 3):
            x = F.relu(getattr(self, f"exit_sep{i}")(x))
        return c1, c2, c3, x


# ============================================= flax-scope-named seg heads
class TorchFCNHead(nn.Module):
    """flax FCNHead twin (scopes block.{conv,bn}, classifier)."""

    def __init__(self, cin, nclass, channels=None):
        super().__init__()
        inter = channels or cin // 4
        self.block = ConvBN(cin, inter, 3)
        self.classifier = nn.Conv2d(inter, nclass, 1, bias=True)

    def forward(self, x):  # eval mode: dropout = identity
        return self.classifier(self.block(x))


class TorchASPP(nn.Module):
    """flax ASPP twin (scopes b0..b3, image_pool, project)."""

    def __init__(self, cin, out=256, rates=(6, 12, 18), separable=True):
        super().__init__()
        self.separable = separable
        self.b0 = ConvBN(cin, out, 1, padding=0)
        for i, r in enumerate(rates):
            if separable:
                setattr(self, f"b{i + 1}",
                        TorchSeparableConv2d(cin, out, 1, r, relu_first=False))
            else:
                setattr(self, f"b{i + 1}", ConvBN(cin, out, 3, dilation=r))
        self.n_rates = len(rates)
        self.image_pool = ConvBN(cin, out, 1, padding=0)
        self.project = ConvBN(out * (2 + len(rates)), out, 1, padding=0)

    def forward(self, x):
        size = x.shape[2:]
        branches = [self.b0(x)]
        for i in range(self.n_rates):
            y = getattr(self, f"b{i + 1}")(x)
            if self.separable:
                y = F.relu(y)
            branches.append(y)
        pooled = self.image_pool(F.adaptive_avg_pool2d(x, 1))
        branches.append(pooled.expand(-1, -1, size[0], size[1]))
        return self.project(torch.cat(branches, dim=1))


class TorchFCN(nn.Module):
    """Whole-model FCN twin: flax-scope names backbone/head/(auxlayer)."""

    def __init__(self, backbone, c4_ch, nclass, aux=False, c3_ch=None):
        super().__init__()
        self.backbone = backbone
        self.head = TorchFCNHead(c4_ch, nclass)
        self.aux = aux
        if aux:
            self.auxlayer = TorchFCNHead(c3_ch, nclass)

    def forward(self, x):
        size = x.shape[2:]
        c1, c2, c3, c4 = self.backbone(x)
        outs = [F.interpolate(self.head(c4), size=size, mode="bilinear",
                              align_corners=True)]
        if self.aux:
            outs.append(F.interpolate(self.auxlayer(c3), size=size,
                                      mode="bilinear", align_corners=True))
        return tuple(outs)


class TorchDeepLabV3Plus(nn.Module):
    """Whole-model DeepLabv3+ twin (flax-scope names throughout)."""

    def __init__(self, backbone, nclass, output_stride=16, c1_ch=128,
                 c4_ch=2048):
        super().__init__()
        rates = (12, 24, 36) if output_stride == 8 else (6, 12, 18)
        self.backbone = backbone
        self.head = TorchASPP(c4_ch, 256, rates, separable=True)
        self.c1_proj = ConvBN(c1_ch, 48, 1, padding=0)
        self.decoder0 = TorchSeparableConv2d(256 + 48, 256, relu_first=False)
        self.decoder1 = TorchSeparableConv2d(256, 256, relu_first=False)
        self.classifier = nn.Conv2d(256, nclass, 1, bias=True)

    def forward(self, x):
        size = x.shape[2:]
        c1, c2, c3, c4 = self.backbone(x)
        y = self.head(c4)
        low = self.c1_proj(c1)
        y = F.interpolate(y, size=low.shape[2:], mode="bilinear",
                          align_corners=True)
        y = torch.cat([y, low], dim=1)
        y = F.relu(self.decoder0(y))
        y = F.relu(self.decoder1(y))
        out = self.classifier(y)
        return (F.interpolate(out, size=size, mode="bilinear",
                              align_corners=True),)


# ===================================================== PSPNet (config #2)
class TorchPyramidPooling(nn.Module):
    """flax modules/module.py::PyramidPooling twin (scopes p0..p3)."""

    def __init__(self, cin, bins=(1, 2, 3, 6), out=None):
        super().__init__()
        self.bins = bins
        for i in range(len(bins)):
            setattr(self, f"p{i}", ConvBN(cin, out or cin // 4, 1, padding=0))

    def forward(self, x):
        size = x.shape[2:]
        outs = [x]
        for i, b in enumerate(self.bins):
            y = getattr(self, f"p{i}")(F.adaptive_avg_pool2d(x, b))
            outs.append(F.interpolate(y, size=size, mode="bilinear",
                                      align_corners=True))
        return torch.cat(outs, dim=1)


class TorchPSPHead(nn.Module):
    """flax models/pspnet.py::_PSPHead twin (psp/block/classifier)."""

    def __init__(self, cin, nclass):
        super().__init__()
        self.psp = TorchPyramidPooling(cin)
        self.block = ConvBN(cin * 2, 512, 3)
        self.classifier = nn.Conv2d(512, nclass, 1, bias=True)

    def forward(self, x):  # eval: dropout = identity
        return self.classifier(self.block(self.psp(x)))


class TorchPSPNet(nn.Module):
    """Whole-model PSPNet twin (backbone/head/auxlayer)."""

    def __init__(self, backbone, c4_ch, nclass, aux=True, c3_ch=None):
        super().__init__()
        self.backbone = backbone
        self.head = TorchPSPHead(c4_ch, nclass)
        self.aux = aux
        if aux:
            self.auxlayer = TorchFCNHead(c3_ch, nclass)

    def forward(self, x):
        size = x.shape[2:]
        c1, c2, c3, c4 = self.backbone(x)
        outs = [F.interpolate(self.head(c4), size=size, mode="bilinear",
                              align_corners=True)]
        if self.aux:
            outs.append(F.interpolate(self.auxlayer(c3), size=size,
                                      mode="bilinear", align_corners=True))
        return tuple(outs)


# ===================================================== DANet (config #5a)
class TorchPAM(nn.Module):
    """flax models/danet.py::PAM twin (query/key/value/gamma)."""

    def __init__(self, c):
        super().__init__()
        self.query = nn.Conv2d(c, c // 8, 1, bias=True)
        self.key = nn.Conv2d(c, c // 8, 1, bias=True)
        self.value = nn.Conv2d(c, c, 1, bias=True)
        self.gamma = nn.Parameter(torch.zeros(()))

    def forward(self, x):
        n, c, h, w = x.shape
        q = self.query(x).reshape(n, c // 8, h * w).permute(0, 2, 1)
        k = self.key(x).reshape(n, c // 8, h * w)
        attn = F.softmax(torch.bmm(q, k), dim=-1)  # (n, p, p)
        v = self.value(x).reshape(n, c, h * w)
        out = torch.bmm(v, attn.permute(0, 2, 1)).reshape(n, c, h, w)
        return self.gamma * out + x


class TorchCAM(nn.Module):
    """flax models/danet.py::CAM twin (gamma only)."""

    def __init__(self):
        super().__init__()
        self.gamma = nn.Parameter(torch.zeros(()))

    def forward(self, x):
        n, c, h, w = x.shape
        flat = x.reshape(n, c, h * w)  # (n, c, p)
        energy = torch.bmm(flat, flat.permute(0, 2, 1))  # (n, c, d)
        energy = energy.max(dim=-1, keepdim=True).values - energy
        attn = F.softmax(energy, dim=-1)
        out = torch.bmm(attn, flat).reshape(n, c, h, w)
        return self.gamma * out + x


class TorchDANet(nn.Module):
    """Whole-model DANet twin (conv_p1/pam/conv_p2, conv_c1/cam/conv_c2,
    out/p_out/c_out); eval mode, dropouts identity."""

    def __init__(self, backbone, c4_ch, nclass, aux=True):
        super().__init__()
        inter = c4_ch // 4
        self.backbone = backbone
        self.conv_p1 = ConvBN(c4_ch, inter, 3)
        self.pam = TorchPAM(inter)
        self.conv_p2 = ConvBN(inter, inter, 3)
        self.conv_c1 = ConvBN(c4_ch, inter, 3)
        self.cam = TorchCAM()
        self.conv_c2 = ConvBN(inter, inter, 3)
        self.out = nn.Conv2d(inter, nclass, 1, bias=True)
        self.aux = aux
        if aux:
            self.p_out = nn.Conv2d(inter, nclass, 1, bias=True)
            self.c_out = nn.Conv2d(inter, nclass, 1, bias=True)

    def forward(self, x):
        size = x.shape[2:]
        c1, c2, c3, c4 = self.backbone(x)
        pa = self.conv_p2(self.pam(self.conv_p1(c4)))
        ca = self.conv_c2(self.cam(self.conv_c1(c4)))
        up = lambda t: F.interpolate(t, size=size, mode="bilinear",  # noqa: E731
                                     align_corners=True)
        outs = [up(self.out(pa + ca))]
        if self.aux:
            outs.append(up(self.p_out(pa)))
            outs.append(up(self.c_out(ca)))
        return tuple(outs)


# ===================================================== OCNet (config #5b)
class TorchSelfAttentionBlock(nn.Module):
    """flax models/ocnet.py::SelfAttentionBlock twin
    (f_query/f_key/f_value/w_out), scaled by key_channels**-0.5."""

    def __init__(self, cin, key_ch, val_ch, out_ch):
        super().__init__()
        self.key_ch = key_ch
        self.f_query = ConvBN(cin, key_ch, 1, padding=0)
        self.f_key = ConvBN(cin, key_ch, 1, padding=0)
        self.f_value = nn.Conv2d(cin, val_ch, 1, bias=True)
        self.w_out = nn.Conv2d(val_ch, out_ch, 1, bias=True)

    def forward(self, x):
        n, c, h, w = x.shape
        q = self.f_query(x).reshape(n, self.key_ch, h * w).permute(0, 2, 1)
        k = self.f_key(x).reshape(n, self.key_ch, h * w)
        attn = F.softmax(torch.bmm(q, k) * self.key_ch ** -0.5, dim=-1)
        v = self.f_value(x).reshape(n, -1, h * w).permute(0, 2, 1)
        ctx = torch.bmm(attn, v).permute(0, 2, 1).reshape(n, -1, h, w)
        return self.w_out(ctx)


class TorchBaseOCModule(nn.Module):
    """flax BaseOCModule twin (attn/proj); eval dropout identity."""

    def __init__(self, cin, out_ch):
        super().__init__()
        self.attn = TorchSelfAttentionBlock(cin, out_ch // 2, out_ch, out_ch)
        self.proj = ConvBN(out_ch + cin, out_ch, 1, padding=0)

    def forward(self, x):
        return self.proj(torch.cat([self.attn(x), x], dim=1))


class TorchOCNet(nn.Module):
    """Whole-model OCNet (base OC) twin (reduce/oc/classifier/auxlayer)."""

    def __init__(self, backbone, c4_ch, nclass, aux=True, c3_ch=None):
        super().__init__()
        self.backbone = backbone
        self.reduce = ConvBN(c4_ch, 512, 3)
        self.oc = TorchBaseOCModule(512, 512)
        self.classifier = nn.Conv2d(512, nclass, 1, bias=True)
        self.aux = aux
        if aux:
            self.auxlayer = TorchFCNHead(c3_ch, nclass)

    def forward(self, x):
        size = x.shape[2:]
        c1, c2, c3, c4 = self.backbone(x)
        y = self.oc(self.reduce(c4))
        outs = [F.interpolate(self.classifier(y), size=size, mode="bilinear",
                              align_corners=True)]
        if self.aux:
            outs.append(F.interpolate(self.auxlayer(c3), size=size,
                                      mode="bilinear", align_corners=True))
        return tuple(outs)


# ============================================= HRNet + OCR (config #4)
class TorchObjectAttention(nn.Module):
    """flax models/hrnet_seg.py::ObjectAttention twin
    (f_pixel/f_object/f_down/f_up)."""

    def __init__(self, cin, key_ch, out_ch):
        super().__init__()
        self.key_ch = key_ch
        self.f_pixel = ConvBN(cin, key_ch, 1, padding=0)
        self.f_object = ConvBN(cin, key_ch, 1, padding=0)
        self.f_down = ConvBN(cin, key_ch, 1, padding=0)
        self.f_up = ConvBN(key_ch, out_ch, 1, padding=0)

    def forward(self, x, regions):
        # x: (n, c, h, w); regions: (n, k, c)
        n, c, h, w = x.shape
        k = regions.shape[1]
        q = self.f_pixel(x).reshape(n, self.key_ch, h * w).permute(0, 2, 1)
        reg = regions.permute(0, 2, 1)[:, :, :, None]  # (n, c, k, 1)
        key = self.f_object(reg).reshape(n, self.key_ch, k)
        v = self.f_down(reg).reshape(n, self.key_ch, k).permute(0, 2, 1)
        attn = F.softmax(torch.bmm(q, key) * self.key_ch ** -0.5, dim=-1)
        ctx = torch.bmm(attn, v).permute(0, 2, 1).reshape(
            n, self.key_ch, h, w
        )
        return self.f_up(ctx)


class TorchHRNetSegOCR(nn.Module):
    """Whole-model HRNetV2+OCR twin (aux_conv/aux_classifier/conv3x3_ocr/
    ocr_attn/ocr_fuse/classifier); eval dropout identity."""

    def __init__(self, spec, nclass, mid_ch=512, key_ch=256):
        super().__init__()
        self.backbone = TorchHRNet(spec)
        _, _, blk4, _, ch4 = spec["stage4"]
        exp = 4 if blk4 == "BOTTLENECK" else 1
        feats = sum(c * exp for c in ch4)
        self.aux_conv = ConvBN(feats, feats, 1, padding=0)
        self.aux_classifier = nn.Conv2d(feats, nclass, 1, bias=True)
        self.conv3x3_ocr = ConvBN(feats, mid_ch, 3)
        self.ocr_attn = TorchObjectAttention(mid_ch, key_ch, mid_ch)
        self.ocr_fuse = ConvBN(mid_ch * 2, mid_ch, 1, padding=0)
        self.classifier = nn.Conv2d(mid_ch, nclass, 1, bias=True)

    def forward(self, x):
        size = x.shape[2:]
        branches = self.backbone(x)
        hi = branches[0].shape[2:]
        ups = [branches[0]] + [
            F.interpolate(b, size=hi, mode="bilinear", align_corners=True)
            for b in branches[1:]
        ]
        feats = torch.cat(ups, dim=1)
        aux = self.aux_classifier(self.aux_conv(feats))
        pixels = self.conv3x3_ocr(feats)
        # SpatialGather: softmax over pixels per class
        n, c, h, w = pixels.shape
        k = aux.shape[1]
        attn = F.softmax(aux.reshape(n, k, h * w), dim=-1)
        regions = torch.bmm(attn, pixels.reshape(n, c, h * w).permute(0, 2, 1))
        ctx = self.ocr_attn(pixels, regions)
        y = self.ocr_fuse(torch.cat([ctx, pixels], dim=1))
        out = self.classifier(y)
        return (
            F.interpolate(out, size=size, mode="bilinear", align_corners=True),
            F.interpolate(aux, size=size, mode="bilinear", align_corners=True),
        )


# ===================================== wave-2 zoo twins (VERDICT r4 #6)
class TorchFlaxInvertedResidual(nn.Module):
    """flax modules/basic.py::InvertedResidual twin (scopes
    expand/depthwise/project/project_bn, relu6 activations)."""

    def __init__(self, cin, cout, stride=1, expand_ratio=6, dilation=1):
        super().__init__()
        hidden = int(round(cin * expand_ratio))
        self.use_res = stride == 1 and cin == cout
        self.has_expand = expand_ratio != 1
        if self.has_expand:
            self.expand = ConvBN(cin, hidden, 1, padding=0, act="relu6")
        self.depthwise = ConvBN(hidden, hidden, 3, stride, dilation,
                                act="relu6", groups=hidden)
        self.project = conv1x1(hidden, cout)
        self.project_bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        y = self.expand(x) if self.has_expand else x
        y = self.project_bn(self.project(self.depthwise(y)))
        return x + y if self.use_res else y


class TorchFastSCNN(nn.Module):
    """Whole-model Fast-SCNN twin mirroring models/fast_scnn.py scopes."""

    def __init__(self, nclass, aux=False):
        super().__init__()
        self.conv = ConvBN(3, 32, 3, 2)
        self.dsconv1 = TorchSeparableConv2d(32, 48, 2, relu_first=False)
        self.dsconv2 = TorchSeparableConv2d(48, 64, 2, relu_first=False)
        cin = 64
        self.settings = ((64, 3, 2), (96, 3, 2), (128, 3, 1))
        for i, (c, n, s) in enumerate(self.settings):
            for b in range(n):
                setattr(self, f"bottleneck{i}_{b}", TorchFlaxInvertedResidual(
                    cin, c, s if b == 0 else 1, 6))
                cin = c
        self.ppm = TorchPyramidPooling(128, out=32)
        self.ppm_out = ConvBN(128 + 4 * 32, 128, 1, padding=0)
        self.ffm_dwconv = ConvBN(128, 128, 3, act=False, groups=128)
        self.ffm_lower_proj = nn.Conv2d(128, 128, 1, bias=True)
        self.ffm_higher_proj = nn.Conv2d(64, 128, 1, bias=True)
        self.ffm_higher_bn = nn.BatchNorm2d(128)
        self.cls_ds1 = TorchSeparableConv2d(128, 128, 1, relu_first=False)
        self.cls_ds2 = TorchSeparableConv2d(128, 128, 1, relu_first=False)
        self.classifier = nn.Conv2d(128, nclass, 1, bias=True)
        self.use_aux = aux
        if aux:
            self.auxlayer = TorchFCNHead(64, nclass)

    def forward(self, x):
        size = x.shape[2:]
        y = self.conv(x)
        y = F.relu(self.dsconv1(y))
        higher = F.relu(self.dsconv2(y))
        z = higher
        for i, (c, n, s) in enumerate(self.settings):
            for b in range(n):
                z = getattr(self, f"bottleneck{i}_{b}")(z)
        z = self.ppm_out(self.ppm(z))
        lower = F.interpolate(z, size=higher.shape[2:], mode="bilinear",
                              align_corners=True)
        lower = self.ffm_lower_proj(self.ffm_dwconv(lower))
        hi = self.ffm_higher_bn(self.ffm_higher_proj(higher))
        fused = F.relu(lower + hi)
        out = F.relu(self.cls_ds1(fused))
        out = F.relu(self.cls_ds2(out))
        out = self.classifier(out)  # eval: dropout identity
        outs = [F.interpolate(out, size=size, mode="bilinear",
                              align_corners=True)]
        if self.use_aux:
            outs.append(F.interpolate(self.auxlayer(higher), size=size,
                                      mode="bilinear", align_corners=True))
        return tuple(outs)


class _TorchARM(nn.Module):
    """flax models/bisenet.py::_ARM twin (conv/gate_conv/gate_bn)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = ConvBN(cin, cout, 3)
        self.gate_conv = conv1x1(cout, cout)
        self.gate_bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        x = self.conv(x)
        g = self.gate_bn(self.gate_conv(F.adaptive_avg_pool2d(x, 1)))
        return x * torch.sigmoid(g)


class _TorchFFM(nn.Module):
    """flax models/bisenet.py::_FFM twin (fuse/se1/se2)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.fuse = ConvBN(cin, cout, 1, padding=0)
        self.se1 = nn.Conv2d(cout, cout // 4, 1, bias=True)
        self.se2 = nn.Conv2d(cout // 4, cout, 1, bias=True)

    def forward(self, spatial, context):
        x = self.fuse(torch.cat([spatial, context], dim=1))
        g = F.relu(self.se1(F.adaptive_avg_pool2d(x, 1)))
        g = torch.sigmoid(self.se2(g))
        return x + x * g


class TorchBiSeNet(nn.Module):
    """Whole-model BiSeNet twin mirroring models/bisenet.py scopes."""

    def __init__(self, backbone, c3_ch, c4_ch, nclass, aux=False):
        super().__init__()
        self.backbone = backbone
        self.sp1 = ConvBN(3, 64, 7, 2)
        self.sp2 = ConvBN(64, 64, 3, 2)
        self.sp3 = ConvBN(64, 64, 3, 2)
        self.sp4 = ConvBN(64, 128, 1, padding=0)
        self.arm4 = _TorchARM(c4_ch, 128)
        self.tail_proj = nn.Conv2d(c4_ch, 128, 1, bias=True)
        self.refine4 = ConvBN(128, 128, 3)
        self.arm3 = _TorchARM(c3_ch, 128)
        self.refine3 = ConvBN(128, 128, 3)
        self.ffm = _TorchFFM(256, 256)
        self.head = TorchFCNHead(256, nclass, channels=64)
        self.use_aux = aux
        if aux:
            self.aux3 = TorchFCNHead(128, nclass, channels=64)
            self.aux4 = TorchFCNHead(128, nclass, channels=64)

    def forward(self, x):
        size = x.shape[2:]
        sp = self.sp4(self.sp3(self.sp2(self.sp1(x))))
        c1, c2, c3, c4 = self.backbone(x)
        tail = F.adaptive_avg_pool2d(c4, 1)
        arm4 = self.arm4(c4) + self.tail_proj(
            tail.expand(-1, -1, c4.shape[2], c4.shape[3])
        )
        arm4 = F.interpolate(arm4, size=c3.shape[2:], mode="bilinear",
                             align_corners=True)
        arm4 = self.refine4(arm4)
        ctx = self.arm3(c3) + arm4
        ctx = F.interpolate(ctx, size=sp.shape[2:], mode="bilinear",
                            align_corners=True)
        ctx = self.refine3(ctx)
        fused = self.ffm(sp, ctx)
        outs = [F.interpolate(self.head(fused), size=size, mode="bilinear",
                              align_corners=True)]
        if self.use_aux:
            outs.append(F.interpolate(self.aux3(ctx), size=size,
                                      mode="bilinear", align_corners=True))
            outs.append(F.interpolate(self.aux4(arm4), size=size,
                                      mode="bilinear", align_corners=True))
        return tuple(outs)


class _TorchCFF(nn.Module):
    """flax models/icnet.py::_CFF twin (aux_cls/low_conv/low_bn/
    high_conv/high_bn)."""

    def __init__(self, low_ch, high_ch, features, nclass):
        super().__init__()
        self.aux_cls = nn.Conv2d(low_ch, nclass, 1, bias=True)
        self.low_conv = nn.Conv2d(low_ch, features, 3, padding=2, dilation=2,
                                  bias=False)
        self.low_bn = nn.BatchNorm2d(features)
        self.high_conv = conv1x1(high_ch, features)
        self.high_bn = nn.BatchNorm2d(features)

    def forward(self, low, high):
        low = F.interpolate(low, size=high.shape[2:], mode="bilinear",
                            align_corners=True)
        aux = self.aux_cls(low)
        low = self.low_bn(self.low_conv(low))
        high = self.high_bn(self.high_conv(high))
        return F.relu(low + high), aux


class TorchICNet(nn.Module):
    """Whole-model ICNet twin mirroring models/icnet.py scopes; the
    backbone runs on BOTH the 1/2 and 1/4 inputs with shared weights,
    exactly like the flax module's param reuse."""

    def __init__(self, backbone, c2_ch, c4_ch, nclass):
        super().__init__()
        self.backbone = backbone
        self.sub1_conv1 = ConvBN(3, 32, 3, 2)
        self.sub1_conv2 = ConvBN(32, 32, 3, 2)
        self.sub1_conv3 = ConvBN(32, 64, 3, 2)
        self.ppm = TorchPyramidPooling(c4_ch)
        self.ppm_proj = ConvBN(c4_ch * 2, 256, 1, padding=0)
        self.sub2_proj = ConvBN(c2_ch, 256, 1, padding=0)
        self.cff24 = _TorchCFF(256, 256, 128, nclass)
        self.cff12 = _TorchCFF(128, 64, 128, nclass)
        self.classifier = nn.Conv2d(128, nclass, 1, bias=True)

    def forward(self, x):
        size = x.shape[2:]
        h, w = size
        sub1 = self.sub1_conv3(self.sub1_conv2(self.sub1_conv1(x)))
        x_half = F.interpolate(x, size=(h // 2, w // 2), mode="bilinear",
                               align_corners=True)
        _, sub2, _, _ = self.backbone(x_half)
        x_quarter = F.interpolate(x, size=(h // 4, w // 4), mode="bilinear",
                                  align_corners=True)
        _, _, _, c4_q = self.backbone(x_quarter)
        sub4 = self.ppm_proj(self.ppm(c4_q))
        fused24, aux4 = self.cff24(sub4, self.sub2_proj(sub2))
        fused12, aux2 = self.cff12(fused24, sub1)
        up = F.interpolate(
            fused12, size=(fused12.shape[2] * 2, fused12.shape[3] * 2),
            mode="bilinear", align_corners=True,
        )
        out = F.interpolate(self.classifier(up), size=size, mode="bilinear",
                            align_corners=True)
        return out, aux2, aux4


class _TorchEncoding(nn.Module):
    """flax models/encnet.py::_Encoding twin (params codewords/scale)."""

    def __init__(self, c, k=32):
        super().__init__()
        g = torch.Generator().manual_seed(17)
        self.codewords = nn.Parameter(
            torch.randn(k, c, generator=g) / float(np.sqrt(k * c))
        )
        self.scale = nn.Parameter(torch.rand(k, generator=g) * 0.4 - 0.2)

    def forward(self, x):  # x NCHW
        b, c, h, w = x.shape
        z = x.reshape(b, c, h * w).permute(0, 2, 1)  # (b, hw, c)
        z2 = (z * z).sum(-1, keepdim=True)
        c2 = (self.codewords * self.codewords).sum(-1)
        d2 = z2 - 2.0 * (z @ self.codewords.t()) + c2[None, None, :]
        assign = F.softmax(-self.scale[None, None, :] * d2, dim=-1)
        agg_z = torch.einsum("bik,bic->bkc", assign, z)
        agg_c = assign.sum(dim=1)[..., None] * self.codewords[None]
        return agg_z - agg_c  # (b, k, c)


class TorchEncModule(nn.Module):
    """flax models/encnet.py::EncModule twin (encoding/enc_bn/fc/selayer).
    enc_bn is BatchNorm over the CODEWORD-FEATURE axis c: flax
    normalizes the last axis of (b, k, c); torch BatchNorm1d(C) over
    (b, c, k) is the same statistic."""

    def __init__(self, c, nclass, k=32, se_loss=True):
        super().__init__()
        self.encoding = _TorchEncoding(c, k)
        self.enc_bn = nn.BatchNorm1d(c)
        self.fc = nn.Linear(c, c)
        self.se_loss = se_loss
        if se_loss:
            self.selayer = nn.Linear(c, nclass)

    def forward(self, x):
        e = self.encoding(x)  # (b, k, c)
        e = F.relu(self.enc_bn(e.permute(0, 2, 1)).permute(0, 2, 1))
        e = e.mean(dim=1)  # (b, c)
        gamma = torch.sigmoid(self.fc(e))
        y = x * gamma[:, :, None, None]
        outs = [y]
        if self.se_loss:
            outs.append(self.selayer(e))
        return outs


class TorchEncNet(nn.Module):
    """Whole-model EncNet twin mirroring models/encnet.py scopes."""

    def __init__(self, backbone, c2_ch, c3_ch, c4_ch, nclass, lateral=True,
                 se_loss=True, aux=False):
        super().__init__()
        self.backbone = backbone
        self.fcn_conv = ConvBN(c4_ch, 512, 3)
        self.lateral = lateral
        if lateral:
            self.lateral_c2 = ConvBN(c2_ch, 512, 1, padding=0)
            self.lateral_c3 = ConvBN(c3_ch, 512, 1, padding=0)
            self.fusion = ConvBN(512 * 3, 512, 3)
        self.encmodule = TorchEncModule(512, nclass, se_loss=se_loss)
        self.classifier = nn.Conv2d(512, nclass, 1, bias=True)
        self.se_loss = se_loss
        self.use_aux = aux
        if aux:
            self.auxlayer = TorchFCNHead(c3_ch, nclass)

    def forward(self, x):
        size = x.shape[2:]
        c1, c2, c3, c4 = self.backbone(x)
        y = self.fcn_conv(c4)
        if self.lateral:
            l2 = F.interpolate(self.lateral_c2(c2), size=y.shape[2:],
                               mode="bilinear", align_corners=True)
            l3 = F.interpolate(self.lateral_c3(c3), size=y.shape[2:],
                               mode="bilinear", align_corners=True)
            y = self.fusion(torch.cat([y, l2, l3], dim=1))
        enc_outs = self.encmodule(y)
        out = self.classifier(enc_outs[0])  # eval: dropout identity
        outs = [F.interpolate(out, size=size, mode="bilinear",
                              align_corners=True)]
        if self.se_loss:
            outs.append(enc_outs[1])  # (b, nclass), non-spatial
        if self.use_aux:
            outs.append(F.interpolate(self.auxlayer(c3), size=size,
                                      mode="bilinear", align_corners=True))
        return tuple(outs)


class TorchCrissCross(nn.Module):
    """flax models/ccnet.py::CrissCrossAttention twin
    (query/key/value/gamma), including the -1e9 column-diagonal mask."""

    def __init__(self, c, reduction=8):
        super().__init__()
        inter = max(c // reduction, 1)
        self.query = conv1x1(c, inter)
        self.key = conv1x1(c, inter)
        self.value = conv1x1(c, c)
        self.gamma = nn.Parameter(torch.zeros(()))

    def forward(self, x):  # NCHW
        b, c, h, w = x.shape
        q = self.query(x).permute(0, 2, 3, 1)  # (b, h, w, inter)
        k = self.key(x).permute(0, 2, 3, 1)
        v = self.value(x).permute(0, 2, 3, 1)
        e_col = torch.einsum("bijc,bkjc->bijk", q, k)
        mask = torch.where(
            torch.eye(h, dtype=torch.bool)[None, :, None, :],
            torch.tensor(-1e9), torch.tensor(0.0),
        )
        e_col = e_col + mask
        e_row = torch.einsum("bijc,bikc->bijk", q, k)
        att = F.softmax(torch.cat([e_col, e_row], dim=-1), dim=-1)
        a_col, a_row = att[..., :h], att[..., h:]
        out = torch.einsum("bijk,bkjc->bijc", a_col, v) + torch.einsum(
            "bijk,bikc->bijc", a_row, v
        )
        return x + self.gamma * out.permute(0, 3, 1, 2)


class TorchCCNet(nn.Module):
    """Whole-model CCNet twin mirroring models/ccnet.py scopes; the cca
    module is applied ``recurrence`` times with shared weights."""

    def __init__(self, backbone, c3_ch, c4_ch, nclass, recurrence=2,
                 aux=False):
        super().__init__()
        self.backbone = backbone
        self.conva = ConvBN(c4_ch, 512, 3)
        self.cca = TorchCrissCross(512)
        self.convb = ConvBN(512, 512, 3)
        self.bottleneck = ConvBN(c4_ch + 512, 512, 3)
        self.classifier = nn.Conv2d(512, nclass, 1, bias=True)
        self.recurrence = recurrence
        self.use_aux = aux
        if aux:
            self.auxlayer = TorchFCNHead(c3_ch, nclass)

    def forward(self, x):
        size = x.shape[2:]
        c1, c2, c3, c4 = self.backbone(x)
        y = self.conva(c4)
        for _ in range(self.recurrence):
            y = self.cca(y)
        y = self.convb(y)
        y = self.bottleneck(torch.cat([c4, y], dim=1))
        out = self.classifier(y)  # eval: dropout identity
        outs = [F.interpolate(out, size=size, mode="bilinear",
                              align_corners=True)]
        if self.use_aux:
            outs.append(F.interpolate(self.auxlayer(c3), size=size,
                                      mode="bilinear", align_corners=True))
        return tuple(outs)


# ============================== wave-3 zoo twins (VERDICT r4 #6, round 5)
def _up(x, size):
    return F.interpolate(x, size=size, mode="bilinear", align_corners=True)


class _TorchDoubleConv(nn.Module):
    """flax models/unet.py::_DoubleConv twin (scopes conv1/conv2)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = ConvBN(cin, cout, 3)
        self.conv2 = ConvBN(cout, cout, 3)

    def forward(self, x):
        return self.conv2(self.conv1(x))


class TorchUNet(nn.Module):
    """Whole-model UNet twin mirroring models/unet.py scopes
    (down{i}, bottom, up{i}_proj, up{i}, classifier)."""

    def __init__(self, nclass, base=64):
        super().__init__()
        c = base
        chans = (c, c * 2, c * 4, c * 8)
        cin = 3
        for i, ch in enumerate(chans):
            setattr(self, f"down{i}", _TorchDoubleConv(cin, ch))
            cin = ch
        self.bottom = _TorchDoubleConv(c * 8, c * 16)
        up_in = c * 16
        for i, ch in enumerate((c * 8, c * 4, c * 2, c)):
            setattr(self, f"up{i}_proj", nn.Conv2d(up_in, ch, 1, bias=True))
            # concat(skip ch, proj ch) -> DoubleConv(ch)
            setattr(self, f"up{i}", _TorchDoubleConv(ch * 2, ch))
            up_in = ch
        self.classifier = nn.Conv2d(c, nclass, 1, bias=True)

    def forward(self, x):
        skips = []
        y = x
        for i in range(4):
            y = getattr(self, f"down{i}")(y)
            skips.append(y)
            y = F.max_pool2d(y, 2, 2)
        y = self.bottom(y)
        for i, skip in enumerate(skips[::-1]):
            y = _up(y, skip.shape[2:])
            y = getattr(self, f"up{i}_proj")(y)
            y = torch.cat([skip, y], dim=1)
            y = getattr(self, f"up{i}")(y)
        return (self.classifier(y),)


class TorchDenseASPP(nn.Module):
    """Whole-model DenseASPP twin mirroring models/denseaspp.py scopes
    (aspp{i}_1x1, aspp{i}_3x3, classifier, auxlayer)."""

    def __init__(self, backbone, c4_ch, nclass, c3_ch=None, aux=False,
                 rates=(3, 6, 12, 18, 24), inter1=512, inter2=128):
        super().__init__()
        self.backbone = backbone
        self.rates = rates
        cin = c4_ch
        for i, r in enumerate(rates):
            setattr(self, f"aspp{i}_1x1", ConvBN(cin, inter1, 1, padding=0))
            setattr(self, f"aspp{i}_3x3",
                    nn.Conv2d(inter1, inter2, 3, padding=r, dilation=r,
                              bias=True))
            cin += inter2
        self.classifier = nn.Conv2d(cin, nclass, 1, bias=True)
        self.use_aux = aux
        if aux:
            self.auxlayer = TorchFCNHead(c3_ch, nclass)

    def forward(self, x):  # eval: dropouts identity
        size = x.shape[2:]
        c1, c2, c3, c4 = self.backbone(x)
        feats = [c4]
        for i in range(len(self.rates)):
            y = torch.cat(feats, dim=1)
            y = getattr(self, f"aspp{i}_1x1")(y)
            y = getattr(self, f"aspp{i}_3x3")(y)
            feats.append(y)
        out = self.classifier(torch.cat(feats, dim=1))
        outs = [_up(out, size)]
        if self.use_aux:
            outs.append(_up(self.auxlayer(c3), size))
        return tuple(outs)


class _TorchDUpsampling(nn.Module):
    """flax models/dunet.py::DUpsampling twin (scope conv_w): 1x1 conv to
    nclass*s*s then the exact flax depth-to-space layout — the conv
    output channel index decomposes as (row, col, class), class fastest."""

    def __init__(self, cin, nclass, scale):
        super().__init__()
        self.nclass, self.scale = nclass, scale
        self.conv_w = nn.Conv2d(cin, nclass * scale * scale, 1, bias=True)

    def forward(self, x):
        s, c = self.scale, self.nclass
        y = self.conv_w(x)  # (b, s*s*c, h, w)
        b, _, h, w = y.shape
        y = y.permute(0, 2, 3, 1).reshape(b, h, w, s, s, c)
        y = y.permute(0, 1, 3, 2, 4, 5).reshape(b, h * s, w * s, c)
        return y.permute(0, 3, 1, 2)


class TorchDUNet(nn.Module):
    """Whole-model DUNet twin mirroring models/dunet.py scopes
    (fuse_c2/fuse_c3/head_conv1/head_conv2/dupsample/auxlayer)."""

    def __init__(self, backbone, c2_ch, c3_ch, c4_ch, nclass, scale=8,
                 aux=False):
        super().__init__()
        self.backbone = backbone
        self.fuse_c2 = ConvBN(c2_ch, 48, 1, padding=0)
        self.fuse_c3 = ConvBN(c3_ch, 48, 1, padding=0)
        self.head_conv1 = ConvBN(c4_ch + 96, 256, 3)
        self.head_conv2 = ConvBN(256, 256, 3)
        self.dupsample = _TorchDUpsampling(256, nclass, scale)
        self.use_aux = aux
        if aux:
            self.auxlayer = TorchFCNHead(c3_ch, nclass)

    def forward(self, x):
        c1, c2, c3, c4 = self.backbone(x)
        f2 = _up(self.fuse_c2(c2), c4.shape[2:])
        f3 = _up(self.fuse_c3(c3), c4.shape[2:])
        y = torch.cat([c4, f3, f2], dim=1)
        y = self.head_conv2(self.head_conv1(y))
        out = self.dupsample(y)
        outs = [out]
        if self.use_aux:
            outs.append(_up(self.auxlayer(c3), out.shape[2:]))
        return tuple(outs)


class _TorchBAM(nn.Module):
    """flax models/translab.py::_BAM twin (scope refine)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.refine = ConvBN(cin, cout, 3)

    def forward(self, x, boundary_logits):
        b = torch.sigmoid(_up(boundary_logits, x.shape[2:]))
        return self.refine(x * b + x)


class TorchTransLab(nn.Module):
    """Whole-model TransLab twin mirroring models/translab.py scopes
    (b_c1/b_c4/b_fuse/b_classifier/head/bam_high/c1_proj/dec_conv1/
    bam_low/classifier)."""

    def __init__(self, backbone, c1_ch, c4_ch, nclass):
        super().__init__()
        self.backbone = backbone
        self.b_c1 = ConvBN(c1_ch, 48, 1, padding=0)
        self.b_c4 = ConvBN(c4_ch, 48, 1, padding=0)
        self.b_fuse = ConvBN(96, 48, 3)
        self.b_classifier = nn.Conv2d(48, 1, 1, bias=True)
        self.head = TorchASPP(c4_ch, 256, (6, 12, 18), separable=True)
        self.bam_high = _TorchBAM(256, 256)
        self.c1_proj = ConvBN(c1_ch, 48, 1, padding=0)
        self.dec_conv1 = ConvBN(256 + 48, 256, 3)
        self.bam_low = _TorchBAM(256, 256)
        self.classifier = nn.Conv2d(256, nclass, 1, bias=True)

    def forward(self, x):
        size = x.shape[2:]
        c1, c2, c3, c4 = self.backbone(x)
        b1 = self.b_c1(c1)
        b4 = _up(self.b_c4(c4), c1.shape[2:])
        bf = self.b_fuse(torch.cat([b1, b4], dim=1))
        boundary = self.b_classifier(bf)
        y = self.head(c4)
        y = self.bam_high(y, boundary)
        y = _up(y, c1.shape[2:])
        y = torch.cat([y, self.c1_proj(c1)], dim=1)
        y = self.dec_conv1(y)
        y = self.bam_low(y, boundary)
        out = self.classifier(y)
        return (_up(out, size), _up(boundary, size))


class _TorchConvBNPReLU(nn.Module):
    """flax models/cgnet.py::_ConvBNPReLU twin (conv/bn + bare ``prelu``)."""

    def __init__(self, cin, cout, k=3, stride=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride, (k - 1) // 2, bias=False)
        self.bn = nn.BatchNorm2d(cout)
        self.prelu = nn.Parameter(torch.full((cout,), 0.25))

    def forward(self, x):
        return F.prelu(self.bn(self.conv(x)), self.prelu)


class _TorchBNPReLU(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.bn = nn.BatchNorm2d(c)
        self.prelu = nn.Parameter(torch.full((c,), 0.25))

    def forward(self, x):
        return F.prelu(self.bn(x), self.prelu)


class _TorchGlobalContext(nn.Module):
    """flax models/cgnet.py::_GlobalContext twin (fc1/fc2)."""

    def __init__(self, c, reduction=16):
        super().__init__()
        self.fc1 = nn.Linear(c, max(c // reduction, 4))
        self.fc2 = nn.Linear(max(c // reduction, 4), c)

    def forward(self, x):
        g = torch.sigmoid(self.fc2(F.relu(self.fc1(x.mean((2, 3))))))
        return x * g[:, :, None, None]


class _TorchCGBlock(nn.Module):
    """flax models/cgnet.py::_CGBlock twin
    (conv1x1/f_loc/f_sur/bn_prelu/[reduce]/f_glo)."""

    def __init__(self, cin, features, dilation=2, reduction=16, down=False):
        super().__init__()
        self.down = down
        n = features if down else features // 2
        self.conv1x1 = _TorchConvBNPReLU(cin, n, 3 if down else 1,
                                         2 if down else 1)
        self.f_loc = nn.Conv2d(n, n, 3, 1, 1, groups=n, bias=False)
        self.f_sur = nn.Conv2d(n, n, 3, 1, dilation, dilation=dilation,
                               groups=n, bias=False)
        self.bn_prelu = _TorchBNPReLU(2 * n)
        if down:
            self.reduce = nn.Conv2d(2 * n, features, 1, bias=False)
        self.f_glo = _TorchGlobalContext(features, reduction)

    def forward(self, x):
        y = self.conv1x1(x)
        joi = torch.cat([self.f_loc(y), self.f_sur(y)], dim=1)
        joi = self.bn_prelu(joi)
        if self.down:
            joi = self.reduce(joi)
        out = self.f_glo(joi)
        return out if self.down else x + out


class TorchCGNet(nn.Module):
    """Whole-model CGNet twin mirroring models/cgnet.py scopes
    (stage1_*, b1/b2/b3, stage{2,3}_down, stage{2,3}_{i}, classifier).
    The input-injection avg pools (sample1/sample2) have no params."""

    def __init__(self, nclass, m=3, n=21):
        super().__init__()
        self.m, self.n = m, n
        self.stage1_0 = _TorchConvBNPReLU(3, 32, 3, 2)
        self.stage1_1 = _TorchConvBNPReLU(32, 32, 3, 1)
        self.stage1_2 = _TorchConvBNPReLU(32, 32, 3, 1)
        self.b1 = _TorchBNPReLU(32 + 3)
        self.stage2_down = _TorchCGBlock(35, 64, 2, 8, down=True)
        for i in range(m - 1):
            setattr(self, f"stage2_{i}", _TorchCGBlock(64, 64, 2, 8))
        self.b2 = _TorchBNPReLU(64 + 64 + 3)
        self.stage3_down = _TorchCGBlock(131, 128, 4, 16, down=True)
        for i in range(n - 1):
            setattr(self, f"stage3_{i}", _TorchCGBlock(128, 128, 4, 16))
        self.b3 = _TorchBNPReLU(256)
        self.classifier = nn.Conv2d(256, nclass, 1, bias=True)

    @staticmethod
    def _inject(x, times):
        for _ in range(times):
            x = F.avg_pool2d(x, 3, 2, 1)
        return x

    def forward(self, x):
        size = x.shape[2:]
        y = self.stage1_2(self.stage1_1(self.stage1_0(x)))
        y = self.b1(torch.cat([y, self._inject(x, 1)], dim=1))
        y0 = self.stage2_down(y)
        z = y0
        for i in range(self.m - 1):
            z = getattr(self, f"stage2_{i}")(z)
        y = self.b2(torch.cat([z, y0, self._inject(x, 2)], dim=1))
        y0 = self.stage3_down(y)
        z = y0
        for i in range(self.n - 1):
            z = getattr(self, f"stage3_{i}")(z)
        y = self.b3(torch.cat([z, y0], dim=1))
        return (_up(self.classifier(y), size),)


class _TorchLEDDown(nn.Module):
    """flax models/lednet.py::_Down twin (conv/bn; conv||maxpool concat)."""

    def __init__(self, cin, features):
        super().__init__()
        self.conv = nn.Conv2d(cin, max(features - cin, 1), 3, 2, 1, bias=True)
        self.bn = nn.BatchNorm2d(features)

    def forward(self, x):
        y = torch.cat([self.conv(x), F.max_pool2d(x, 2, 2)], dim=1)
        return F.relu(self.bn(y))


class _TorchSSnbt(nn.Module):
    """flax models/lednet.py::_SSnbt twin (l_conv*/l_bn*/r_conv*/r_bn* +
    residual + 2-group channel shuffle)."""

    def __init__(self, c2, dilation=1):
        super().__init__()
        c, d = c2 // 2, dilation
        self.l_conv1 = nn.Conv2d(c, c, (3, 1), 1, (1, 0), bias=True)
        self.l_conv2 = nn.Conv2d(c, c, (1, 3), 1, (0, 1), bias=True)
        self.l_bn1 = nn.BatchNorm2d(c)
        self.l_conv3 = nn.Conv2d(c, c, (3, 1), 1, (d, 0), (d, 1), bias=True)
        self.l_conv4 = nn.Conv2d(c, c, (1, 3), 1, (0, d), (1, d), bias=True)
        self.l_bn2 = nn.BatchNorm2d(c)
        self.r_conv1 = nn.Conv2d(c, c, (1, 3), 1, (0, 1), bias=True)
        self.r_conv2 = nn.Conv2d(c, c, (3, 1), 1, (1, 0), bias=True)
        self.r_bn1 = nn.BatchNorm2d(c)
        self.r_conv3 = nn.Conv2d(c, c, (1, 3), 1, (0, d), (1, d), bias=True)
        self.r_conv4 = nn.Conv2d(c, c, (3, 1), 1, (d, 0), (d, 1), bias=True)
        self.r_bn2 = nn.BatchNorm2d(c)

    def forward(self, x):
        c = x.shape[1] // 2
        l, r = x[:, :c], x[:, c:]
        l = F.relu(self.l_conv2(F.relu(self.l_conv1(l))))
        l = F.relu(self.l_bn1(l))
        l = self.l_bn2(self.l_conv4(F.relu(self.l_conv3(l))))
        r = F.relu(self.r_conv2(F.relu(self.r_conv1(r))))
        r = F.relu(self.r_bn1(r))
        r = self.r_bn2(self.r_conv4(F.relu(self.r_conv3(r))))
        y = F.relu(x + torch.cat([l, r], dim=1))
        b, ch, h, w = y.shape
        return (y.view(b, 2, ch // 2, h, w).transpose(1, 2)
                .reshape(b, ch, h, w))


class _TorchAPN(nn.Module):
    """flax models/lednet.py::_APN twin (flat {name}_conv/{name}_bn attrs
    + parameterless pyramid resizes and the global-pool branch)."""

    def __init__(self, cin, nclass):
        super().__init__()

        def cbr(ci, k, s, name):
            setattr(self, f"{name}_conv",
                    nn.Conv2d(ci, nclass, k, s, (k - 1) // 2, bias=True))
            setattr(self, f"{name}_bn", nn.BatchNorm2d(nclass))

        cbr(cin, 7, 2, "down1")
        cbr(nclass, 5, 2, "down2")
        cbr(nclass, 3, 2, "down3")
        cbr(nclass, 3, 1, "down3b")
        cbr(nclass, 5, 1, "lat2")
        cbr(nclass, 7, 1, "lat1")
        cbr(cin, 1, 1, "mid")
        self.global_conv = nn.Conv2d(cin, nclass, 1, bias=True)

    def _run(self, name, x):
        return F.relu(getattr(self, f"{name}_bn")(
            getattr(self, f"{name}_conv")(x)))

    def forward(self, x):
        size = x.shape[2:]
        d1 = self._run("down1", x)
        d2 = self._run("down2", d1)
        d3 = self._run("down3b", self._run("down3", d2))
        y = _up(d3, d2.shape[2:]) + self._run("lat2", d2)
        y = _up(y, d1.shape[2:]) + self._run("lat1", d1)
        y = _up(y, size)
        out = self._run("mid", x) * y
        g = self.global_conv(x.mean((2, 3), keepdim=True))
        return out + g


class TorchLEDNet(nn.Module):
    """Whole-model LEDNet twin mirroring models/lednet.py scopes
    (down{1,2,3}, ssnbt{1,2,3}_{i}, apn)."""

    def __init__(self, nclass, dilations=(1, 2, 5, 9, 2, 5, 9, 17)):
        super().__init__()
        self.dilations = dilations
        self.down1 = _TorchLEDDown(3, 32)
        for i in range(3):
            setattr(self, f"ssnbt1_{i}", _TorchSSnbt(32))
        self.down2 = _TorchLEDDown(32, 64)
        for i in range(2):
            setattr(self, f"ssnbt2_{i}", _TorchSSnbt(64))
        self.down3 = _TorchLEDDown(64, 128)
        for i, d in enumerate(dilations):
            setattr(self, f"ssnbt3_{i}", _TorchSSnbt(128, d))
        self.apn = _TorchAPN(128, nclass)

    def forward(self, x):
        size = x.shape[2:]
        y = self.down1(x)
        for i in range(3):
            y = getattr(self, f"ssnbt1_{i}")(y)
        y = self.down2(y)
        for i in range(2):
            y = getattr(self, f"ssnbt2_{i}")(y)
        y = self.down3(y)
        for i in range(len(self.dilations)):
            y = getattr(self, f"ssnbt3_{i}")(y)
        return (_up(self.apn(y), size),)


def _hard_link(layer, base_ch, gr, grmul):
    """HarDNet harmonic link rule (layer k reads k - 2^i), re-derived
    independently of models/hardnet.py::_get_link for oracle value."""
    if layer == 0:
        return base_ch, []
    out_ch = float(gr)
    link = []
    for i in range(10):
        dv = 2 ** i
        if layer % dv == 0:
            link.append(layer - dv)
            if i > 0:
                out_ch *= grmul
    out_ch = int(int(out_ch + 1) / 2) * 2
    return out_ch, link


class _TorchHarDBlock(nn.Module):
    """flax models/hardnet.py::_HarDBlock twin (layer{1..n} ConvBN)."""

    def __init__(self, cin, gr, grmul, n_layers):
        super().__init__()
        self.n_layers = n_layers
        self.gr, self.grmul, self.base = gr, grmul, cin
        chans = {0: cin}
        for i in range(1, n_layers + 1):
            out_ch, link = _hard_link(i, cin, gr, grmul)
            tin = sum(chans[j] for j in link)
            setattr(self, f"layer{i}", ConvBN(tin, out_ch, 3))
            chans[i] = out_ch
        self.out_ch = sum(chans[i] for i in range(n_layers + 1)
                          if i == n_layers or i % 2 == 1)

    def forward(self, x):
        layers = [x]
        for i in range(1, self.n_layers + 1):
            _, link = _hard_link(i, self.base, self.gr, self.grmul)
            tin = torch.cat([layers[j] for j in link], dim=1)
            layers.append(getattr(self, f"layer{i}")(tin))
        outs = [layers[i] for i in range(len(layers))
                if i == len(layers) - 1 or i % 2 == 1]
        return torch.cat(outs, dim=1)


class TorchHardNet(nn.Module):
    """Whole-model FC-HarDNet twin mirroring models/hardnet.py scopes
    (stem0..3, block{i}, trans{i}, dec_conv{i}, dec_block{i},
    classifier)."""

    def __init__(self, nclass, first_ch=(16, 24, 32, 48),
                 ch_list=(64, 96, 160, 224, 320), grmul=1.7,
                 gr=(10, 16, 18, 24, 32), n_layers=(4, 4, 8, 8, 8)):
        super().__init__()
        self.n_blocks = len(n_layers)
        self.stem0 = ConvBN(3, first_ch[0], 3, stride=2)
        self.stem1 = ConvBN(first_ch[0], first_ch[1], 3)
        self.stem2 = ConvBN(first_ch[1], first_ch[2], 3, stride=2)
        self.stem3 = ConvBN(first_ch[2], first_ch[3], 3)
        cin = first_ch[3]
        skip_ch = []
        for i in range(self.n_blocks):
            blk = _TorchHarDBlock(cin, gr[i], grmul, n_layers[i])
            setattr(self, f"block{i}", blk)
            skip_ch.append(blk.out_ch)
            setattr(self, f"trans{i}", ConvBN(blk.out_ch, ch_list[i], 1,
                                              padding=0))
            cin = ch_list[i]
        for i in range(self.n_blocks - 2, -1, -1):
            dec = ConvBN(cin + skip_ch[i], ch_list[i], 1, padding=0)
            setattr(self, f"dec_conv{i}", dec)
            blk = _TorchHarDBlock(ch_list[i], gr[i], grmul,
                                  max(n_layers[i] // 2, 2))
            setattr(self, f"dec_block{i}", blk)
            cin = blk.out_ch
        self.classifier = nn.Conv2d(cin, nclass, 1, bias=True)

    def forward(self, x):  # eval: dropout identity
        size = x.shape[2:]
        y = self.stem3(self.stem2(self.stem1(self.stem0(x))))
        skips = []
        for i in range(self.n_blocks):
            y = getattr(self, f"block{i}")(y)
            skips.append(y)
            y = getattr(self, f"trans{i}")(y)
            if i < self.n_blocks - 1:
                y = F.avg_pool2d(y, 2, 2)
        for i in range(self.n_blocks - 2, -1, -1):
            y = _up(y, skips[i].shape[2:])
            y = torch.cat([y, skips[i]], dim=1)
            y = getattr(self, f"dec_conv{i}")(y)
            y = getattr(self, f"dec_block{i}")(y)
        return (_up(self.classifier(y), size),)


class _TorchXABlock(nn.Module):
    """flax models/dfanet.py::_XABlock twin (sep1..3, skip_conv/skip_bn)."""

    def __init__(self, cin, features, stride=1):
        super().__init__()
        inter = features // 4
        self.sep1 = TorchSeparableConv2d(cin, inter, 1, relu_first=True)
        self.sep2 = TorchSeparableConv2d(inter, inter, 1, relu_first=True)
        self.sep3 = TorchSeparableConv2d(inter, features, stride,
                                         relu_first=True)
        self.proj = stride != 1 or cin != features
        if self.proj:
            self.skip_conv = conv1x1(cin, features, stride)
            self.skip_bn = nn.BatchNorm2d(features)

    def forward(self, x):
        y = self.sep3(self.sep2(self.sep1(x)))
        sc = self.skip_bn(self.skip_conv(x)) if self.proj else x
        return y + sc


class _TorchXAStage(nn.Module):
    """flax models/dfanet.py::_XceptionAStage twin (block0..n-1)."""

    def __init__(self, cin, features, n_blocks=3):
        super().__init__()
        self.n = n_blocks
        self.block0 = _TorchXABlock(cin, features, 2)
        for i in range(1, n_blocks):
            setattr(self, f"block{i}", _TorchXABlock(features, features))

    def forward(self, x):
        y = self.block0(x)
        for i in range(1, self.n):
            y = getattr(self, f"block{i}")(y)
        return y


class _TorchFCAttention(nn.Module):
    """flax models/dfanet.py::_FCAttention twin (fc + conv gate)."""

    def __init__(self, c, fc_dim=1000):
        super().__init__()
        self.fc = nn.Linear(c, fc_dim)
        self.conv = nn.Conv2d(fc_dim, c, 1, bias=True)

    def forward(self, x):
        g = self.fc(x.mean((2, 3)))
        g = self.conv(g[:, :, None, None])
        return x * torch.sigmoid(g)


class _TorchEncoderPass(nn.Module):
    """flax models/dfanet.py::_EncoderPass twin (enc2/enc3/enc4/fca)."""

    def __init__(self, cin, channels=(48, 96, 192)):
        super().__init__()
        self.enc2 = _TorchXAStage(cin, channels[0])
        self.enc3 = _TorchXAStage(channels[0], channels[1])
        self.enc4 = _TorchXAStage(channels[1], channels[2])
        self.fca = _TorchFCAttention(channels[2])

    def forward(self, x):
        e2 = self.enc2(x)
        e3 = self.enc3(e2)
        e4 = self.enc4(e3)
        return e2, e3, e4, self.fca(e4)


class TorchDFANet(nn.Module):
    """Whole-model DFANet twin mirroring models/dfanet.py scopes
    (stem, pass{0,1,2}, dec_e2_{p}, dec_fca_{p}, dec_conv, classifier)."""

    def __init__(self, nclass, channels=(48, 96, 192), dec_ch=64):
        super().__init__()
        self.stem = ConvBN(3, 8, 3, stride=2)
        self.pass0 = _TorchEncoderPass(8, channels)
        self.pass1 = _TorchEncoderPass(channels[0] + channels[2], channels)
        self.pass2 = _TorchEncoderPass(channels[0] + channels[2], channels)
        for p in range(3):
            setattr(self, f"dec_e2_{p}", ConvBN(channels[0], dec_ch, 1,
                                                padding=0))
            setattr(self, f"dec_fca_{p}", ConvBN(channels[2], dec_ch, 1,
                                                 padding=0))
        self.dec_conv = ConvBN(dec_ch, dec_ch, 3)
        self.classifier = nn.Conv2d(dec_ch, nclass, 1, bias=True)

    def forward(self, x):
        size = x.shape[2:]
        y = self.stem(x)
        e2s, fcas = [], []
        inp = y
        for p in range(3):
            e2, e3, e4, fca = getattr(self, f"pass{p}")(inp)
            e2s.append(e2)
            fcas.append(fca)
            if p < 2:
                inp = torch.cat([e2, _up(fca, e2.shape[2:])], dim=1)
        tgt = e2s[0].shape[2:]
        dec = None
        for p, e2 in enumerate(e2s):
            y = _up(getattr(self, f"dec_e2_{p}")(e2), tgt)
            dec = y if dec is None else dec + y
        for p, fca in enumerate(fcas):
            dec = dec + _up(getattr(self, f"dec_fca_{p}")(fca), tgt)
        out = self.classifier(self.dec_conv(dec))
        return (_up(out, size),)


class _TorchCBPR(nn.Module):
    """flax backbones/eespnet.py::_CBPR twin (conv/bn + bare prelu)."""

    def __init__(self, cin, cout, k=3, stride=1, groups=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride, (k - 1) // 2,
                              groups=groups, bias=False)
        self.bn = nn.BatchNorm2d(cout)
        self.prelu = nn.Parameter(torch.full((cout,), 0.25))

    def forward(self, x):
        return F.prelu(self.bn(self.conv(x)), self.prelu)


class _TorchEESP(nn.Module):
    """flax backbones/eespnet.py::_EESP twin (reduce, dw{i}, hff_bn,
    expand, expand_bn + bare hff_prelu/out_prelu)."""

    def __init__(self, cin, features, stride=1, branches=4, max_dilation=8):
        super().__init__()
        self.k, self.stride, self.cin, self.features = (
            branches, stride, cin, features)
        d = features // branches
        groups = min(branches, d)
        self.reduce = _TorchCBPR(cin, d, 1, stride, groups=groups)
        self.dilations = [min(2 ** i, max_dilation) for i in range(branches)]
        for i, dil in enumerate(self.dilations):
            setattr(self, f"dw{i}",
                    nn.Conv2d(d, d, 3, 1, dil, dilation=dil, groups=d,
                              bias=False))
        self.hff_bn = nn.BatchNorm2d(d * branches)
        self.hff_prelu = nn.Parameter(torch.full((d * branches,), 0.25))
        self.expand = nn.Conv2d(d * branches, features, 1, groups=groups,
                                bias=False)
        self.expand_bn = nn.BatchNorm2d(features)
        self.out_prelu = nn.Parameter(torch.full((features,), 0.25))

    def forward(self, x):
        y = self.reduce(x)
        outs = [getattr(self, f"dw{i}")(y) for i in range(self.k)]
        fused = [outs[0]]
        for i in range(1, self.k):
            fused.append(fused[-1] + outs[i])
        z = F.prelu(self.hff_bn(torch.cat(fused, dim=1)), self.hff_prelu)
        z = self.expand_bn(self.expand(z))
        if self.stride == 1 and self.cin == self.features:
            z = z + x
        return F.prelu(z, self.out_prelu)


class _TorchDownEESP(nn.Module):
    """flax backbones/eespnet.py::_DownEESP twin (eesp, inject +
    bare merge_prelu; the avg-pool shortcut has no params)."""

    def __init__(self, cin, features):
        super().__init__()
        self.eesp = _TorchEESP(cin, features - cin, stride=2)
        self.inject = _TorchCBPR(3, features, 3, 1)
        self.merge_prelu = nn.Parameter(torch.full((features,), 0.25))

    def forward(self, x, img):
        y = torch.cat([F.avg_pool2d(x, 3, 2, 1), self.eesp(x)], dim=1)
        while img.shape[2] > y.shape[2]:
            img = F.avg_pool2d(img, 3, 2, 1)
        return F.prelu(y + self.inject(img), self.merge_prelu)


class TorchEESPNet(nn.Module):
    """flax backbones/eespnet.py::EESPNet twin (level1, level{2,3,4}_down,
    level{2,3,4}_{i}) at scale 1.0, depths (0, 3, 7)."""

    def __init__(self, depths=(0, 3, 7), chans=(32, 64, 128, 256)):
        super().__init__()
        self.depths = depths
        self.level1 = _TorchCBPR(3, chans[0], 3, 2)
        self.level2_down = _TorchDownEESP(chans[0], chans[1])
        for i in range(depths[0]):
            setattr(self, f"level2_{i}", _TorchEESP(chans[1], chans[1]))
        self.level3_down = _TorchDownEESP(chans[1], chans[2])
        for i in range(depths[1]):
            setattr(self, f"level3_{i}", _TorchEESP(chans[2], chans[2]))
        self.level4_down = _TorchDownEESP(chans[2], chans[3])
        for i in range(depths[2]):
            setattr(self, f"level4_{i}", _TorchEESP(chans[3], chans[3]))

    def forward(self, x):
        img = x
        c1 = self.level1(x)
        c2 = self.level2_down(c1, img)
        for i in range(self.depths[0]):
            c2 = getattr(self, f"level2_{i}")(c2)
        c3 = self.level3_down(c2, img)
        for i in range(self.depths[1]):
            c3 = getattr(self, f"level3_{i}")(c3)
        c4 = self.level4_down(c3, img)
        for i in range(self.depths[2]):
            c4 = getattr(self, f"level4_{i}")(c4)
        return c1, c2, c3, c4


class TorchESPNetV2(nn.Module):
    """Whole-model ESPNetV2 twin mirroring models/espnetv2.py scopes
    (backbone, psp, proj4/proj3/proj2, fuse3/fuse2, classifier)."""

    def __init__(self, nclass, proj_ch=128, c_taps=(32, 64, 128, 256)):
        super().__init__()
        self.backbone = TorchEESPNet()
        self.psp = TorchPyramidPooling(c_taps[3], out=proj_ch // 4)
        psp_out = c_taps[3] + 4 * (proj_ch // 4)
        self.proj4 = ConvBN(psp_out, proj_ch, 1, padding=0)
        self.proj3 = ConvBN(c_taps[2], proj_ch, 1, padding=0)
        self.fuse3 = _TorchEESP(2 * proj_ch, proj_ch)
        self.proj2 = ConvBN(c_taps[1], proj_ch, 1, padding=0)
        self.fuse2 = _TorchEESP(2 * proj_ch, proj_ch)
        self.classifier = nn.Conv2d(proj_ch, nclass, 1, bias=True)

    def forward(self, x):  # eval: dropout identity
        size = x.shape[2:]
        c1, c2, c3, c4 = self.backbone(x)
        y = self.proj4(self.psp(c4))
        y = _up(y, c3.shape[2:])
        y = self.fuse3(torch.cat([y, self.proj3(c3)], dim=1))
        y = _up(y, c2.shape[2:])
        y = self.fuse2(torch.cat([y, self.proj2(c2)], dim=1))
        return (_up(self.classifier(y), size),)


class _TorchPointHead(nn.Module):
    """flax models/pointrend.py::PointHead twin (fc{i}, predictor)."""

    def __init__(self, fine_ch, nclass, channels=256, depth=3):
        super().__init__()
        self.depth = depth
        cin = fine_ch + nclass
        for i in range(depth):
            setattr(self, f"fc{i}", nn.Linear(cin, channels))
            cin = channels + nclass
        self.predictor = nn.Linear(cin, nclass)

    def forward(self, fine_pts, coarse_pts):  # (B, N, C) each
        y = torch.cat([fine_pts, coarse_pts], dim=-1)
        for i in range(self.depth):
            y = F.relu(getattr(self, f"fc{i}")(y))
            y = torch.cat([y, coarse_pts], dim=-1)
        return self.predictor(y)


def _torch_point_sample(feat, coords):
    """ops/point_sample.py::point_sample oracle: F.grid_sample with
    [0,1] coords mapped to [-1,1], align_corners=False, border pad."""
    grid = coords * 2.0 - 1.0  # (B, N, 2), xy order == grid_sample's
    out = F.grid_sample(feat, grid[:, None], mode="bilinear",
                        padding_mode="border", align_corners=False)
    return out[:, :, 0].permute(0, 2, 1)  # (B, N, C)


class TorchPointRend(nn.Module):
    """Whole-model PointRend twin (eval subdivision path) mirroring
    models/pointrend.py scopes (head/c1_proj/classifier/point_head) over
    the DeepLabV3_Plus-style coarse head."""

    def __init__(self, backbone, c1_ch, c4_ch, nclass,
                 subdivision_steps=2, subdivision_points=64):
        super().__init__()
        self.backbone = backbone
        self.nclass = nclass
        self.steps = subdivision_steps
        self.npts = subdivision_points
        self.head = TorchASPP(c4_ch, 256, (6, 12, 18), separable=True)
        self.c1_proj = ConvBN(c1_ch, 48, 1, padding=0)
        self.classifier = nn.Conv2d(256 + 48, nclass, 1, bias=True)
        self.point_head = _TorchPointHead(c1_ch, nclass)

    def forward(self, x):
        size = x.shape[2:]
        c1, c2, c3, c4 = self.backbone(x)
        y = _up(self.head(c4), c1.shape[2:])
        coarse = self.classifier(torch.cat([y, self.c1_proj(c1)], dim=1))
        b = x.shape[0]
        logits = coarse
        for _ in range(self.steps):
            nh = min(logits.shape[2] * 2, size[0])
            nw = min(logits.shape[3] * 2, size[1])
            logits = _up(logits, (nh, nw))
            npts = min(self.npts, nh * nw)
            top2 = logits.topk(2, dim=1).values
            unc = (top2[:, 1] - top2[:, 0]).reshape(b, -1)
            _, idx = unc.topk(npts, dim=1)
            ys = (idx // nw).float()
            xs = (idx % nw).float()
            coords = torch.stack([(xs + 0.5) / nw, (ys + 0.5) / nh], dim=-1)
            refined = self.point_head(
                _torch_point_sample(c1, coords),
                _torch_point_sample(logits, coords),
            )  # (B, N, C)
            flat = logits.reshape(b, self.nclass, nh * nw)
            flat = flat.scatter(
                2, idx[:, None].expand(-1, self.nclass, -1),
                refined.permute(0, 2, 1),
            )
            logits = flat.reshape(b, self.nclass, nh, nw)
        return (_up(logits, size),)


class TorchPyramidOCModule(nn.Module):
    """flax models/ocnet.py::PyramidOCModule twin (attn{li}, proj):
    zero-pad to a multiple of the level, attend within each cell,
    re-assemble, crop, concat all levels + input."""

    def __init__(self, cin, out_ch, levels=(1, 2, 3, 6)):
        super().__init__()
        self.levels = levels
        self.out_ch = out_ch
        for li in range(len(levels)):
            setattr(self, f"attn{li}",
                    TorchSelfAttentionBlock(cin, out_ch // 2, out_ch, out_ch))
        self.proj = ConvBN(out_ch * len(levels) + cin, out_ch * 2, 1,
                           padding=0)

    def forward(self, x):
        n, c, h, w = x.shape
        outs = []
        for li, level in enumerate(self.levels):
            ph = -(-h // level) * level
            pw = -(-w // level) * level
            xp = F.pad(x, (0, pw - w, 0, ph - h))
            bh, bw = ph // level, pw // level
            cells = xp.reshape(n, c, level, bh, level, bw)
            cells = cells.permute(0, 2, 4, 1, 3, 5).reshape(
                n * level * level, c, bh, bw)
            ctx = getattr(self, f"attn{li}")(cells)
            ctx = ctx.reshape(n, level, level, self.out_ch, bh, bw)
            ctx = ctx.permute(0, 3, 1, 4, 2, 5).reshape(
                n, self.out_ch, ph, pw)[:, :, :h, :w]
            outs.append(ctx)
        return self.proj(torch.cat(outs + [x], dim=1))


class TorchASPOCModule(nn.Module):
    """flax models/ocnet.py::ASPOCModule twin (oc_conv/oc/b1..b4/proj)."""

    def __init__(self, cin, out_ch, rates=(12, 24, 36)):
        super().__init__()
        self.n_rates = len(rates)
        self.oc_conv = ConvBN(cin, out_ch, 3)
        self.oc = TorchBaseOCModule(out_ch, out_ch)
        self.b1 = ConvBN(cin, out_ch, 1, padding=0)
        for i, r in enumerate(rates):
            setattr(self, f"b{i + 2}", ConvBN(cin, out_ch, 3, dilation=r))
        self.proj = ConvBN(out_ch * (2 + len(rates)), out_ch * 2, 1,
                           padding=0)

    def forward(self, x):
        branches = [self.oc(self.oc_conv(x)), self.b1(x)]
        for i in range(self.n_rates):
            branches.append(getattr(self, f"b{i + 2}")(x))
        return self.proj(torch.cat(branches, dim=1))


class TorchOCNetVariant(nn.Module):
    """Whole-model OCNet twin for the pyramid / asp OC_ARCH variants
    (reduce/oc/classifier/auxlayer)."""

    def __init__(self, backbone, c4_ch, nclass, oc_arch, aux=True,
                 c3_ch=None):
        super().__init__()
        self.backbone = backbone
        self.reduce = ConvBN(c4_ch, 512, 3)
        if oc_arch == "pyramid":
            self.oc = TorchPyramidOCModule(512, 512)
            head_ch = 1024
        elif oc_arch == "asp":
            self.oc = TorchASPOCModule(512, 512)
            head_ch = 1024
        else:
            raise ValueError(oc_arch)
        self.classifier = nn.Conv2d(head_ch, nclass, 1, bias=True)
        self.aux = aux
        if aux:
            self.auxlayer = TorchFCNHead(c3_ch, nclass)

    def forward(self, x):
        size = x.shape[2:]
        c1, c2, c3, c4 = self.backbone(x)
        y = self.oc(self.reduce(c4))
        outs = [F.interpolate(self.classifier(y), size=size, mode="bilinear",
                              align_corners=True)]
        if self.aux:
            outs.append(F.interpolate(self.auxlayer(c3), size=size,
                                      mode="bilinear", align_corners=True))
        return tuple(outs)
