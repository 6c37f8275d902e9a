"""Aligned Xception-65 / 71 backbone
(reference: ``segmentron/models/backbones/xception.py``).

The DeepLabv3+ encoder: entry flow (stride-2 sep-conv blocks with
1x1-conv residuals), a 16-block middle flow, and a dilated exit flow.
``output_stride`` controls which entry/exit strides become dilations:

- OS16: entry block3 stride 2, exit dilation 2
- OS8:  entry block3 stride 1 + dilation 2, exit dilation 4

Feature taps (SegBaseModel contract): c1 = entry block1 (128ch, /4),
c2 = entry block2 (256ch, /8), c3 = middle-flow out (728ch), c4 = exit
(2048ch).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax

from ...modules.basic import ConvBNReLU, SeparableConv2d, conv2d
from ...modules.batch_norm import NormConfig
from .build import BACKBONE_REGISTRY

__all__ = ["Xception65"]


class XceptionBlock(nn.Module):
    """Three separable convs with an additive skip.

    ``skip_type='conv'`` uses a strided 1x1+BN projection (channel or
    stride mismatch), ``'sum'`` an identity skip, ``'none'`` no skip.
    The last separable conv carries the block stride.
    """

    channels: Sequence[int]
    stride: int = 1
    dilation: int = 1
    skip_type: str = "conv"
    relu_first: bool = True
    norm: NormConfig = NormConfig()

    def _fused_chain(self, x, train: bool) -> bool:
        """True when the whole block should run as one pallas chain
        (v3 sepconv kernels + fused block-end, ops/sepconv.py): eval,
        "pw" int8 mode, big entry-flow-scale tensors. pallas->pallas
        hops are free while every XLA-conv<->pallas boundary costs a
        relayout copy, so fusion is all-or-nothing per block."""
        import os

        import jax

        from ...config import cfg

        if train or self.is_initializing():
            return False
        entry_v3 = self.name in [
            s.strip() for s in str(cfg.TPU.FUSED_ENTRY_V3).split(",") if s.strip()
        ]
        if cfg.TPU.INT8_ACTIVATIONS != "pw" or not (
            bool(cfg.TPU.FUSED_SEPCONV_V3) or entry_v3
        ):
            return False
        if bool(cfg.TPU.INT8_CALIBRATE):
            return False
        if self.norm.bn_type not in ("BN", "SyncBN", "FrozenBN"):
            return False
        interpret = os.environ.get("SEGMENTRON_PALLAS_INTERPRET") == "1"
        if not interpret and jax.default_backend() != "tpu":
            return False
        # 'sum' (middle-flow) blocks only: a uniform pallas chain with
        # one XLA boundary at each end measured 1.69x faster than XLA
        # at OS8 full-res (15.7 vs 26.5 ms). 'conv'-skip (entry) blocks
        # measured NET SLOWER in-model (46.8 vs 54.1 img/s) — their
        # XLA-conv neighbors (stem, decoder taps) force relayout
        # copies at every chain edge and XLA's in-context conv fusion
        # is stronger at those shapes. Kernel support for 'conv'/stride
        # is kept (tested) for future stem-in-pallas work.
        if entry_v3:
            # explicit opt-in for a conv-skip entry block (see the
            # cfg.TPU.FUSED_ENTRY_V3 rationale) — no MIN_BYTES gate
            if self.skip_type != "conv":
                return False
        elif self.skip_type != "sum" or self.stride != 1:
            return False
        elif x.shape[-1] != self.channels[-1]:
            return False
        n, h, w, c = x.shape
        t_in = 2 * self.stride * self.dilation  # smallest viable tile
        if h % t_in or w % self.stride or h < 2 * t_in:
            return False
        if not entry_v3 and (
            h * w * (c + self.channels[0]) * 2
            < int(cfg.TPU.FUSED_SEPCONV_MIN_BYTES)
        ):
            return False
        # the gate must guarantee _end_tile finds a tile — otherwise
        # _fused_forward would pass tile_out=None into the kernel
        return (
            self._end_tile(h, w, self.channels[-2], c, self.channels[-1])
            is not None
        )

    def _end_tile(self, h, w, c, cin, co):
        from ...ops.sepconv import v3_skip_vmem_ok

        d, s = self.dilation, self.stride
        for t_out in (8, 4, 2):
            t_in = s * t_out
            if (
                t_in % d == 0
                and h % t_in == 0
                and h >= 2 * t_in
                and v3_skip_vmem_ok(h, w, c, cin, co, d, s, t_out)
            ):
                return t_out
        return None

    def _fused_forward(self, x):
        """The whole block as one pallas chain: sep1/sep2 through the
        v3 kernel (chain=True), sep3 + the residual through the fused
        block-end kernel. Same parameter tree as the regular path
        (shadow declarations)."""
        import os

        from ...config import cfg
        from ...modules.basic import _SepParams, _SharedBN, _SharedKernel
        from ...ops.quant import bn_folded_affine
        from ...ops.sepconv import (
            fold_sepconv_int8, fused_sepconv_infer_v3_skip,
        )

        interpret = os.environ.get("SEGMENTRON_PALLAS_INTERPRET") == "1"
        y = x
        for i, ch in enumerate(self.channels[:-1]):
            y = SeparableConv2d(
                ch, 3, stride=1, dilation=self.dilation, norm=self.norm,
                relu_first=self.relu_first, chain=True, name=f"sep{i + 1}",
            )(y, False)
        in_ch = y.shape[-1]
        co = self.channels[-1]
        dw, (s1, b1, m1, v1), pw, (s2, b2, m2, v2) = _SepParams(
            co, name=f"sep{len(self.channels)}"
        )(in_ch)
        a1, c1 = bn_folded_affine(s1, b1, m1, v1, self.norm.eps)
        a2, c2 = bn_folded_affine(s2, b2, m2, v2, self.norm.eps)
        ms, mb, wq, osc = fold_sepconv_int8(
            a1, c1, pw, a2, k_sigma=float(cfg.TPU.INT8_K)
        )
        n, h, w, _ = y.shape
        tile = self._end_tile(h, w, in_ch, x.shape[-1], co)
        assert tile is not None, "_fused_chain gate must ensure a viable tile"
        if self.skip_type == "conv":
            skw = _SharedKernel((1, 1, x.shape[-1], co), name="skip_conv")()
            ss, sbb, sm, sv = _SharedBN(name="skip_bn")(co)
            sa, sc = bn_folded_affine(ss, sbb, sm, sv, self.norm.eps)
            return fused_sepconv_infer_v3_skip(
                y, x, dw, ms, mb, wq, osc, c2, skw, sa, sc,
                dilation=self.dilation, stride=self.stride,
                pre_relu=self.relu_first, tile_out=tile, int8_dot=True,
                skip="conv", interpret=interpret,
            )
        return fused_sepconv_infer_v3_skip(
            y, x, dw, ms, mb, wq, osc, c2,
            dilation=self.dilation, stride=1, pre_relu=self.relu_first,
            tile_out=tile, int8_dot=True, skip="sum", interpret=interpret,
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ...ops.quant import QTensor

        if self._fused_chain(x, train):
            return self._fused_forward(x)

        int8 = isinstance(x, QTensor)
        residual = x
        y = x
        for i, ch in enumerate(self.channels):
            stride = self.stride if i == len(self.channels) - 1 else 1
            y = SeparableConv2d(
                ch,
                3,
                stride=stride,
                dilation=self.dilation,
                norm=self.norm,
                relu_first=self.relu_first,
                name=f"sep{i + 1}",
            )(y, train)
        if self.skip_type == "conv":
            if int8:
                from ...config import cfg
                from ...ops.quant import (
                    bn_amax, bn_folded_affine, qadd, qconv,
                )

                from ...modules.basic import _SharedBN, _SharedKernel

                w = _SharedKernel(
                    (1, 1, x.q.shape[-1], self.channels[-1]), name="skip_conv"
                )()
                s, b, m, v = _SharedBN(name="skip_bn")(self.channels[-1])
                a_bn, b_bn = bn_folded_affine(s, b, m, v, self.norm.eps)
                from ...ops.quant import site_amax

                residual = qconv(
                    x, w, self.stride, 0, bn_affine=(a_bn, b_bn),
                    out_amax=site_amax(
                        self, "skip_bn",
                        bn_amax(a_bn, b_bn, k=float(cfg.TPU.INT8_K)),
                    ),
                )
                y = qadd(y, residual)
            else:
                residual = conv2d(
                    self.channels[-1], 1, self.stride, 0, name="skip_conv"
                )(x)
                residual = self.norm.make("skip_bn")(
                    residual, use_running_average=not train
                )
                from ...ops.quant import observe_amax

                observe_amax(self, "skip_bn", residual)
                y = y + residual
        elif self.skip_type == "sum":
            if int8:
                from ...ops.quant import qadd

                y = qadd(y, residual)
            else:
                y = y + residual
        return y


class Xception65(nn.Module):
    output_stride: int = 16
    middle_blocks: int = 16  # 16 -> Xception-65; Xception-71 adds entry blocks
    variant: str = "65"
    norm: NormConfig = NormConfig()

    def _fused_stem_mode(self, x, train: bool) -> str:
        """'' (off) | 'stem' (conv1+conv2 as one pallas kernel) |
        'block1' (stem + whole block1 as one kernel, ops/entrychain.py)
        — eval only; defaults decided by the model-level A/B
        (BASELINE.md round 3)."""
        import os

        from ...config import cfg
        from ...ops.entrychain import stem_block1_supported, stem_supported
        from ...ops.quant import QTensor

        if train or self.is_initializing():
            return ""
        mode = cfg.TPU.FUSED_STEM
        if not mode:
            return ""
        if mode is True:
            mode = "stem"
        elif mode not in ("stem", "block1"):
            return ""  # unknown spelling = off, never a silent "stem"
        if isinstance(x, QTensor):  # full-int8 mode quantizes the input
            return ""
        if self.norm.bn_type not in ("BN", "SyncBN", "FrozenBN"):
            return ""
        interpret = os.environ.get("SEGMENTRON_PALLAS_INTERPRET") == "1"
        if not interpret and jax.default_backend() != "tpu":
            return ""
        n, h, w, c = x.shape
        if mode == "block1":
            # phase-2 also requires the standard block1 geometry
            if self.variant != "65":
                return ""
            return "block1" if stem_block1_supported(h, w, c) else ""
        return "stem" if stem_supported(h, w, c) else ""

    def _int8_mode(self, train: bool) -> bool:
        from ...config import cfg

        if train or self.is_initializing():
            return False
        if cfg.TPU.INT8_ACTIVATIONS not in (True, "full"):
            return False  # "pw" handles itself inside SeparableConv2d
        if bool(cfg.TPU.INT8_CALIBRATE):
            return False  # calibration runs the f32 path + amax hooks
        return self.norm.bn_type in ("BN", "SyncBN", "FrozenBN")

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple:
        from ...ops.quant import QTensor, dequantize, qrelu, quantize_static

        if self.output_stride == 16:
            entry3_stride, middle_dilation, exit_dilations = 2, 1, (1, 2)
        elif self.output_stride == 8:
            entry3_stride, middle_dilation, exit_dilations = 1, 2, (2, 4)
        else:
            raise ValueError(f"output_stride must be 8 or 16, got {self.output_stride}")

        int8 = self._int8_mode(train)
        if int8:
            # normalized input images: |x| <~ (1-mean)/std ~= 2.6; a
            # static amax of 4 keeps headroom without clipping
            import jax.numpy as jnp

            x = quantize_static(x, jnp.full((x.shape[-1],), 4.0, jnp.float32))

        def tap(t):
            return dequantize(t) if isinstance(t, QTensor) else t

        # entry flow
        fused_mode = self._fused_stem_mode(x, train)
        if fused_mode:
            import os as _os

            from ...modules.basic import _ConvBNParams, _SepParams
            from ...ops.entrychain import fused_stem, fused_stem_block1
            from ...ops.quant import bn_folded_affine

            interpret = (
                _os.environ.get("SEGMENTRON_PALLAS_INTERPRET") == "1"
            )
            k1, (s1, b1, m1, v1) = _ConvBNParams((3, 3, 3, 32), name="conv1")()
            k2, (s2, b2, m2, v2) = _ConvBNParams((3, 3, 32, 64), name="conv2")()
            a1, c1b = bn_folded_affine(s1, b1, m1, v1, self.norm.eps)
            a2, c2b = bn_folded_affine(s2, b2, m2, v2, self.norm.eps)
            if fused_mode == "block1":
                from ...modules.basic import _SharedBN, _SharedKernel

                class _B1(nn.Module):
                    eps: float

                    @nn.compact
                    def __call__(self):
                        seps = []
                        cin = 64
                        for j in range(3):
                            dw, dbn, pw, pbn = _SepParams(
                                128, name=f"sep{j + 1}"
                            )(cin)
                            ad, bd = bn_folded_affine(*dbn, self.eps)
                            ap, bp = bn_folded_affine(*pbn, self.eps)
                            seps.append((dw, ad, bd, pw, ap, bp))
                            cin = 128
                        wsk = _SharedKernel((1, 1, 64, 128),
                                            name="skip_conv")()
                        sbn = _SharedBN(name="skip_bn")(128)
                        a_s, b_s = bn_folded_affine(*sbn, self.eps)
                        return tuple(seps), (wsk, a_s, b_s)

                sep_p, skip_p = _B1(eps=self.norm.eps, name="block1")()
                x = fused_stem_block1(
                    x, (k1, a1, c1b, k2, a2, c2b), sep_p, skip_p,
                    strip=4, interpret=interpret,
                )
            else:
                # strip=8: strip=16 is ~0.1 ms faster standalone but
                # sits 1.5 MB over the 16 MB scoped-VMEM cliff once the
                # consumer graph constrains operand layouts (measured
                # in-model OOM)
                x = fused_stem(
                    x, k1, a1, c1b, k2, a2, c2b, strip=8,
                    interpret=interpret,
                )
        else:
            x = ConvBNReLU(32, 3, 2, norm=self.norm, name="conv1")(x, train)
            x = ConvBNReLU(64, 3, 1, norm=self.norm, name="conv2")(x, train)
        if self.variant == "71":
            # Xception-71: stride spread over two extra entry blocks
            x = XceptionBlock(
                (128, 128, 128), 2, norm=self.norm, relu_first=False, name="block1a"
            )(x, train)
            x = XceptionBlock(
                (128, 128, 128), 1, norm=self.norm, name="block1"
            )(x, train)
        elif fused_mode != "block1":
            x = XceptionBlock(
                (128, 128, 128), 2, norm=self.norm, relu_first=False, name="block1"
            )(x, train)
        c1 = tap(x)  # low-level decoder tap: 128ch at stride 4
        x = XceptionBlock((256, 256, 256), 2, norm=self.norm, name="block2")(x, train)
        c2 = tap(x)
        x = XceptionBlock(
            (728, 728, 728), entry3_stride, norm=self.norm, name="block3"
        )(x, train)

        # middle flow
        for i in range(self.middle_blocks):
            x = XceptionBlock(
                (728, 728, 728),
                1,
                dilation=middle_dilation,
                skip_type="sum",
                norm=self.norm,
                name=f"middle{i + 1}",
            )(x, train)
        c3 = tap(x)

        # exit flow
        x = XceptionBlock(
            (728, 1024, 1024),
            1,
            dilation=exit_dilations[0],
            norm=self.norm,
            name="exit1",
        )(x, train)
        for i, ch in enumerate((1536, 1536, 2048)):
            x = SeparableConv2d(
                ch,
                3,
                dilation=exit_dilations[1],
                norm=self.norm,
                relu_first=False,
                name=f"exit_sep{i + 1}",
            )(x, train)
            x = qrelu(x) if isinstance(x, QTensor) else nn.relu(x)
        return c1, c2, c3, tap(x)


@BACKBONE_REGISTRY.register(name="xception65")
def _xception65(norm: NormConfig, name=None):
    from ...config import cfg

    return Xception65(
        output_stride=int(cfg.MODEL.OUTPUT_STRIDE),
        middle_blocks=int(cfg.MODEL.XCEPTION.MIDDLE_BLOCKS),
        norm=norm,
        name=name,
    )


@BACKBONE_REGISTRY.register(name="xception71")
def _xception71(norm: NormConfig, name=None):
    from ...config import cfg

    return Xception65(
        output_stride=int(cfg.MODEL.OUTPUT_STRIDE),
        middle_blocks=int(cfg.MODEL.XCEPTION.MIDDLE_BLOCKS),
        variant="71",
        norm=norm,
        name=name,
    )
