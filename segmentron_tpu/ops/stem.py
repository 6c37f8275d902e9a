"""W-blocked stem convolution — fast first-layer conv for C_in=3 images.

XLA's TPU lowering of a conv whose input has 3 channels is terrible: the
MXU wants >=8 (ideally >=128) contraction lanes, so the stem conv1 of
every backbone (3x3/7x7 stride-2 over the raw image) runs ~3x slower
than its roofline — measured 3.7 ms of a 17.1 ms DeepLabv3+/Xception-65
full-res inference (22% of the model for 2.3% of its FLOPs).

The classic fix is space-to-depth, but a full H+W s2d needs a transpose
(measured SLOWER: 5.8 ms vs 2.6 ms plain).  This op uses the one
reformulation whose data movement is FREE in NHWC row-major: group B
adjacent *W columns* into channels with a pure `reshape` (W and C are
the trailing contiguous dims), and emit the B//s output columns of each
block as channels, un-grouped by another free reshape:

    x:(N,H,W,C) --reshape--> (N, H, W/B, B*C)
      conv k_h x KW_blocks, stride (s_h, 1)        <- MXU-friendly lanes
    out:(N,H',W/B,(B/s_w)*C_out) --reshape--> (N, H', W', C_out)

Mathematically exact (bit-identical contraction order per output up to
reduction reassociation).  Measured on v5e @1024x2048x3 -> 32, 3x3 s2:
plain 2.62 ms, pad-to-8 2.18, H-phase-split 2.18, B=4/8 1.02,
**B=16: 0.88 ms (3.0x)**.

Reference: ``segmentron/modules/basic.py::_ConvBNReLU`` (the op it
accelerates); no reference analogue (CUDA cores don't care about C=3).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pick_block", "wblock_conv2d"]


def _taps(block: int, s_w: int, k_w: int, p_w: int):
    """Yield (m, dx, kb, r) for every output sub-column m and kernel tap
    dx: input column ``s_w*m + dx - p_w`` lives in relative block ``kb``
    (0-based after left-shift) at within-block offset ``r``."""
    m_out = block // s_w
    kbs = []
    for m in range(m_out):
        for dx in range(k_w):
            t = s_w * m + dx - p_w
            kb, r = divmod(t, block)  # floor-div: t<0 -> kb=-1
            kbs.append((m, dx, kb, r))
    kb_min = min(k for _, _, k, _ in kbs)
    kb_max = max(k for _, _, k, _ in kbs)
    return kbs, kb_min, kb_max


def pick_block(
    x_shape: Sequence[int],
    kernel_size: Tuple[int, int],
    stride: Tuple[int, int],
    padding: Tuple[int, int],
    dilation: Tuple[int, int] = (1, 1),
    groups: int = 1,
    max_block: int = 16,
) -> Optional[int]:
    """Largest eligible W-block size, or ``None`` when the plain conv
    should be used.  Eligibility (all exactness conditions):

    - 4-D NHWC input with few channels (C_in <= 4 — the win exists only
      because C_in starves the MXU's contraction dimension),
    - no dilation / groups,
    - ``1 <= k_w - 2*p_w <= s_w`` so the blocked output width
      ``(W/B)*(B/s_w)`` equals the plain ``floor((W+2p-k)/s)+1``,
    - W divisible by B, B divisible by s_w.
    """
    if len(x_shape) != 4:
        return None
    c_in = x_shape[-1]
    w_dim = x_shape[2]
    if c_in > 4 or groups != 1 or dilation != (1, 1):
        return None
    k_w, s_w, p_w = kernel_size[1], stride[1], padding[1]
    # k=7 measured NEUTRAL-to-NEGATIVE (FCN/ResNet-50 @512²: 508 -> 493
    # img/s): the blocked kernel's zero-padding wastes ~7x FLOPs for a
    # 7-tap row vs ~3x for 3-tap, eating the lane-starvation win. Only
    # small kernels ship through this path.
    if k_w > 5:
        return None
    if not (1 <= k_w - 2 * p_w <= s_w):
        return None
    b = max_block
    while b >= 2 * s_w:
        if w_dim % b == 0 and b % s_w == 0:
            return b
        b //= 2
    return None


def _selector(block: int, s_w: int, k_w: int, p_w: int, dtype) -> Tuple[np.ndarray, int]:
    """Constant T[kb, r, m, dx] in {0,1}: tap ``dx`` of output sub-col
    ``m`` reads within-block offset ``r`` of relative block ``kb``."""
    kbs, kb_min, kb_max = _taps(block, s_w, k_w, p_w)
    kw_blocks = kb_max - kb_min + 1
    T = np.zeros((kw_blocks, block, block // s_w, k_w), np.float32)
    for m, dx, kb, r in kbs:
        T[kb - kb_min, r, m, dx] = 1.0
    return T.astype(dtype), -kb_min


def wblock_conv2d(
    x: jax.Array,
    kernel: jax.Array,
    stride: Tuple[int, int],
    padding: Tuple[int, int],
    block: int,
) -> jax.Array:
    """Exact 2-D conv via free W-axis blocking (see module docstring).

    ``kernel`` is the canonical HWIO weight ``(k_h, k_w, C_in, C_out)``
    — the caller keeps its normal parameter; the blocked kernel is
    derived here by a tiny einsum XLA folds into the conv's prologue.
    """
    n, h, w_dim, c = x.shape
    k_h, k_w, _, c_out = kernel.shape
    s_h, s_w = stride
    p_h, p_w = padding
    assert w_dim % block == 0 and block % s_w == 0
    m_out = block // s_w

    T, pad_lo = _selector(block, s_w, k_w, p_w, np.float32)
    # K[kh, kb, r*c + ci, m*c_out + co] = sum_dx T[kb,r,m,dx] * W[kh,dx,ci,co]
    K = jnp.einsum(
        "brmd,hdio->hbrimo", jnp.asarray(T, kernel.dtype), kernel
    ).reshape(k_h, T.shape[0], block * c, m_out * c_out)

    X = x.reshape(n, h, w_dim // block, block * c)
    # No preferred_element_type: it breaks the conv VJP under mixed
    # precision (f32 cotangent vs bf16 kernel in the transpose conv),
    # and the plain nn.Conv path doesn't set it either — the MXU
    # accumulates in f32 internally regardless.
    out = jax.lax.conv_general_dilated(
        X,
        K.astype(x.dtype),
        window_strides=(s_h, 1),
        padding=[(p_h, p_h), (pad_lo, T.shape[0] - 1 - pad_lo)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(x.dtype)
    out = out.reshape(n, out.shape[1], (w_dim // block) * m_out, c_out)
    # Layout firewall (semantically a no-op). Without it XLA propagates
    # the blocked conv's layout choice into downstream convs: measured
    # model-level the stem win shrank from -1.7 ms to -0.3 ms; with the
    # barrier -0.8 ms survives (flagship @1024x2048, v5e).
    out = jax.lax.optimization_barrier(out)
    return out
