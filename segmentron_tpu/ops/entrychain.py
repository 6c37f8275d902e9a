"""Fused entry-chain Pallas kernels (VERDICT r2 next-round #1).

The r2 component map leaves ONE slack area: the entry flow runs ~2x its
roofline, and every per-layer/per-block pallas attempt lost to the
XLA<->pallas boundary relayouts (BASELINE.md, sepconv v3). The open
line is fusing whole multi-layer sections into single kernels so the
interior activations never touch HBM and there are no interior
boundaries.

This module implements the STEM section: the reference's
``conv1(3x3 s2, 3->32) + BN + ReLU + conv2(3x3 s1, 32->64) + BN +
ReLU`` (``segmentron/models/backbones/xception.py`` entry) as ONE
pallas kernel. Mosaic-shaped design (no lane<->sublane shape casts —
the first formulation died on "unsupported shape cast"):

- the C_in=3 conv1 uses the W-block reformulation (ops/stem.py): the
  image arrives as (H, W/B, B*3) via a free XLA reshape so the MXU
  contraction lane is 48 wide, and conv1 is computed PER OUTPUT
  SUB-COLUMN m (8 small matmuls) so its results live in 8 separate
  (rows, W/B, 32) arrays — no un-grouping reshape needed;
- H-stride-2 is handled by streaming the even/odd ROW PLANES of the
  image as separate BlockSpec streams over a free (H/2, 2, W/B, 48)
  reshape — no strided extracts;
- conv2's 3x3 taps index the m-indexed conv1 arrays directly
  (cross-block taps are sublane shifts); its K=288 im2col is a lane
  concat and one MXU contraction per output sub-column;
- the kernel writes the blocked layout (H/2, W/B, m*64); the final
  un-grouping to (H/2, W/2, 64) is a free XLA reshape;
- halo rows stream as thin clamped BlockSpec windows over the planes
  (the sepconv-v3 technique), edges zero-masked in-kernel.

Exact w.r.t. the XLA path up to f32-accumulation reassociation
(tests/test_entrychain.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stem import _selector

__all__ = ["fused_stem", "fused_stem_ref", "stem_supported"]

_B = 16  # W-block size (ops/stem.py measured optimum for 3x3 s2)
_M = _B // 2  # output sub-columns per block (stride 2)


def stem_supported(h: int, w: int, c: int, strip: int = 16) -> bool:
    """Shapes the kernel handles: even dims, W % (2*B) == 0, strips
    dividing the output height, at least two strips."""
    return (
        c == 3
        and h % 2 == 0
        and w % (2 * _B) == 0
        and strip % 2 == 0
        and (h // 2) % strip == 0
        and h // 2 >= 2 * strip
    )


def fused_stem_ref(x, k1, a1, b1, k2, a2, b2):
    """XLA oracle: conv1(s2) + affine + relu + conv2(s1) + affine + relu."""
    y = jax.lax.conv_general_dilated(
        x, k1, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = jnp.maximum(y * a1 + b1, 0.0).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        y, k2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return jnp.maximum(y * a2 + b2, 0.0).astype(x.dtype)


def _shift_wb(x, direction):
    """Shift along the W-block (sublane) axis: direction=-1 brings the
    PREVIOUS block's row into position (zero at the left edge)."""
    z = jnp.zeros_like(x[:, :1])
    if direction == -1:
        return jnp.concatenate([z, x[:, :-1]], axis=1)
    return jnp.concatenate([x[:, 1:], z], axis=1)


def _stem_kernel(
    me_ref, te_ref, be_ref, mo_ref, to_ref, bo_ref,
    k1p_ref, bn1_ref, k2r_ref, bn2_ref, o_ref,
    *, strip: int, nstrips: int,
):
    """One strip of conv2-output rows [s0, s0+S), s0 = S*i.

    Streams (planes of the free (h2, 2, wb, 48) image reshape):
      me (1,S,wb,48)  even rows [s0, s0+S)          = image rows 2r
      te (1,1,wb,48)  even row s0-1   (clamped)     | be: even row s0+S
      mo (1,S,wb,48)  odd rows [s0, s0+S)           = image rows 2r+1
      to (1,2,wb,48)  odd rows s0-2, s0-1 (clamped) | bo: odd row s0+S
    conv1 row r (local q = r-s0+1, q in [0, S+1]) taps image rows
    2r-1 = odd[r-1], 2r = even[r], 2r+1 = odd[r].
    out (1, S, wb, M*64) blocked conv2 rows.
    """
    i = pl.program_id(1)
    S = strip
    f32 = jnp.float32

    even = jnp.concatenate(
        [te_ref[0][:, 0], me_ref[0][:, 0], be_ref[0][:, 0]], axis=0
    )  # rows s0-1 .. s0+S          (S+2)
    odd = jnp.concatenate(
        [to_ref[0][:, 0], mo_ref[0][:, 0], bo_ref[0][:, 0]], axis=0
    )  # rows s0-2 .. s0+S          (S+3)

    # mask out-of-image halo rows (top at i==0, bottom at the last strip)
    def mask_rows(x, top_n, bot_n):
        n = x.shape[0]
        r = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
        lo = jnp.where(i == 0, top_n, 0)
        hi = jnp.where(i == nstrips - 1, n - bot_n, n)
        return jnp.where((r >= lo) & (r < hi), x, 0)

    even = mask_rows(even, 1, 1)
    odd = mask_rows(odd, 2, 1)

    R = S + 2  # conv1 rows r = s0-1 .. s0+S
    taps = (odd[0:R], even[0:R], odd[1 : R + 1])  # 2r-1, 2r, 2r+1

    k1p = k1p_ref[...]   # (3, 2, 8, 48, 32) per (kh, block-tap, m)
    bn1 = bn1_ref[...].astype(f32)  # (2, 32)
    # conv1 per output sub-column m: c1[m] (R, wb, 32)
    c1 = []
    qidx = jax.lax.broadcasted_iota(jnp.int32, (R, 1, 1), 0)
    row_ok = ((i > 0) | (qidx > 0)) & ((i < nstrips - 1) | (qidx < R - 1))
    wb = even.shape[1]
    # 2-D operands: Mosaic runs leading-dim-batched dot_generals as one
    # matmul per batch row — merge (rows, wb) into M instead (leading
    # reshapes are sublane-only, supported)
    shifted = {}
    for kh in range(3):
        cur = taps[kh]
        shifted[(kh, 1)] = cur.reshape(R * wb, _B * 3)
        shifted[(kh, 0)] = _shift_wb(cur, -1).reshape(R * wb, _B * 3)
    for m in range(_M):
        acc = None
        for kh in range(3):
            for t in (0, 1):
                y = jax.lax.dot_general(
                    shifted[(kh, t)], k1p[kh, t, m],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
                acc = y if acc is None else acc + y
        y = jnp.maximum(acc.reshape(R, wb, 32) * bn1[0] + bn1[1], 0.0)
        # conv1 rows outside the image are conv2's zero H-padding
        c1.append(jnp.where(row_ok, y, 0.0).astype(o_ref.dtype))

    # conv2: out sub-column m taps conv1 sub-columns m-1, m, m+1
    # (dx = 0, 1, 2 with the left pad folded in); edges cross blocks
    k2r = k2r_ref[...]   # (288, 64)
    bn2 = bn2_ref[...].astype(f32)  # (2, 64)

    def src(mi):
        if mi < 0:
            return _shift_wb(c1[_M - 1], -1)
        if mi >= _M:
            return _shift_wb(c1[0], +1)
        return c1[mi]

    outs = []
    for m in range(_M):
        pieces = []
        for dy in range(3):
            for mi in (m - 1, m, m + 1):
                pieces.append(src(mi)[dy : dy + S])
        im2col = jnp.concatenate(pieces, axis=2).reshape(
            S * wb, 9 * 32
        )  # one 2-D matmul per sub-column
        y = jax.lax.dot_general(
            im2col, k2r, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ).reshape(S, wb, 64)
        y = jnp.maximum(y * bn2[0] + bn2[1], 0.0).astype(o_ref.dtype)
        outs.append(y)
    o_ref[0] = jnp.concatenate(outs, axis=2)  # (S, wb, M*64)


@functools.partial(jax.jit, static_argnames=("strip", "interpret"))
def fused_stem(
    x, k1, a1, b1, k2, a2, b2, *, strip: int = 16, interpret: bool = False
):
    """Fused stem: (N, H, W, 3) -> (N, H/2, W/2, 64).

    ``a*/b*`` are the folded BN affines (ops/quant.py::bn_folded_affine)
    of conv1/conv2 — inference only.
    """
    n, h, w, c = x.shape
    assert stem_supported(h, w, c, strip), (h, w, c, strip)
    wb = w // _B
    h2, w2 = h // 2, w // 2
    S = strip
    nstrips = h2 // S

    T, pad_lo = _selector(_B, 2, 3, 1, np.float32)
    assert T.shape[0] == 2 and pad_lo == 1
    # K1p[kh, t, m] : (48, 32) — the wblock kernel per output sub-column
    k1p = jnp.einsum(
        "brmd,hdio->hbmrio", jnp.asarray(T), k1.astype(jnp.float32)
    ).reshape(3, 2, _M, _B * 3, 32).astype(x.dtype)
    bn1 = jnp.stack([a1, b1]).astype(jnp.float32)
    # conv2 im2col order: (dy, dx, ci) — matches HWIO reshape
    k2r = k2.astype(x.dtype).reshape(9 * 32, 64)
    bn2 = jnp.stack([a2, b2]).astype(jnp.float32)

    # free reshape: row planes (n, h2, 2, wb, 48); plane 0 = even rows
    xr = x.reshape(n, h2, 2, wb, _B * 3)

    def even_spec(rows, index):
        return pl.BlockSpec(
            (1, rows, 1, wb, _B * 3),
            lambda b, i: (b, index(i), 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def odd_spec(rows, index):
        return pl.BlockSpec(
            (1, rows, 1, wb, _B * 3),
            lambda b, i: (b, index(i), 1, 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid = (n, nstrips)
    out = pl.pallas_call(
        functools.partial(_stem_kernel, strip=S, nstrips=nstrips),
        grid=grid,
        in_specs=[
            even_spec(S, lambda i: i),                                # me
            # 1-row halos in units of their own block shape (1 row)
            even_spec(1, lambda i: jnp.maximum(S * i - 1, 0)),        # te
            even_spec(1, lambda i: jnp.minimum(S * (i + 1), h2 - 1)), # be
            odd_spec(S, lambda i: i),                                 # mo
            # 2-row top halo: offset S*i-2 in 2-row units (S even)
            pl.BlockSpec(
                (1, 2, 1, wb, _B * 3),
                lambda b, i: (b, jnp.maximum((S // 2) * i - 1, 0), 1, 0, 0),
                memory_space=pltpu.VMEM,
            ),                                                        # to
            odd_spec(1, lambda i: jnp.minimum(S * (i + 1), h2 - 1)),  # bo
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, S, wb, _M * 64), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h2, wb, _M * 64), x.dtype),
        interpret=interpret,
    )(xr, xr, xr, xr, xr, xr, k1p, bn1, k2r, bn2)
    # blocked (wb, m, 64) -> (w2, 64): free reshape
    return out.reshape(n, h2, w2, 64)
