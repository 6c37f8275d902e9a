"""Fused entry-chain Pallas kernels (VERDICT r2 next-round #1).

The r2 component map leaves ONE slack area: the entry flow runs ~2x its
roofline, and every per-layer/per-block pallas attempt lost to the
XLA<->pallas boundary relayouts (BASELINE.md, sepconv v3). The open
line is fusing whole multi-layer sections into single kernels so the
interior activations never touch HBM and there are no interior
boundaries. Round-3 bandwidth data (BASELINE.md): Mosaic streams at
~330-340 GB/s vs XLA's 599, so a fused kernel must CUT traffic, which
multi-layer fusion does (one read of the image, one write of the
section output).

Two kernels, built from shared pieces:

- ``fused_stem``:  conv1(3x3 s2, 3->32) + BN + ReLU + conv2(3x3 s1,
  32->64) + BN + ReLU  — the reference's Xception entry stem
  (``segmentron/models/backbones/xception.py``).
- ``fused_stem_block1``: the stem PLUS the whole block1 (three
  separable convs 64->128->128->128, the last stride 2, no interior
  ReLUs — relu_first=False — and the strided 1x1+BN conv-skip),
  emitting the c1 tap at stride 4 directly: image -> (H/4, W/4, 128)
  with zero interior HBM roundtrips.

Mosaic-shaped design (the first formulation died on "unsupported shape
cast"):
- the C_in=3 conv1 uses the W-block reformulation (ops/stem.py): the
  image arrives as (H, W/B, B*3) via a free XLA reshape so the MXU
  contraction lane is 48 wide;
- H-stride-2 uses free LEADING-dim reshapes ((R, wb, c) ->
  (R/2, 2, wb, c)) + middle-dim slices — no strided extracts;
- per-sub-column work is merged on the M axis into a handful of big
  MXU contractions (conv1: 6, conv2/pw1/pw2/pw3/skip: 1 each);
- the W taps of 3x3 convs are lane-slices + sublane block-shifts;
- halo rows stream as thin clamped BlockSpec windows over the image
  (the sepconv-v3 technique), with out-of-image rows zero-masked
  in-kernel (exact conv padding semantics);
- outputs leave in a blocked layout whose un-grouping is a free XLA
  reshape, with 128-aligned lane dims for the HBM DMA.

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

__all__ = [
    "fused_stem",
    "fused_stem_ref",
    "stem_supported",
    "fused_stem_block1",
    "fused_stem_block1_ref",
    "stem_block1_supported",
]

_B = 16  # W-block size (ops/stem.py measured optimum for 3x3 s2)
_M = _B // 2  # stem output sub-columns per block (stride 2)


# ------------------------------------------------------------------ oracles
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


def fused_stem_block1_ref(x, stem_p, sep_p, skip_p):
    """XLA oracle for stem + block1 (relu_first=False, conv skip)."""
    y = fused_stem_ref(x, *stem_p)
    inp = y

    def sepconv(y, dwk, ad, bd, pwk, ap, bp, stride):
        c = y.shape[-1]
        y = jax.lax.conv_general_dilated(
            y, dwk, (stride, stride), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c, preferred_element_type=jnp.float32,
        )
        y = (y * ad + bd).astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            y, pwk, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return (y * ap + bp).astype(x.dtype)

    for i, p in enumerate(sep_p):
        y = sepconv(y, *p, stride=2 if i == 2 else 1)
    wsk, a_s, b_s = skip_p
    sk = jax.lax.conv_general_dilated(
        inp, wsk, (2, 2), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    sk = (sk * a_s + b_s).astype(x.dtype)
    return y + sk


def stem_supported(h: int, w: int, c: int, strip: int = 8) -> bool:
    return (
        c == 3
        and h % 2 == 0
        and w % (2 * _B) == 0
        and strip % 2 == 0
        and (h // 2) % strip == 0
        and h // 2 >= 2 * strip
    )


def stem_block1_supported(h: int, w: int, c: int, strip: int = 4) -> bool:
    return (
        c == 3
        and h % 4 == 0
        and w % (4 * _B) == 0
        and strip % 4 == 0
        and (h // 4) % strip == 0
        and h // 4 >= 2 * strip
    )


# ----------------------------------------------------------- kernel pieces
def _shift_wb(x, direction):
    """Shift along the W-block (sublane) axis: direction=-1 brings the
    PREVIOUS block's row into position (zero at the edges).

    Implemented as a circular roll + edge mask: the earlier
    concatenate-with-zeros form trips a Mosaic layout bug when ``x`` is
    a lane-offset slice ("tpu.concatenate" with mismatched vpad
    offsets), and hoisting whole-lane shifts costs multi-MB VMEM copies
    per layer. ``roll`` is single-operand and layout-preserving."""
    nb = x.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)
    # tpu.rotate only supports 32-bit data — roll bf16 via f32
    xr = x if x.dtype.itemsize == 4 else x.astype(jnp.float32)
    if direction == -1:
        out = jnp.where(idx >= 1, pltpu.roll(xr, 1, 1), 0)
    else:
        out = jnp.where(idx < nb - 1, pltpu.roll(xr, nb - 1, 1), 0)
    return out.astype(x.dtype)


def _mask_rows(x, i, lo_local, h_valid, nstrips, strip_rows):
    """Zero rows whose GLOBAL index (strip_rows*i + lo_local + k) falls
    outside [0, h_valid) — the convs' zero padding semantics. Only the
    first/last strips can be affected, so the compare is against the
    program id."""
    n = x.shape[0]
    k = jax.lax.broadcasted_iota(jnp.int32, (n,) + (1,) * (x.ndim - 1), 0)
    g = strip_rows * i + lo_local + k
    return jnp.where((g >= 0) & (g < h_valid), x, 0)


def _row_valid(n, i, lo_local, h_valid, strip_rows):
    """(n, 1, 1) f32 0/1 validity of rows strip_rows*i + lo_local + k.

    Multiplied into each stage's FINAL per-sub-column affine instead of
    a whole-tensor _mask_rows pass: the where-copies of c1/x2/x3/x4
    were ~9.5 MB of scoped-VMEM buffers (measured OOM); a broadcast
    multiply fused into the existing elementwise chain costs none."""
    k = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    g = strip_rows * i + lo_local + k
    return ((g >= 0) & (g < h_valid)).astype(jnp.float32)


def _conv1_wblock(taps, k1p, bn1, dtype, valid=None):
    """W-blocked conv1 on three row-tap arrays (R, wb, 48) ->
    (R, wb, 256) post-BN-ReLU (lanes = 8 sub-cols x 32 ch). ``bn1`` is
    pre-tiled to 256 lanes host-side (a lane-split reshape for a (32,)
    broadcast would be an unsupported Mosaic shape cast). ``valid``
    ((R,1,1) f32 0/1) zeroes out-of-image rows in the same affine."""
    f32 = jnp.float32
    acc = None
    for kh in range(3):
        cur = taps[kh]
        R, wb = cur.shape[0], cur.shape[1]
        for t, xp in ((0, _shift_wb(cur, -1)), (1, cur)):
            y = jax.lax.dot_general(
                xp.reshape(R * wb, _B * 3), k1p[kh, t],
                (((1,), (0,)), ((), ())), preferred_element_type=f32,
            )
            acc = y if acc is None else acc + y
    y = jnp.maximum(acc.reshape(R, wb, _M * 32) * bn1[0] + bn1[1], 0.0)
    if valid is not None:
        y = y * valid
    return y.astype(dtype)


def _conv2_im2col(c1, k2r, bn2, relu, dtype, valid=None):
    """3x3 s1 conv 32->64 on the blocked conv1 output (R, wb, 256):
    per-sub-column K=288 im2col (lane slices + block shifts) + dot,
    one sub-column at a time — merging all of them on M into one
    contraction builds an (M*S*wb, 288) buffer that blows the 16 MB
    scoped-VMEM stack at block1 strip sizes (measured 24.7 MB OOM);
    per-m the transient is 1/M of that and S*wb rows (>=1792) still
    fill the MXU. Output (R-2, wb, M*64), rows shrink by the dy halo."""
    f32 = jnp.float32
    R, wb = c1.shape[0], c1.shape[1]
    S = R - 2

    def sub(mi):  # conv1 sub-column mi as (R, wb, 32), cross-block shifted
        if mi < 0:
            return _shift_wb(c1[:, :, (_M - 1) * 32 :], -1)
        if mi >= _M:
            return _shift_wb(c1[:, :, :32], +1)
        return c1[:, :, mi * 32 : (mi + 1) * 32]

    outs = []
    for m in range(_M):
        pieces = []
        for dy in range(3):
            for mi in (m - 1, m, m + 1):
                pieces.append(sub(mi)[dy : dy + S])
        im2col = jnp.concatenate(pieces, axis=2).reshape(S * wb, 288)
        y = jax.lax.dot_general(
            im2col, k2r, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ).reshape(S, wb, 64)
        y = y * bn2[0] + bn2[1]
        if relu:
            y = jnp.maximum(y, 0.0)
        if valid is not None:
            y = y * valid
        outs.append(y.astype(dtype))
    return jnp.concatenate(outs, axis=2)


def _sep_stride1(x, n_sub, cin, dwk, bnd, pwk, bnp, dtype, valid=None):
    """Separable conv (dw 3x3 s1 + BN + pw + BN, NO relus — block1's
    relu_first=False layout) on a blocked (R, wb, n_sub*cin) tensor.
    Output (R-2, wb, n_sub*cout)."""
    f32 = jnp.float32
    R, wb = x.shape[0], x.shape[1]
    S = R - 2
    cout = pwk.shape[1]

    def sub(mi):
        if mi < 0:
            return _shift_wb(x[:, :, (n_sub - 1) * cin :], -1)
        if mi >= n_sub:
            return _shift_wb(x[:, :, :cin], +1)
        return x[:, :, mi * cin : (mi + 1) * cin]

    outs = []
    for m in range(n_sub):
        acc = None
        for dy in range(3):
            for dx in range(3):
                t = sub(m + dx - 1)[dy : dy + S].astype(f32) * dwk[dy, dx]
                acc = t if acc is None else acc + t
        dw = (acc * bnd[0] + bnd[1]).astype(dtype)  # (S, wb, cin)
        # per-m pointwise dot (see _conv2_im2col: merged-on-M LHS
        # buffers OOM the scoped-VMEM stack at block1 strips)
        y = jax.lax.dot_general(
            dw.reshape(S * wb, cin), pwk, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ).reshape(S, wb, cout)
        y = y * bnp[0] + bnp[1]
        if valid is not None:
            y = y * valid
        outs.append(y.astype(dtype))
    return jnp.concatenate(outs, axis=2)


# --------------------------------------------------------------- fused stem
def _stem_kernel(
    me_ref, te_ref, be_ref, mo_ref, to_ref, bo_ref,
    k1p_ref, bn1_ref, k2r_ref, bn2_ref, o_ref,
    *, strip: int, nstrips: int, h2: int,
):
    """One strip of conv2-output rows [s0, s0+S), s0 = S*i. Streams are
    the even/odd row planes of the free (h2, 2, wb, 48) image reshape;
    conv1 row r (q = r-s0+1 in [0, S+1]) taps image rows 2r-1 (odd
    plane r-1), 2r (even r), 2r+1 (odd r)."""
    i = pl.program_id(1)
    S = strip

    even = jnp.concatenate(
        [te_ref[0][:, 0], me_ref[0][:, 0], be_ref[0][:, 0]], axis=0
    )  # plane rows s0-1 .. s0+S   (S+2)
    odd = jnp.concatenate(
        [to_ref[0][:, 0], mo_ref[0][:, 0], bo_ref[0][:, 0]], axis=0
    )  # plane rows s0-2 .. s0+S   (S+3)
    even = _mask_rows(even, i, -1, h2, nstrips, S)
    odd = _mask_rows(odd, i, -2, h2, nstrips, S)

    R = S + 2
    taps = (odd[0:R], even[0:R], odd[1 : R + 1])  # 2r-1, 2r, 2r+1
    # conv1 rows r = s0-1 .. s0+S; rows outside [0, h2) are conv2's
    # zero H-padding — zeroed inside conv1's own affine
    c1 = _conv1_wblock(
        taps, k1p_ref[...], bn1_ref[...].astype(jnp.float32), o_ref.dtype,
        valid=_row_valid(R, i, -1, h2, S),
    )
    out = _conv2_im2col(
        c1, k2r_ref[...], bn2_ref[...].astype(jnp.float32), True,
        o_ref.dtype,
    )
    o_ref[0] = out


@functools.partial(jax.jit, static_argnames=("strip", "interpret"))
def fused_stem(
    x, k1, a1, b1, k2, a2, b2, *, strip: int = 8, interpret: bool = False
):
    """Fused stem: (N, H, W, 3) -> (N, H/2, W/2, 64)."""
    n, h, w, c = x.shape
    assert stem_supported(h, w, c, strip), (h, w, c, strip)
    wb = w // _B
    h2 = h // 2
    S = strip
    nstrips = h2 // S

    T, pad_lo = _selector(_B, 2, 3, 1, np.float32)
    assert T.shape[0] == 2 and pad_lo == 1
    # K1p[kh, t]: (48, 256) with output lanes ordered (m, c_out)
    k1p = jnp.einsum(
        "brmd,hdio->hbrimo", jnp.asarray(T), k1.astype(jnp.float32)
    ).reshape(3, 2, _B * 3, _M * 32).astype(x.dtype)
    bn1 = jnp.stack([jnp.tile(a1, _M), jnp.tile(b1, _M)]).astype(
        jnp.float32
    )  # pre-tiled to 256 lanes (see _conv1_wblock)
    k2r = k2.astype(x.dtype).reshape(9 * 32, 64)
    bn2 = jnp.stack([a2, b2]).astype(jnp.float32)

    xr = x.reshape(n, h2, 2, wb, _B * 3)  # free: row planes

    def plane_spec(rows, plane, index):
        return pl.BlockSpec(
            (1, rows, 1, wb, _B * 3),
            lambda b, i, index=index, plane=plane: (b, index(i), plane, 0, 0),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        functools.partial(
            _stem_kernel, strip=S, nstrips=nstrips, h2=h2
        ),
        grid=(n, nstrips),
        in_specs=[
            plane_spec(S, 0, lambda i: i),
            plane_spec(1, 0, lambda i: jnp.maximum(S * i - 1, 0)),
            plane_spec(1, 0, lambda i: jnp.minimum(S * (i + 1), h2 - 1)),
            plane_spec(S, 1, lambda i: i),
            pl.BlockSpec(
                (1, 2, 1, wb, _B * 3),
                lambda b, i: (b, jnp.maximum((S // 2) * i - 1, 0), 1, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            plane_spec(1, 1, lambda i: jnp.minimum(S * (i + 1), h2 - 1)),
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
    return out.reshape(n, h2, w // 2, 64)


# ------------------------------------------------------- fused stem+block1
def _stem_block1_kernel(
    me_ref, te_ref, be_ref, mo_ref, to_ref, bo_ref,
    k1p_ref, bn1_ref, k2r_ref, bn2_ref,
    dw1_ref, bnd1_ref, pw1_ref, bnp1_ref,
    dw2_ref, bnd2_ref, pw2_ref, bnp2_ref,
    dw3_ref, bnd3_ref, pw3_ref, bnp3_ref,
    wsk_ref, bnsk_ref, o_ref,
    *, strip: int, nstrips: int, h2: int,
):
    """One strip of block1-output rows [t0, t0+S1), t0 = S1*i, at 1/4
    resolution. 512-res row ranges (local to 2*t0):

      X2 (conv2 out)  rows [2t0-3, 2t0+2S1+2]   (2S1+6)
      X3 (sep1 out)   rows [2t0-2, 2t0+2S1+1]   (2S1+4)
      X4 (sep2 out)   rows [2t0-1, 2t0+2S1]     (2S1+2)
      sep3/skip out   rows [t0, t0+S1)

    conv1 rows [2t0-4, 2t0+2S1+3] (2S1+8); image rows via the stem's
    even/odd plane taps.
    """
    i = pl.program_id(1)
    S1 = strip
    S2 = 2 * S1  # conv2-out rows per output row-pair unit
    f32 = jnp.float32
    dt = o_ref.dtype

    even = jnp.concatenate(
        [te_ref[0][:, 0], me_ref[0][:, 0], be_ref[0][:, 0]], axis=0
    )  # plane rows 2t0-8 .. 2t0+2S1+3  (2S1+12)
    odd = jnp.concatenate(
        [to_ref[0][:, 0], mo_ref[0][:, 0], bo_ref[0][:, 0]], axis=0
    )  # same coverage
    even = _mask_rows(even, i, -8, h2, nstrips, S2)
    odd = _mask_rows(odd, i, -8, h2, nstrips, S2)

    # conv1 rows r = 2t0-4 .. 2t0+2S1+3 (R rows); taps odd[r-1], even[r],
    # odd[r]; local arrays start at plane row 2t0-8 -> r index offset 4
    R = S2 + 8
    taps = (odd[3 : 3 + R], even[4 : 4 + R], odd[4 : 4 + R])
    # out-of-image rows of every stage are zeroed inside the stage's
    # own final affine (fused _row_valid multiply, not a where pass)
    c1 = _conv1_wblock(
        taps, k1p_ref[...], bn1_ref[...].astype(f32), dt,
        valid=_row_valid(R, i, -4, h2, S2),
    )

    x2 = _conv2_im2col(
        c1, k2r_ref[...], bn2_ref[...].astype(f32), True, dt,
        valid=_row_valid(S2 + 6, i, -3, h2, S2),
    )  # rows [2t0-3, 2t0+2S1+2], (2S1+6, wb, M*64)

    x3 = _sep_stride1(
        x2, _M, 64, dw1_ref[...].astype(f32), bnd1_ref[...].astype(f32),
        pw1_ref[...], bnp1_ref[...].astype(f32), dt,
        valid=_row_valid(S2 + 4, i, -2, h2, S2),
    )  # rows [2t0-2, 2t0+2S1+1], (2S1+4, wb, M*128)

    x4 = _sep_stride1(
        x3, _M, 128, dw2_ref[...].astype(f32), bnd2_ref[...].astype(f32),
        pw2_ref[...], bnp2_ref[...].astype(f32), dt,
        valid=_row_valid(S2 + 2, i, -1, h2, S2),
    )  # rows [2t0-1, 2t0+2S1], (2S1+2, wb, M*128)

    # ---- sep3: dw 3x3 stride 2 + BN + pw + BN ----------------------
    # H deinterleave: x4 rows 2t0-1+k -> (k even = odd global rows,
    # k odd = even global rows)
    wb = x4.shape[1]
    planes = x4.reshape((S1 + 1), 2, wb, _M * 128)
    xo = planes[:, 0]  # global odd rows 2(t0+j)-1, j = 0..S1
    xe = planes[:, 1]  # global even rows 2(t0+j), j = 0..S1-1... (S1+1 rows)
    dw3 = dw3_ref[...].astype(f32)
    bnd3 = bnd3_ref[...].astype(f32)

    def sub4(mi):  # x4 sub-column with cross-block shifts, both planes
        if mi < 0:
            return (_shift_wb(xo[:, :, (_M - 1) * 128 :], -1),
                    _shift_wb(xe[:, :, (_M - 1) * 128 :], -1))
        if mi >= _M:
            return (_shift_wb(xo[:, :, :128], +1),
                    _shift_wb(xe[:, :, :128], +1))
        return (xo[:, :, mi * 128 : (mi + 1) * 128],
                xe[:, :, mi * 128 : (mi + 1) * 128])

    # out sub-col m' (4 per block at 1/4 res) taps input sub-cols
    # 2m'+dx-1; out row j taps odd[j], even[j], odd[j+1]
    dws = []
    for mp in range(4):
        acc = None
        for dx in range(3):
            o_c, e_c = sub4(2 * mp + dx - 1)
            rowtaps = (o_c[0:S1], e_c[0:S1], o_c[1 : S1 + 1])
            for dy in range(3):
                t = rowtaps[dy].astype(f32) * dw3[dy, dx]
                acc = t if acc is None else acc + t
        dws.append((acc * bnd3[0] + bnd3[1]).astype(dt))  # (S1, wb, 128)
    lhs = jnp.concatenate(dws, axis=0).reshape(4 * S1 * wb, 128)
    y = jax.lax.dot_general(
        lhs, pw3_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).reshape(4, S1, wb, 128)
    y = y * bnp3_ref[...].astype(f32)[0] + bnp3_ref[...].astype(f32)[1]

    # ---- conv skip: 1x1 stride 2 on x2 ------------------------------
    # rows: even global rows 2(t0+j) = x2 local index 2j+3; W: even
    # sub-cols 2m' of each block
    x2p = x2.reshape((S1 + 3), 2, wb, _M * 64)
    x2_even = x2p[:, 1][1 : S1 + 1]  # x2 local rows 3,5,..,2S1+1 -> (S1, wb, M*64)
    sks = []
    for mp in range(4):
        sks.append(x2_even[:, :, (2 * mp) * 64 : (2 * mp + 1) * 64])
    sk_lhs = jnp.concatenate(sks, axis=0).reshape(4 * S1 * wb, 64)
    sk = jax.lax.dot_general(
        sk_lhs, wsk_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).reshape(4, S1, wb, 128)
    bnsk = bnsk_ref[...].astype(f32)
    sk = sk * bnsk[0] + bnsk[1]

    out = (y + sk).astype(dt)  # (4, S1, wb, 128)
    o_ref[0] = jnp.concatenate([out[m] for m in range(4)], axis=2)


@functools.partial(jax.jit, static_argnames=("strip", "interpret"))
def fused_stem_block1(
    x, stem_p, sep_p, skip_p, *, strip: int = 4, interpret: bool = False
):
    """Fused stem + block1: (N, H, W, 3) -> (N, H/4, W/4, 128).

    ``stem_p`` = (k1, a1, b1, k2, a2, b2); ``sep_p`` = three tuples
    (dw HWIO (3,3,1,C), a_dw, b_dw, pw (1,1,C,C'), a_pw, b_pw);
    ``skip_p`` = (wsk (1,1,64,128), a, b). Inference only.
    """
    n, h, w, c = x.shape
    assert stem_block1_supported(h, w, c, strip), (h, w, c, strip)
    wb = w // _B
    h2, h4 = h // 2, h // 4
    S1 = strip
    S2 = 2 * S1
    nstrips = h4 // S1

    k1, a1, b1, k2, a2, b2 = stem_p
    T, pad_lo = _selector(_B, 2, 3, 1, np.float32)
    assert T.shape[0] == 2 and pad_lo == 1
    k1p = jnp.einsum(
        "brmd,hdio->hbrimo", jnp.asarray(T), k1.astype(jnp.float32)
    ).reshape(3, 2, _B * 3, _M * 32).astype(x.dtype)
    bn1 = jnp.stack([jnp.tile(a1, _M), jnp.tile(b1, _M)]).astype(
        jnp.float32
    )
    k2r = k2.astype(x.dtype).reshape(9 * 32, 64)
    bn2 = jnp.stack([a2, b2]).astype(jnp.float32)

    def sep_params(p):
        dwk, ad, bd, pwk, ap, bp = p
        return (
            dwk.reshape(3, 3, -1).astype(jnp.float32),
            jnp.stack([ad, bd]).astype(jnp.float32),
            pwk.reshape(pwk.shape[-2], pwk.shape[-1]).astype(x.dtype),
            jnp.stack([ap, bp]).astype(jnp.float32),
        )

    dw1, bnd1, pw1, bnp1 = sep_params(sep_p[0])
    dw2, bnd2, pw2, bnp2 = sep_params(sep_p[1])
    dw3, bnd3, pw3, bnp3 = sep_params(sep_p[2])
    wsk, a_s, b_s = skip_p
    wskr = wsk.reshape(64, 128).astype(x.dtype)
    bnsk = jnp.stack([a_s, b_s]).astype(jnp.float32)

    xr = x.reshape(n, h2, 2, wb, _B * 3)

    def plane_spec(rows, plane, index):
        return pl.BlockSpec(
            (1, rows, 1, wb, _B * 3),
            lambda b, i, index=index, plane=plane: (b, index(i), plane, 0, 0),
            memory_space=pltpu.VMEM,
        )

    # plane coverage [2t0-8, 2t0+2S1+3]: main (S2) + 8-row top halo +
    # 4-row bottom halo (S1 % 4 == 0 keeps the units aligned)
    def top_idx(i):
        return jnp.maximum((S2 // 8) * i - 1, 0)

    def bot_idx(i):
        return jnp.minimum((S2 // 4) * (i + 1), h2 // 4 - 1)

    top_spec = lambda plane: pl.BlockSpec(
        (1, 8, 1, wb, _B * 3),
        lambda b, i, plane=plane: (b, top_idx(i), plane, 0, 0),
        memory_space=pltpu.VMEM,
    )
    bot_spec = lambda plane: pl.BlockSpec(
        (1, 4, 1, wb, _B * 3),
        lambda b, i, plane=plane: (b, bot_idx(i), plane, 0, 0),
        memory_space=pltpu.VMEM,
    )

    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _stem_block1_kernel, strip=S1, nstrips=nstrips, h2=h2
        ),
        grid=(n, nstrips),
        in_specs=[
            plane_spec(S2, 0, lambda i: i),
            top_spec(0),
            bot_spec(0),
            plane_spec(S2, 1, lambda i: i),
            top_spec(1),
            bot_spec(1),
            vm, vm, vm, vm,          # k1p, bn1, k2r, bn2
            vm, vm, vm, vm,          # dw1, bnd1, pw1, bnp1
            vm, vm, vm, vm,          # dw2, bnd2, pw2, bnp2
            vm, vm, vm, vm,          # dw3, bnd3, pw3, bnp3
            vm, vm,                  # wsk, bnsk
        ],
        out_specs=pl.BlockSpec(
            (1, S1, wb, 4 * 128), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h4, wb, 4 * 128), x.dtype),
        interpret=interpret,
    )(
        xr, xr, xr, xr, xr, xr,
        k1p, bn1, k2r, bn2,
        dw1, bnd1, pw1, bnp1,
        dw2, bnd2, pw2, bnp2,
        dw3, bnd3, pw3, bnp3,
        wskr, bnsk,
    )
    return out.reshape(n, h4, w // 4, 128)
