"""Spatial (HW x HW) affinity attention — XLA and Pallas paths.

The reference's DANet PAM / OCNet object-context blocks materialise an
(HW x HW) affinity with CUDA bmm+softmax (SURVEY.md §2.9). At
1024x2048 eval (OS8: HW = 32768) that is 4 GB in fp32 — the true
"long-context" hot spot of this workload.

Two TPU-native implementations:

- ``_attention_xla``: plain einsum/softmax (exact; fine for small HW).
- ``_attention_pallas``: blockwise flash-style kernel with online
  softmax — never materialises HW², streams K/V blocks through VMEM,
  MXU for both matmuls. Used when ``use_pallas`` and the problem is
  big enough to matter; falls back to XLA otherwise (e.g. under the
  CPU test mesh where Mosaic is unavailable).

Semantics: ``out_i = sum_j softmax_j(scale * q_i . k_j) v_j`` — with
``scale=1.0`` this is exactly DANet's (unscaled) PAM; OCNet passes
``key_channels**-0.5``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["spatial_attention"]

_NEG_INF = -1e30


def _attention_xla(q, k, v, scale: float):
    energy = jnp.einsum("npc,nqc->npq", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(energy * scale, axis=-1)
    out = jnp.einsum("npq,nqc->npc", attn, v, preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref, *,
    scale, nk, p_real, p_pad, block_k
):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # (BQ, Dk)
    k = k_ref[0]  # (BK, Dk)
    v = v_ref[0]  # (BK, Dv)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # (BQ, BK)
    # mask zero-padded key rows (would otherwise take softmax mass).
    # Gate on p_real < p_pad — NOT p_real % block_k — because padding
    # rounds to max(block_q, block_k): with unequal blocks, p_real can
    # be a block_k multiple yet still be padded.
    if p_real < p_pad:
        cols = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(cols < p_real, s, _NEG_INF)

    m_prev = m_ref[:]  # (BQ, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)  # (BQ, BK)
    alpha = jnp.exp(m_prev - m_new)  # (BQ, 1)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    m_ref[:] = m_new

    @pl.when(kb == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)
        # logsumexp per query row — the only residual the flash
        # backward needs besides (q, k, v, o). Broadcast across the
        # 128-lane dim (Mosaic block shapes must be lane-aligned).
        lse = m_ref[:] + jnp.log(l_ref[:])  # (BQ, 1)
        lse_ref[0] = jnp.broadcast_to(lse, (lse.shape[0], 128))


def _pad_to(x, size: int, axis: int):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def _attention_pallas(
    q, k, v, scale: float, block_q: int = 512, block_k: int = 512,
    interpret: bool = False,
):
    n, p, dk = q.shape
    dv = v.shape[-1]
    # pad sequence to block multiples and feature dims to lane width
    p_pad = -(-p // max(block_q, block_k)) * max(block_q, block_k)
    dk_pad = max(-(-dk // 128) * 128, 128)
    dv_pad = max(-(-dv // 128) * 128, 128)
    qp = _pad_to(_pad_to(q, p_pad, 1), dk_pad, 2)
    kp = _pad_to(_pad_to(k, p_pad, 1), dk_pad, 2)
    vp = _pad_to(_pad_to(v, p_pad, 1), dv_pad, 2)
    nq = p_pad // block_q
    nk = p_pad // block_k

    out, lse = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, nk=nk, p_real=p, p_pad=p_pad,
            block_k=block_k,
        ),
        grid=(n, nq, nk),
        in_specs=[
            pl.BlockSpec(
                (1, block_q, dk_pad), lambda b, i, j: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_k, dk_pad), lambda b, i, j: (b, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_k, dv_pad), lambda b, i, j: (b, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, block_q, dv_pad), lambda b, i, j: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_q, 128), lambda b, i, j: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, p_pad, dv_pad), v.dtype),
            jax.ShapeDtypeStruct((n, p_pad, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, dv_pad), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :p, :dv], lse[:, :p, 0]


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *, scale, nk
):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]  # (BQ, 1) — lane-broadcast storage
    delta = delta_ref[0][:, :1]  # (BQ, 1)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse)  # padded keys: k rows are zero, so their
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    ds = p * (dp - delta)  # contribution to dq (ds @ k) vanishes
    dq_ref[0] = dq_ref[0] + (
        jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    ).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, *,
    scale, nq
):
    ib = pl.program_id(2)

    @pl.when(ib == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)  # zero rows for padded queries
    lse = lse_ref[0][:, :1]
    delta = delta_ref[0][:, :1]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse)  # (BQ, BK)
    dv_ref[0] = dv_ref[0] + jnp.dot(
        p.T, do, preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dk_ref[0] = dk_ref[0] + (
        jnp.dot(ds.T, q, preferred_element_type=jnp.float32) * scale
    ).astype(dk_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def _attention_pallas_bwd(
    q, k, v, do, o, lse, scale: float, block_q: int = 512,
    block_k: int = 512, interpret: bool = False,
):
    """Flash backward: (dq, dk, dv) without materializing (P x P).

    ``delta_i = rowsum(dO_i * O_i)`` is computed in XLA (elementwise);
    the dq pass runs grid (n, i, j) accumulating per-i blocks, and the
    dk/dv pass runs grid (n, j, i) accumulating per-j blocks."""
    n, p, dk_dim = q.shape
    dv_dim = v.shape[-1]
    p_pad = -(-p // max(block_q, block_k)) * max(block_q, block_k)
    dk_pad = max(-(-dk_dim // 128) * 128, 128)
    dv_pad = max(-(-dv_dim // 128) * 128, 128)
    qp = _pad_to(_pad_to(q, p_pad, 1), dk_pad, 2)
    kp = _pad_to(_pad_to(k, p_pad, 1), dk_pad, 2)
    vp = _pad_to(_pad_to(v, p_pad, 1), dv_pad, 2)
    dop = _pad_to(_pad_to(do, p_pad, 1), dv_pad, 2)
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )  # (n, p)
    # lane-broadcast per-row scalars to 128 so blocks are tile-aligned
    lsep = jnp.broadcast_to(
        _pad_to(lse, p_pad, 1)[..., None], (n, p_pad, 128)
    )
    deltap = jnp.broadcast_to(
        _pad_to(delta, p_pad, 1)[..., None], (n, p_pad, 128)
    )
    nq = p_pad // block_q
    nk = p_pad // block_k
    f32 = jnp.float32

    def spec_q(*block):
        return pl.BlockSpec(block, lambda b, i, j: (b, i, 0),
                            memory_space=pltpu.VMEM)

    def spec_k(*block):
        return pl.BlockSpec(block, lambda b, i, j: (b, j, 0),
                            memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, nk=nk),
        grid=(n, nq, nk),
        in_specs=[
            spec_q(1, block_q, dk_pad),
            spec_k(1, block_k, dk_pad),
            spec_k(1, block_k, dv_pad),
            spec_q(1, block_q, dv_pad),
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=spec_q(1, block_q, dk_pad),
        out_shape=jax.ShapeDtypeStruct((n, p_pad, dk_pad), f32),
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, deltap)

    # dk/dv pass: swap the roles — grid (n, j, i), j-indexed outputs
    def spec_j(*block):  # fixed per j (second grid dim)
        return pl.BlockSpec(block, lambda b, j, i: (b, j, 0),
                            memory_space=pltpu.VMEM)

    def spec_i(*block):
        return pl.BlockSpec(block, lambda b, j, i: (b, i, 0),
                            memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, nq=nq),
        grid=(n, nk, nq),
        in_specs=[
            spec_i(1, block_q, dk_pad),
            spec_j(1, block_k, dk_pad),
            spec_j(1, block_k, dv_pad),
            spec_i(1, block_q, dv_pad),
            pl.BlockSpec((1, block_q, 128), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 128), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            spec_j(1, block_k, dk_pad),
            spec_j(1, block_k, dv_pad),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, p_pad, dk_pad), f32),
            jax.ShapeDtypeStruct((n, p_pad, dv_pad), f32),
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, deltap)

    return (
        dq[:, :p, :dk_dim].astype(q.dtype),
        dk[:, :p, :dk_dim].astype(k.dtype),
        dv[:, :p, :dv_dim].astype(v.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attention_pallas_diff(q, k, v, scale):
    """Fully-blockwise differentiable attention: flash forward (online
    softmax) + flash backward (dq / dkv passes over key/query blocks) —
    the (P x P) affinity never materializes in either direction, so
    DANet/OCNet *training* also fits HBM at full resolution."""
    return _attention_pallas(q, k, v, scale=scale)[0]


def _attention_pallas_diff_fwd(q, k, v, scale):
    out, lse = _attention_pallas(q, k, v, scale=scale)
    return out, (q, k, v, out, lse)


def _attention_pallas_diff_bwd(scale, res, g):
    q, k, v, out, lse = res
    return _attention_pallas_bwd(q, k, v, g, out, lse, scale)


_attention_pallas_diff.defvjp(_attention_pallas_diff_fwd, _attention_pallas_diff_bwd)


def spatial_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float = 1.0,
    use_pallas: bool = False,
    min_seq_for_pallas: int = 2048,
) -> jax.Array:
    """Affinity attention over flattened spatial positions.

    q, k: (N, P, Dk); v: (N, P, Dv) -> (N, P, Dv). Zero-padded key rows
    are masked to -inf inside the kernel, so any P works. Differentiable
    (custom VJP backs the Pallas path).
    """
    p = q.shape[1]
    # TPU platforms: "tpu" natively; "axon" when reached through the
    # relay plugin in this container — both run Mosaic.
    backend = jax.default_backend()
    if use_pallas and backend in ("tpu", "axon") and p >= min_seq_for_pallas:
        return _attention_pallas_diff(q, k, v, float(scale))
    return _attention_xla(q, k, v, float(scale))
