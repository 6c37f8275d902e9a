"""Adaptive average pooling with torch-exact window semantics.

The reference's PSP pyramid pooling and ASPP image pooling use ATen
``adaptive_avg_pool2d`` with output sizes {1, 2, 3, 6} (SURVEY.md §2.9).
Torch's windows are ``[floor(i*in/out), ceil((i+1)*in/out))`` — uneven
when ``in % out != 0`` — so a plain stride-pool is NOT equivalent.

TPU-native design: like resize, 1-D adaptive pooling is a linear map;
we build the (out, in) averaging matrices at trace time and lower the
pool to two matmuls on the MXU. Exact for every (in, out) pair.
"""

from __future__ import annotations

import functools
from typing import Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["adaptive_avg_pool", "global_avg_pool"]


@functools.lru_cache(maxsize=None)
def _pool_weights(in_size: int, out_size: int):
    w = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -((-(i + 1) * in_size) // out_size)  # ceil
        w[i, lo:hi] = 1.0 / (hi - lo)
    return w


def adaptive_avg_pool(
    x: jax.Array, output_size: Union[int, Sequence[int]]
) -> jax.Array:
    """Adaptive average pool NHWC ``x`` to ``output_size`` (torch-exact)."""
    if isinstance(output_size, int):
        out_h = out_w = output_size
    else:
        out_h, out_w = int(output_size[0]), int(output_size[1])
    n, in_h, in_w, c = x.shape
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    wh = jnp.asarray(_pool_weights(in_h, out_h), jnp.float32)
    ww = jnp.asarray(_pool_weights(in_w, out_w), jnp.float32)
    y = jnp.einsum("oh,nhwc->nowc", wh, xf, precision='highest', preferred_element_type=jnp.float32)
    y = jnp.einsum("pw,nowc->nopc", ww, y, precision='highest', preferred_element_type=jnp.float32)
    return y.astype(orig_dtype)


def global_avg_pool(x: jax.Array, keepdims: bool = True) -> jax.Array:
    """Mean over H, W of an NHWC tensor (ASPP image pooling)."""
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=keepdims).astype(
        x.dtype
    )
