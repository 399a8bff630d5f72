"""TPU-native prefix sums.

XLA lowers a long 1-D `jnp.cumsum` to hierarchical `reduce-window` ops
whose scoped-vmem footprint explodes inside `lax.scan` bodies (observed:
64MB scoped vmem for a 80k-element cumsum vs the 16MB limit).  The
MXU-native alternative: block the vector into [nb, B] rows, do the
in-row inclusive scan as a [nb,B]x[B,B] triangular-ones matmul (full-f32
precision => exact for integer values < 2^24), and recurse on the nb
block totals.  One matmul + one tiny scan instead of a deep
reduce-window tree.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

_BLOCK = 128


@functools.lru_cache(maxsize=8)
def _tri_ones_np(block: int):
    # U[k, j] = 1 for k <= j  =>  (x @ U)[j] = sum_{k<=j} x[k]  (inclusive)
    import numpy as np
    return np.triu(np.ones((block, block), np.float32))


def cumsum_i32(x: jnp.ndarray, block: int = _BLOCK) -> jnp.ndarray:
    """Inclusive 1-D cumsum of non-negative int32 with total < 2^24,
    as blocked triangular matmuls (exact in f32 with HIGHEST precision)."""
    n = x.shape[0]
    if n <= block:
        return jnp.cumsum(x)
    nb = -(-n // block)
    xf = jnp.zeros(nb * block, jnp.float32).at[:n].set(
        x.astype(jnp.float32)).reshape(nb, block)
    inner = jax.lax.dot(xf, jnp.asarray(_tri_ones_np(block)),
                        precision=jax.lax.Precision.HIGHEST)
    totals = inner[:, -1].astype(jnp.int32)
    # exclusive block offsets; nb is small (n/128), recurse if still long
    if nb <= block:
        off = jnp.cumsum(totals) - totals
    else:
        off = cumsum_i32(totals, block) - totals
    out = inner.astype(jnp.int32) + off[:, None]
    return out.reshape(-1)[:n]


def cumsum_rows(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum along the LAST axis of a 2-D array as a single
    [*, K]x[K, K] triangular matmul (XLA lowers short-axis cumsum to a
    K-iteration while loop with dynamic-update-slice carries; one MXU
    matmul is cheaper for K up to a few hundred).  Exact for f64 inputs
    (HIGHEST precision) and for integer-valued f32 sums < 2^24."""
    k = x.shape[-1]
    dt = x.dtype
    as_int = jnp.issubdtype(dt, jnp.integer)
    xf = x.astype(jnp.float32) if as_int else x
    tri = jnp.asarray(np.triu(np.ones((k, k), xf.dtype)))
    out = jax.lax.dot_general(
        xf, tri, (((x.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    return out.astype(dt) if as_int else out
