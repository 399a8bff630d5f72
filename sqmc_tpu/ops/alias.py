"""Walker alias-method sampler (setup O(K), sample O(1)).

Replaces setup_alias/sample_alias (ref: more_tools.f90:5603,5665): tables are
dense device arrays; sampling is a gather + compare, fully vectorized -
thousands of samples per call instead of the reference's one-at-a-time draws.
Used by semistochastic PT (sample variational dets with p ~ |c|) and by the
SQMC heat-bath proposal sampler.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def setup_alias_np(prob: np.ndarray):
    """Build alias tables on host.  prob: [K] nonnegative, sums to 1.

    Returns (J [K] int32 alias index, q [K] float64 acceptance threshold).
    Uses the native C++ Vose builder when available (sqmc_tpu.native) -
    the Python loop is O(K) interpreted and dominates setup for large K.
    """
    from ..native import build_alias
    out = build_alias(prob)
    if out is not None:
        return out
    K = len(prob)
    q = prob * K
    J = np.arange(K, dtype=np.int32)
    small = [i for i in range(K) if q[i] < 1.0]
    large = [i for i in range(K) if q[i] >= 1.0]
    q = q.copy()
    while small and large:
        s = small.pop()
        l = large.pop()
        J[s] = l
        q[l] = q[l] - (1.0 - q[s])
        if q[l] < 1.0:
            small.append(l)
        else:
            large.append(l)
    return J, q


def sample_alias(key, J: jnp.ndarray, q: jnp.ndarray, n: int) -> jnp.ndarray:
    """Draw n iid samples from the alias tables.  Returns int32 [n]."""
    K = J.shape[0]
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (n,), 0, K)
    u = jax.random.uniform(k2, (n,))
    return jnp.where(u < q[idx], idx, J[idx]).astype(jnp.int32)
