"""ops/segscan: one-pass segmented reductions vs a numpy oracle."""

import numpy as np
import jax.numpy as jnp

from sqmc_tpu.ops import segscan


def test_seg_scan_matches_numpy_oracle():
    rng = np.random.default_rng(7)
    n = 1024
    # random sorted segment structure, including length-1 and long runs
    start = rng.random(n) < 0.2
    start[0] = True
    sid = np.cumsum(start) - 1
    w = rng.normal(size=n)
    v = rng.integers(-5, 100, size=n).astype(np.int32)

    s_w, s_v_min, s_v_max = segscan.seg_scan(
        (jnp.asarray(w), jnp.asarray(v), jnp.asarray(v)),
        ("sum", "min", "max"), jnp.asarray(start))

    ends = np.asarray(segscan.seg_ends(jnp.asarray(start)))
    assert ends[-1] and np.array_equal(ends[:-1], start[1:])

    for g in range(sid.max() + 1):
        rows = np.where(sid == g)[0]
        e = rows[-1]
        assert ends[e]
        assert np.isclose(float(s_w[e]), w[rows].sum(), atol=1e-12)
        assert int(s_v_min[e]) == v[rows].min()
        assert int(s_v_max[e]) == v[rows].max()

    # inclusive-prefix semantics inside a segment
    for i in range(n):
        rows = np.where((sid == sid[i]) & (np.arange(n) <= i))[0]
        assert int(s_v_min[i]) == v[rows].min()


def test_seg_scan_single_segment_and_all_starts():
    x = jnp.arange(8, dtype=jnp.float32)
    (inc,) = segscan.seg_scan((x,), ("sum",),
                              jnp.zeros(8, bool).at[0].set(True))
    assert np.allclose(np.asarray(inc), np.cumsum(np.arange(8)))
    (own,) = segscan.seg_scan((x,), ("max",), jnp.ones(8, bool))
    assert np.array_equal(np.asarray(own), np.arange(8))
