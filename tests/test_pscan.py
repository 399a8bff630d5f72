"""Pallas segmented-scan kernel (ops/pscan.py) vs the XLA reference
(ops/segscan.py), run in interpret mode so the kernel LOGIC is covered on
CPU CI; the compiled-on-TPU path is exercised by the bench/profile runs
(1.28 ms vs 6.88 ms standalone at [720k] x 6, round-4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sqmc_tpu.ops import pscan, segscan


def _mk(n, nseg_frac, seed=0):
    rng = np.random.default_rng(seed)
    start = rng.random(n) < nseg_frac
    start[0] = True
    return start


@pytest.mark.parametrize("n", [1, 127, 128, 4096, 70000])
def test_pscan_matches_xla_six_fields(n):
    rng = np.random.default_rng(1)
    start = _mk(n, 0.3)
    fields = (
        rng.integers(0, 131, n).astype(np.int32),
        rng.integers(0, 4, n).astype(np.int32),
        rng.standard_normal(n).astype(np.float32),
        (rng.standard_normal(n) * (rng.random(n) < 0.2)).astype(np.float32),
        rng.standard_normal(n).astype(np.float32),
        rng.integers(-2, 1000, n).astype(np.int32),
    )
    ops = ("min", "max", "sum", "sum", "min", "max")
    jf = tuple(jnp.asarray(x) for x in fields)
    js = jnp.asarray(start)
    ref = segscan.seg_scan(jf, ops, js)
    # rows=8 exercises multi-block carries even at small n
    got = pscan.seg_scan(jf, ops, js, rows=8, interpret=True)
    for o, r, g in zip(ops, ref, got):
        r, g = np.asarray(r), np.asarray(g)
        if np.issubdtype(r.dtype, np.integer):
            np.testing.assert_array_equal(g, r)
        else:
            # sums associate differently (sweep vs scan tree)
            np.testing.assert_allclose(g, r, rtol=0, atol=5e-6)


def test_pscan_long_segment_spanning_blocks():
    # one segment covering many grid blocks: the cross-block carry chain
    # must thread the running sum through every block
    n = 6000
    start = np.zeros(n, bool)
    start[0] = True
    start[5000] = True
    x = np.ones(n, np.float32)
    got = pscan.seg_scan((jnp.asarray(x),), ("sum",), jnp.asarray(start),
                         rows=8, interpret=True)[0]
    exp = np.concatenate([np.arange(1, 5001), np.arange(1, 1001)])
    np.testing.assert_allclose(np.asarray(got), exp.astype(np.float32))


def test_pscan_cumsum_cummax():
    rng = np.random.default_rng(2)
    x = rng.integers(-50, 50, 3000).astype(np.int32)
    cs = pscan.cumsum(jnp.asarray(x), rows=8, interpret=True)
    cm = pscan.cummax(jnp.asarray(x), rows=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(cs), np.cumsum(x))
    np.testing.assert_array_equal(np.asarray(cm), np.maximum.accumulate(x))


def test_pscan_u32_fields_sign_flip_domain():
    # u32 min/max ride the order-preserving sign-flip into i32 (Mosaic
    # cannot legalize arith.maxui on v5e); u32 sums bitcast.  Values
    # straddle the sign bit so a plain i32 bitcast would mis-order.
    rng = np.random.default_rng(3)
    n = 4000
    start = _mk(n, 0.25, seed=4)
    vals = rng.integers(0, 2**32, size=(3, n), dtype=np.uint64).astype(
        np.uint32)
    ops = ("max", "min", "sum")
    jf = tuple(jnp.asarray(v) for v in vals)
    js = jnp.asarray(start)
    ref = segscan.seg_scan(jf, ops, js)
    got = pscan.seg_scan(jf, ops, js, rows=8, interpret=True)
    for r, g in zip(ref, got):
        assert g.dtype == jnp.uint32
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_supported_gates_on_backend_and_dtype():
    # CPU backend -> not supported (the XLA path runs); f64 fields never
    f32 = jnp.zeros(4, jnp.float32)
    f64 = jnp.zeros(4, jnp.float64)
    assert not pscan.supported((f64,))
    import jax
    if jax.default_backend() != "tpu":
        assert not pscan.supported((f32,))
