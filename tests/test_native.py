"""Native C++ host-runtime kernels vs their numpy fallbacks."""

import numpy as np
import pytest

from sqmc_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_parse_records_matches_python():
    text = b"""  1.25e-01   1  2  3  4
    -3.5D... junk should stop here
    """
    vals, idx = native.parse_records(b" 1.5 1 2 3 4\n-2.25e-1 5 6 0 0\n 7.0 0 0 0 0\n")
    assert len(vals) == 3
    np.testing.assert_allclose(vals, [1.5, -0.225, 7.0])
    np.testing.assert_array_equal(idx[0], [1, 2, 3, 4])
    np.testing.assert_array_equal(idx[2], [0, 0, 0, 0])


def test_parse_fcidump_equivalence(tmp_path):
    """Native and python parsers produce the same IntegralTable on a real
    reference FCIDUMP."""
    import sqmc_tpu.native as nat
    from sqmc_tpu.systems.chem import fcidump
    path = "/root/reference/C2_v2z_curve/r1.24253/FCIDUMP"
    d_native = fcidump.read_fcidump(path)
    # force fallback
    orig = nat.parse_records
    nat.parse_records = lambda text: None
    try:
        d_py = fcidump.read_fcidump(path)
    finally:
        nat.parse_records = orig
    np.testing.assert_allclose(d_native.h, d_py.h, atol=0)
    np.testing.assert_allclose(d_native.eri, d_py.eri, atol=0)
    assert d_native.core_energy == d_py.core_energy


def test_build_alias_is_valid_decomposition():
    rng = np.random.default_rng(0)
    prob = rng.random(1000)
    prob /= prob.sum()
    J, q = native.build_alias(prob)
    # reconstruct the sampling probability of each outcome
    K = len(prob)
    p_rec = q / K
    np.add.at(p_rec, J, (1.0 - q) / K)
    np.testing.assert_allclose(p_rec, prob, atol=1e-12)


def test_build_row_alias_matches_single():
    rng = np.random.default_rng(1)
    counts = np.array([5, 0, 17, 3], np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    vals = rng.standard_normal(int(counts.sum()))
    J, q = native.build_row_alias(vals, starts, counts)
    for s, c in zip(starts, counts):
        if c == 0:
            continue
        row = np.abs(vals[s:s + c])
        Jr, qr = native.build_alias(row / row.sum())
        np.testing.assert_array_equal(J[s:s + c], Jr)
        np.testing.assert_allclose(q[s:s + c], qr, atol=1e-14)
