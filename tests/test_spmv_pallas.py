"""Pallas ELL SpMV kernel vs the COO reference matvec (interpret mode on
CPU; the compiled kernel runs on TPU via davidson's matvec_fn)."""

import numpy as np
import pytest

from sqmc_tpu.algo.davidson import matvec
from sqmc_tpu.algo.sparseham import build_sparse_ham
from sqmc_tpu.algo.hci import run_hci
from sqmc_tpu.ops.spmv_pallas import EllSpmv, ell_from_coo
from sqmc_tpu.systems.heg.system import make_heg_system


@pytest.fixture(scope="module")
def H():
    heg = make_heg_system(3, 0.5, 14, 7, 1.49)
    res = run_hci(heg, eps_var=2e-3, eps_var_sched=[2e-3] * 5, verbose=False)
    return build_sparse_ham(heg.table, res.up, res.dn, heg.nup, heg.ndn,
                            heg.norb)


def test_ell_conversion_roundtrip(H):
    cols, vals, K = ell_from_coo(H.n, H.rows, H.cols, H.vals, H.diag)
    # every row's entries sum to the same row sums as the COO
    x = np.ones(H.n)
    y_coo = np.asarray(matvec(H, x))
    xp = np.zeros(cols.shape[0])
    xp[:H.n] = x
    y_ell = np.sum(vals * xp[cols], axis=1)[:H.n]
    np.testing.assert_allclose(y_ell, y_coo, rtol=2e-6, atol=1e-5)


def test_pallas_kernel_interpret_matches(H):
    mv = EllSpmv(H, use_pallas=False, interpret=True)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((H.n, 2))
    y_ref = np.asarray(matvec(H, x))
    y = np.asarray(mv(x))
    np.testing.assert_allclose(y, y_ref, rtol=3e-5, atol=3e-5)


def test_xla_fallback_matches(H):
    mv = EllSpmv(H, use_pallas=False, interpret=False)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(H.n)
    np.testing.assert_allclose(np.asarray(mv(x)), np.asarray(matvec(H, x)),
                               rtol=3e-5, atol=3e-5)


def test_blockell_matches(H):
    from sqmc_tpu.ops.spmv_pallas import BlockEllSpmv
    mv = BlockEllSpmv(H)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((H.n, 2))
    y_ref = np.asarray(matvec(H, x))
    y = np.asarray(mv(x))
    np.testing.assert_allclose(y, y_ref, rtol=3e-5, atol=3e-5)
    y1 = np.asarray(mv(x[:, 0]))
    np.testing.assert_allclose(y1, y[:, 0], rtol=0, atol=0)
