"""PT-2 golden-number e2e tests (reference: src/e2e_tests/heg/o_det_ref,
o_st_ref; tolerances from e2e_check.py: 1% deterministic, 5-sigma stochastic)."""

import numpy as np
import pytest

from sqmc_tpu.systems.heg.system import make_heg_system
from sqmc_tpu.algo.hci import run_hci
from sqmc_tpu.algo.pt import second_order_pt, do_pt


@pytest.fixture(scope="module")
def heg_var():
    sys_ = make_heg_system(3, 0.5, 14, 7, 1.49)
    res = run_hci(sys_, eps_var=1e-3, eps_var_sched=[1e-3] * 10, verbose=False)
    return sys_, res


def test_deterministic_pt_golden(heg_var):
    sys_, res = heg_var
    pt, nconn = second_order_pt(sys_, res.up, res.dn, res.wts[:, 0],
                                res.energies[0], 2e-7, verbose=False)
    assert abs(pt - (-0.000939196)) < 1e-8
    assert nconn == 501881
    total = res.energies[0] + pt + sys_.extra["energy_madelung"]
    assert abs(total - 48.051813420) < 1e-7


def test_semistochastic_pt_golden(heg_var):
    sys_, res = heg_var
    out = do_pt(sys_, res.up, res.dn, res.wts[:, 0], res.diag,
                res.energies[0], 1e-3, 2e-7, eps_pt_big=1e-5,
                target_error=1e-5, n_mc=200, verbose=False)
    assert out["mode"] == "semistochastic"
    # golden deterministic value within 5 combined sigma
    sigma = max(out["pt_err"], 1e-6)
    assert abs(out["pt"] - (-0.000939196)) < 5 * sigma + 1e-5
