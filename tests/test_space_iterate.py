"""Iterated deterministic-space / trial construction (ref:
generate_space_iterate, semistoch.f90:145): expand-screen-diagonalize-
truncate loops must converge to the FCI energy when the truncation holds
the whole reachable space, and the resulting trial must drive an exact
deterministic-limit walk."""

import numpy as np
import pytest

from sqmc_tpu.systems.heg.system import make_heg_system
from sqmc_tpu.algo.hci import run_hci
from sqmc_tpu.algo.semistoch import (generate_space_iterate,
                                     build_trial_iterate)
from sqmc_tpu.algo.walk import WalkConfig, run_walk


@pytest.fixture(scope="module")
def tiny():
    sys_ = make_heg_system(3, 1.0, 4, 2, 1.6)
    res = run_hci(sys_, eps_var=1e-9, eps_var_sched=[1e-9] * 30,
                  max_iters=60, verbose=False)
    return sys_, float(res.energies[0]), len(res.up)


def test_space_iterate_converges_to_fci(tiny):
    sys_, e_fci, n_fci = tiny
    up, dn, coefs, energy = generate_space_iterate(
        sys_, n_iters=6, n_initiators=10 * n_fci,
        n_truncate=10 * n_fci, verbose=False)
    assert len(up) == n_fci           # reachable space fully enumerated
    assert energy == pytest.approx(e_fci, abs=1e-8)


def test_space_iterate_truncation_is_variational(tiny):
    sys_, e_fci, n_fci = tiny
    _, _, _, e_small = generate_space_iterate(
        sys_, n_iters=3, n_initiators=5, n_truncate=max(n_fci // 3, 4),
        verbose=False)
    assert e_small >= e_fci - 1e-10
    assert e_small < 0.0 or np.isfinite(e_small)


def test_trial_iterate_drives_exact_walk(tiny):
    sys_, e_fci, n_fci = tiny
    trial = build_trial_iterate(sys_, n_iters=6,
                                n_initiators=10 * n_fci,
                                n_truncate=10 * n_fci,
                                n_psi_t=n_fci, verbose=False)
    cfg = WalkConfig(mwalk=2048, cap_spawn=4096, norb=sys_.norb, nup=2,
                     ndn=2, n_words=1, tau=5e-3, w_abs_target=500.0,
                     has_singles=False)
    out = run_walk(sys_, trial, cfg, nstep=30, nblk=2, nblk_eq=1,
                   w_abs_begin=500.0, e_trial_initial=e_fci,
                   verbose=False)
    assert abs(out.e_mixed - e_fci) < 1e-9
