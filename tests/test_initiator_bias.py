"""Initiator-path accuracy at r_initiator > 0 (VERDICT r2 item 2; ref:
check_initiator do_walk.f90:6838 and the order-independent group-max merge
variant :5898).

Every other stochastic-accuracy test runs r_initiator=0; these run the
initiator machinery ON against an exactly solvable system and assert
(a) the dynamics actually change (the suppression rule fires) and (b) the
stationary energy stays within tolerance of the exact eigenvalue at the
test's population.  The production-scale bias ladder (C2 on-chip,
r in {1, 0.5, 0.25->0}: 3.38 -> 1.46 -> ~1.2 mHa, monotone toward the
oracle) is measured by tools/scan_walk.py and recorded in PERF_NOTES.md.
"""

import numpy as np
import pytest

from sqmc_tpu.systems.heg.system import make_heg_system
from sqmc_tpu.algo.hci import run_hci
from sqmc_tpu.algo.semistoch import build_trial_wavefunction
from sqmc_tpu.algo.walk import WalkConfig, run_walk


@pytest.fixture(scope="module")
def tiny():
    sys_ = make_heg_system(3, 1.0, 4, 2, 1.6)
    res = run_hci(sys_, eps_var=1e-9, eps_var_sched=[1e-9] * 30,
                  max_iters=60, verbose=False)
    trial = build_trial_wavefunction(sys_, eps_var=1e-3, n_psi_t=30, n_imp=1,
                                     verbose=False)
    return sys_, res, trial


def _run(sys_, trial, e0, r, seed=3):
    cfg = WalkConfig(mwalk=4096, cap_spawn=16384, norb=sys_.norb, nup=2,
                     ndn=2, n_words=1, tau=5e-3, w_abs_target=1500.0,
                     has_singles=False, r_initiator=r, min_wt=0.25)
    return run_walk(sys_, trial, cfg, nstep=100, nblk=6, nblk_eq=3,
                    w_abs_begin=1000.0, e_trial_initial=e0,
                    verbose=False, seed=seed, max_eq_extensions=0)


def test_initiator_on_accuracy_and_effect(tiny):
    sys_, res, trial = tiny
    e0 = res.energies[0]
    out1 = _run(sys_, trial, e0, r=1.0)
    out0 = _run(sys_, trial, e0, r=0.0)
    # (a) the initiator rule fires: same seed, different dynamics
    # (non-initiator spawns onto unoccupied dets are discarded at r=1)
    assert not np.allclose(out1.nwalk_trace, out0.nwalk_trace)
    # initiator suppression can only reduce the occupied-det count
    assert float(np.mean(out1.nwalk_trace[-200:])) <= \
        float(np.mean(out0.nwalk_trace[-200:]))
    # (b) accuracy: r=0 is unbiased (sigma-level); r=1 carries at most a
    # small initiator bias at this population (absolute tolerance - the
    # ratio-estimator error bar is unreliable on weak-trial runs)
    assert abs(out0.e_mixed - e0) < 6 * max(out0.e_err, 5e-6) + 2e-5
    assert abs(out1.e_mixed - e0) < 2e-3
