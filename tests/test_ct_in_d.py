"""C(T)-in-D mixed estimator (WalkConfig.ct_in_d, round-4).

When every C(T) det lives in the deterministic space (FCI-solvable D
spaces; NEVER the flagship C2 trial), the mixed estimator reduces to two
dots against the D-weight vector the exact projection already
materializes, and the per-walker C(T) index plane drops out of the merge.
Pins the contract:

  1. the first generation is common to both paths (identical merged
     output), and the dots at generation 2 reproduce the gather
     estimator at generation 1 exactly - the one-generation shift.
     From generation 2 on the trajectories DIVERGE by design: the
     population-control feedback (e_est -> e_trial -> reweight,
     walk.py _finalize_step) consumes each estimate one generation
     late, a statistically equivalent control loop, not a bitwise one;
  2. the deterministic-limit energy stays exact through run_walk;
  3. requesting the flag when C(T) is not a subset of D raises (the
     dots would silently drop out-of-D contributions).

Ref: the gather estimator mirrors psi_t_connected e_loc lookups
(semistoch.f90:27 generate_psi_t_connected_e_loc); the subset condition
has no reference analog (the reference always searches).
"""

import numpy as np
import pytest

import jax

from sqmc_tpu.systems.heg.system import make_heg_system
from sqmc_tpu.algo.hci import run_hci
from sqmc_tpu.algo.semistoch import build_trial_wavefunction
from sqmc_tpu.algo.walk import (WalkConfig, build_walk_tables,
                                init_walk_state, run_walk, walk_step)


@pytest.fixture(scope="module")
def tiny():
    sys_ = make_heg_system(3, 1.0, 4, 2, 1.6)
    res = run_hci(sys_, eps_var=1e-9, eps_var_sched=[1e-9] * 30,
                  max_iters=60, verbose=False)
    return sys_, res


def _trace(sys_, trial, e0, ct_in_d: bool, nstep: int):
    cfg = WalkConfig(mwalk=2048, cap_spawn=4096, norb=sys_.norb, nup=2,
                     ndn=2, n_words=1, tau=5e-3, w_abs_target=500.0,
                     has_singles=False, ct_in_d=ct_in_d)
    tables = build_walk_tables(sys_, trial, cfg=cfg)
    state = init_walk_state(cfg, trial, w_abs_begin=500.0,
                            e_trial_initial=e0, seed=7, tables=tables)
    nums, dens = [], []
    for _ in range(nstep):
        state, stats = walk_step(state, tables, cfg)
        nums.append(float(stats["e_num_gen"]))
        dens.append(float(stats["e_den_gen"]))
    return np.asarray(nums), np.asarray(dens), state


def test_ct_in_d_trace_is_shifted_gather_trace(tiny):
    sys_, res = tiny
    # D = the full (FCI) connected space => C(T) subset of D holds
    trial = build_trial_wavefunction(sys_, eps_var=1e-9, n_psi_t=30,
                                     n_imp=len(res.up), verbose=False)
    e0 = float(res.energies[0])
    n_on, d_on, _ = _trace(sys_, trial, e0, True, 2)
    n_off, d_off, _ = _trace(sys_, trial, e0, False, 2)
    # generation 1 is dynamically common to both paths (the estimator
    # feedback only reaches the weights at generation 2), so the dots at
    # generation 2 must reproduce the gather estimator at generation 1
    # exactly (different f64 summation order => allclose, not equal)
    np.testing.assert_allclose(n_on[1], n_off[0], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(d_on[1], d_off[0], rtol=1e-9, atol=1e-12)
    # and generation 1's dots see the INITIAL state, whose mixed estimator
    # is e_trial-ish by construction (Psi_T-seeded population): finite
    assert np.isfinite(n_on[0]) and abs(d_on[0]) > 0


def test_ct_in_d_exact_deterministic_limit(tiny):
    sys_, res = tiny
    trial = build_trial_wavefunction(sys_, eps_var=1e-9, n_psi_t=len(res.up),
                                     n_imp=len(res.up), verbose=False)
    cfg = WalkConfig(mwalk=2048, cap_spawn=4096, norb=sys_.norb, nup=2,
                     ndn=2, n_words=1, tau=5e-3, w_abs_target=500.0,
                     has_singles=False, ct_in_d=True)
    out = run_walk(sys_, trial, cfg, nstep=30, nblk=2, nblk_eq=1,
                   w_abs_begin=500.0, e_trial_initial=res.energies[0],
                   verbose=False)
    assert abs(out.e_mixed - res.energies[0]) < 1e-9


def test_ct_in_d_raises_outside_d(tiny):
    sys_, res = tiny
    trial = build_trial_wavefunction(sys_, eps_var=1e-3, n_psi_t=30,
                                     n_imp=8, verbose=False)
    cfg = WalkConfig(mwalk=2048, cap_spawn=4096, norb=sys_.norb, nup=2,
                     ndn=2, n_words=1, tau=5e-3, w_abs_target=500.0,
                     has_singles=False, ct_in_d=True)
    with pytest.raises(ValueError, match="ct_in_d"):
        build_walk_tables(sys_, trial, cfg=cfg)
