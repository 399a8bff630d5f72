"""Walk-engine correctness tests on a tiny exactly-solvable HEG:
(1) deterministic-space = full FCI space -> the walk is exact power
    iteration and must reproduce E0 to machine precision;
(2) stochastic spawning with no initiator cutoff -> statistically unbiased
    mixed energy (same-seed determinism also checked).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sqmc_tpu.systems.heg.system import make_heg_system
from sqmc_tpu.algo.hci import run_hci
from sqmc_tpu.algo.semistoch import build_trial_wavefunction
from sqmc_tpu.algo.walk import WalkConfig, run_walk


@pytest.fixture(scope="module")
def tiny():
    sys_ = make_heg_system(3, 1.0, 4, 2, 1.6)
    res = run_hci(sys_, eps_var=1e-9, eps_var_sched=[1e-9] * 30,
                  max_iters=60, verbose=False)
    return sys_, res


def test_walk_exact_deterministic_limit(tiny):
    sys_, res = tiny
    trial = build_trial_wavefunction(sys_, eps_var=1e-9, n_psi_t=len(res.up),
                                     n_imp=len(res.up), verbose=False)
    cfg = WalkConfig(mwalk=2048, cap_spawn=4096, norb=sys_.norb, nup=2, ndn=2,
                     n_words=1, tau=5e-3, w_abs_target=500.0,
                     has_singles=False)
    out = run_walk(sys_, trial, cfg, nstep=30, nblk=2, nblk_eq=1,
                   w_abs_begin=500.0, e_trial_initial=res.energies[0],
                   verbose=False)
    assert abs(out.e_mixed - res.energies[0]) < 1e-9


def test_walk_stochastic_unbiased(tiny):
    sys_, res = tiny
    trial = build_trial_wavefunction(sys_, eps_var=1e-3, n_psi_t=30, n_imp=1,
                                     verbose=False)
    cfg = WalkConfig(mwalk=4096, cap_spawn=16384, norb=sys_.norb, nup=2,
                     ndn=2, n_words=1, tau=5e-3, w_abs_target=2000.0,
                     has_singles=False, r_initiator=0.0)
    out = run_walk(sys_, trial, cfg, nstep=100, nblk=6, nblk_eq=3,
                   w_abs_begin=1000.0, e_trial_initial=res.energies[0],
                   verbose=False)
    # statistical agreement: generous 6-sigma + floor to avoid flakiness
    tol = 6 * max(out.e_err, 5e-6) + 2e-5
    assert abs(out.e_mixed - res.energies[0]) < tol


def test_walkalize_and_histogram(tiny, tmp_path):
    """Aux parity: walkalize per-generation trace file (ref:
    do_walk.f90:1675,2930) and the log2 spawned-weight histogram (ref:
    gen_hist, more_tools.f90:5449)."""
    sys_, res = tiny
    trial = build_trial_wavefunction(sys_, eps_var=1e-3, n_psi_t=30, n_imp=1,
                                     verbose=False)
    cfg = WalkConfig(mwalk=4096, cap_spawn=16384, norb=sys_.norb, nup=2,
                     ndn=2, n_words=1, tau=5e-3, w_abs_target=1000.0,
                     has_singles=False)
    wfile = str(tmp_path / "walkalize")
    out = run_walk(sys_, trial, cfg, nstep=20, nblk=2, nblk_eq=1,
                   w_abs_begin=500.0, e_trial_initial=res.energies[0],
                   verbose=False, walkalize_file=wfile)
    lines = open(wfile).read().splitlines()
    assert len(lines) >= 40        # one line per generation (eq may extend)
    step, inv_rw, w_abs, e_gen, nwalk = lines[5].split()
    assert int(step) == 6 and float(w_abs) > 0 and int(nwalk) > 0
    assert out.spawn_hist is not None and out.spawn_hist.sum() > 0
