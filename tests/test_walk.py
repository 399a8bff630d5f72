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


@pytest.mark.parametrize("full_sort", [False, True])
def test_walk_exact_deterministic_limit(tiny, full_sort):
    sys_, res = tiny
    trial = build_trial_wavefunction(sys_, eps_var=1e-9, n_psi_t=len(res.up),
                                     n_imp=len(res.up), verbose=False)
    cfg = WalkConfig(mwalk=2048, cap_spawn=4096, norb=sys_.norb, nup=2, ndn=2,
                     n_words=1, tau=5e-3, w_abs_target=500.0,
                     has_singles=False, full_sort_merge=full_sort)
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


def test_walk_uniform_proposal_unbiased(tiny):
    """uniform double proposals (ref off_diagonal_move_chem:4237) give the
    same stationary mixed energy as heat-bath."""
    sys_, res = tiny
    trial = build_trial_wavefunction(sys_, eps_var=1e-3, n_psi_t=30, n_imp=1,
                                     verbose=False)
    cfg = WalkConfig(mwalk=4096, cap_spawn=16384, norb=sys_.norb, nup=2,
                     ndn=2, n_words=1, tau=4e-3, w_abs_target=2000.0,
                     has_singles=False, r_initiator=0.0, proposal="uniform")
    out = run_walk(sys_, trial, cfg, nstep=100, nblk=6, nblk_eq=3,
                   w_abs_begin=1000.0, e_trial_initial=res.energies[0],
                   verbose=False, max_eq_extensions=0)
    tol = 6 * max(out.e_err, 5e-6) + 5e-5
    assert abs(out.e_mixed - res.energies[0]) < tol


def test_walk_quantized_selection_unbiased(tiny):
    """The heat-bath spawn weight must stay exactly unbiased when the
    dense selection rowsums are QUANTIZED relative to the exact alias
    normalization - the production situation on TPU, where the MXU
    rounds the one-hot einsum's f32 table entries to bf16 at any
    precision setting (measured, tools/microbench_rowsum.py) while
    hb_row_scr keeps the exact f32 rowsums.  Quantizing to ONE mantissa
    bit (up to ~33% per-channel error, ~128x coarser than bf16) biases
    an uncorrected sampler by +1.1e-3 Ha here - 18x this tolerance
    (measured by disabling the correction); the S/diff correction in
    the fast_heatbath branch must absorb it exactly."""
    sys_, res = tiny

    def q1(x):
        m, e = np.frexp(np.asarray(x, np.float64))
        return jnp.asarray(np.ldexp(np.round(m * 2) / 2, e)
                           .astype(np.float32))

    def quantize(tables):
        return tables._replace(hb_rs_dense=q1(tables.hb_rs_dense),
                               hb_ro_dense=q1(tables.hb_ro_dense))

    trial = build_trial_wavefunction(sys_, eps_var=1e-3, n_psi_t=30, n_imp=1,
                                     verbose=False)
    cfg = WalkConfig(mwalk=4096, cap_spawn=16384, norb=sys_.norb, nup=2,
                     ndn=2, n_words=1, tau=5e-3, w_abs_target=2000.0,
                     has_singles=False, r_initiator=0.0)
    out = run_walk(sys_, trial, cfg, nstep=100, nblk=6, nblk_eq=3,
                   w_abs_begin=1000.0, e_trial_initial=res.energies[0],
                   verbose=False, max_eq_extensions=0,
                   tables_transform=quantize)
    tol = 6 * max(out.e_err, 5e-6) + 2e-5
    assert abs(out.e_mixed - res.energies[0]) < tol


@pytest.mark.parametrize("proposal", ["uniform", "cauchy_schwarz"])
def test_walk_chem_proposals_unbiased(proposal):
    """uniform / Cauchy-Schwarz proposals on a chem-type system (dense
    integrals, where the CS bound sqrt((pr|pr)(qs|qs)) is nonzero; ref
    off_diagonal_move_chem_cauchySchwarz:2530)."""
    import sys as _s, os as _o
    _s.path.insert(0, _o.path.dirname(_o.path.abspath(__file__)))
    from reference_impl import random_integrals
    from sqmc_tpu.systems.base import FermionSystem
    from sqmc_tpu.systems.chem.integrals import IntegralTable
    from sqmc_tpu.systems.heatbath import build_heatbath
    from sqmc_tpu import dets as dets_mod

    NORB, NUP, NDN = 4, 2, 2
    h, eri, core, _ = random_integrals(NORB, seed=5)
    table = IntegralTable.from_dense_arrays(h, eri, core,
                                            np.ones(NORB, np.int32))
    sys_ = FermionSystem(
        name="chem", norb=NORB, nup=NUP, ndn=NDN, table=table,
        heatbath=build_heatbath(table),
        orb_sym_arr=jnp.ones(NORB, jnp.int32), has_singles=True,
        hf_up=dets_mod.det_from_orbs(range(NUP), NORB),
        hf_dn=dets_mod.det_from_orbs(range(NDN), NORB), extra={})
    res = run_hci(sys_, eps_var=1e-9, eps_var_sched=[1e-9] * 30,
                  max_iters=60, verbose=False)
    trial = build_trial_wavefunction(sys_, eps_var=1e-4, n_psi_t=10,
                                     n_imp=1, verbose=False)
    cfg = WalkConfig(mwalk=4096, cap_spawn=16384, norb=NORB, nup=NUP,
                     ndn=NDN, n_words=1, tau=2e-3, w_abs_target=2000.0,
                     has_singles=True, r_initiator=0.0, proposal=proposal)
    out = run_walk(sys_, trial, cfg, nstep=100, nblk=6, nblk_eq=3,
                   w_abs_begin=1000.0, e_trial_initial=res.energies[0],
                   verbose=False, max_eq_extensions=0)
    tol = 6 * max(out.e_err, 5e-6) + 1e-4
    assert abs(out.e_mixed - res.energies[0]) < tol


def test_walk_hubbardk_vs_fci():
    """FCIQMC on momentum-space Hubbard (no singles channel): stationary
    mixed energy equals the FCI ground state reachable from HF."""
    import itertools
    from sqmc_tpu.systems.hubbard.system import make_hubbard_k_system
    from sqmc_tpu.algo.sparseham import build_sparse_ham
    from sqmc_tpu.algo.davidson import davidson
    from sqmc_tpu import dets as dets_mod

    hub = make_hubbard_k_system(2, 2, t=1.0, U=4.0, nup=2, ndn=2)
    ups = [dets_mod.det_from_orbs(c, hub.norb)
           for c in itertools.combinations(range(hub.norb), 2)]
    up = np.repeat(np.stack(ups), len(ups), axis=0)
    dn = np.tile(np.stack(ups), (len(ups), 1))
    H = build_sparse_ham(hub.table, up, dn, 2, 2, hub.norb)
    e0 = float(davidson(H, n_states=1)[0][0])

    trial = build_trial_wavefunction(hub, eps_var=1e-6, n_psi_t=36, n_imp=1,
                                     verbose=False)
    cfg = WalkConfig(mwalk=2048, cap_spawn=8192, norb=hub.norb, nup=2,
                     ndn=2, n_words=1, tau=5e-3, w_abs_target=2000.0,
                     has_singles=False, r_initiator=0.0)
    out = run_walk(hub, trial, cfg, nstep=100, nblk=6, nblk_eq=3,
                   w_abs_begin=1000.0, e_trial_initial=e0,
                   verbose=False, max_eq_extensions=0)
    assert abs(out.e_mixed - e0) < 6 * max(out.e_err, 5e-6) + 1e-4


def test_capacity_escalation(tiny):
    """Deliberately undersized capacities must grow and complete instead
    of dying (ref MWALK auto-size, do_walk.f90:652-674)."""
    sys_, res = tiny
    trial = build_trial_wavefunction(sys_, eps_var=1e-3, n_psi_t=30, n_imp=1,
                                     verbose=False)
    cfg = WalkConfig(mwalk=64, cap_spawn=256, norb=sys_.norb, nup=2,
                     ndn=2, n_words=1, tau=5e-3, w_abs_target=2000.0,
                     has_singles=False, r_initiator=0.0)
    out = run_walk(sys_, trial, cfg, nstep=50, nblk=3, nblk_eq=2,
                   w_abs_begin=1000.0, e_trial_initial=res.energies[0],
                   verbose=False, max_eq_extensions=0)
    assert np.isfinite(out.e_mixed)
    assert float(np.mean(out.w_abs_trace[-50:])) > 1000.0
    tol = 8 * max(out.e_err, 5e-6) + 5e-5
    assert abs(out.e_mixed - res.energies[0]) < tol
