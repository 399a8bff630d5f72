"""External FCI anchor for the chem HCI/PT/walk pipeline (VERDICT r4
item 4).

Every other C2 oracle in this suite is either the committed reference
output (HEG) or this framework's own converged numbers (the c2_curve
goldens).  Here the oracle is LAPACK: a frozen-core CAS of the committed
r=1.24253 FCIDUMP (core folded by systems/chem/cas.py) is small enough
that the FULL determinant space can be enumerated and the Hamiltonian
densely diagonalized.  That energy anchors, externally to every code
path under test:

  1. HCI selection completeness: eps_var -> 0 selects the whole
     symmetry-reachable sector and the dense ground energy over the
     selected space equals E_FCI to <= 1e-8 Ha (ref analog: the
     reference's energy_exact prints, hamiltonian_mod.f90:476);
  2. PT consistency: from the complete sector the 2nd-order correction
     is identically zero (H is totally symmetric), and at finite
     eps_var the PT-corrected energy lands much closer to E_FCI than
     the variational energy alone;
  3. the walk in the exact-deterministic limit reproduces E_FCI.
"""

from itertools import combinations

import numpy as np
import pytest

from sqmc_tpu import dets as dets_mod
from sqmc_tpu.algo.hci import run_hci
from sqmc_tpu.algo.pt import do_pt
from sqmc_tpu.algo.sparseham import build_sparse_ham
from sqmc_tpu.algo.semistoch import build_trial_wavefunction
from sqmc_tpu.algo.walk import WalkConfig, run_walk
from sqmc_tpu.systems.base import make_chem_system
from sqmc_tpu.systems.chem.cas import write_cas_fcidump

FCIDUMP = "/root/reference/C2_v2z_curve/r1.24253/FCIDUMP"
N_CORE, N_ACT = 2, 12


@pytest.fixture(scope="module")
def cas(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cas") / "FCIDUMP_cas")
    info = write_cas_fcidump(FCIDUMP, N_CORE, N_ACT, path)
    assert info["nelec"] == 4 and info["norb"] == N_ACT
    system = make_chem_system(path)
    return system


def _dense_ground(system, up, dn):
    H = build_sparse_ham(system.table, up, dn, system.nup, system.ndn,
                         system.norb)
    n = H.n
    M = np.zeros((n, n))
    M[H.rows, H.cols] = H.vals
    M = M + M.T + np.diag(H.diag)
    from scipy.linalg import eigh
    w = eigh(M, eigvals_only=True, subset_by_index=[0, 0])
    return float(w[0])


@pytest.fixture(scope="module")
def e_fci(cas):
    """Dense ground energy of the HF symmetry sector over the FULL CAS
    det space — the anchor.

    The GLOBAL CAS(4e,12o) minimum lives in the B2u/B3u sectors (a
    degenerate Pi_u pair at -75.517967; the truncated active space
    reorders C2's close-lying Sigma/Pi states), while HF and everything
    under test project onto the Ag sector.  H is totally symmetric for
    the abelian group, so the sector block (dets whose occupied-orbital
    irrep XOR equals HF's) is an exact invariant subspace and its lowest
    eigenvalue is the right external anchor; measured sector spectrum:
    Ag -75.479081, B3u/B2u -75.517967, B1g -75.490472."""
    norb, nup, ndn = cas.norb, cas.nup, cas.ndn
    sym = np.asarray(cas.orb_sym_arr) - 1
    ups = list(combinations(range(norb), nup))
    dns = list(combinations(range(norb), ndn))
    irr_u = np.array([np.bitwise_xor.reduce(sym[list(c)]) for c in ups])
    irr_d = np.array([np.bitwise_xor.reduce(sym[list(c)]) for c in dns])
    irr = np.repeat(irr_u, len(dns)) ^ np.tile(irr_d, len(ups))
    hf_irr = (np.bitwise_xor.reduce(sym[:nup])
              ^ np.bitwise_xor.reduce(sym[:ndn]))
    up = np.repeat(np.asarray(
        [dets_mod.det_from_orbs(c, norb) for c in ups], np.uint64),
        len(dns), axis=0)
    dn = np.tile(np.asarray(
        [dets_mod.det_from_orbs(c, norb) for c in dns], np.uint64),
        (len(ups), 1))
    keep = irr == hf_irr
    return _dense_ground(cas, up[keep], dn[keep]), int(keep.sum())


@pytest.mark.slow
def test_hci_selection_complete_vs_fci(cas, e_fci):
    e0, n_full = e_fci
    res = run_hci(cas, eps_var=1e-7,
                  eps_var_sched=[1e-3, 1e-5] + [1e-7] * 18,
                  max_iters=20, verbose=False)
    # selection completeness: dense eigval over the SELECTED space --
    # independent of the Davidson solver -- matches full-space FCI
    e_sel = _dense_ground(cas, res.up, res.dn)
    assert abs(e_sel - e0) < 1e-8, (e_sel, e0)
    # and the solver itself is close at its own tolerance
    assert abs(res.energies[0] - e0) < 5e-6, (res.energies[0], e0)
    # PT from the complete sector vanishes identically (H is totally
    # symmetric: no coupling out of the sector)
    pt = do_pt(cas, res.up, res.dn, res.wts[:, 0], res.diag,
               float(res.energies[0]), eps_var=1e-7, eps_pt=1e-10,
               verbose=False)
    assert abs(pt["pt"]) < 1e-10, pt["pt"]
    assert abs(pt["e_tot"] - e0) < 5e-6


@pytest.mark.slow
def test_hci_pt_ladder_converges_to_fci(cas, e_fci):
    """At finite eps_var the variational error is O(mHa); PT recovers
    most of it, and both errors shrink monotonically with eps_var."""
    e0, _ = e_fci
    err_var, err_tot = [], []
    for eps in (1e-2, 3e-3, 1e-3):
        res = run_hci(cas, eps_var=eps, eps_var_sched=[eps] * 10,
                      verbose=False)
        pt = do_pt(cas, res.up, res.dn, res.wts[:, 0], res.diag,
                   float(res.energies[0]), eps_var=eps, eps_pt=1e-9,
                   verbose=False)
        err_var.append(res.energies[0] - e0)
        err_tot.append(abs(pt["e_tot"] - e0))
    # variational: above FCI and monotone in eps
    assert all(e > 0 for e in err_var)
    assert err_var[0] > err_var[1] > err_var[2]
    # PT recovers the bulk of each gap
    for ev, et in zip(err_var, err_tot):
        assert et < 0.5 * ev, (ev, et)
    assert err_tot[2] < err_tot[0]


@pytest.mark.slow
def test_walk_pinned_at_fci(cas, e_fci):
    """Exact-deterministic limit: D = the full reachable sector makes the
    walk exact power iteration -> e_mixed == E_FCI."""
    e0, _ = e_fci
    res = run_hci(cas, eps_var=1e-7,
                  eps_var_sched=[1e-3, 1e-5] + [1e-7] * 18,
                  max_iters=20, verbose=False)
    n = len(res.up)
    trial = build_trial_wavefunction(cas, eps_var=1e-7, n_psi_t=n, n_imp=n,
                                     verbose=False)
    cfg = WalkConfig(mwalk=1 << 13, cap_spawn=1 << 15, norb=cas.norb,
                     nup=cas.nup, ndn=cas.ndn, n_words=1, tau=2e-3,
                     w_abs_target=500.0, has_singles=True)
    out = run_walk(cas, trial, cfg, nstep=30, nblk=2, nblk_eq=1,
                   w_abs_begin=500.0, e_trial_initial=float(res.energies[0]),
                   verbose=False)
    assert abs(out.e_mixed - e0) < 1e-7, (out.e_mixed, e0)
