"""Variational active space, PT-corrected 1-RDM, energy extrapolation
(ref: hci.f90:149-191 active space, get_1rdm_with_pt:3400,
energies_for_extrapolation:1824)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sqmc_tpu import dets
from sqmc_tpu.algo.hci import extrapolate_energy, run_eps_series, run_hci
from sqmc_tpu.algo.rdm import get_1rdm, get_1rdm_with_pt
from sqmc_tpu.systems.base import FermionSystem
from sqmc_tpu.systems.chem.integrals import IntegralTable
from sqmc_tpu.systems.heatbath import build_heatbath
from sqmc_tpu.systems.heg.system import make_heg_system

from reference_impl import (all_dets, dense_hamiltonian, random_integrals,
                            spin_orbs)


def test_active_space_restricts_and_raises_energy():
    heg = make_heg_system(3, 0.5, 14, 7, 1.49)
    full = run_hci(heg, eps_var=2e-3, eps_var_sched=[2e-3] * 5,
                   verbose=False)
    act = run_hci(heg, eps_var=2e-3, eps_var_sched=[2e-3] * 5,
                  verbose=False, active_space=(3, 3, 30))
    assert len(act.up) < len(full.up)
    assert act.energies[0] >= full.energies[0] - 1e-10
    # masks respected: lowest 4 orbitals occupied, none above 4+30
    core = dets.det_from_orbs(range(4), heg.norb)
    virt = dets.det_from_orbs(range(34, heg.norb), heg.norb)
    for w in range(act.up.shape[1]):
        assert np.all(act.up[:, w] & core[w] == core[w])
        assert np.all(act.up[:, w] & virt[w] == 0)


def test_extrapolation_exact_linear():
    pt = np.array([-0.05, -0.03, -0.01])
    var = 1.0 - 1.5 * pt - pt          # E_tot = 1.0 - 1.5*pt
    e0, slope = extrapolate_energy(var, pt)
    assert e0 == pytest.approx(1.0, abs=1e-12)
    assert slope == pytest.approx(-1.5, abs=1e-10)


@pytest.fixture(scope="module")
def small():
    NORB, NUP, NDN = 4, 2, 2
    h, eri, core, eri_fn = random_integrals(NORB, seed=11)
    basis, H = dense_hamiltonian(NORB, NUP, NDN, h, eri_fn, core)
    table = IntegralTable.from_dense_arrays(h, eri, core,
                                            np.ones(NORB, np.int32))
    system = FermionSystem(
        name="chem", norb=NORB, nup=NUP, ndn=NDN, table=table,
        heatbath=build_heatbath(table),
        orb_sym_arr=jnp.ones(NORB, jnp.int32), has_singles=True,
        hf_up=dets.det_from_orbs(range(NUP), NORB),
        hf_dn=dets.det_from_orbs(range(NDN), NORB), extra={})
    return system, basis, H


def _dense_trans_rdm(basis, norb, ca, cb):
    """Brute-force spin-summed <a|p+ q|b> transition 1-RDM."""
    from reference_impl import annihilate, create
    g = np.zeros((norb, norb))
    index = {bd: i for i, bd in enumerate(basis)}
    for j, (u, d) in enumerate(basis):
        if cb[j] == 0:
            continue
        for spin, occ in ((0, u), (1, d)):
            for q in occ:
                for p in range(norb):
                    # a_p+ a_q |u,d>
                    so_occ = spin_orbs(u, d, norb)
                    r1 = annihilate(so_occ, q + spin * norb)
                    if r1 is None:
                        continue
                    s1, occ1 = r1
                    r2 = create(occ1, p + spin * norb)
                    if r2 is None:
                        continue
                    s2, occ2 = r2
                    new_u = tuple(o for o in occ2 if o < norb)
                    new_d = tuple(o - norb for o in occ2 if o >= norb)
                    i = index.get((new_u, new_d))
                    if i is None:
                        continue
                    g[p, q] += ca[i] * s1 * s2 * cb[j]
    return g


def test_1rdm_with_pt_vs_brute_force(small):
    system, basis, H = small
    # variational space: HF + its strongest connections (top few dets)
    w, v = np.linalg.eigh(H)
    g = v[:, 0]
    top = np.argsort(-np.abs(g))[:6]
    from sqmc_tpu.ops import setalg
    up = np.stack([dets.det_from_orbs(basis[i][0], 4) for i in top])
    dn = np.stack([dets.det_from_orbs(basis[i][1], 4) for i in top])
    so = setalg.lexsort_dets(up, dn)
    up, dn = up[so], dn[so]
    # variational wavefunction in the small space
    from sqmc_tpu.algo.sparseham import build_sparse_ham
    Hs = build_sparse_ham(system.table, up, dn, 2, 2, 4)
    M = np.zeros((len(up), len(up)))
    M[Hs.rows, Hs.cols] = Hs.vals
    M[Hs.cols, Hs.rows] = Hs.vals
    M[np.diag_indices(len(up))] = Hs.diag
    w0, v0 = np.linalg.eigh(M)
    c0 = v0[:, 0]
    e_var = w0[0]

    gamma = get_1rdm_with_pt(system, up, dn, c0, e_var, eps_pt_big=1e-12)

    # brute force: psi0 over the full basis, psi1 = first-order PT vector
    key = {(tuple(dets.orbs_from_det(up[i], 4)),
            tuple(dets.orbs_from_det(dn[i], 4))): i for i in range(len(up))}
    psi0 = np.zeros(len(basis))
    var_rows = []
    for i, bd in enumerate(basis):
        if bd in key:
            psi0[i] = c0[key[bd]]
            var_rows.append(i)
    psi1 = np.zeros(len(basis))
    for i, bd in enumerate(basis):
        if bd in key:
            continue
        num = float(H[i] @ psi0)
        if num != 0.0:
            psi1[i] = num / (e_var - H[i, i])
    want = (_dense_trans_rdm(basis, 4, psi0, psi0) +
            2.0 * 0.5 * (_dense_trans_rdm(basis, 4, psi0, psi1) +
                         _dense_trans_rdm(basis, 4, psi1, psi0)))
    np.testing.assert_allclose(gamma, want, atol=1e-9)


def test_1rdm_trace(small):
    system, basis, H = small
    w, v = np.linalg.eigh(H)
    up = np.stack([dets.det_from_orbs(b[0], 4) for b in basis])
    dn = np.stack([dets.det_from_orbs(b[1], 4) for b in basis])
    from sqmc_tpu.ops import setalg
    so = setalg.lexsort_dets(up, dn)
    # re-map eigvec to sorted det order
    key = {(tuple(basis[i][0]), tuple(basis[i][1])): i
           for i in range(len(basis))}
    c = np.empty(len(basis))
    for pos, i in enumerate(so):
        c[pos] = v[i, 0]
    gamma = get_1rdm(system, up[so], dn[so], c)
    assert np.trace(gamma) == pytest.approx(4.0, abs=1e-10)
    np.testing.assert_allclose(gamma, gamma.T, atol=1e-12)


def test_run_eps_series_extrapolation():
    """Extrapolation driver over an eps_var series on HEG: e_extrapolated
    must beat every series total toward the exact limit (monotone dE2)."""
    heg = make_heg_system(3, 0.5, 14, 7, 1.49)
    out = run_eps_series(heg, [4e-3, 2e-3, 1e-3], eps_pt=2e-7,
                         verbose=False)
    assert np.all(np.diff(out["e_var"]) < 1e-12)      # tighter eps, lower E
    # the dE2 -> 0 limit continues the e_tot trend past the tightest point:
    # closer to the last total than the loosest total is
    d_last = abs(out["e_extrapolated"] - out["e_tot"][-1])
    assert d_last < abs(out["e_tot"][0] - out["e_tot"][-1]) + 1e-9
    # golden check: within 0.5 mHa of the tightest total (HEG is nearly
    # converged at eps_var=1e-3)
    assert d_last < 5e-4


def test_pt_memory_autosize_and_reuse():
    heg = make_heg_system(3, 0.5, 14, 7, 1.49)
    res = run_hci(heg, eps_var=2e-3, eps_var_sched=[2e-3] * 5, verbose=False)
    from sqmc_tpu.algo.pt import do_pt
    out = do_pt(heg, res.up, res.dn, res.wts[:, 0], res.diag,
                float(res.energies[0]), eps_var=2e-3, eps_pt=2e-6,
                n_max_connections=0, verbose=False)
    assert out["mode"] == "deterministic"
    # eps_pt_big_energy reuse skips the deterministic recompute
    out2 = do_pt(heg, res.up, res.dn, res.wts[:, 0], res.diag,
                 float(res.energies[0]), eps_var=2e-3, eps_pt=2e-6,
                 eps_pt_big=1e-4, eps_pt_big_energy=-0.000123,
                 n_mc=50, target_error=1e-3, verbose=False)
    assert out2["mode"] == "semistochastic"
    assert out2["pt_big"] == -0.000123
