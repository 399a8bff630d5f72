"""End-to-end HCI tests against the reference's golden HEG numbers and
internal brute-force cross-checks (SURVEY.md section 4 test strategy)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sqmc_tpu import dets
from sqmc_tpu.systems.heg.system import make_heg_system
from sqmc_tpu.algo.hci import run_hci
from sqmc_tpu.algo.sparseham import build_sparse_ham
from sqmc_tpu.algo.davidson import davidson
from sqmc_tpu.systems.chem import slater


@pytest.fixture(scope="module")
def heg():
    return make_heg_system(3, 0.5, 14, 7, 1.49)


def test_heg_hf_energies(heg):
    # golden: o_det_ref "HF kinetic, exchange, total" and Madelung
    assert abs(heg.extra["energy_hf"] - 58.59267497) < 1e-7
    assert abs(heg.extra["energy_madelung"] - (-10.224153)) < 1e-5


def test_heg_hci_golden(heg):
    res = run_hci(heg, eps_var=1e-3, eps_var_sched=[1e-3] * 10, verbose=False)
    assert len(res.up) == 9475          # golden det count
    assert abs(res.energies[0] - 58.276906085) < 1e-7


def test_heg_hci_device_davidson_matches_golden(heg):
    """run_hci(device_davidson=True) — f32 block-ELL SpMV on the
    accelerator + host-f64 Rayleigh refinement — must reproduce the
    f64 COO golden to ~1e-7 Ha (the refinement makes the eigenvalue
    error O(||r||^2) of the f32 residual)."""
    res = run_hci(heg, eps_var=1e-3, eps_var_sched=[1e-3] * 10,
                  verbose=False, device_davidson=True)
    assert len(res.up) == 9475
    assert abs(res.energies[0] - 58.276906085) < 1e-6


def test_sparse_ham_vs_brute(heg):
    res = run_hci(heg, eps_var=1e-2, eps_var_sched=[1e-2] * 10, verbose=False)
    n = len(res.up)
    H = build_sparse_ham(heg.table, res.up, res.dn, heg.nup, heg.ndn, heg.norb)
    M = np.zeros((n, n))
    M[H.rows, H.cols] = H.vals
    M = M + M.T + np.diag(H.diag)
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    bu = dets.to_bits(jnp.asarray(res.up), heg.norb)
    bd = dets.to_bits(jnp.asarray(res.dn), heg.norb)
    Mb = np.asarray(slater.pair_matrix_elements(
        heg.table, bu[ii.ravel()], bd[ii.ravel()],
        bu[jj.ravel()], bd[jj.ravel()])).reshape(n, n)
    assert np.abs(M - Mb).max() < 1e-12


def test_davidson_vs_dense(heg):
    res = run_hci(heg, eps_var=5e-3, eps_var_sched=[5e-3] * 10,
                  verbose=False, keep_ham=True)
    H = build_sparse_ham(heg.table, res.up, res.dn, heg.nup, heg.ndn, heg.norb)
    n = H.n
    M = np.zeros((n, n))
    M[H.rows, H.cols] = H.vals
    M = M + M.T + np.diag(H.diag)
    w = np.linalg.eigvalsh(M)
    ev, _ = davidson(H, 2)
    np.testing.assert_allclose(ev, w[:2], atol=1e-8)


def test_heg_2d_backend():
    """2D HEG (ref: heg.f90 n_dim=2 branch, V(t)=2pi/(L^2 |t|)): HCI runs
    and matches exact diagonalization over its selected space."""
    from sqmc_tpu.algo.davidson import davidson
    heg2 = make_heg_system(2, 1.0, 4, 2, 1.5)
    assert heg2.norb == 9
    r = run_hci(heg2, eps_var=1e-9, eps_var_sched=[1e-9] * 20,
                max_iters=40, verbose=False)
    H = build_sparse_ham(heg2.table, r.up, r.dn, heg2.nup, heg2.ndn,
                         heg2.norb)
    evals, _ = davidson(H, n_states=1)
    assert r.energies[0] == pytest.approx(float(evals[0]), abs=1e-9)
    # kinetic-only HF diagonal sanity: E_var below HF energy
    assert r.energies[0] < heg2.extra["energy_hf"] + 1e-12


def test_arpack_diagonalizer_matches_davidson(heg):
    """ARPACK alternative diagonalizer (ref: the optional PARPACK build,
    more_tools.f90:2869): same selection trajectory and variational
    energy as the Davidson default."""
    res_d = run_hci(heg, eps_var=1e-2, eps_var_sched=[1e-2] * 10,
                    verbose=False)
    res_a = run_hci(heg, eps_var=1e-2, eps_var_sched=[1e-2] * 10,
                    verbose=False, diagonalizer="arpack")
    assert len(res_a.up) == len(res_d.up)
    assert abs(res_a.energies[0] - res_d.energies[0]) < 1e-8
