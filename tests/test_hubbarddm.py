"""hubbarddm density-matrix block basis: exact rotation reproduces the
real-space spectrum; truncation is variational
(ref: hubbard.f90 density_matrix_2by2:7836, hamiltonian_hubbard_dm:1986).
"""

import numpy as np
import pytest

from sqmc_tpu.systems.hubbard.dmbasis import (block_rotation,
                                              dm_basis_hamiltonian,
                                              make_hubbarddm_dense,
                                              patch_density_matrix,
                                              CROSS_BONDS, CROSS_NSITES)
from sqmc_tpu.systems.hubbard.system import make_hubbard_dense_system

LX, LY, T, U = 4, 2, 1.0, 4.0
NUP = NDN = 2


@pytest.fixture(scope="module")
def rho():
    # nup_emb=2 keeps the embedding ED small for CI; the construction is
    # filling-agnostic (make_hubbarddm_dense uses the matched filling)
    return patch_density_matrix(CROSS_BONDS, CROSS_NSITES, T, U,
                                nup_emb=2, ndn_emb=2)


def test_patch_dm_properties(rho):
    assert np.allclose(rho, rho.T, atol=1e-12)
    assert np.trace(rho) == pytest.approx(1.0, abs=1e-10)
    w = np.linalg.eigvalsh(rho)
    assert w.min() > -1e-12
    # block diagonal in (nup, ndn): cross-sector entries vanish
    from sqmc_tpu.systems.hubbard.dmbasis import _patch_sectors
    nu, nd = _patch_sectors()
    for a, b in [(0, 1), (2, 0)]:
        rows = np.nonzero((nu == a))[0]
        cols = np.nonzero((nu == b))[0]
        if a != b:
            assert np.abs(rho[np.ix_(rows, cols)]).max() < 1e-12


def test_block_rotation_orthogonal(rho):
    u, su, sd, w = block_rotation(rho)
    assert np.allclose(u @ u.T, np.eye(256), atol=1e-10)
    assert w.sum() == pytest.approx(1.0, abs=1e-10)


def test_exact_rotation_reproduces_spectrum(rho):
    u, su, sd, w = block_rotation(rho)
    H_dm, basis = dm_basis_hamiltonian(LX, LY, T, U, NUP, NDN, u, su, sd,
                                       keep_per_sector=None, pbc=True)
    toy = make_hubbard_dense_system(LX, LY, T, U, NUP, NDN, pbc=True)
    w_real = np.linalg.eigvalsh(toy.ham)
    w_dm = np.linalg.eigvalsh(H_dm)
    assert H_dm.shape[0] == toy.ndet
    np.testing.assert_allclose(w_dm, w_real, atol=1e-8)


def test_truncated_dm_basis_is_variational(rho):
    u, su, sd, w = block_rotation(rho)
    toy = make_hubbard_dense_system(LX, LY, T, U, NUP, NDN, pbc=True)
    e_exact = np.linalg.eigvalsh(toy.ham)[0]
    H_tr, basis = dm_basis_hamiltonian(LX, LY, T, U, NUP, NDN, u, su, sd,
                                       keep_per_sector=3, pbc=True)
    assert H_tr.shape[0] < toy.ndet
    e_tr = np.linalg.eigvalsh(H_tr)[0]
    assert e_tr >= e_exact - 1e-10
    # the DM basis should be a good truncation: within ~10% of E0
    assert e_tr <= e_exact * 0.7 if e_exact < 0 else True


def test_make_hubbarddm_dense_end_to_end():
    # 1up/1dn keeps the auto-matched embedding ED tiny
    sys_, info = make_hubbarddm_dense(LX, LY, T, U, 1, 1,
                                      keep_per_sector=None)
    toy = make_hubbard_dense_system(LX, LY, T, U, 1, 1, pbc=True)
    np.testing.assert_allclose(np.linalg.eigvalsh(sys_.ham)[0],
                               np.linalg.eigvalsh(toy.ham)[0], atol=1e-8)
