"""CPMC auxiliary-field walk vs exact diagonalization
(ref: hubbard.f90 cpmc:8768)."""

import numpy as np
import pytest

from sqmc_tpu.systems.hubbard.cpmc import CpmcConfig, run_cpmc
from sqmc_tpu.systems.hubbard.system import make_hubbard_dense_system

LX, LY, T = 2, 2, 1.0
NUP = NDN = 1   # 2 electrons on 4 sites: mild sign structure


def _e_exact(U):
    toy = make_hubbard_dense_system(LX, LY, T, U, NUP, NDN, pbc=True)
    return float(np.linalg.eigvalsh(toy.ham)[0])


def test_hirsch_decomposition_identity():
    """avg_x exp(gamma x - tauU/2 * (nu+nd)) multiplied out reproduces
    exp(-tau U nu nd) for all four occupations."""
    tau, U = 0.07, 4.0
    g = np.arccosh(np.exp(0.5 * tau * U))
    for nu in (0, 1):
        for nd in (0, 1):
            avg = 0.5 * sum(
                np.exp(g * x * nu - 0.5 * tau * U * nu) *
                np.exp(-g * x * nd - 0.5 * tau * U * nd)
                for x in (1, -1))
            assert avg == pytest.approx(np.exp(-tau * U * nu * nd),
                                        abs=1e-12)


@pytest.mark.parametrize("U", [0.0, 4.0])
def test_cpmc_energy(U):
    e0 = _e_exact(U)
    cfg = CpmcConfig(LX, LY, T, U, NUP, NDN, tau=0.05, n_walkers=128)
    e, err = run_cpmc(cfg, n_blocks=24, nstep=20, n_eq=8, seed=1)
    tol = max(5 * err, 0.05 if U > 0 else 1e-6)
    assert abs(e - e0) < tol


def test_free_projection_matches_constrained_small_u():
    """At small U the CP bias is negligible: free projection and CP agree."""
    U = 1.0
    e0 = _e_exact(U)
    cfg_cp = CpmcConfig(LX, LY, T, U, NUP, NDN, tau=0.05, n_walkers=128,
                        constrained=True)
    e_cp, err = run_cpmc(cfg_cp, n_blocks=20, nstep=20, n_eq=6, seed=2)
    assert abs(e_cp - e0) < max(5 * err, 0.05)
