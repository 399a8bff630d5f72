"""Hubbard mean-field + Gutzwiller VMC vs brute-force enumeration
(ref: hubbard.f90 do_hartree_fock:848, compute_vmc_energy_gutz_wf:1061,
det_ratio_hubbard:4346)."""

import numpy as np
import pytest

from sqmc_tpu.systems.hubbard.meanfield import (hartree_fock,
                                               hopping_matrix, uhf_scan)
from sqmc_tpu.systems.hubbard.vmc import (exact_vmc_energy, init_vmc,
                                          neighbor_table, run_vmc,
                                          vmc_sweep)

LX, LY, T, U = 3, 2, 1.0, 4.0
NUP = NDN = 2


def test_hopping_matrix_consistency():
    h = hopping_matrix(LX, LY, T, pbc=True)
    assert np.allclose(h, h.T)
    nbr = neighbor_table(LX, LY, pbc=True)
    for s in range(LX * LY):
        nbrs = set(x for x in nbr[s] if x >= 0)
        assert nbrs == set(np.nonzero(h[s])[0])


def test_rhf_energy_formula():
    pu, pd, e = hartree_fock(LX, LY, T, U, NUP, NDN, pbc=True, m=0.0)
    assert pu.shape == (LX * LY, NUP)
    h = hopping_matrix(LX, LY, T, pbc=True)
    avgn = (NUP + NDN) / (LX * LY)
    w = np.linalg.eigvalsh(h + np.diag(0.5 * U * avgn * np.ones(LX * LY)))
    want = (2 * np.sum(w[:NUP]) - 0.25 * U * avgn * avgn * LX * LY)
    assert e == pytest.approx(want, abs=1e-10)


def test_uhf_scan_contains_rhf():
    res, best = uhf_scan(LX, LY, T, U, NUP, NDN)
    ms = [m for m, _ in res]
    assert any(abs(m) < 1e-9 for m in ms)
    assert best[2] <= min(e for _, e in res) + 1e-12


@pytest.mark.parametrize("g", [1.0, 0.7])
def test_vmc_matches_exact_gutzwiller_energy(g):
    """Sampled VMC energy == brute-force <psi|H|psi>/<psi|psi> within
    statistical error."""
    pu, pd, _ = hartree_fock(LX, LY, T, U, NUP, NDN, pbc=True, m=0.2)
    e_exact = exact_vmc_energy(LX, LY, T, U, NUP, NDN, g, pu, pd)
    e, err = run_vmc(LX, LY, T, U, NUP, NDN, g, phi_up=pu, phi_dn=pd,
                     n_walkers=256, n_sweeps=150, n_eq=50,
                     steps_per_sweep=12, seed=1)
    assert abs(e - e_exact) < max(5 * err, 0.05)


def test_sherman_morrison_consistency():
    """After many accepted moves the running inverses still match the
    recomputed inverses."""
    import jax.numpy as jnp
    pu, pd, _ = hartree_fock(LX, LY, T, U, NUP, NDN, pbc=True, m=0.3)
    nbr = jnp.asarray(neighbor_table(LX, LY, pbc=True))
    state = init_vmc(pu, pd, LX, LY, n_walkers=16, seed=3)
    state, _ = vmc_sweep(state, jnp.asarray(pu), jnp.asarray(pd), nbr,
                         0.8, U, T, 40, LX * LY)
    mu = np.linalg.inv(pu[np.asarray(state.r_up)])
    assert np.allclose(np.asarray(state.minv_up), mu, atol=1e-8)


def test_gutzwiller_lowers_energy_at_large_u():
    """At U=8 the optimal g<1 must not be above the g=1 Slater energy
    (variational)."""
    pu, pd, _ = hartree_fock(LX, LY, T, 8.0, NUP, NDN, pbc=True, m=0.0)
    e1 = exact_vmc_energy(LX, LY, T, 8.0, NUP, NDN, 1.0, pu, pd)
    e_g = min(exact_vmc_energy(LX, LY, T, 8.0, NUP, NDN, g, pu, pd)
              for g in (0.4, 0.5, 0.6, 0.8))
    assert e_g <= e1 + 1e-12
