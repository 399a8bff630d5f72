"""Orbital energies + deterministic MP2 vs brute force
(ref: chemistry.f90 compute_orbital_energies:9378, mp2_deterministic:9445).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sqmc_tpu import dets
from sqmc_tpu.systems.base import FermionSystem
from sqmc_tpu.systems.chem.integrals import IntegralTable
from sqmc_tpu.systems.chem.mp2 import (compute_orbital_energies,
                                       mp2_deterministic)
from sqmc_tpu.systems.heatbath import build_heatbath

from reference_impl import all_dets, dense_hamiltonian, random_integrals

NORB, NUP, NDN = 4, 2, 2


@pytest.fixture(scope="module")
def sys_and_dense():
    h, eri, core, eri_fn = random_integrals(NORB, seed=7)
    basis, H = dense_hamiltonian(NORB, NUP, NDN, h, eri_fn, core)
    table = IntegralTable.from_dense_arrays(h, eri, core,
                                            np.ones(NORB, np.int32))
    system = FermionSystem(
        name="chem", norb=NORB, nup=NUP, ndn=NDN, table=table,
        heatbath=build_heatbath(table),
        orb_sym_arr=jnp.ones(NORB, jnp.int32), has_singles=True,
        hf_up=dets.det_from_orbs(range(NUP), NORB),
        hf_dn=dets.det_from_orbs(range(NDN), NORB), extra={})
    return system, basis, H, h, eri_fn


def test_orbital_energies_formula(sys_and_dense):
    """eps_i = h_ii + sum_occ [direct - same-spin exchange] with the HF
    occupancies, computed independently here orbital by orbital."""
    system, basis, H, h, eri_fn = sys_and_dense
    eps = compute_orbital_energies(system)
    occ_up = set(range(NUP))
    occ_dn = set(range(NDN))
    for i in range(NORB):
        want = h[i, i]
        for j in occ_up:
            if j != i:
                want += eri_fn(i, i, j, j) - eri_fn(i, j, j, i)
        for j in occ_dn:
            want += eri_fn(i, i, j, j)
            if j != i:
                want -= 0.0  # opposite spin: no exchange
        # reference halves the double-counted direct sums; replicate by
        # symmetric role of up/dn for this closed-shell det
        assert eps[i] == pytest.approx(want, abs=1e-12)


def test_mp2_matches_brute_force(sys_and_dense):
    """E2 = sum_k H_0k^2/(eps_removed - eps_added) over ALL single+double
    excitations of HF, brute-forced from the dense H."""
    system, basis, H, h, eri_fn = sys_and_dense
    eps = compute_orbital_energies(system)
    i0 = basis.index((tuple(range(NUP)), tuple(range(NDN))))
    e2_want = 0.0
    occ0_u, occ0_d = set(range(NUP)), set(range(NDN))
    for k, (u, d) in enumerate(basis):
        if k == i0 or H[i0, k] == 0.0:
            continue
        rem = (occ0_u - set(u)) | set()
        den = (sum(eps[list(occ0_u - set(u))]) +
               sum(eps[list(occ0_d - set(d))]) -
               sum(eps[list(set(u) - occ0_u)]) -
               sum(eps[list(set(d) - occ0_d)]))
        if abs(den) > 1e-12:
            e2_want += H[i0, k] ** 2 / den
    e2, _ = mp2_deterministic(system)
    assert e2 == pytest.approx(e2_want, abs=1e-10)
