"""Space-group symmetrized hubbardk basis vs full ED
(ref: more_tools.f90 generate_fourfold_k_configs, hubbard.f90
symmetry_reduce_hubbardk:9061, hamiltonian_hubbard_k_space_sym:2927).
"""

import itertools

import numpy as np
import pytest

from sqmc_tpu import dets
from sqmc_tpu.algo.sparseham import build_sparse_ham
from sqmc_tpu.ops import setalg
from sqmc_tpu.systems.hubbard.symmetry import (k_symmetry_maps, orbit,
                                               representatives,
                                               symmetrized_matrix_element)
from sqmc_tpu.systems.hubbard.system import make_hubbard_k_system

L, NUP, NDN, U = 2, 2, 2, 4.0


@pytest.fixture(scope="module")
def setup():
    hub = make_hubbard_k_system(L, L, 1.0, U, NUP, NDN)
    ups = [dets.det_from_orbs(c, hub.norb)
           for c in itertools.combinations(range(hub.norb), NUP)]
    up = np.repeat(np.stack(ups), len(ups), axis=0)
    dn = np.tile(np.stack(ups), (len(ups), 1))
    so = setalg.lexsort_dets(up, dn)
    up, dn = up[so], dn[so]
    H = build_sparse_ham(hub.table, up, dn, NUP, NDN, hub.norb)
    M = np.zeros((len(up), len(up)))
    M[H.rows, H.cols] = H.vals
    M[H.cols, H.rows] = H.vals
    M[np.diag_indices(len(up))] = H.diag
    c4, refl = k_symmetry_maps(L, L)
    return hub, up, dn, M, c4, refl


def test_maps_are_permutations_preserving_energy(setup):
    hub, up, dn, M, c4, refl = setup
    e = hub.extra["k_energies"]
    for perm in [c4[0], c4[1], c4[2], refl]:
        assert sorted(perm) == list(range(hub.norb))
        np.testing.assert_allclose(e[perm], e, atol=1e-12)
    # C4^2 applied twice = C4^4 = identity
    np.testing.assert_array_equal(c4[1][c4[1]], np.arange(hub.norb))


def test_orbit_images_are_isoenergetic(setup):
    """Every orbit member has the same diagonal energy (the group
    commutes with H)."""
    import jax.numpy as jnp
    from sqmc_tpu.systems.chem import slater
    hub, up, dn, M, c4, refl = setup
    ou, od, ph = orbit(up[:8], dn[:8], NUP, NDN, hub.norb, c4, refl, 1, 1)
    for g in range(16):
        bu = dets.to_bits(jnp.asarray(ou[:, g]), hub.norb)
        bd = dets.to_bits(jnp.asarray(od[:, g]), hub.norb)
        dg = np.asarray(slater.diag_elements(hub.table, bu, bd))
        bu0 = dets.to_bits(jnp.asarray(up[:8]), hub.norb)
        bd0 = dets.to_bits(jnp.asarray(dn[:8]), hub.norb)
        d0 = np.asarray(slater.diag_elements(hub.table, bu0, bd0))
        np.testing.assert_allclose(dg, d0, atol=1e-10)
    assert np.all(np.abs(ph) == 1.0)


@pytest.mark.parametrize("z,p", [(1, 1), (-1, 1), (1, -1)])
def test_symmetrized_spectrum_is_subset_of_full(setup, z, p):
    hub, up, dn, M, c4, refl = setup
    w_full, v_full = np.linalg.eigh(M)
    _, _, norm, is_rep = representatives(up, dn, NUP, NDN, hub.norb, c4,
                                         refl, z, p)
    reps = np.nonzero(is_rep)[0]
    if len(reps) == 0:
        pytest.skip("empty sector")
    n = len(reps)
    Hs = np.zeros((n, n))
    for i, a in enumerate(reps):
        for j, b in enumerate(reps):
            if j < i:
                continue
            Hs[i, j] = Hs[j, i] = symmetrized_matrix_element(
                hub.table, up[a], dn[a], up[b], dn[b], NUP, NDN,
                hub.norb, c4, refl, z, p)
    w_sym = np.linalg.eigvalsh(Hs)
    for w in w_sym:
        assert np.min(np.abs(w_full - w)) < 1e-8

    # the sector minimum must match the projector-based sector minimum
    key_all = (up[:, 0].astype(object) << 64) | dn[:, 0].astype(object)
    pos = {k: i for i, k in enumerate(key_all.tolist())}
    ou, od, ph = orbit(up, dn, NUP, NDN, hub.norb, c4, refl, z, p)
    img_idx = np.empty((len(up), 16), np.int64)
    for g in range(16):
        kg = (ou[:, g, 0].astype(object) << 64) | od[:, g, 0].astype(object)
        img_idx[:, g] = [pos[k] for k in kg.tolist()]
    sector_min = np.inf
    for m in range(len(w_full)):
        v = v_full[:, m]
        pv = np.zeros_like(v)
        for g in range(16):
            pv += ph[:, g] * v[img_idx[:, g]]
        if abs(v @ pv) / 16 > 1e-8:
            sector_min = min(sector_min, w_full[m])
    assert w_sym[0] == pytest.approx(sector_min, abs=1e-8)
