"""Exhaustive parity tests of the batched Slater-Condon kernels against a
brute-force second-quantization reference on a small random system."""

import numpy as np
import pytest

import jax.numpy as jnp

from sqmc_tpu import dets
from sqmc_tpu.systems.chem.integrals import IntegralTable
from sqmc_tpu.systems.chem import slater

from reference_impl import all_dets, dense_hamiltonian, random_integrals

NORB, NUP, NDN = 4, 2, 2


@pytest.fixture(scope="module")
def small_system():
    h, eri, core, eri_fn = random_integrals(NORB, seed=3)
    basis, H = dense_hamiltonian(NORB, NUP, NDN, h, eri_fn, core)
    table = IntegralTable.from_dense_arrays(h, eri, core, np.ones(NORB, np.int32))
    return h, eri, core, eri_fn, basis, H, table


def _bits(basis):
    n = len(basis)
    bu = np.zeros((n, NORB), np.uint8)
    bd = np.zeros((n, NORB), np.uint8)
    for i, (u, d) in enumerate(basis):
        bu[i, list(u)] = 1
        bd[i, list(d)] = 1
    return jnp.asarray(bu), jnp.asarray(bd)


def test_diag_elements(small_system):
    h, eri, core, eri_fn, basis, H, table = small_system
    bu, bd = _bits(basis)
    got = np.asarray(slater.diag_elements(table, bu, bd))
    np.testing.assert_allclose(got, np.diag(H), rtol=0, atol=1e-12)


def test_all_pair_elements(small_system):
    """Every (i,j) pair: the batched general kernel must reproduce the
    brute-force H, including fermion signs and >double zeros."""
    h, eri, core, eri_fn, basis, H, table = small_system
    bu, bd = _bits(basis)
    n = len(basis)
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    ii, jj = ii.ravel(), jj.ravel()
    got = np.asarray(
        slater.pair_matrix_elements(table, bu[ii], bd[ii], bu[jj], bd[jj])
    ).reshape(n, n)
    np.testing.assert_allclose(got, H, rtol=0, atol=1e-11)


def test_packed_roundtrip():
    rng = np.random.default_rng(0)
    norb = 130  # force 3 words
    W = dets.n_words(norb)
    bits = (rng.random((7, norb)) < 0.3).astype(np.uint8)
    words = dets.from_bits(jnp.asarray(bits), norb)
    assert words.shape == (7, W)
    back = np.asarray(dets.to_bits(words, norb))
    np.testing.assert_array_equal(back, bits)
    np.testing.assert_array_equal(
        np.asarray(dets.popcount(words)), bits.sum(axis=1))


def test_occ_orbitals():
    bits = jnp.asarray(np.array([[1, 0, 1, 1, 0, 0, 1]], np.uint8))
    occ = np.asarray(dets.occ_orbitals(bits, 4))
    np.testing.assert_array_equal(occ, [[0, 2, 3, 6]])


def test_set_clear_get():
    norb = 70
    words = jnp.asarray(np.zeros((2, dets.n_words(norb)), np.uint64))
    orb = jnp.asarray(np.array([3, 65], np.int32))
    w2 = dets.set_orb(words, orb)
    assert bool(dets.get_orb(w2, orb)[0]) and bool(dets.get_orb(w2, orb)[1])
    w3 = dets.clear_orb(w2, orb)
    assert not bool(dets.get_orb(w3, orb)[0])
    np.testing.assert_array_equal(np.asarray(w3), np.asarray(words))
