"""1-RDM, natural orbitals, and Green's function validation on a small
exactly-solvable system."""

import numpy as np
import pytest

import jax.numpy as jnp

from sqmc_tpu import dets
from sqmc_tpu.systems.base import FermionSystem
from sqmc_tpu.systems.chem.integrals import IntegralTable, n_eri
from sqmc_tpu.systems.heatbath import build_heatbath
from sqmc_tpu.algo.hci import run_hci
from sqmc_tpu.algo.rdm import get_1rdm, generate_natorb_fcidump
from sqmc_tpu.algo.greens import greens_function_g0


@pytest.fixture(scope="module")
def toy():
    rng = np.random.default_rng(3)
    norb = 5
    h = rng.normal(size=(norb, norb)) * 0.3
    h = 0.5 * (h + h.T) + np.diag(np.arange(norb) * 1.0)
    eri = rng.normal(size=n_eri(norb)) * 0.1
    table = IntegralTable.from_dense_arrays(h, eri, 0.0,
                                            np.ones(norb, np.int32))
    sys_ = FermionSystem(
        name="toy", norb=norb, nup=2, ndn=2, table=table,
        heatbath=build_heatbath(table),
        orb_sym_arr=jnp.ones(norb, jnp.int32), has_singles=True,
        hf_up=dets.det_from_orbs([0, 1], norb),
        hf_dn=dets.det_from_orbs([0, 1], norb), extra={})
    res = run_hci(sys_, 1e-12, [1e-12] * 40, max_iters=60, verbose=False)
    return sys_, res


def test_rdm_trace_and_natorb_invariance(toy, tmp_path):
    sys_, res = toy
    g = get_1rdm(sys_, res.up, res.dn, res.wts[:, 0])
    assert abs(np.trace(g) - 4.0) < 1e-10
    np.testing.assert_allclose(g, g.T, atol=1e-12)
    path = str(tmp_path / "FCIDUMP.natorb")
    occs, U = generate_natorb_fcidump(sys_, res.up, res.dn, res.wts[:, 0],
                                      path, nelec=4)
    assert abs(occs.sum() - 4.0) < 1e-10
    from sqmc_tpu.systems.base import make_chem_system
    s2 = make_chem_system(path, nup=2, ndn=2, reorder=False)
    r2 = run_hci(s2, 1e-12, [1e-12] * 40, max_iters=60, verbose=False)
    assert abs(r2.energies[0] - res.energies[0]) < 1e-8


def test_greens_sum_rules(toy):
    sys_, res = toy
    g = get_1rdm(sys_, res.up, res.dn, res.wts[:, 0])
    W = np.array([1e8])
    Gp, Gm = greens_function_g0(sys_, res.up, res.dn, res.wts[:, 0],
                                res.energies[0], W)
    norb = sys_.norb
    assert np.abs((W[0] * Gp[0]).real - (2 * np.eye(norb) - g)).max() < 1e-5
    assert np.abs((W[0] * Gm[0]).real - g).max() < 1e-5
