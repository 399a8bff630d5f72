"""Sharded Davidson matvec over a virtual 8-device mesh (SURVEY P4)."""
import numpy as np
from sqmc_tpu.systems.heg.system import make_heg_system
from sqmc_tpu.algo.sparseham import build_sparse_ham
from sqmc_tpu.algo.davidson import davidson, matvec
from sqmc_tpu.algo.hci import run_hci
from sqmc_tpu.parallel.dist import make_mesh, make_sharded_matvec

def test_sharded_matvec_and_davidson():
    heg = make_heg_system(3, 0.5, 14, 7, 1.49)
    res = run_hci(heg, eps_var=2e-3, eps_var_sched=[2e-3]*5, verbose=False)
    H = build_sparse_ham(heg.table, res.up, res.dn, heg.nup, heg.ndn, heg.norb)
    mesh = make_mesh(8)
    mv = make_sharded_matvec(H, mesh)
    v = np.random.default_rng(0).normal(size=(H.n, 2))
    y_ser = np.asarray(matvec(H, v))
    y_par = np.asarray(mv(v))
    np.testing.assert_allclose(y_par, y_ser, rtol=0, atol=1e-9)
    e_ser, _ = davidson(H, n_states=2)
    e_par, _ = davidson(H, n_states=2, matvec_fn=mv)
    np.testing.assert_allclose(e_par, e_ser, atol=1e-8)
    print("sharded davidson OK", e_par)


def test_hci_with_mesh_matches_serial():
    heg = make_heg_system(3, 0.5, 14, 7, 1.49)
    r_ser = run_hci(heg, eps_var=2e-3, eps_var_sched=[2e-3]*5, verbose=False)
    r_par = run_hci(heg, eps_var=2e-3, eps_var_sched=[2e-3]*5, verbose=False,
                    mesh=make_mesh(8))
    assert len(r_ser.up) == len(r_par.up)
    np.testing.assert_allclose(r_par.energies, r_ser.energies, atol=1e-8)
