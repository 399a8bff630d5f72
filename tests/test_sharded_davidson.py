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


def test_sharded_unique_dets_matches_host():
    """P5 distributed dedup: all_to_all owner routing + per-shard
    sort/unique must equal host unique_dets (ref mpi_merge_sort2)."""
    import numpy as np
    from sqmc_tpu.parallel.dist import make_mesh, sharded_unique_dets
    from sqmc_tpu.ops import setalg

    rng = np.random.default_rng(5)
    n = 5000
    up = rng.integers(0, 1 << 20, size=(n, 1)).astype(np.uint64)
    dn = rng.integers(0, 1 << 20, size=(n, 1)).astype(np.uint64)
    # inject duplicates
    up[::3] = up[0]
    dn[::3] = dn[0]
    mesh = make_mesh(8)
    u1, d1 = sharded_unique_dets(mesh, up, dn)
    u2, d2, _, _ = setalg.unique_dets(up, dn)
    np.testing.assert_array_equal(u1, u2)
    np.testing.assert_array_equal(d1, d2)


def test_distributed_pt_matches_serial():
    """P6 replicated-stream PT: identical sample stream, per-device
    ownership masks, psum - must match the serial estimate to float
    tolerance (ref shared alias seed do_walk.f90:233)."""
    import numpy as np
    from sqmc_tpu.parallel.dist import make_mesh
    from sqmc_tpu.systems.heg.system import make_heg_system
    from sqmc_tpu.algo.hci import run_hci
    from sqmc_tpu.algo.pt import second_order_pt_alias, second_order_pt

    sys_ = make_heg_system(3, 0.5, 14, 7, 1.49)
    res = run_hci(sys_, eps_var=1e-3, eps_var_sched=[1e-3] * 8,
                  verbose=False)
    e_var = float(res.energies[0])
    pt_big, _ = second_order_pt(sys_, res.up, res.dn, res.wts[:, 0],
                                e_var, 5e-6, verbose=False)
    kwargs = dict(eps_pt=2e-7, eps_pt_big=5e-6, n_mc=100,
                  target_error=3e-5, pt_big=pt_big, seed=7,
                  max_samples=12, min_samples=12, verbose=False)
    r1 = second_order_pt_alias(sys_, res.up, res.dn, res.wts[:, 0], e_var,
                               **kwargs)
    mesh = make_mesh(8)
    r2 = second_order_pt_alias(sys_, res.up, res.dn, res.wts[:, 0], e_var,
                               mesh=mesh, **kwargs)
    assert abs(r1.pt_diff - r2.pt_diff) < 1e-12
    assert r1.n_samples == r2.n_samples
