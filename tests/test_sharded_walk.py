"""Multi-device determinant-sharded walk on the 8-virtual-CPU mesh:
all_to_all spawn routing + all-gathered deterministic projection + psum'd
population control must stay statistically exact (SURVEY P1/P2/P4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sqmc_tpu.systems.heg.system import make_heg_system
from sqmc_tpu.algo.hci import run_hci
from sqmc_tpu.algo.semistoch import build_trial_wavefunction
from sqmc_tpu.algo.walk import WalkConfig, end_of_block
from sqmc_tpu.parallel.dist import make_mesh, make_sharded_walk


def test_sharded_walk_unbiased():
    if jax.device_count() < 4:
        pytest.skip("needs >=4 devices")
    sys_ = make_heg_system(3, 1.0, 4, 2, 1.6)
    res = run_hci(sys_, eps_var=1e-9, eps_var_sched=[1e-9] * 30,
                  max_iters=60, verbose=False)
    trial = build_trial_wavefunction(sys_, eps_var=1e-3, n_psi_t=30,
                                     n_imp=10, verbose=False)
    n_dev = 4
    mesh = make_mesh(n_dev)
    cfg = WalkConfig(mwalk=2048, cap_spawn=8192, norb=sys_.norb, nup=2,
                     ndn=2, n_words=1, tau=5e-3, w_abs_target=2000.0,
                     has_singles=False, r_initiator=0.0, axis_name="d",
                     n_dev=n_dev)
    step, state, tables = make_sharded_walk(sys_, trial, cfg, mesh,
                                            1000.0, res.energies[0])
    ebl = []
    for blk in range(7):
        if blk >= 3:
            state = state._replace(equilibrated=jnp.asarray(True))
        num = den = 0.0
        for _ in range(100):
            state, stats = step(state, tables)
            num += float(stats["e_num_gen"])
            den += float(stats["e_den_gen"])
        if blk >= 3:
            ebl.append(num / den)
        state = end_of_block(state)
    e = np.mean(ebl)
    err = np.std(ebl, ddof=1) / np.sqrt(len(ebl))
    assert abs(e - res.energies[0]) < 6 * max(err, 5e-6) + 2e-5


def test_sharded_dense_projection_matches_ell():
    """f32-state sharded walks row-slice the DENSE projection matrix
    across shards (one local [m_loc, n_glob] MXU matmul against the
    all-gathered weight vector).  The slices must reproduce the
    per-shard block-ELL matvec, and the walk must run through the dense
    branch."""
    if jax.device_count() < 4:
        pytest.skip("needs >=4 devices")
    sys_ = make_heg_system(3, 1.0, 4, 2, 1.6)
    trial = build_trial_wavefunction(sys_, eps_var=1e-3, n_psi_t=30,
                                     n_imp=10, verbose=False)
    n_dev = 4
    mesh = make_mesh(n_dev)
    cfg = WalkConfig(mwalk=1024, cap_spawn=4096, norb=sys_.norb, nup=2,
                     ndn=2, n_words=1, tau=5e-3, w_abs_target=1000.0,
                     has_singles=False, r_initiator=0.0, axis_name="d",
                     n_dev=n_dev, f32_state=True)
    step, state, tables = make_sharded_walk(sys_, trial, cfg, mesh,
                                            500.0, trial.e_trial, seed=3)
    n_glob = tables.imp_dense.shape[0]
    assert n_glob == tables.imp_dense.shape[1] and n_glob > 0
    m_loc = n_glob // n_dev

    rng = np.random.default_rng(0)
    w = rng.normal(size=n_glob).astype(np.float32)
    hw_dense = np.asarray(tables.imp_dense, np.float64) @ w
    # oracle: the per-shard block-ELL form (local rows, global cols)
    ec = np.asarray(tables.imp_ell_cols).reshape(n_dev, -1)
    ev = np.asarray(tables.imp_ell_vals, np.float64).reshape(n_dev, -1)
    er = np.asarray(tables.imp_ell_row).reshape(n_dev, -1)
    hw_ell = np.zeros(n_glob)
    for d in range(n_dev):
        blk = (ev[d] * w[ec[d]]).reshape(-1, 128).sum(axis=1)
        for b, r in zip(blk, er[d]):
            if r < m_loc:
                hw_ell[d * m_loc + r] += b
    np.testing.assert_allclose(hw_dense, hw_ell, atol=1e-4)

    for _ in range(25):
        state, stats = step(state, tables)
    assert np.isfinite(float(stats["w_abs_gen"]))
    assert int(stats["nwalk"]) > 0


def test_sharded_walk_deterministic_same_seed():
    """Same seed + same mesh => bitwise-identical trajectory (the TPU
    analog of SURVEY 5.2's determinism guards; JAX purity makes this a
    hard guarantee rather than a hope)."""
    if jax.device_count() < 4:
        pytest.skip("needs >=4 devices")
    sys_ = make_heg_system(3, 1.0, 4, 2, 1.6)
    trial = build_trial_wavefunction(sys_, eps_var=1e-3, n_psi_t=30,
                                     n_imp=10, verbose=False)
    n_dev = 4
    mesh = make_mesh(n_dev)
    cfg = WalkConfig(mwalk=1024, cap_spawn=4096, norb=sys_.norb, nup=2,
                     ndn=2, n_words=1, tau=5e-3, w_abs_target=1000.0,
                     has_singles=False, r_initiator=0.0, axis_name="d",
                     n_dev=n_dev)
    traces = []
    for rep in range(2):
        step, state, tables = make_sharded_walk(sys_, trial, cfg, mesh,
                                                500.0, trial.e_trial,
                                                seed=3)
        tr = []
        for _ in range(25):
            state, stats = step(state, tables)
            tr.append((float(stats["w_abs_gen"]),
                       float(stats["e_num_gen"]), int(stats["nwalk"])))
        traces.append(tr)
    assert traces[0] == traces[1]
