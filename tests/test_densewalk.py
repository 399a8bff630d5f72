"""Dense-vector walk engine + toy backends: run_type family vs dense ED.

Golden source: the projector-variant semantics of the reference's
move_heat_bath2 (do_walk.f90:4395-4550) checked against exact
diagonalization of the same matrices.
"""

import numpy as np
import pytest

from sqmc_tpu.systems.toy import (Rannyu, ToySystem, make_fictitious_system,
                                  make_read_system, toy_psi_t)
from sqmc_tpu.algo.densewalk import (DenseWalkConfig, build_dense_tables,
                                     deterministic_ground_state,
                                     run_dense_walk, _projector_parts)


@pytest.fixture(scope="module")
def boson():
    """Sign-problem-free fictitious matrix (bosonic=1)."""
    return make_fictitious_system(20, bosonic=1, spectrum_coef=1.0,
                                  spectrum_power=1.0, ham_diag_fluc=0.5,
                                  ham_offdiag_fluc=1.0)


@pytest.fixture(scope="module")
def fermi():
    """Sign-problem fictitious matrix (bosonic=0)."""
    return make_fictitious_system(16, bosonic=0, spectrum_coef=1.0,
                                  spectrum_power=1.0, ham_diag_fluc=0.5,
                                  ham_offdiag_fluc=1.5, seed=(1, 2, 3, 5))


def test_rannyu_matches_lcg_definition():
    r = Rannyu((0, 0, 0, 1))
    m = 34522712143931
    s = 1
    for _ in range(5):
        s = (s * m) % (1 << 48)
        assert abs(r() - s / 2.0 ** 48) < 1e-15
    # savern returns the 4x12-bit state split
    parts = r.savern()
    assert ((parts[0] << 36) | (parts[1] << 24) | (parts[2] << 12)
            | parts[3]) == s


def test_fictitious_construction(boson):
    h = boson.ham
    assert np.allclose(h, h.T)
    assert np.min(np.diag(h)) == 0.0          # diagonal shifted to min 0
    off = h[~np.eye(20, dtype=bool)]
    assert np.all(off <= 0)                   # bosonic => negative offdiag


def test_read_system_roundtrip(tmp_path, boson):
    p = tmp_path / "hamiltonian"
    n = boson.ndet
    with open(p, "w") as f:
        f.write(f"{n}\n")
        for row in boson.ham:
            f.write(" ".join(f"{x:.17g}" for x in row) + "\n")
    sys2 = make_read_system(str(p))
    assert np.allclose(sys2.ham, boson.ham, atol=1e-12)


def test_dense_ed_and_tau(boson):
    w, g = boson.diagonalize()
    assert np.all(np.diff(w) > -1e-12)
    assert g[np.argmax(np.abs(g))] > 0
    tau_det, tau_sto, tau = boson.tau_optimal(0.5)
    assert tau_det == pytest.approx(2 / (w[-1] + w[1] - 2 * w[0]))
    assert tau == pytest.approx(0.5 / (w[-1] - w[0]))


def test_deterministic_projection_exact(boson):
    e, v = deterministic_ground_state(boson)
    w, g = boson.diagonalize()
    assert e == pytest.approx(w[0], abs=1e-9)
    assert abs(abs(np.dot(v, g)) - 1) < 1e-6


def test_partial_node_interpolates(fermi):
    """eps=0 reproduces the exact projector; eps=1 reproduces fixed_node1."""
    g = np.abs(fermi.diagonalize()[1]) + 0.01
    for eps, ref_type in [(0.0, "none"), (1.0, "fixed_node1")]:
        p0, d0 = _projector_parts(fermi.ham, 0.01, "partial_node", g, 1, eps)
        p1, d1 = _projector_parts(fermi.ham, 0.01, ref_type, g, 1, 0.0)
        assert np.allclose(p0, p1, atol=1e-14)
        assert np.allclose(d0, d1, atol=1e-14)


def _fn_effective_energy(system, run_type, psi_g, eps=0.0):
    """Ground energy of the effective (possibly non-symmetric) projector:
    dominant eigvec of P gives the FN wavefunction; report its projector
    growth energy E with P = 1 + tau*(E - H_eff)."""
    tau = 0.01
    p, d0 = _projector_parts(system.ham, tau, run_type, psi_g, 1, eps)
    P = p + np.diag(d0)                       # e_trial = 0
    ev = np.linalg.eigvals(P)
    lam = np.max(ev.real)
    return (lam - 1) / -tau                   # E_eff with e_trial=0


def test_fixed_node_exact_nodes_gives_exact_energy(fermi):
    """With psi_g = exact ground state, the FN effective Hamiltonian has
    the exact energy (standard lattice-FN property)."""
    w, g = fermi.diagonalize()
    e_fn = _fn_effective_energy(fermi, "fixed_node1", g)
    assert e_fn == pytest.approx(w[0], abs=1e-8)


def test_fixed_node_upper_bound(fermi):
    """Approximate psi_g: E_FN >= E_0 (variational upper bound)."""
    w, g = fermi.diagonalize()
    rng = np.random.default_rng(0)
    g_approx = g + 0.25 * rng.standard_normal(g.shape) * np.abs(g).mean()
    g_approx[g_approx == 0] = 1e-3
    e_fn = _fn_effective_energy(fermi, "fixed_node1", g_approx)
    assert e_fn >= w[0] - 1e-9


def test_stochastic_walk_none_boson(boson):
    """Plain projector walk on the sign-free matrix: mixed energy within
    a few sigma of ED."""
    w, g = boson.diagonalize()
    psi_t = g.copy()
    cfg = DenseWalkConfig(ndet=boson.ndet, tau=0.02, w_abs_target=2000.0,
                          run_type="none", min_wt=0.25)
    out = run_dense_walk(boson, cfg, psi_t, nstep=200, nblk=12, nblk_eq=4,
                         w_abs_begin=500.0, seed=1)
    assert abs(out.e_mixed - w[0]) < max(4 * out.e_err, 2e-3)


def test_stochastic_fixed_node_imp_sampling(fermi):
    """FN1 + importance sampling with exact nodes: energy == E0 within
    stochastic error; weights remain positive."""
    w, g = fermi.diagonalize()
    cfg = DenseWalkConfig(ndet=fermi.ndet, tau=0.02, w_abs_target=2000.0,
                          run_type="fixed_node1", importance_sampling=1,
                          min_wt=0.25)
    out = run_dense_walk(fermi, cfg, psi_t=g, psi_g=g, nstep=200, nblk=12,
                         nblk_eq=4, w_abs_begin=500.0, seed=2)
    assert np.all(np.asarray(out.state.w) >= -1e-12)
    assert abs(out.e_mixed - w[0]) < max(4 * out.e_err, 2e-3)


def test_release_node_recovers_exact(fermi):
    """Release-node with a slightly wrong psi_g: after release the signed
    walk relaxes toward the exact energy."""
    w, g = fermi.diagonalize()
    cfg = DenseWalkConfig(ndet=fermi.ndet, tau=0.02, w_abs_target=4000.0,
                          run_type="release_node", importance_sampling=1,
                          release_step=100, min_wt=0.25)
    out = run_dense_walk(fermi, cfg, psi_t=g, psi_g=np.abs(g) + 1e-2,
                         nstep=200, nblk=10, nblk_eq=3, w_abs_begin=1000.0,
                         seed=3)
    assert abs(out.e_mixed - w[0]) < max(5 * out.e_err, 5e-3)


def test_vmc_samples_guiding_energy(fermi):
    """VMC mode: energy -> <psi_g|H|psi_g> (psi_g = exact ground state,
    where the discrete-VMC chain is exactly stationary on psi_g^2)."""
    w, g = fermi.diagonalize()
    cfg = DenseWalkConfig(ndet=fermi.ndet, tau=0.02, w_abs_target=2000.0,
                          run_type="vmc", importance_sampling=1, min_wt=0.25)
    out = run_dense_walk(fermi, cfg, psi_t=g, psi_g=g, nstep=100, nblk=8,
                         nblk_eq=2, w_abs_begin=1000.0, seed=4)
    assert out.e_mixed == pytest.approx(w[0], abs=1e-8)


def test_sr_preserves_weight_and_energy(fermi):
    """Stochastic reconfiguration: total |w| conserved by the comb each
    step; energy unbiased for exact-node psi_g."""
    w, g = fermi.diagonalize()
    cfg = DenseWalkConfig(ndet=fermi.ndet, tau=0.02, w_abs_target=1000.0,
                          run_type="sr", importance_sampling=1,
                          partial_node_eps=1.0, min_wt=0.0, sr_nwalk=1000)
    out = run_dense_walk(fermi, cfg, psi_t=g, psi_g=g, nstep=150, nblk=10,
                         nblk_eq=3, w_abs_begin=1000.0, seed=5)
    assert abs(out.e_mixed - w[0]) < max(5 * out.e_err, 5e-3)


def test_sr_requires_importance_sampling(fermi):
    cfg = DenseWalkConfig(ndet=fermi.ndet, tau=0.02, w_abs_target=100.0,
                          run_type="sr", importance_sampling=0)
    with pytest.raises(ValueError, match="importance sampling"):
        build_dense_tables(fermi, cfg, np.ones(fermi.ndet), None)


def test_toy_psi_t_guiding():
    psi_t, psi_g = toy_psi_t(10, iwdet=[1, 3], cdet=[0.8, 0.4])
    assert psi_t[0] == pytest.approx(0.8 / np.sqrt(0.8 ** 2 + 0.4 ** 2))
    assert psi_g[0] == pytest.approx(0.8)
    # off-support guiding value: sqrt((1-0.8)/(10-2))
    assert psi_g[5] == pytest.approx(np.sqrt((1 - 0.8) / 8))


def test_exponential_projector(boson):
    """exp projector (ref use_exponential_projector card): stationary
    energy matches ED; deterministic limit exact in one application
    sense (the exp projector's dominant eigvec IS the ground state)."""
    w, g = boson.diagonalize()
    cfg = DenseWalkConfig(ndet=boson.ndet, tau=0.05, w_abs_target=2000.0,
                          run_type="none", min_wt=0.25,
                          use_exponential_projector=True)
    out = run_dense_walk(boson, cfg, psi_t=g, nstep=150, nblk=10, nblk_eq=4,
                         w_abs_begin=500.0, seed=7)
    assert abs(out.e_mixed - w[0]) < max(4 * out.e_err, 2e-3)
