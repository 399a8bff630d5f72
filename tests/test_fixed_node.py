"""Fixed-node / importance-sampled determinant walks on real-space Hubbard
(ref: run_type dispatch do_walk.f90:38-50, move variants :3460-4748,
Gutzwiller guiding hubbard.f90 det_ratio_hubbard:4346).

Oracle: the exact fixed-node effective Hamiltonian built on the FULL
enumerated det space with the same Gutzwiller guiding - its ground state
under the mixed estimator <psi_T|H|phi_FN>/<psi_T|phi_FN> is what the
walk must reproduce (fixed_node1 is variational: E_FN >= E_0).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sqmc_tpu import dets
from sqmc_tpu.systems.base import FermionSystem
from sqmc_tpu.systems.hubbard.system import make_hubbard_real_system
from sqmc_tpu.systems.chem import slater
from sqmc_tpu.algo.guiding import (make_gutzwiller_guiding, eval_guiding,
                                   make_table_guiding)
from sqmc_tpu.algo.semistoch import build_trial_wavefunction
from sqmc_tpu.algo.walk import WalkConfig, run_walk

from reference_impl import all_dets


L, NUP, NDN, U = 8, 2, 2, 4.0
GUTZ_G = 0.7


@pytest.fixture(scope="module")
def chain():
    """1x8 open Hubbard chain (nondegenerate one-body spectrum), quarter
    filling: 784-det space, exactly enumerable."""
    sys_ = make_hubbard_real_system(1, L, t=1.0, U=U, nup=NUP, ndn=NDN,
                                    pbc=False)
    guide = make_gutzwiller_guiding(sys_, g=GUTZ_G)

    # enumerate the full space; dense H and psi_g on it
    combos = all_dets(L, NUP, NDN)
    ups = np.stack([dets.det_from_orbs(u, L) for u, d in combos])
    dns = np.stack([dets.det_from_orbs(d, L) for u, d in combos])
    bu = dets.to_bits(jnp.asarray(ups), L)
    bd = dets.to_bits(jnp.asarray(dns), L)
    n = len(combos)
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    H = np.asarray(slater.pair_matrix_elements(
        sys_.table, bu[ii.ravel()], bd[ii.ravel()],
        bu[jj.ravel()], bd[jj.ravel()])).reshape(n, n)
    g = np.asarray(eval_guiding(guide, "gutzwiller", jnp.asarray(ups),
                                jnp.asarray(dns), L, NUP, NDN))
    return sys_, guide, ups, dns, H, g


def _fn_oracle(H, g, psit_vec, eps=1.0):
    """Mixed energy of the exact fixed-node(eps) effective Hamiltonian's
    ground state (the densewalk._projector_parts matrix rules)."""
    ht = H * (g[:, None] / g[None, :])
    off = ~np.eye(len(H), dtype=bool)
    viol = off & (ht > 0)
    # fixed-node effective H in the untransformed det basis: kept flows are
    # the original H elements (viol is symmetric: g_i H_ij g_j > 0), the
    # diagonal dump is sum of the TRANSFORMED violating column flows
    hfn = np.where(viol, (1 - eps) * H, H)
    np.fill_diagonal(hfn, np.diag(H) + eps * np.sum(np.where(viol, ht, 0.0),
                                                    axis=0))
    w, v = np.linalg.eig(hfn)
    i0 = np.argmin(w.real)
    phi = v[:, i0].real
    phi *= np.sign(np.dot(phi, psit_vec) + 1e-300)
    e_mix = (psit_vec @ H @ phi) / (psit_vec @ phi)
    return float(w[i0].real), float(e_mix)


def _psit_vector(trial, ups, dns):
    vec = np.zeros(len(ups))
    tu = np.asarray(trial.psit_up)
    td = np.asarray(trial.psit_dn)
    tc = np.asarray(trial.psit_coef)
    for k in range(len(tu)):
        m = np.all(ups == tu[k], axis=1) & np.all(dns == td[k], axis=1)
        vec[np.nonzero(m)[0][0]] = tc[k]
    return vec


def test_importance_sampling_unbiased(chain):
    """run_type none + Gutzwiller importance sampling must stay unbiased:
    e_mixed -> E_0 exactly (statistically)."""
    sys_, guide, ups, dns, H, g = chain
    e0 = float(np.linalg.eigvalsh(H)[0])
    trial = build_trial_wavefunction(sys_, eps_var=1e-3, n_psi_t=40, n_imp=1,
                                     verbose=False)
    cfg = WalkConfig(mwalk=4096, cap_spawn=16384, norb=L, nup=NUP, ndn=NDN,
                     n_words=1, tau=2e-2, w_abs_target=3000.0,
                     has_singles=True, r_initiator=0.0,
                     guiding="gutzwiller")
    out = run_walk(sys_, trial, cfg, nstep=100, nblk=8, nblk_eq=4,
                   w_abs_begin=1500.0, e_trial_initial=e0, verbose=False,
                   guide=guide)
    tol = 6 * max(out.e_err, 1e-4) + 1e-3
    assert abs(out.e_mixed - e0) < tol


@pytest.mark.parametrize("run_type,eps", [("fixed_node1", 1.0),
                                          ("partial_node", 0.6)])
def test_fixed_node_matches_dense_oracle(chain, run_type, eps):
    sys_, guide, ups, dns, H, g = chain
    trial = build_trial_wavefunction(sys_, eps_var=1e-3, n_psi_t=40, n_imp=1,
                                     verbose=False)
    psit_vec = _psit_vector(trial, ups, dns)
    _, e_mix_oracle = _fn_oracle(H, g, psit_vec, eps=eps)
    e0 = float(np.linalg.eigvalsh(H)[0])

    cfg = WalkConfig(mwalk=4096, cap_spawn=16384, norb=L, nup=NUP, ndn=NDN,
                     n_words=1, tau=2e-2, w_abs_target=3000.0,
                     has_singles=True, r_initiator=0.0,
                     run_type=run_type, partial_node_eps=eps,
                     guiding="gutzwiller")
    out = run_walk(sys_, trial, cfg, nstep=100, nblk=8, nblk_eq=4,
                   w_abs_begin=1500.0, e_trial_initial=e_mix_oracle,
                   verbose=False, guide=guide)
    tol = 6 * max(out.e_err, 1e-4) + 1e-3
    assert abs(out.e_mixed - e_mix_oracle) < tol
    if run_type == "fixed_node1":
        # fixed-node energy is variational
        e_fn, _ = _fn_oracle(H, g, psit_vec, eps=1.0)
        assert e_fn >= e0 - 1e-12


def test_release_node_recovers_exact(chain):
    """release_node: fixed-node until release_step, exact projector after
    - the post-release stationary energy is E_0."""
    sys_, guide, ups, dns, H, g = chain
    e0 = float(np.linalg.eigvalsh(H)[0])
    trial = build_trial_wavefunction(sys_, eps_var=1e-3, n_psi_t=40, n_imp=1,
                                     verbose=False)
    cfg = WalkConfig(mwalk=4096, cap_spawn=16384, norb=L, nup=NUP, ndn=NDN,
                     n_words=1, tau=2e-2, w_abs_target=3000.0,
                     has_singles=True, r_initiator=0.0,
                     run_type="release_node", release_step=200,
                     guiding="gutzwiller")
    out = run_walk(sys_, trial, cfg, nstep=100, nblk=8, nblk_eq=4,
                   w_abs_begin=1500.0, e_trial_initial=e0, verbose=False,
                   guide=guide)
    tol = 6 * max(out.e_err, 1e-4) + 1e-3
    assert abs(out.e_mixed - e0) < tol


def test_table_guiding_matches_gutzwiller(chain):
    """'table' guiding with the tabulated Gutzwiller values must follow the
    identical trajectory as analytic Gutzwiller guiding (same seed)."""
    sys_, guide, ups, dns, H, g = chain
    tab = make_table_guiding(ups, dns, g)
    trial = build_trial_wavefunction(sys_, eps_var=1e-3, n_psi_t=40, n_imp=1,
                                     verbose=False)
    outs = []
    for kind, gd in (("gutzwiller", guide), ("table", tab)):
        cfg = WalkConfig(mwalk=2048, cap_spawn=8192, norb=L, nup=NUP,
                         ndn=NDN, n_words=1, tau=2e-2, w_abs_target=1000.0,
                         has_singles=True, r_initiator=0.0,
                         run_type="fixed_node1", guiding=kind)
        outs.append(run_walk(sys_, trial, cfg, nstep=30, nblk=2, nblk_eq=1,
                             w_abs_begin=500.0, e_trial_initial=-3.0,
                             verbose=False, guide=gd, seed=7))
    assert np.allclose(outs[0].e_blocks, outs[1].e_blocks, rtol=1e-9)
