"""Multi-word determinant paths (norb > 64, W=2 packed words).

Oracle: pad a small random-integral system with dead orbitals (zero
integrals, distinct irrep) past the 64-orbital word boundary - every
stage (HCI selection, sparse H, Davidson, PT, 1-RDM) must reproduce the
unpadded W=1 results exactly.  This exercises the reference's
NUM_ORBITALS_GT_127 ik_vec regime (types.f90:50-52) in the packed-word
design.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sqmc_tpu import dets
from sqmc_tpu.algo.hci import run_hci
from sqmc_tpu.algo.pt import second_order_pt
from sqmc_tpu.algo.rdm import get_1rdm
from sqmc_tpu.systems.base import FermionSystem
from sqmc_tpu.systems.chem.integrals import (IntegralTable, n_eri,
                                             pair_index, quad_index)
from sqmc_tpu.systems.heatbath import build_heatbath

from reference_impl import random_integrals

NORB, NUP, NDN = 6, 3, 3
NPAD = 70          # > 64: forces W=2


def _sys(norb, h, eri, core, sym):
    table = IntegralTable.from_dense_arrays(h, eri, core, sym)
    return FermionSystem(
        name="chem", norb=norb, nup=NUP, ndn=NDN, table=table,
        heatbath=build_heatbath(table),
        orb_sym_arr=jnp.asarray(sym), has_singles=True,
        hf_up=dets.det_from_orbs(range(NUP), norb),
        hf_dn=dets.det_from_orbs(range(NDN), norb), extra={})


@pytest.fixture(scope="module")
def pair():
    h, eri, core, eri_fn = random_integrals(NORB, seed=13)
    sym = np.ones(NORB, np.int32)
    small = _sys(NORB, h, eri, core, sym)

    hp = np.zeros((NPAD, NPAD))
    hp[:NORB, :NORB] = h
    # keep dead orbitals energetically far away and symmetry-forbidden
    for o in range(NORB, NPAD):
        hp[o, o] = 100.0 + o
    erip = np.zeros(n_eri(NPAD))
    P, Q = np.meshgrid(np.arange(NORB), np.arange(NORB), indexing="ij")
    for r in range(NORB):
        for s in range(r + 1):
            idx_small = quad_index(pair_index(P, Q),
                                   pair_index(r, s))
            erip[quad_index(pair_index(P, Q), pair_index(r, s))] = \
                eri[idx_small]
    symp = np.ones(NPAD, np.int32)
    symp[NORB:] = 2 + np.arange(NPAD - NORB)      # unreachable irreps
    big = _sys(NPAD, hp, erip, core, symp)
    assert big.n_words == 2 and small.n_words == 1
    return small, big


def test_hci_energy_identical(pair):
    small, big = pair
    r1 = run_hci(small, eps_var=1e-6, eps_var_sched=[1e-6] * 10,
                 verbose=False)
    r2 = run_hci(big, eps_var=1e-6, eps_var_sched=[1e-6] * 10,
                 verbose=False)
    assert len(r1.up) == len(r2.up)
    assert r2.energies[0] == pytest.approx(r1.energies[0], abs=1e-9)


def test_pt_identical(pair):
    small, big = pair
    r1 = run_hci(small, eps_var=5e-2, eps_var_sched=[5e-2] * 4,
                 verbose=False)
    r2 = run_hci(big, eps_var=5e-2, eps_var_sched=[5e-2] * 4,
                 verbose=False)
    pt1, n1 = second_order_pt(small, r1.up, r1.dn, r1.wts[:, 0],
                              r1.energies[0], 1e-9, verbose=False)
    pt2, n2 = second_order_pt(big, r2.up, r2.dn, r2.wts[:, 0],
                              r2.energies[0], 1e-9, verbose=False)
    assert pt2 == pytest.approx(pt1, abs=1e-9)
    assert n1 == n2


def test_rdm_identical(pair):
    small, big = pair
    r1 = run_hci(small, eps_var=1e-6, eps_var_sched=[1e-6] * 10,
                 verbose=False)
    r2 = run_hci(big, eps_var=1e-6, eps_var_sched=[1e-6] * 10,
                 verbose=False)
    g1 = get_1rdm(small, r1.up, r1.dn, r1.wts[:, 0])
    g2 = get_1rdm(big, r2.up, r2.dn, r2.wts[:, 0])
    np.testing.assert_allclose(g2[:NORB, :NORB], g1, atol=1e-8)
    assert np.abs(g2[NORB:, :]).max() < 1e-12


def test_walk_identical(pair):
    """The W=2 walk (2-key fused sort, multi-word searches, padded det
    words) must follow the IDENTICAL trajectory as the W=1 walk of the
    same physics, so block energies agree to roundoff (VERDICT r1 item
    6).  Doubles-only proposals: the heat-bath draws depend only on row
    CONTENT (identical after padding), while the singles target-orbital
    alias maps the uniform stream over norb slots and cannot be
    trajectory-invariant under padding (singles correctness at W=2 is
    covered by the deterministic-limit and HCI/PT parity tests)."""
    from sqmc_tpu.algo.semistoch import build_trial_wavefunction
    from sqmc_tpu.algo.walk import WalkConfig, run_walk

    outs = []
    for sys_ in pair:
        res = run_hci(sys_, eps_var=1e-9, eps_var_sched=[1e-9] * 12,
                      max_iters=25, verbose=False)
        trial = build_trial_wavefunction(sys_, eps_var=1e-3, n_psi_t=20,
                                         n_imp=1, verbose=False)
        cfg = WalkConfig(mwalk=2048, cap_spawn=8192, norb=sys_.norb,
                         nup=NUP, ndn=NDN, n_words=sys_.n_words, tau=5e-3,
                         w_abs_target=1000.0, has_singles=False,
                         r_initiator=0.0)
        outs.append(run_walk(sys_, trial, cfg, nstep=40, nblk=3, nblk_eq=1,
                             w_abs_begin=500.0,
                             e_trial_initial=float(res.energies[0]),
                             verbose=False, seed=11,
                             max_eq_extensions=0))
    assert np.allclose(outs[0].e_blocks, outs[1].e_blocks, rtol=0, atol=1e-8)
    assert np.allclose(outs[0].w_abs_trace, outs[1].w_abs_trace,
                       rtol=1e-10, atol=1e-6)


def test_walk_deterministic_limit_w2(pair):
    """W=2 walk with singles, D = full space: exact power iteration must
    hit the FCI energy to machine precision."""
    from sqmc_tpu.algo.semistoch import build_trial_wavefunction
    from sqmc_tpu.algo.walk import WalkConfig, run_walk

    _, big = pair
    res = run_hci(big, eps_var=1e-9, eps_var_sched=[1e-9] * 12,
                  max_iters=25, verbose=False)
    trial = build_trial_wavefunction(big, eps_var=1e-9, n_psi_t=len(res.up),
                                     n_imp=len(res.up), verbose=False)
    cfg = WalkConfig(mwalk=1024, cap_spawn=4096, norb=big.norb, nup=NUP,
                     ndn=NDN, n_words=2, tau=5e-3, w_abs_target=500.0,
                     has_singles=True)
    out = run_walk(big, trial, cfg, nstep=30, nblk=2, nblk_eq=1,
                   w_abs_begin=500.0, e_trial_initial=float(res.energies[0]),
                   verbose=False)
    assert abs(out.e_mixed - float(res.energies[0])) < 1e-9
