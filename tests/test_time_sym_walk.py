"""Time-reversal-symmetrized FCIQMC walk (ref: hamiltonian_chem_time_sym
chemistry.f90:1323; the C2 curve configs walk in the z=+1 sector).

Oracle: a small random-integral chem system whose full det space and ts
representative space are enumerable - the ts walk's mixed energy must hit
the exact ground state (identical in both bases), both in the
deterministic limit (machine precision) and stochastically.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sqmc_tpu import dets
from sqmc_tpu.systems.base import FermionSystem
from sqmc_tpu.systems.chem.integrals import IntegralTable
from sqmc_tpu.systems.heatbath import build_heatbath
from sqmc_tpu.algo.hci import run_hci
from sqmc_tpu.algo.semistoch import build_trial_wavefunction
from sqmc_tpu.algo.walk import WalkConfig, run_walk

from reference_impl import random_integrals, all_dets, spin_orbs, h_element

NORB, NUP, NDN = 6, 2, 2


@pytest.fixture(scope="module")
def ts_system():
    h, eri_flat, core, eri_fn = random_integrals(NORB, seed=3)
    table = IntegralTable.from_dense_arrays(h, eri_flat, core,
                                            np.ones(NORB, np.int32))
    hb = build_heatbath(table)
    sys_ = FermionSystem(
        name="chem", norb=NORB, nup=NUP, ndn=NDN, table=table, heatbath=hb,
        orb_sym_arr=jnp.ones(NORB, jnp.int32), has_singles=True,
        hf_up=dets.lowest_det(NUP, NORB), hf_dn=dets.lowest_det(NDN, NORB),
        extra={}, time_sym=True, z=1)

    # exact ground state of the z=+1 sector: dense ts H over the
    # enumerated representatives via the batched ts kernel
    from sqmc_tpu.systems.chem import slater
    combos = all_dets(NORB, NUP, NDN)
    ups = np.stack([dets.det_from_orbs(u, NORB) for u, d in combos])
    dns = np.stack([dets.det_from_orbs(d, NORB) for u, d in combos])
    keep = []   # representatives: (up,dn) <= (dn,up) in the fused order
    for k in range(len(combos)):
        ku = int(ups[k, 0]) << 32 | int(dns[k, 0])
        kr = int(dns[k, 0]) << 32 | int(ups[k, 0])
        if ku <= kr:
            keep.append(k)
    ups, dns = ups[keep], dns[keep]
    n = len(ups)
    bu = dets.to_bits(jnp.asarray(ups), NORB)
    bd = dets.to_bits(jnp.asarray(dns), NORB)
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    Hts = np.asarray(slater.pair_matrix_elements_time_sym(
        table, bu[ii.ravel()], bd[ii.ravel()], bu[jj.ravel()],
        bd[jj.ravel()], z=1)).reshape(n, n)
    e0 = float(np.linalg.eigvalsh(Hts)[0])
    return sys_, e0


def test_ts_hci_matches_det_basis(ts_system):
    sys_, e0 = ts_system
    res = run_hci(sys_, eps_var=1e-9, eps_var_sched=[1e-9] * 20,
                  max_iters=40, verbose=False)
    assert res.energies[0] == pytest.approx(e0, abs=1e-8)


def test_ts_walk_exact_deterministic_limit(ts_system):
    """D-space = full ts space: the walk is exact power iteration in the
    symmetrized basis."""
    sys_, e0 = ts_system
    res = run_hci(sys_, eps_var=1e-9, eps_var_sched=[1e-9] * 20,
                  max_iters=40, verbose=False)
    trial = build_trial_wavefunction(sys_, eps_var=1e-9,
                                     n_psi_t=len(res.up),
                                     n_imp=len(res.up), verbose=False)
    cfg = WalkConfig(mwalk=1024, cap_spawn=4096, norb=NORB, nup=NUP,
                     ndn=NDN, n_words=1, tau=5e-3, w_abs_target=500.0,
                     has_singles=True, time_sym=True, z=1)
    out = run_walk(sys_, trial, cfg, nstep=30, nblk=2, nblk_eq=1,
                   w_abs_begin=500.0, e_trial_initial=e0, verbose=False)
    assert abs(out.e_mixed - e0) < 1e-9


def test_ts_walk_stochastic_unbiased(ts_system):
    """Stochastic ts spawning (representative mapping, sqrt2 norms, z sign
    flips, diagonal cross term) must stay unbiased."""
    sys_, e0 = ts_system
    trial = build_trial_wavefunction(sys_, eps_var=1e-3, n_psi_t=30,
                                     n_imp=1, verbose=False)
    cfg = WalkConfig(mwalk=4096, cap_spawn=16384, norb=NORB, nup=NUP,
                     ndn=NDN, n_words=1, tau=5e-3, w_abs_target=2000.0,
                     has_singles=True, r_initiator=0.0, time_sym=True, z=1)
    out = run_walk(sys_, trial, cfg, nstep=100, nblk=6, nblk_eq=3,
                   w_abs_begin=1000.0, e_trial_initial=e0, verbose=False)
    tol = 6 * max(out.e_err, 5e-6) + 5e-5
    assert abs(out.e_mixed - e0) < tol
