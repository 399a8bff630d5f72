"""Exponential (continuous-time) projector on the determinant walk
(ref: use_exponential_projector card, move_uniform_exponential_projector
do_walk.f90:3803).  CT propagation has NO time-step error, so the walk is
run at a tau far beyond the linear propagator's stability range and must
still reproduce the FCI energy."""

import itertools

import numpy as np
import pytest

from sqmc_tpu import dets as dets_mod
from sqmc_tpu.systems.hubbard.system import make_hubbard_k_system
from sqmc_tpu.algo.semistoch import build_trial_wavefunction
from sqmc_tpu.algo.walk import (WalkConfig, build_walk_tables, run_walk)


@pytest.fixture(scope="module")
def hub22():
    hub = make_hubbard_k_system(2, 2, t=1.0, U=4.0, nup=2, ndn=2)
    from sqmc_tpu.algo.sparseham import build_sparse_ham
    from sqmc_tpu.algo.davidson import davidson
    ups = [dets_mod.det_from_orbs(c, hub.norb)
           for c in itertools.combinations(range(hub.norb), 2)]
    up = np.repeat(np.stack(ups), len(ups), axis=0)
    dn = np.tile(np.stack(ups), (len(ups), 1))
    H = build_sparse_ham(hub.table, up, dn, 2, 2, hub.norb)
    e0 = float(davidson(H, n_states=1)[0][0])
    return hub, e0


def test_kmap3_momentum_conservation(hub22):
    """s = kmap3[p,q,r] satisfies k_s = k_p + k_q - k_r mod the
    reciprocal lattice, for every (p,q,r)."""
    hub, _ = hub22
    cfg = WalkConfig(mwalk=64, cap_spawn=128, norb=hub.norb, nup=2, ndn=2,
                     n_words=1, tau=0.05, w_abs_target=100.0,
                     has_singles=False, semistochastic=False,
                     use_exponential_projector=True)
    trial = build_trial_wavefunction(hub, eps_var=1e-6, n_psi_t=4, n_imp=1,
                                     verbose=False)
    tables = build_walk_tables(hub, trial, cfg=cfg)
    kmap3 = np.asarray(tables.kmap3).reshape(hub.norb, hub.norb, hub.norb)
    rel = np.asarray(hub.extra["k_rel"])
    mod = np.array([2 * hub.extra["l_x"], 2 * hub.extra["l_y"]])
    for p in range(hub.norb):
        for q in range(hub.norb):
            for r in range(hub.norb):
                s = kmap3[p, q, r]
                d = rel[p] + rel[q] - rel[r] - rel[s]
                assert np.all(d % mod == 0), (p, q, r, s)
    assert float(tables.ct_rate) == pytest.approx(
        2 * 2 * (hub.norb - 2) * 4.0 / hub.norb)


def test_ct_walk_unbiased_at_large_tau(hub22):
    """Stationary mixed energy equals FCI at tau=0.05 - an order of
    magnitude beyond where the linear projector's O(tau) bias and
    stability allow (the linear walk tests run tau=5e-3)."""
    hub, e0 = hub22
    trial = build_trial_wavefunction(hub, eps_var=1e-6, n_psi_t=36, n_imp=1,
                                     verbose=False)
    cfg = WalkConfig(mwalk=4096, cap_spawn=16384, norb=hub.norb, nup=2,
                     ndn=2, n_words=1, tau=0.05, w_abs_target=2000.0,
                     has_singles=False, r_initiator=0.0,
                     semistochastic=False, use_exponential_projector=True)
    out = run_walk(hub, trial, cfg, nstep=60, nblk=6, nblk_eq=3,
                   w_abs_begin=1000.0, e_trial_initial=e0,
                   verbose=False, max_eq_extensions=0)
    assert abs(out.e_mixed - e0) < 6 * max(out.e_err, 5e-6) + 1e-4


def test_ct_mode_system_validation():
    """ct_mode must match the system (the default 'hubbardk' on a HEG
    raises with a pointer to the right mode; 'generic' on hubbardk
    raises; 'heg' on hubbardk raises)."""
    from sqmc_tpu.systems.heg.system import make_heg_system
    sys_ = make_heg_system(3, 1.0, 4, 2, 1.6)
    trial = build_trial_wavefunction(sys_, eps_var=1e-3, n_psi_t=4, n_imp=1,
                                     verbose=False)
    cfg = WalkConfig(mwalk=64, cap_spawn=128, norb=sys_.norb, nup=2, ndn=2,
                     n_words=1, tau=0.05, w_abs_target=100.0,
                     has_singles=False, semistochastic=False,
                     use_exponential_projector=True)
    with pytest.raises(NotImplementedError):
        build_walk_tables(sys_, trial, cfg=cfg)

    hub = make_hubbard_k_system(2, 2, t=1.0, U=4.0, nup=2, ndn=2)
    trial_h = build_trial_wavefunction(hub, eps_var=1e-6, n_psi_t=4, n_imp=1,
                                       verbose=False)
    for bad in ("heg", "generic"):
        cfg_h = WalkConfig(mwalk=64, cap_spawn=128, norb=hub.norb, nup=2,
                           ndn=2, n_words=1, tau=0.05, w_abs_target=100.0,
                           has_singles=False, semistochastic=False,
                           use_exponential_projector=True, ct_mode=bad)
        with pytest.raises(NotImplementedError):
            build_walk_tables(hub, trial_h, cfg=cfg_h)


@pytest.fixture(scope="module")
def heg4():
    from sqmc_tpu.systems.heg.system import make_heg_system
    from sqmc_tpu.algo.hci import run_hci
    sys_ = make_heg_system(3, 1.0, 4, 2, 1.6)
    res = run_hci(sys_, eps_var=1e-9, eps_var_sched=[1e-9] * 30,
                  max_iters=60, verbose=False)
    return sys_, float(res.energies[0])


def test_ct_heg_momentum_map(heg4):
    """heg kmap3: s satisfies k_s = k_p + k_q - k_r exactly (no folding);
    -1 exactly when the conserving target lies outside the cutoff."""
    sys_, _ = heg4
    cfg = WalkConfig(mwalk=64, cap_spawn=128, norb=sys_.norb, nup=2, ndn=2,
                     n_words=1, tau=0.05, w_abs_target=100.0,
                     has_singles=False, semistochastic=False,
                     use_exponential_projector=True, ct_mode="heg")
    trial = build_trial_wavefunction(sys_, eps_var=1e-3, n_psi_t=4, n_imp=1,
                                     verbose=False)
    tables = build_walk_tables(sys_, trial, cfg=cfg)
    rel = np.asarray(sys_.extra["k_rel"])
    lut = {tuple(v): i for i, v in enumerate(rel.tolist())}
    kmap3 = np.asarray(tables.kmap3).reshape(sys_.norb, sys_.norb, sys_.norb)
    rng = np.random.default_rng(0)
    for _ in range(200):
        p, q, r = rng.integers(0, sys_.norb, 3)
        want = lut.get(tuple(rel[p] + rel[q] - rel[r]), -1)
        assert kmap3[p, q, r] == want
    assert float(tables.ct_rate) > 0.0


def test_ct_heg_unbiased_at_large_tau(heg4):
    """CT walk on the HEG (exact analytic elements in the jump factors)
    reproduces FCI at tau an order of magnitude beyond the linear
    projector's range - the ct_mode='heg' generalization the reference
    never ran (its exponential projector is hubbardk-hardwired,
    do_walk.f90:3849)."""
    sys_, e0 = heg4
    trial = build_trial_wavefunction(sys_, eps_var=1e-4, n_psi_t=30,
                                     n_imp=1, verbose=False)
    cfg = WalkConfig(mwalk=4096, cap_spawn=16384, norb=sys_.norb, nup=2,
                     ndn=2, n_words=1, tau=0.02, w_abs_target=2000.0,
                     has_singles=False, r_initiator=0.0,
                     semistochastic=False, use_exponential_projector=True,
                     ct_mode="heg")
    out = run_walk(sys_, trial, cfg, nstep=60, nblk=6, nblk_eq=3,
                   w_abs_begin=1000.0, e_trial_initial=e0,
                   verbose=False, max_eq_extensions=0)
    assert abs(out.e_mixed - e0) < 6 * max(out.e_err, 5e-6) + 2e-4


def test_ct_generic_chem_unbiased_at_large_tau():
    """CT walk with the generic uniform singles+doubles move (exact
    signed chem elements) reproduces FCI on a random-integral system
    WITH singles - beyond the reference (see test above)."""
    import itertools
    import jax.numpy as jnp
    from sqmc_tpu.systems.base import FermionSystem
    from sqmc_tpu.systems.chem.integrals import IntegralTable, n_eri
    from sqmc_tpu.systems.heatbath import build_heatbath
    from sqmc_tpu.algo.sparseham import build_sparse_ham
    from sqmc_tpu.algo.davidson import davidson

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
        hf_up=dets_mod.det_from_orbs([0, 1], norb),
        hf_dn=dets_mod.det_from_orbs([0, 1], norb), extra={})

    ups = [dets_mod.det_from_orbs(c, norb)
           for c in itertools.combinations(range(norb), 2)]
    up = np.repeat(np.stack(ups), len(ups), axis=0)
    dn = np.tile(np.stack(ups), (len(ups), 1))
    H = build_sparse_ham(sys_.table, up, dn, 2, 2, norb)
    e0 = float(davidson(H, n_states=1)[0][0])

    trial = build_trial_wavefunction(sys_, eps_var=1e-6, n_psi_t=30,
                                     n_imp=1, verbose=False)
    cfg = WalkConfig(mwalk=4096, cap_spawn=16384, norb=norb, nup=2, ndn=2,
                     n_words=1, tau=0.05, w_abs_target=2000.0,
                     has_singles=True, r_initiator=0.0,
                     semistochastic=False, use_exponential_projector=True,
                     ct_mode="generic")
    out = run_walk(sys_, trial, cfg, nstep=60, nblk=6, nblk_eq=3,
                   w_abs_begin=1000.0, e_trial_initial=e0,
                   verbose=False, max_eq_extensions=0)
    assert abs(out.e_mixed - e0) < 6 * max(out.e_err, 5e-6) + 2e-4
