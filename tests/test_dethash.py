"""Cuckoo det-hash lookup == sorted-list search (ops/dethash.py, r4h).

The hash replaces walk._searchsorted_dets for the per-generation fresh-
det C(T) lookup; the contract is exact index-or-minus-one equality on
hits, misses, and duplicate queries, for both the fused norb<=32 layout
and the multi-word (norb>32) plane layout.  (Ref: the reference's own
det maps are open-hash tables, fhash_module.f90; results must equal the
binary search it uses for psi_t_connected.)
"""

import numpy as np
import pytest

from sqmc_tpu.ops.dethash import build_det_hash, lookup_det_hash
from sqmc_tpu.algo.walk import _searchsorted_dets


def _rand_dets(rng, n, norb, nup, W):
    rows = set()
    while len(rows) < n:
        orbs = tuple(sorted(rng.choice(norb, nup, replace=False)))
        rows.add(orbs)
    rows = sorted(rows)
    out = np.zeros((len(rows), W), np.uint64)
    for i, orbs in enumerate(rows):
        for o in orbs:
            out[i, o // 64] |= np.uint64(1) << np.uint64(o % 64)
    return out


@pytest.mark.parametrize("norb,W", [(26, 1), (60, 1), (90, 2)])
def test_hash_matches_search(norb, W):
    rng = np.random.default_rng(7)
    n, q = 3000, 700
    up = _rand_dets(rng, n, norb, 6, W)
    dn = _rand_dets(rng, n, norb, 6, W)
    # sort in the fused det order the search expects
    from sqmc_tpu.ops import setalg
    order = np.asarray(setalg.lexsort_dets(up, dn))
    up, dn = up[order], dn[order]

    table = build_det_hash(up, dn, norb)
    qi = rng.integers(0, n, q)
    q_up, q_dn = up[qi].copy(), dn[qi].copy()
    # corrupt half the queries into (very likely) misses
    miss = rng.random(q) < 0.5
    q_up[miss, 0] ^= np.uint64(0b11)

    import jax.numpy as jnp
    got = np.asarray(lookup_det_hash(jnp.asarray(table), jnp.asarray(q_up),
                                     jnp.asarray(q_dn), norb))
    want = np.asarray(_searchsorted_dets(jnp.asarray(up), jnp.asarray(dn),
                                         jnp.asarray(q_up),
                                         jnp.asarray(q_dn), norb))
    np.testing.assert_array_equal(got, want)
    # every non-corrupted query is a guaranteed hit at its own index
    np.testing.assert_array_equal(got[~miss], qi[~miss])


def test_walk_trajectory_bitwise_invariant():
    """det_hash=True must be a pure data-movement change: same C(T)
    indices -> bitwise-identical walk trajectories and estimators."""
    from sqmc_tpu.systems.heg.system import make_heg_system
    from sqmc_tpu.algo.semistoch import build_trial_wavefunction
    from sqmc_tpu.algo.walk import WalkConfig, run_walk

    sys_ = make_heg_system(3, 1.0, 4, 2, 1.6)
    trial = build_trial_wavefunction(sys_, eps_var=1e-3, n_psi_t=30,
                                     n_imp=8, verbose=False)
    outs = []
    for flag in (False, True):
        cfg = WalkConfig(mwalk=2048, cap_spawn=8192, norb=sys_.norb,
                         nup=2, ndn=2, n_words=1, tau=5e-3,
                         w_abs_target=800.0, has_singles=False,
                         det_hash=flag)
        outs.append(run_walk(sys_, trial, cfg, nstep=25, nblk=2, nblk_eq=1,
                             w_abs_begin=500.0, e_trial_initial=-1.0,
                             verbose=False))
    assert outs[0].e_mixed == outs[1].e_mixed
    np.testing.assert_array_equal(outs[0].w_abs_trace, outs[1].w_abs_trace)
    np.testing.assert_array_equal(outs[0].nwalk_trace, outs[1].nwalk_trace)


def test_build_rejects_nothing_small():
    # 1-det and 0-det edge cases round-trip
    up = np.array([[0b111]], np.uint64)
    dn = np.array([[0b1011]], np.uint64)
    t = build_det_hash(up, dn, 26)
    import jax.numpy as jnp
    got = lookup_det_hash(jnp.asarray(t), jnp.asarray(up), jnp.asarray(dn),
                          26)
    assert int(got[0]) == 0
