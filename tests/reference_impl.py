"""Brute-force second-quantization reference implementations for tests.

Ground truth that is independent of Slater-Condon rules: determinants are
ordered tuples of spin orbitals, operators act with explicit fermion sign
bookkeeping.  Slow, used only on tiny systems.

Spin orbital convention (BLOCKED, matching the reference Fortran's separate
up/dn strings): spatial orbital o, spin s (0=up, 1=dn) -> so = o + s*norb.
All up spin-orbitals precede all dn ones, so fermion signs factor per spin
channel exactly as in tools.f90 permutation_factor.

H = E_core + sum_{pq,s} h[p,q] a+_{ps} a_{qs}
    + 1/2 sum_{pqrs,st} (pq|rs) a+_{ps} a+_{rt} a_{st} a_{qs}
(chemist notation).
"""

from __future__ import annotations

import numpy as np


def annihilate(occ: tuple, so: int):
    """Apply a_so to |occ> (ascending tuple). Returns (sign, new_occ) or None."""
    if so not in occ:
        return None
    idx = occ.index(so)
    sign = (-1) ** idx
    return sign, occ[:idx] + occ[idx + 1:]


def create(occ: tuple, so: int):
    """Apply a+_so. Returns (sign, new_occ) or None."""
    if so in occ:
        return None
    idx = 0
    while idx < len(occ) and occ[idx] < so:
        idx += 1
    sign = (-1) ** idx
    return sign, occ[:idx] + (so,) + occ[idx:]


def h_element(occ_i: tuple, occ_j: tuple, h: np.ndarray, eri_fn, core: float) -> float:
    """<occ_i| H |occ_j> by brute-force operator application.

    eri_fn(p,q,r,s) returns the chemist integral (pq|rs) for spatial indices.
    """
    norb = h.shape[0]
    val = core if occ_i == occ_j else 0.0

    # one-body
    for p in range(norb):
        for q in range(norb):
            if h[p, q] == 0.0:
                continue
            for s in range(2):
                r1 = annihilate(occ_j, q + s * norb)
                if r1 is None:
                    continue
                sg1, t1 = r1
                r2 = create(t1, p + s * norb)
                if r2 is None:
                    continue
                sg2, t2 = r2
                if t2 == occ_i:
                    val += sg1 * sg2 * h[p, q]

    # two-body: 1/2 sum (pq|rs) a+_ps a+_rt a_st a_qs
    for p in range(norb):
        for q in range(norb):
            for r in range(norb):
                for s_ in range(norb):
                    v = eri_fn(p, q, r, s_)
                    if v == 0.0:
                        continue
                    for s1 in range(2):
                        for s2 in range(2):
                            r1 = annihilate(occ_j, q + s1 * norb)
                            if r1 is None:
                                continue
                            sg1, t1 = r1
                            r2 = annihilate(t1, s_ + s2 * norb)
                            if r2 is None:
                                continue
                            sg2, t2 = r2
                            r3 = create(t2, r + s2 * norb)
                            if r3 is None:
                                continue
                            sg3, t3 = r3
                            r4 = create(t3, p + s1 * norb)
                            if r4 is None:
                                continue
                            sg4, t4 = r4
                            if t4 == occ_i:
                                val += 0.5 * sg1 * sg2 * sg3 * sg4 * v
    return val


def random_integrals(norb: int, seed: int = 0):
    """Random symmetric one-body + 8-fold-symmetric two-body integrals."""
    from sqmc_tpu.systems.chem.integrals import n_eri, pair_index, quad_index

    rng = np.random.default_rng(seed)
    h = rng.normal(size=(norb, norb))
    h = 0.5 * (h + h.T)
    eri = rng.normal(size=n_eri(norb))
    core = float(rng.normal())

    def eri_fn(p, q, r, s):
        return eri[quad_index(pair_index(p, q), pair_index(r, s))]

    return h, eri, core, eri_fn


def all_dets(norb: int, nup: int, ndn: int):
    """All (occ_up_tuple, occ_dn_tuple) pairs (spatial indices)."""
    from itertools import combinations

    ups = list(combinations(range(norb), nup))
    dns = list(combinations(range(norb), ndn))
    return [(u, d) for u in ups for d in dns]


def spin_orbs(occ_up: tuple, occ_dn: tuple, norb: int) -> tuple:
    """Blocked ascending spin-orbital tuple: up block then dn block."""
    return tuple(sorted([o for o in occ_up] + [o + norb for o in occ_dn]))


def dense_hamiltonian(norb, nup, ndn, h, eri_fn, core):
    """Full dense FCI Hamiltonian, brute force."""
    basis = all_dets(norb, nup, ndn)
    n = len(basis)
    H = np.zeros((n, n))
    socc = [spin_orbs(u, d, norb) for u, d in basis]
    for i in range(n):
        for j in range(i, n):
            # skip quadruple+ excitations for speed
            diff = len(set(socc[i]) - set(socc[j]))
            if diff > 2:
                continue
            H[i, j] = h_element(socc[i], socc[j], h, eri_fn, core)
            H[j, i] = H[i, j]
    return basis, H
