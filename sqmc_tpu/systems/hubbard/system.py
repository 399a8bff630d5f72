"""Hubbard model backends: momentum-space (hubbardk) and real-space
(hubbard2).

Re-design of hubbard.f90 through the unified integral interface:

  * hubbardk (ref: hamiltonian_hubbard_k:2866, generate_k_vectors:2179):
    k-lattice kx in {-Lx+2i} (shifted by -1 for odd Lx), dispersion
    eps(k) = -2t (cos(pi kx/Lx) + cos(pi ky/Ly)); on-site U becomes the
    analytic integral (pq|rs) = U/N under momentum conservation modulo
    the reciprocal lattice (2Lx, 2Ly) - umklapp included.  Spin-free
    integrals automatically cancel same-spin doubles and reproduce the
    reference's diagonal U/N*nup*ndn + sum eps.
  * hubbard2 (ref: hamiltonian_hubbard:1536): site basis, hopping h,
    on-site-only (pp|pp) = U dense integrals; all doubles vanish and the
    walk's single (hopping) channel carries the dynamics.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..base import FermionSystem
from ..chem.integrals import IntegralTable, n_eri, pair_index, quad_index
from ..heatbath import build_heatbath
from ... import dets


def hubbard_k_vectors(l_x: int, l_y: int):
    """Integer k-vectors and band energies, sorted ascending by energy
    (ref: hubbard.f90:2238-2283)."""
    kx = -l_x + 2 * np.arange(1, l_x + 1)
    ky = -l_y + 2 * np.arange(1, l_y + 1)
    if l_x % 2 == 1:
        kx = kx - 1
    if l_y % 2 == 1:
        ky = ky - 1
    KX, KY = np.meshgrid(kx, ky, indexing="ij")
    rel = np.stack([KX.ravel(), KY.ravel()], axis=1)
    t = 1.0
    if l_y == 1:
        e = -2 * t * np.cos(np.pi * rel[:, 0] / l_x)
    elif l_x == 1:
        e = -2 * t * np.cos(np.pi * rel[:, 1] / l_y)
    else:
        e = -2 * t * (np.cos(np.pi * rel[:, 0] / l_x) +
                      np.cos(np.pi * rel[:, 1] / l_y))
    order = np.argsort(e, kind="stable")
    return rel[order], e[order]


def make_hubbard_k_system(l_x: int, l_y: int, t: float, U: float, nup: int,
                          ndn: int, with_heatbath: bool = True) -> FermionSystem:
    """Momentum-space Hubbard as a FermionSystem (analytic integrals)."""
    nsites = l_x * l_y
    rel, e = hubbard_k_vectors(l_x, l_y)
    e = e * t  # energies above computed with t=1
    ubyn = U / nsites
    V = np.full((nsites, nsites), ubyn)
    h = np.diag(e)
    mod = np.array([2 * l_x, 2 * l_y])
    table = IntegralTable.from_heg(h, V, rel, mod=mod)

    hf_up = dets.det_from_orbs(range(nup), nsites)
    hf_dn = dets.det_from_orbs(range(ndn), nsites)
    hb = build_heatbath(table) if with_heatbath else None
    return FermionSystem(
        name="hubbardk", norb=nsites, nup=nup, ndn=ndn, table=table,
        heatbath=hb, orb_sym_arr=jnp.ones(nsites, jnp.int32),
        has_singles=False,  # momentum conservation kills single hops
        hf_up=hf_up, hf_dn=hf_dn,
        extra=dict(l_x=l_x, l_y=l_y, t=t, U=U, k_rel=rel, k_energies=e),
    )


def make_hubbard_dense_system(l_x: int, l_y: int, t: float, U: float,
                              nup: int, ndn: int, pbc: bool = True):
    """The reference's `hubbard` toy type: the full Hilbert-space dense
    Hamiltonian of a small real-space lattice (ref: hamiltonian_mod.f90:
    273-301, make_hubbard_matrix_2d:937), as a ToySystem for the
    dense-vector walk engine (algo/densewalk.py)."""
    import itertools
    from ..toy import ToySystem
    from ...algo.sparseham import build_sparse_ham

    sysr = make_hubbard_real_system(l_x, l_y, t, U, nup, ndn, pbc=pbc,
                                    with_heatbath=False)
    nsites = l_x * l_y
    ups = [dets.det_from_orbs(c, nsites)
           for c in itertools.combinations(range(nsites), nup)]
    dns = [dets.det_from_orbs(c, nsites)
           for c in itertools.combinations(range(nsites), ndn)]
    # det index = iup*len(dns)+idn, both spin strings in lex orbital order
    up = np.repeat(np.stack(ups), len(dns), axis=0)
    dn = np.tile(np.stack(dns), (len(ups), 1))
    sp = build_sparse_ham(sysr.table, up, dn, nup, ndn, nsites)
    n = len(up)
    ham = np.zeros((n, n))
    ham[sp.rows, sp.cols] = sp.vals
    ham[sp.cols, sp.rows] = sp.vals
    ham[np.diag_indices(n)] = sp.diag
    return ToySystem(ham=ham, kind="hubbard-dense")


def make_hubbard_real_system(l_x: int, l_y: int, t: float, U: float,
                             nup: int, ndn: int, pbc: bool = True,
                             with_heatbath: bool = True) -> FermionSystem:
    """Real-space Hubbard: hopping one-body matrix + on-site U."""
    nsites = l_x * l_y

    def site(ix, iy):
        return ix * l_y + iy

    h = np.zeros((nsites, nsites))
    for ix in range(l_x):
        for iy in range(l_y):
            for dx, dy in ((1, 0), (0, 1)):
                jx, jy = ix + dx, iy + dy
                if jx < l_x and jy < l_y:
                    h[site(ix, iy), site(jx, jy)] = -t
                    h[site(jx, jy), site(ix, iy)] = -t
                elif pbc:
                    jx %= l_x
                    jy %= l_y
                    if (dx and l_x > 2) or (dy and l_y > 2):
                        h[site(ix, iy), site(jx, jy)] = -t
                        h[site(jx, jy), site(ix, iy)] = -t

    eri = np.zeros(n_eri(nsites))
    for p in range(nsites):
        eri[quad_index(pair_index(p, p), pair_index(p, p))] = U
    table = IntegralTable.from_dense_arrays(h, eri, 0.0,
                                            np.ones(nsites, np.int32))
    hf_up = dets.det_from_orbs(range(nup), nsites)
    hf_dn = dets.det_from_orbs(range(ndn), nsites)
    hb = build_heatbath(table) if with_heatbath else None
    return FermionSystem(
        name="hubbard2", norb=nsites, nup=nup, ndn=ndn, table=table,
        heatbath=hb, orb_sym_arr=jnp.ones(nsites, jnp.int32),
        has_singles=True, hf_up=hf_up, hf_dn=hf_dn,
        extra=dict(l_x=l_x, l_y=l_y, t=t, U=U, pbc=pbc),
    )
