"""Molecular integral storage with 8-fold-symmetric compact indexing.

Replaces the reference's node-shared flat `integrals(...)` array
(ref: chemistry.f90:538 read_integrals, :9106 integral_index) with a
device-resident float64 HBM array replicated per chip (TPU mapping P3 of
SURVEY.md section 2.4) plus small dense derived matrices that turn the
diagonal-element double loops into MXU matmuls.

Conventions: 0-based orbital indices everywhere.  The two-electron integral
(pq|rs) is in chemist notation, symmetric under p<->q, r<->s, (pq)<->(rs)
- exactly the FCIDUMP symmetry.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def pair_index(a, b):
    """Compact symmetric pair index, 0-based: max(a,b)*(max+1)//2 + min."""
    hi = np.maximum(a, b) if isinstance(a, np.ndarray) or isinstance(b, np.ndarray) else max(a, b)
    lo = np.minimum(a, b) if isinstance(a, np.ndarray) or isinstance(b, np.ndarray) else min(a, b)
    return hi * (hi + 1) // 2 + lo


def pair_index_jnp(a, b):
    hi = jnp.maximum(a, b).astype(jnp.int64)
    lo = jnp.minimum(a, b).astype(jnp.int64)
    return hi * (hi + 1) // 2 + lo


def quad_index(pq, rs):
    """Compact index of ((pq)|(rs)) from two pair indices (host/np)."""
    hi = np.maximum(pq, rs)
    lo = np.minimum(pq, rs)
    return hi * (hi + 1) // 2 + lo


def quad_index_jnp(pq, rs):
    hi = jnp.maximum(pq, rs).astype(jnp.int64)
    lo = jnp.minimum(pq, rs).astype(jnp.int64)
    return hi * (hi + 1) // 2 + lo


@dataclasses.dataclass
class IntegralTable:
    """All molecular integrals for one system, ready for device use.

    Attributes:
      norb: number of spatial orbitals
      core_energy: nuclear-nuclear (+frozen-core) constant
      h: one-body integrals, dense float64 [norb, norb]
      eri: two-body integrals, compact 8-fold float64 [npair*(npair+1)//2]
      orb_sym: orbital irrep labels int32 [norb] (1-based, as in FCIDUMP)
      direct: D[p,q] = (pp|qq)  float64 [norb, norb]
      exchange: X[p,q] = (pq|qp) float64 [norb, norb]
    """

    norb: int
    core_energy: float
    h: jnp.ndarray
    eri: jnp.ndarray
    orb_sym: np.ndarray
    direct: jnp.ndarray
    exchange: jnp.ndarray

    @staticmethod
    def from_dense_arrays(h: np.ndarray, eri_compact: np.ndarray, core: float,
                          orb_sym: np.ndarray) -> "IntegralTable":
        norb = h.shape[0]
        p = np.arange(norb)
        diag_pair = pair_index(p, p)  # [norb]
        # D[p,q] = (pp|qq)
        D = eri_compact[quad_index(diag_pair[:, None], diag_pair[None, :])]
        # X[p,q] = (pq|qp)
        pq = pair_index(p[:, None], p[None, :])
        X = eri_compact[quad_index(pq, pq)]
        return IntegralTable(
            norb=norb,
            core_energy=float(core),
            h=jnp.asarray(h, dtype=jnp.float64),
            eri=jnp.asarray(eri_compact, dtype=jnp.float64),
            orb_sym=np.asarray(orb_sym, dtype=np.int32),
            direct=jnp.asarray(D, dtype=jnp.float64),
            exchange=jnp.asarray(X, dtype=jnp.float64),
        )

    def eri_value(self, p, q, r, s):
        """(pq|rs) for batched jnp index arrays (0-based)."""
        return self.eri[quad_index_jnp(pair_index_jnp(p, q), pair_index_jnp(r, s))]

    # numpy-side access for host code / tests
    def eri_np(self):
        return np.asarray(self.eri)

    def h_np(self):
        return np.asarray(self.h)


jax.tree_util.register_pytree_node(
    IntegralTable,
    lambda t: ((t.h, t.eri, t.direct, t.exchange),
               (t.norb, t.core_energy, t.orb_sym)),
    lambda aux, ch: IntegralTable(norb=aux[0], core_energy=aux[1],
                                  orb_sym=aux[2], h=ch[0], eri=ch[1],
                                  direct=ch[2], exchange=ch[3]),
)


def n_eri(norb: int) -> int:
    npair = norb * (norb + 1) // 2
    return npair * (npair + 1) // 2
