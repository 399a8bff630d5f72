"""Integral storage with a uniform batched-lookup interface.

Two backends behind one dataclass:

  * dense: molecular integrals in the 8-fold-symmetric compact array
    (ref: chemistry.f90:538 read_integrals, :9106 integral_index), replicated
    in each chip's HBM (TPU mapping P3 of SURVEY.md 2.4);
  * analytic HEG: plane-wave orbitals are complex, so 8-fold symmetry does
    NOT hold ((pq|rs) != (qp|rs)); instead (pq|rs) = V(k_p-k_q) under
    momentum conservation is evaluated on the fly from O(norb^2) tables
    (the reference computes these in hamiltonian_heg:845 the same way).

Derived dense matrices turn diagonal elements into MXU matmuls:
D[p,q]=(pp|qq), X[p,q]=(pq|qp), and the single-excitation tensors
sing_dir[(p,r),q]=(pr|qq), sing_exch[(p,r),q]=(pq|qr).

Conventions: 0-based orbital indices; chemist notation (pq|rs).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def pair_index(a, b):
    """Compact symmetric pair index, 0-based: max*(max+1)//2 + min."""
    hi = np.maximum(a, b)
    lo = np.minimum(a, b)
    return hi * (hi + 1) // 2 + lo


def pair_index_jnp(a, b):
    hi = jnp.maximum(a, b).astype(jnp.int64)
    lo = jnp.minimum(a, b).astype(jnp.int64)
    return hi * (hi + 1) // 2 + lo


def quad_index(pq, rs):
    hi = np.maximum(pq, rs)
    lo = np.minimum(pq, rs)
    return hi * (hi + 1) // 2 + lo


def quad_index_jnp(pq, rs):
    hi = jnp.maximum(pq, rs).astype(jnp.int64)
    lo = jnp.minimum(pq, rs).astype(jnp.int64)
    return hi * (hi + 1) // 2 + lo


def n_eri(norb: int) -> int:
    npair = norb * (norb + 1) // 2
    return npair * (npair + 1) // 2


@dataclasses.dataclass
class IntegralTable:
    """All integrals for one system, ready for device use.

    Dense backend: `eri` holds the compact two-electron array.
    HEG backend: `eri` is None; `heg_V` [norb,norb] holds V(k_p-k_q) and
    `heg_rel` [norb,dim] the integer k-vectors.
    """

    norb: int
    core_energy: float
    h: jnp.ndarray
    orb_sym: np.ndarray
    direct: jnp.ndarray
    exchange: jnp.ndarray
    eri: jnp.ndarray | None = None
    sing_dir: jnp.ndarray | None = None
    sing_exch: jnp.ndarray | None = None
    heg_V: jnp.ndarray | None = None
    heg_rel: jnp.ndarray | None = None
    heg_mod: jnp.ndarray | None = None   # modular momentum conservation
                                         # (Hubbard-k umklapp); None = exact

    # ------------------------------------------------------------------
    @staticmethod
    def from_dense_arrays(h: np.ndarray, eri_compact: np.ndarray, core: float,
                          orb_sym: np.ndarray) -> "IntegralTable":
        norb = h.shape[0]
        p = np.arange(norb)
        diag_pair = pair_index(p, p)
        D = eri_compact[quad_index(diag_pair[:, None], diag_pair[None, :])]
        pq = pair_index(p[:, None], p[None, :])
        X = eri_compact[quad_index(pq, pq)]
        P, R, Q = np.meshgrid(p, p, p, indexing="ij")
        sd = eri_compact[quad_index(pair_index(P, R), pair_index(Q, Q))]
        se = eri_compact[quad_index(pair_index(P, Q), pair_index(Q, R))]
        return IntegralTable(
            norb=norb, core_energy=float(core),
            h=jnp.asarray(h, dtype=jnp.float64),
            orb_sym=np.asarray(orb_sym, dtype=np.int32),
            direct=jnp.asarray(D), exchange=jnp.asarray(X),
            eri=jnp.asarray(eri_compact, dtype=jnp.float64),
            sing_dir=jnp.asarray(sd.reshape(norb * norb, norb)),
            sing_exch=jnp.asarray(se.reshape(norb * norb, norb)),
        )

    @staticmethod
    def from_heg(h: np.ndarray, V: np.ndarray, k_rel: np.ndarray,
                 mod: np.ndarray | None = None) -> "IntegralTable":
        """Momentum-space system with (pq|rs) = V[p,q] under (optionally
        modular) momentum conservation.  For jellium V has a zero diagonal
        (background cancels the q=0 component); for Hubbard-k V = U/N
        everywhere and `mod` enables umklapp.  Derived matrices:
        D[p,q] = (pp|qq) = V[p,p] (conservation trivially holds),
        X[p,q] = (pq|qp) = V[p,q]."""
        norb = h.shape[0]
        D = np.broadcast_to(np.diag(V)[:, None], (norb, norb)).copy()
        X = V.copy()
        return IntegralTable(
            norb=norb, core_energy=0.0,
            h=jnp.asarray(h, dtype=jnp.float64),
            orb_sym=np.ones(norb, dtype=np.int32),
            direct=jnp.asarray(D),
            exchange=jnp.asarray(X),
            heg_V=jnp.asarray(V), heg_rel=jnp.asarray(k_rel.astype(np.int32)),
            heg_mod=None if mod is None else jnp.asarray(mod.astype(np.int32)),
        )

    # ------------------------------------------------------------------
    def eri_value(self, p, q, r, s):
        """(pq|rs) for batched jnp index arrays (0-based)."""
        if self.eri is not None:
            return self.eri[quad_index_jnp(pair_index_jnp(p, q),
                                           pair_index_jnp(r, s))]
        # analytic: nonzero iff k_p - k_q == k_s - k_r (mod heg_mod)
        rel = self.heg_rel
        d = rel[p] - rel[q] + rel[r] - rel[s]
        if self.heg_mod is not None:
            d = d % self.heg_mod
        conserve = jnp.all(d == 0, axis=-1)
        return jnp.where(conserve, self.heg_V[p, q], 0.0)

    def eri_value_np(self, p, q, r, s):
        """Host (numpy) version of eri_value, same semantics."""
        if self.eri is not None:
            eri = np.asarray(self.eri)
            return eri[quad_index(pair_index(np.asarray(p), np.asarray(q)),
                                  pair_index(np.asarray(r), np.asarray(s)))]
        rel = np.asarray(self.heg_rel)
        V = np.asarray(self.heg_V)
        d = rel[p] - rel[q] + rel[r] - rel[s]
        if self.heg_mod is not None:
            d = d % np.asarray(self.heg_mod)
        conserve = np.all(d == 0, axis=-1)
        return np.where(conserve, V[p, q], 0.0)

    def h_np(self):
        return np.asarray(self.h)


# orb_sym is stored as a tuple in the static aux data so pytree metadata
# stays hashable (jit cache keys compare aux by equality)
jax.tree_util.register_pytree_node(
    IntegralTable,
    lambda t: ((t.h, t.direct, t.exchange, t.eri, t.sing_dir, t.sing_exch,
                t.heg_V, t.heg_rel, t.heg_mod),
               (t.norb, t.core_energy, tuple(np.asarray(t.orb_sym).tolist()))),
    lambda aux, ch: IntegralTable(norb=aux[0], core_energy=aux[1],
                                  orb_sym=np.asarray(aux[2], dtype=np.int32),
                                  h=ch[0], direct=ch[1],
                                  exchange=ch[2], eri=ch[3], sing_dir=ch[4],
                                  sing_exch=ch[5], heg_V=ch[6], heg_rel=ch[7],
                                  heg_mod=ch[8]),
)
