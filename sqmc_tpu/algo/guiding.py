"""Guiding wavefunctions for importance-sampled / fixed-node determinant
walks.

The reference evaluates guiding-wavefunction ratios per proposed move
(Gutzwiller x free-fermion determinant ratios via Sherman-Morrison,
hubbard.f90 det_ratio_hubbard:4346; trial-wavefunction files for the toy
models, read_psit hamiltonian_mod.f90:1299).  The TPU walk instead
evaluates psi_g on whole BATCHES of determinants: batched k x k
determinants (cofactor formulas for k <= 4, LU otherwise) plus a
Gutzwiller double-occupancy factor, or a sorted-table lookup.

psi_g is SIGNED; the fixed-node rules test the sign of the
importance-transformed flow Ht_ij = (psi_g_i / psi_g_j) H_ij, which is
independent of any global sign convention (ref run_type dispatch
do_walk.f90:38-50, move variants :3460-4748).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import dets


class Guiding(NamedTuple):
    """Device-side guiding-wavefunction data (pytree).

    kind (static, lives in WalkConfig.guiding):
      'gutzwiller': psi_g(D) = det(phi_up[occ_up]) * det(phi_dn[occ_dn])
                    * g^n_double
      'table':      psi_g from a sorted complete det table (toy systems)
    """
    phi_up: jnp.ndarray     # [norb, nup]
    phi_dn: jnp.ndarray     # [norb, ndn]
    g: jnp.ndarray          # scalar Gutzwiller factor
    tab_up: jnp.ndarray     # [n, W] sorted packed dets ('table')
    tab_dn: jnp.ndarray
    tab_val: jnp.ndarray    # [n]


def empty_guiding() -> Guiding:
    z = jnp.zeros((1, 1))
    zu = jnp.zeros((1, 1), jnp.uint64)
    return Guiding(phi_up=z, phi_dn=z, g=jnp.asarray(1.0),
                   tab_up=zu, tab_dn=zu, tab_val=jnp.zeros(1))


def make_gutzwiller_guiding(system, g: float = 1.0, phi_up=None,
                            phi_dn=None) -> Guiding:
    """Free-fermion x Gutzwiller guiding from the one-body hamiltonian's
    lowest orbitals (ref: wf_type 'gutz' hubbard.f90 set_gutzwiller:1432).

    Degenerate Fermi levels make the Slater part ill-conditioned; callers
    should pass UHF orbitals (systems.hubbard.meanfield.hartree_fock) or
    pick fillings with a gap.
    """
    h = np.asarray(system.table.h)
    if phi_up is None or phi_dn is None:
        _, v = np.linalg.eigh(h)
        phi_up = v[:, :system.nup] if phi_up is None else phi_up
        phi_dn = v[:, :system.ndn] if phi_dn is None else phi_dn
    e = empty_guiding()
    return e._replace(phi_up=jnp.asarray(np.asarray(phi_up, np.float64)),
                      phi_dn=jnp.asarray(np.asarray(phi_dn, np.float64)),
                      g=jnp.asarray(float(g)))


def make_table_guiding(up: np.ndarray, dn: np.ndarray,
                       values: np.ndarray) -> Guiding:
    """Guiding from explicit per-det values (complete toy det spaces;
    ref read_psit).  The table is sorted on construction."""
    from ..ops import setalg
    order = setalg.lexsort_dets(up, dn)
    e = empty_guiding()
    return e._replace(tab_up=jnp.asarray(up[order]),
                      tab_dn=jnp.asarray(dn[order]),
                      tab_val=jnp.asarray(np.asarray(values,
                                                     np.float64)[order]))


def _batched_det(mats: jnp.ndarray) -> jnp.ndarray:
    """det of [..., k, k] float64; explicit cofactor expansion for k <= 4
    (pure VPU arithmetic - no LU on the hot path), jnp.linalg.det beyond."""
    k = mats.shape[-1]
    m = mats
    if k == 1:
        return m[..., 0, 0]
    if k == 2:
        return m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
    if k == 3:
        return (m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2]
                                - m[..., 1, 2] * m[..., 2, 1])
                - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2]
                                  - m[..., 1, 2] * m[..., 2, 0])
                + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1]
                                  - m[..., 1, 1] * m[..., 2, 0]))
    if k == 4:
        def det3(rows, cols):
            sub = m[..., rows, :][..., :, cols]
            return (sub[..., 0, 0] * (sub[..., 1, 1] * sub[..., 2, 2]
                                      - sub[..., 1, 2] * sub[..., 2, 1])
                    - sub[..., 0, 1] * (sub[..., 1, 0] * sub[..., 2, 2]
                                        - sub[..., 1, 2] * sub[..., 2, 0])
                    + sub[..., 0, 2] * (sub[..., 1, 0] * sub[..., 2, 1]
                                        - sub[..., 1, 1] * sub[..., 2, 0]))
        r = (1, 2, 3)
        return (m[..., 0, 0] * det3(r, (1, 2, 3))
                - m[..., 0, 1] * det3(r, (0, 2, 3))
                + m[..., 0, 2] * det3(r, (0, 1, 3))
                - m[..., 0, 3] * det3(r, (0, 1, 2)))
    return jnp.linalg.det(m)


def eval_guiding(guide: Guiding, kind: str, up: jnp.ndarray,
                 dn: jnp.ndarray, norb: int, nup: int,
                 ndn: int) -> jnp.ndarray:
    """Batched signed psi_g for packed dets [B, W] -> [B] float64."""
    if kind == "gutzwiller":
        bits_up = dets.to_bits(up, norb)
        bits_dn = dets.to_bits(dn, norb)
        occ_up = dets.occ_orbitals(bits_up, nup)
        occ_dn = dets.occ_orbitals(bits_dn, ndn)
        det_up = _batched_det(guide.phi_up[occ_up])
        det_dn = _batched_det(guide.phi_dn[occ_dn])
        ndouble = dets.popcount(up & dn).astype(jnp.float64)
        return det_up * det_dn * guide.g ** ndouble
    if kind == "table":
        from .walk import _searchsorted_dets
        idx = _searchsorted_dets(guide.tab_up, guide.tab_dn, up, dn, norb)
        n = guide.tab_val.shape[0]
        v = guide.tab_val[jnp.clip(idx, 0, n - 1)]
        return jnp.where(idx >= 0, v, 0.0)
    raise ValueError(f"unknown guiding kind {kind!r}")


def eval_guiding_np(guide: Guiding, kind: str, up: np.ndarray,
                    dn: np.ndarray, norb: int, nup: int,
                    ndn: int) -> np.ndarray:
    """Host-side psi_g (table construction, initial populations)."""
    if kind == "gutzwiller":
        phi_up = np.asarray(guide.phi_up)
        phi_dn = np.asarray(guide.phi_dn)
        g = float(guide.g)
        out = np.empty(len(up))
        for i in range(len(up)):
            ou = dets.orbs_from_det(up[i], norb)
            od = dets.orbs_from_det(dn[i], norb)
            nd = len(set(ou) & set(od))
            out[i] = (np.linalg.det(phi_up[ou]) * np.linalg.det(phi_dn[od])
                      * g ** nd)
        return out
    if kind == "table":
        from ..ops import setalg
        tu = np.asarray(guide.tab_up)
        td = np.asarray(guide.tab_dn)
        tv = np.asarray(guide.tab_val)
        out = np.zeros(len(up))
        for i in range(len(up)):
            m = np.all(tu == up[i], axis=1) & np.all(td == dn[i], axis=1)
            j = np.nonzero(m)[0]
            if len(j):
                out[i] = tv[j[0]]
        return out
    raise ValueError(f"unknown guiding kind {kind!r}")
