"""Zeroth-order variational Green's function G0(w).

Re-design of get_zeroth_order_variational_greens_function
(ref: hci.f90:3849): the (N+/-1)-space zeroth-order Hamiltonian is taken
diagonal, so no linear solves are needed:

  G0(w,p,q)     = G0_np1(w,p,q) + G0_nm1(w,p,q)
  G0_np1(w,p,q) = <var| a_p 1/(w - (H0 - E0)) a+_q |var>
  G0_nm1(w,p,q) = <var| a+_p 1/(w - (E0 - H0)) a_q |var>

spin-summed, with proper fermion signs in the blocked (up-then-dn) spin
ordering.  Batched over dets; diagonal elements evaluate on device.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import dets as dets_mod
from ..ops import setalg
from ..systems.chem import slater


def _sign_before(bits: np.ndarray, orb: np.ndarray) -> np.ndarray:
    """(-1)^(# occupied below orb) for creation/annihilation in one spin
    channel (blocked ordering keeps channels independent)."""
    pref = np.cumsum(bits, axis=1) - bits
    cnt = pref[np.arange(len(bits)), orb]
    return np.where(cnt % 2 == 0, 1.0, -1.0)


def greens_function_g0(system, up, dn, wts, e0: float, w: np.ndarray,
                       eta: float = 0.0):
    """Returns (G0_np1, G0_nm1), each complex128 [n_w, norb, norb]
    (imaginary broadening eta; eta=0 gives the real principal values as in
    the reference)."""
    norb = system.norb
    n = len(up)
    n_w = len(w)
    table = system.table
    bu = np.asarray(dets_mod.to_bits(jnp.asarray(up), norb))
    bd = np.asarray(dets_mod.to_bits(jnp.asarray(dn), norb))
    wz = w + 1j * eta if eta else w.astype(np.complex128)

    G_np1 = np.zeros((n_w, norb, norb), np.complex128)
    G_nm1 = np.zeros((n_w, norb, norb), np.complex128)

    for spin, (bits, other, pack_up) in enumerate(
            [(bu, bd, True), (bd, bu, False)]):
        # ---- N+1: create q (unoccupied), diag, annihilate p (occupied) ----
        det_i, q_list = np.nonzero(1 - bits)
        new_bits = bits[det_i].copy()
        new_bits[np.arange(len(det_i)), q_list] = 1
        s_q = _sign_before(bits[det_i], q_list)
        # diagonal elements of the N+1 dets
        if pack_up:
            h_ii = np.asarray(slater.diag_elements(
                table, jnp.asarray(new_bits), jnp.asarray(other[det_i])))
        else:
            h_ii = np.asarray(slater.diag_elements(
                table, jnp.asarray(other[det_i]), jnp.asarray(new_bits)))
        # annihilate each occupied p of the new det
        for p in range(norb):
            occ_p = new_bits[:, p] > 0
            if not occ_p.any():
                continue
            sel = np.nonzero(occ_p)[0]
            back = new_bits[sel].copy()
            back[:, p] = 0
            s_p = _sign_before(new_bits[sel], np.full(len(sel), p))
            # locate the resulting det in the variational list
            bw = dets_mod.from_bits(jnp.asarray(back), norb)
            if pack_up:
                k = setalg.search_dets(up, dn, np.asarray(bw),
                                       dn[det_i[sel]])
            else:
                k = setalg.search_dets(up, dn, up[det_i[sel]],
                                       np.asarray(bw))
            hit = k >= 0
            if not hit.any():
                continue
            i_idx = det_i[sel][hit]
            k_idx = k[hit]
            amp = wts[i_idx] * wts[k_idx] * s_q[sel][hit] * s_p[hit]
            denom = wz[:, None] - (h_ii[sel][hit][None, :] - e0)
            # accumulate per (p, q) with possible repeated q values
            contrib = amp[None, :] / denom            # [n_w, m]
            qs = q_list[sel][hit]
            for qq in np.unique(qs):
                m = qs == qq
                G_np1[:, p, qq] += contrib[:, m].sum(axis=1)

        # ---- N-1: annihilate q (occupied), diag, create p ----
        det_i, q_list = np.nonzero(bits)
        new_bits = bits[det_i].copy()
        new_bits[np.arange(len(det_i)), q_list] = 0
        s_q = _sign_before(bits[det_i], q_list)
        if pack_up:
            h_ii = np.asarray(slater.diag_elements(
                table, jnp.asarray(new_bits), jnp.asarray(other[det_i])))
        else:
            h_ii = np.asarray(slater.diag_elements(
                table, jnp.asarray(other[det_i]), jnp.asarray(new_bits)))
        for p in range(norb):
            emp_p = new_bits[:, p] == 0
            if not emp_p.any():
                continue
            sel = np.nonzero(emp_p)[0]
            back = new_bits[sel].copy()
            back[:, p] = 1
            s_p = _sign_before(new_bits[sel], np.full(len(sel), p))
            bw = dets_mod.from_bits(jnp.asarray(back), norb)
            if pack_up:
                k = setalg.search_dets(up, dn, np.asarray(bw), dn[det_i[sel]])
            else:
                k = setalg.search_dets(up, dn, up[det_i[sel]], np.asarray(bw))
            hit = k >= 0
            if not hit.any():
                continue
            i_idx = det_i[sel][hit]
            k_idx = k[hit]
            amp = wts[i_idx] * wts[k_idx] * s_q[sel][hit] * s_p[hit]
            denom = wz[:, None] - (e0 - h_ii[sel][hit][None, :])
            contrib = amp[None, :] / denom
            qs = q_list[sel][hit]
            for qq in np.unique(qs):
                m = qs == qq
                G_nm1[:, p, qq] += contrib[:, m].sum(axis=1)

    return G_np1, G_nm1
