"""Batched Slater-Condon matrix elements for molecular Hamiltonians.

TPU-native re-design of the reference's scalar matrix-element micro-stack
(ref: chemistry.f90 hamiltonian_chem:1260, one_body:1382, two_body:1609,
two_body_single:1845, two_body_double:1934; signs from tools.f90
permutation_factor:1294 / permutation_factor2:1342):

  * diagonal elements become two [B,norb]x[norb,norb] matmuls (MXU) instead
    of O(nelec^2) bit loops;
  * single/double elements become vectorized gathers from the compact ERI
    array plus prefix-sum parity for the fermion sign (VPU);
  * everything is batched over determinant arrays and jit-compiled.

All functions take dense occupancy bit vectors uint8[B, norb] per spin
(see sqmc_tpu.dets.to_bits).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ... import dets
from .integrals import IntegralTable


# ---------------------------------------------------------------------------
# Diagonal elements
# ---------------------------------------------------------------------------

def diag_elements(table: IntegralTable, bits_up: jnp.ndarray,
                  bits_dn: jnp.ndarray, dtype=jnp.float64) -> jnp.ndarray:
    """<D|H|D> for a batch of dets. [B, norb] x2 -> [B] float64.

    E = E_core + sum_p n_p h_pp
        + 1/2 (u^T D u - sum u_p D_pp) + 1/2 (d^T D d - sum d_p D_pp)
        + u^T D d
        - 1/2 (u^T X u - sum u_p X_pp) - 1/2 (d^T X d - sum d_p X_pp)
    with D[p,q]=(pp|qq), X[p,q]=(pq|qp).

    dtype=float32 is the f32-walker-state fast path: the fused matmul
    runs native f32 at Precision.HIGHEST (honored for plain dots on the
    v5e, measured 2e-7 relative in tools/microbench_rowsum.py /
    PERF_NOTES) instead of 6-pass-emulated f64, adding ~1e-5 Ha noise to
    a value the f32 state was about to quantize to ~5e-6 Ha anyway -
    the diagonal feeds only the death factor 1+tau*(E_T-H_ii), never the
    f64 estimators.
    """
    u = bits_up.astype(dtype)
    d = bits_dn.astype(dtype)
    h_diag = jnp.diagonal(table.h)
    D = table.direct
    X = table.exchange
    Dd = jnp.diagonal(D)  # == (pp|pp) == diagonal of X as well

    # ONE fused matmul: rows = [u; d], columns = [D | X | h_diag+Dd-combos]
    # (f64 matmuls are software-emulated on the MXU, so op count matters
    # more than flops at these tiny sizes)
    norb = u.shape[-1]
    B = u.shape[0]
    A = jnp.concatenate([D, X, h_diag[:, None], Dd[:, None]],
                        axis=1).astype(dtype)        # [norb, 2*norb+2]
    both = jnp.concatenate([u, d], axis=0)           # [2B, norb]
    out = jnp.matmul(both, A,
                     precision=jax.lax.Precision.HIGHEST)  # [2B, 2*norb+2]
    uD, dD = out[:B, :norb], out[B:, :norb]
    uX, dX = out[:B, norb:2 * norb], out[B:, norb:2 * norb]
    u_h, d_h = out[:B, 2 * norb], out[B:, 2 * norb]
    u_Dd, d_Dd = out[:B, 2 * norb + 1], out[B:, 2 * norb + 1]

    one_body = u_h + d_h
    direct = 0.5 * (jnp.sum(uD * u, axis=-1) - u_Dd) \
           + 0.5 * (jnp.sum(dD * d, axis=-1) - d_Dd) \
           + jnp.sum(uD * d, axis=-1)
    exch = -0.5 * (jnp.sum(uX * u, axis=-1) - u_Dd) \
           - 0.5 * (jnp.sum(dX * d, axis=-1) - d_Dd)
    return table.core_energy + one_body + direct + exch


# ---------------------------------------------------------------------------
# Single excitation elements
# ---------------------------------------------------------------------------

def single_element_no_sign(table: IntegralTable, bits_same: jnp.ndarray,
                           bits_other: jnp.ndarray, p: jnp.ndarray,
                           r: jnp.ndarray) -> jnp.ndarray:
    """Unsigned <D|H|D_p^r> for a same-spin single p->r.

    bits_same: occupancy of the excited spin channel in the SOURCE det
    bits_other: occupancy of the opposite spin channel
    p, r: int32 [B]
    Returns float64 [B] (no fermion sign).

    element = h_pr + sum_{q occ same, q!=p,r} [(pr|qq) - (pq|qr)]
                   + sum_{q occ other}        (pr|qq)
    (ref: chemistry.f90 one_body_single:1480 + two_body_single:1845)
    """
    norb = table.norb
    qs = jnp.arange(norb, dtype=jnp.int32)

    if table.sing_dir is not None:
        # contiguous row gathers from the precomputed [norb^2, norb]
        # tables - far cheaper than scattered quad-index gathers from the
        # compact ERI (the dominant cost of the walk's singles channel)
        row = p * norb + r
        direct_row = table.sing_dir[row]           # [B,norb] (pr|qq)
        exch_row = table.sing_exch[row]            # [B,norb] (pq|qr)
    else:
        qb = jnp.broadcast_to(qs[None, :], (p.shape[0], norb))
        pb = jnp.broadcast_to(p[:, None], qb.shape)
        rb = jnp.broadcast_to(r[:, None], qb.shape)
        direct_row = table.eri_value(pb, rb, qb, qb)   # [B,norb] (pr|qq)
        exch_row = table.eri_value(pb, qb, qb, rb)     # [B,norb] (pq|qr)

    same = bits_same.astype(jnp.float64)
    other = bits_other.astype(jnp.float64)
    mask_pr = (qs[None, :] != p[:, None]) & (qs[None, :] != r[:, None])
    same_m = same * mask_pr

    h_pr = table.h[p, r]
    val = h_pr \
        + jnp.sum((direct_row - exch_row) * same_m, axis=-1) \
        + jnp.sum(direct_row * other, axis=-1)
    return val


def single_element(table: IntegralTable, bits_same: jnp.ndarray,
                   bits_other: jnp.ndarray, p: jnp.ndarray,
                   r: jnp.ndarray) -> jnp.ndarray:
    """Signed single-excitation element (source det occupancies)."""
    sign = dets.single_excite_sign(bits_same, p, r)
    return sign * single_element_no_sign(table, bits_same, bits_other, p, r)


# ---------------------------------------------------------------------------
# Double excitation elements
# ---------------------------------------------------------------------------

def double_same_spin_no_sign(table: IntegralTable, p, q, r, s):
    """Unsigned same-spin double {p,q}->{r,s} with p<q, r<s:
    (pr|qs) - (ps|qr).  [B] float64."""
    return table.eri_value(p, r, q, s) - table.eri_value(p, s, q, r)


def double_same_spin(table: IntegralTable, bits_same, p, q, r, s):
    """Signed same-spin double.  bits_same = source-det occupancy of the
    excited spin channel; p<q removed, r<s added."""
    gamma = dets.double_excite_sign_same_spin(bits_same, p, q, r, s)
    return gamma * double_same_spin_no_sign(table, p, q, r, s)


def double_opposite_spin_no_sign(table: IntegralTable, p_up, r_up, q_dn, s_dn):
    """Unsigned opposite-spin double: up p->r, dn q->s: (pr|qs)."""
    return table.eri_value(p_up, r_up, q_dn, s_dn)


def double_opposite_spin(table: IntegralTable, bits_up, bits_dn,
                         p_up, r_up, q_dn, s_dn):
    """Signed opposite-spin double from source-det occupancies."""
    sign = dets.single_excite_sign(bits_up, p_up, r_up) * \
           dets.single_excite_sign(bits_dn, q_dn, s_dn)
    return sign * double_opposite_spin_no_sign(table, p_up, r_up, q_dn, s_dn)


# ---------------------------------------------------------------------------
# General pairwise element (used by the sparse-H builder)
# ---------------------------------------------------------------------------

def _extract_diff2(bits_a: jnp.ndarray, bits_b: jnp.ndarray):
    """Positions of up-to-2 bits set in a&~b, ascending; padded with norb-1.

    Returns (pos0, pos1, count).  Uses a stable argsort like occ_orbitals.
    """
    diff = (bits_a & (1 - bits_b)).astype(jnp.int32)
    count = jnp.sum(diff, axis=-1)
    order = jnp.argsort(1 - diff, axis=-1, stable=True)
    pos0 = order[..., 0].astype(jnp.int32)
    pos1 = order[..., 1].astype(jnp.int32)
    return pos0, pos1, count


@functools.partial(jax.jit, static_argnames=())
def pair_matrix_elements(table: IntegralTable, bits_up_i, bits_dn_i,
                         bits_up_j, bits_dn_j) -> jnp.ndarray:
    """<D_i|H|D_j> for batches of det pairs (any excitation level).

    [B, norb] x4 -> [B] float64.  Returns 0 for pairs more than doubly
    excited; returns the full diagonal element (incl. core) for i==j.
    This is the workhorse of the Hamiltonian-matrix construction: the
    sort-join pair finder produces candidate (i,j) pairs and this kernel
    evaluates them all in one fused pass.
    """
    pu0, pu1, n_up = _extract_diff2(bits_up_i, bits_up_j)
    ru0, ru1, _ = _extract_diff2(bits_up_j, bits_up_i)
    pd0, pd1, n_dn = _extract_diff2(bits_dn_i, bits_dn_j)
    rd0, rd1, _ = _extract_diff2(bits_dn_j, bits_dn_i)
    level = n_up + n_dn

    diag = diag_elements(table, bits_up_i, bits_dn_i)

    s_up = single_element(table, bits_up_i, bits_dn_i, pu0, ru0)
    s_dn = single_element(table, bits_dn_i, bits_up_i, pd0, rd0)
    single = jnp.where(n_up == 1, s_up, s_dn)

    d_up = double_same_spin(table, bits_up_i, pu0, pu1, ru0, ru1)
    d_dn = double_same_spin(table, bits_dn_i, pd0, pd1, rd0, rd1)
    d_mix = double_opposite_spin(table, bits_up_i, bits_dn_i, pu0, ru0, pd0, rd0)
    double = jnp.where(n_up == 2, d_up, jnp.where(n_dn == 2, d_dn, d_mix))

    out = jnp.where(level == 0, diag,
                    jnp.where(level == 1, single,
                              jnp.where(level == 2, double, 0.0)))
    return out


# ---------------------------------------------------------------------------
# Word-level per-class kernels (the sparse-H builder's hot path): the
# excitation pattern is known per pair class, so no argsort diff
# extraction, no dense bit rows for doubles, no dead branches
# ---------------------------------------------------------------------------

@jax.jit
def same_spin_double_words(table: IntegralTable, wi, wj):
    """Signed same-spin double element from packed words of the excited
    spin channel. [B, W] x2 -> [B] float64."""
    p, q, _ = dets.diff2_words(wi, wj)
    r, s, _ = dets.diff2_words(wj, wi)
    val = table.eri_value(p, r, q, s) - table.eri_value(p, s, q, r)
    return dets.double_sign_same_spin_words(wi, wj, p, q, r, s) * val


@jax.jit
def opp_spin_double_words(table: IntegralTable, wu_i, wu_j, wd_i, wd_j):
    """Signed opposite-spin double element from packed words."""
    p, _, _ = dets.diff2_words(wu_i, wu_j)
    r, _, _ = dets.diff2_words(wu_j, wu_i)
    q, _, _ = dets.diff2_words(wd_i, wd_j)
    s, _, _ = dets.diff2_words(wd_j, wd_i)
    val = table.eri_value(p, r, q, s)
    return dets.single_sign_words(wu_i, p, r) * \
        dets.single_sign_words(wd_i, q, s) * val


@functools.partial(jax.jit, static_argnames=("norb",))
def single_words(table: IntegralTable, w_same_i, w_same_j, w_other_i,
                 norb: int):
    """Signed single-excitation element from packed words (the occupancy
    rows are still needed for the sum over occupied orbitals)."""
    p, _, _ = dets.diff2_words(w_same_i, w_same_j)
    r, _, _ = dets.diff2_words(w_same_j, w_same_i)
    bits_same = dets.to_bits(w_same_i, norb)
    bits_other = dets.to_bits(w_other_i, norb)
    return dets.single_sign_words(w_same_i, p, r) * \
        single_element_no_sign(table, bits_same, bits_other, p, r)


# ---------------------------------------------------------------------------
# Time-reversal symmetrized elements (ref: hamiltonian_chem_time_sym:1355)
# ---------------------------------------------------------------------------

SQRT2 = 1.4142135623730951
SQRT2INV = 0.7071067811865476


def pair_matrix_elements_time_sym(table: IntegralTable, bits_up_i, bits_dn_i,
                                  bits_up_j, bits_dn_j, z: int) -> jnp.ndarray:
    """<i_ts|H|j_ts> between time-symmetrized basis states given their
    REPRESENTATIVE orientations (up <= dn).

    elem = norm_bra * norm_ketinv * (H(i,j) + z * H(rev_i, j)) with
    norm_bra = sqrt2 when i is self-symmetric, norm_ketinv = 1/sqrt2 when
    j is, and the cross term skipped when i or j is self-symmetric
    (ref: chemistry.f90:1355-1413).
    """
    sym_i = jnp.all((bits_up_i == bits_dn_i), axis=-1)
    sym_j = jnp.all((bits_up_j == bits_dn_j), axis=-1)
    m1 = pair_matrix_elements(table, bits_up_i, bits_dn_i, bits_up_j, bits_dn_j)
    m2 = pair_matrix_elements(table, bits_dn_i, bits_up_i, bits_up_j, bits_dn_j)
    m2 = jnp.where(sym_j, m1, m2)       # ref: matrix_element2=matrix_element1
    m2 = jnp.where(sym_i, 0.0, m2)      # check=false -> no cross term
    norm = jnp.where(sym_i, SQRT2, 1.0) * jnp.where(sym_j, SQRT2INV, 1.0)
    return norm * (m1 + z * m2)
