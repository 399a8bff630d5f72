"""Heat-bath double-excitation tables (generic over an IntegralTable).

The HCI selection/PT kernels need, for every occupied orbital pair, the list
of target pairs sorted by |H| descending so an eps cut is a prefix
(ref: chemistry.f90 setup_efficient_heatbath:872, dtm_hb + pq_ind/pq_count).

TPU-native layout: flat ragged arrays in HBM (values sorted descending per
row) + row offsets, consumed by vectorized binary searches - the sorted-scan
early exit of the Fortran becomes "rank < searchsorted(eps)" masks.

Row conventions (all orbital indices spatial, 0-based):
  * same-spin rows, one per unordered pair p<q, row index q*(q-1)//2 + p:
    entries (r<s) with |H| = |(pr|qs)-(ps|qr)| > 0.
  * opposite-spin rows, one per pair a<=b, row index b*(b+1)//2 + a,
    meaning excitation a(up)->r, b(dn)->s; entries (r,s) with
    |H| = |(ar|bs)| > 0.  A query with p_up > q_dn uses row (q_dn, p_up)
    and swaps the (r,s) meaning (spin-exchange symmetry; ref:
    chemistry.f90:7038-7058).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .chem.integrals import IntegralTable, pair_index, quad_index


def tri_lt(p, q):
    """Row index for unordered p<q (strict)."""
    return q * (q - 1) // 2 + p


def tri_le(a, b):
    """Row index for unordered a<=b."""
    return b * (b + 1) // 2 + a


@dataclasses.dataclass
class HeatbathTable:
    """Flat ragged heat-bath tables on device.

    same_rs / opp_rs: int32 [total], packed r*norb+s target pairs
    same_val / opp_val: float64 [total], SIGNED no-reference elements,
      |value|-descending within each row
    same_start / opp_start: int64 [n_rows], row offsets
    same_count / opp_count: int32 [n_rows]
    max_double: float, largest |H| over all rows (early-out threshold,
      ref: chemistry.f90 max_double)
    """

    norb: int
    same_rs: jnp.ndarray
    same_val: jnp.ndarray
    same_start: jnp.ndarray
    same_count: jnp.ndarray
    opp_rs: jnp.ndarray
    opp_val: jnp.ndarray
    opp_start: jnp.ndarray
    opp_count: jnp.ndarray
    max_double: float


jax.tree_util.register_pytree_node(
    HeatbathTable,
    lambda t: ((t.same_rs, t.same_val, t.same_start, t.same_count,
                t.opp_rs, t.opp_val, t.opp_start, t.opp_count),
               (t.norb, t.max_double)),
    lambda aux, ch: HeatbathTable(aux[0], *ch[:4], *ch[4:], aux[1]),
)


def build_heatbath(table: IntegralTable) -> HeatbathTable:
    """Host-side construction (once per system), fully vectorized numpy."""
    norb = table.norb
    eri_v = table.eri_value_np

    rr, ss = np.meshgrid(np.arange(norb), np.arange(norb), indexing="ij")

    # ---- same spin: pairs p<q ----
    # Values stored SIGNED (the no-reference element (pr|qs)-(ps|qr));
    # rows sorted by |H| descending so an eps cut is a prefix.  The fermion
    # sign relative to a reference det is applied at generation/sampling
    # time via the prefix-sum parity kernels.
    same_rows_rs, same_rows_h, same_counts = [], [], []
    max_double = 0.0
    tri_mask = rr < ss  # candidate target pairs r<s
    for q in range(norb):
        for p in range(q):
            H = eri_v(p, rr, q, ss) - eri_v(p, ss, q, rr)
            H = np.where(tri_mask, H, 0.0)
            # exclude targets overlapping the source pair (p,q->r,s requires
            # all four distinct; ref: chemistry.f90:9625 no_ref element
            # returns 0 when indices coincide).
            for o in (p, q):
                H[o, :] = 0.0
                H[:, o] = 0.0
            r_i, s_i = np.nonzero(H != 0)
            h = H[r_i, s_i]
            order = np.argsort(-np.abs(h), kind="stable")
            same_rows_rs.append((r_i * norb + s_i)[order].astype(np.int32))
            same_rows_h.append(h[order])
            same_counts.append(len(h))
            if len(h):
                max_double = max(max_double, abs(h[order[0]]))

    # ---- opposite spin: pairs a<=b, a up -> r, b dn -> s ----
    opp_rows_rs, opp_rows_h, opp_counts = [], [], []
    for b in range(norb):
        for a in range(b + 1):
            H = eri_v(a, rr, b, ss).astype(np.float64).copy()
            # exclude r==a (no excitation in up) and s==b
            H[a, :] = 0.0
            H[:, b] = 0.0
            r_i, s_i = np.nonzero(H != 0)
            h = H[r_i, s_i]
            order = np.argsort(-np.abs(h), kind="stable")
            opp_rows_rs.append((r_i * norb + s_i)[order].astype(np.int32))
            opp_rows_h.append(h[order])
            opp_counts.append(len(h))
            if len(h):
                max_double = max(max_double, abs(h[order[0]]))

    def _flat(rows_rs, rows_h, counts):
        counts = np.asarray(counts, dtype=np.int64)
        start = np.zeros(len(counts), dtype=np.int64)
        if len(counts) > 1:
            start[1:] = np.cumsum(counts[:-1])
        rs = np.concatenate(rows_rs) if rows_rs else np.zeros(0, np.int32)
        h = np.concatenate(rows_h) if rows_h else np.zeros(0, np.float64)
        if len(rs) == 0:   # keep flat arrays non-empty so gathers stay legal
            rs = np.zeros(1, np.int32)
            h = np.zeros(1, np.float64)
        return rs, h, start, counts.astype(np.int32)

    s_rs, s_h, s_st, s_ct = _flat(same_rows_rs, same_rows_h, np.asarray(same_counts))
    o_rs, o_h, o_st, o_ct = _flat(opp_rows_rs, opp_rows_h, np.asarray(opp_counts))

    return HeatbathTable(
        norb=norb,
        same_rs=jnp.asarray(s_rs), same_val=jnp.asarray(s_h),
        same_start=jnp.asarray(s_st), same_count=jnp.asarray(s_ct),
        opp_rs=jnp.asarray(o_rs), opp_val=jnp.asarray(o_h),
        opp_start=jnp.asarray(o_st), opp_count=jnp.asarray(o_ct),
        max_double=float(max_double),
    )


def rank_of_eps(val_flat: jnp.ndarray, start: jnp.ndarray, count: jnp.ndarray,
                eps: jnp.ndarray, strict: bool = True) -> jnp.ndarray:
    """Number of leading entries of each (descending) row with |H| > eps
    (strict=True; the doubles scan uses 'exit when <= eps',
    ref chemistry.f90:7040) via vectorized binary search on the flat array.

    start/count: [...] row descriptors (gathered); eps: [...] same shape.
    Returns int32 [...] counts.
    """
    nflat = val_flat.shape[0]
    if nflat == 0:
        return jnp.zeros(count.shape, jnp.int32)
    lo = jnp.zeros_like(count)
    hi = count

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        v = jnp.abs(val_flat[jnp.clip(start + mid, 0, nflat - 1)])
        take = (v > eps) if strict else (v >= eps)
        take = take & (lo < hi)
        lo = jnp.where(take, mid + 1, lo)
        hi = jnp.where(take, hi, mid)
        return lo, hi

    # count <= flat row length; 40 iterations covers 2^40 entries
    n_iter = 40
    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    return lo.astype(jnp.int32)
