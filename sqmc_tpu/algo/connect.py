"""Screened connected-determinant generation (the HCI hot kernel).

TPU re-design of find_important_connected_dets_chem
(ref: chemistry.f90:6819-7162) and the per-reference scan loops of
find_doubly_excited (ref: semistoch.f90:1579):

  * the per-pair sorted-|H| scan with early exit becomes a vectorized
    binary search for the eps cut (rank_of_eps) over the flat heat-bath
    table - data-dependent loop bounds become counts;
  * ragged per-reference candidate lists become one fixed-capacity flat
    emission, located by searchsorted over the exclusive prefix sum of
    counts (two-phase: a cheap count pass sizes the capacity bucket on the
    host, then the emit pass runs with static shapes);
  * single excitations evaluate for ALL (p,r) at once as two
    [B,norb]x[norb,norb^2] MXU matmuls against precomputed
    (pr|qq) / (pq|qr) tensors, then slots gather scalars;
  * fermion signs come from per-reference occupancy prefix sums with
    scalar gathers (no [cap,norb] intermediates).

All emitted candidates carry the signed matrix element and the reference
index, so the same kernels serve HCI selection (|H c| > eps_var),
deterministic PT, and semistochastic PT.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import dets
from ..systems.heatbath import HeatbathTable, rank_of_eps, tri_le, tri_lt
from ..systems.chem.integrals import IntegralTable


def _pair_descriptors(occ_up, occ_dn, nup: int, ndn: int):
    """Static electron-pair enumeration for a batch: same-up (kind 0,
    p<q spatial), same-dn (kind 1), opposite (kind 2, p up / q dn)."""
    iu, ju = np.triu_indices(nup, k=1)
    idn, jdn = np.triu_indices(ndn, k=1)
    io, jo = np.meshgrid(np.arange(nup), np.arange(ndn), indexing="ij")
    io, jo = io.ravel(), jo.ravel()

    p = jnp.concatenate([occ_up[:, iu], occ_dn[:, idn], occ_up[:, io]], axis=1)
    q = jnp.concatenate([occ_up[:, ju], occ_dn[:, jdn], occ_dn[:, jo]], axis=1)
    n_uu = len(iu)
    n_dd = len(idn)
    n_op = len(io)
    kind = jnp.concatenate([
        jnp.zeros((occ_up.shape[0], n_uu), jnp.int32),
        jnp.ones((occ_up.shape[0], n_dd), jnp.int32),
        jnp.full((occ_up.shape[0], n_op), 2, jnp.int32)], axis=1)
    return p, q, kind


@functools.partial(jax.jit, static_argnames=("nup", "ndn"))
def count_doubles(hb: HeatbathTable, ref_up, ref_dn, eps, min_H, *,
                  nup: int, ndn: int):
    """Phase 1: per-(ref, pair) emission counts for the eps window.

    Emitted ranks for a pair are [lo, hi): hi = #entries with |H| > eps,
    lo = #entries with |H| > min_H (already generated in a previous
    iteration; ref: chemistry.f90:7043 min_H_already_done_elem).
    """
    norb = hb.norb
    bits_up = dets.to_bits(ref_up, norb)
    bits_dn = dets.to_bits(ref_dn, norb)
    occ_up = dets.occ_orbitals(bits_up, nup)
    occ_dn = dets.occ_orbitals(bits_dn, ndn)
    p, q, kind = _pair_descriptors(occ_up, occ_dn, nup, ndn)

    a = jnp.minimum(p, q)
    b = jnp.maximum(p, q)
    same_row = tri_lt(a, b)
    opp_row = tri_le(a, b)
    is_opp = kind == 2
    start = jnp.where(is_opp, hb.opp_start[opp_row], hb.same_start[same_row])
    count = jnp.where(is_opp, hb.opp_count[opp_row], hb.same_count[same_row])
    swapped = is_opp & (p > q)

    eps_b = jnp.broadcast_to(eps[:, None], start.shape)
    minH_b = jnp.broadcast_to(min_H[:, None], start.shape)
    hi = jnp.where(is_opp,
                   rank_of_eps(hb.opp_val, start, count, eps_b),
                   rank_of_eps(hb.same_val, start, count, eps_b))
    lo = jnp.where(is_opp,
                   rank_of_eps(hb.opp_val, start, count, minH_b),
                   rank_of_eps(hb.same_val, start, count, minH_b))
    n_emit = jnp.maximum(hi - lo, 0).astype(jnp.int64)
    return n_emit, lo, (p, q, kind, start, is_opp, swapped)


@functools.partial(jax.jit, static_argnames=("cap", "norb"))
def emit_doubles(hb: HeatbathTable, table: IntegralTable, ref_up, ref_dn,
                 n_emit, lo, desc, *, cap: int, norb: int):
    """Phase 2: materialize up to `cap` double-excitation candidates.

    Returns flat arrays [cap]: new_up/new_dn (packed words), ref (int32),
    helem (signed H), valid.  Invalid: slots past the true total,
    occupied targets, exactly-zero elements.
    """
    p, q, kind, start, is_opp, swapped = desc
    B, npairs = p.shape

    flat_emit = n_emit.reshape(-1)
    cum = jnp.cumsum(flat_emit)
    total = cum[-1]
    off = cum - flat_emit

    t = jnp.arange(cap, dtype=jnp.int64)
    seg = jnp.searchsorted(cum, t, side="right").astype(jnp.int32)
    seg = jnp.minimum(seg, B * npairs - 1)
    rank = (t - off[seg] + lo.reshape(-1)[seg]).astype(jnp.int64)
    valid = t < total

    b = seg // npairs
    pr_i = seg % npairs
    pp = p[b, pr_i]
    qq = q[b, pr_i]
    kk = kind[b, pr_i]
    st = start[b, pr_i]
    opp = is_opp[b, pr_i]
    sw = swapped[b, pr_i]

    idx = st + rank
    rs_same = hb.same_rs[jnp.clip(idx, 0, hb.same_rs.shape[0] - 1)]
    rs_opp = hb.opp_rs[jnp.clip(idx, 0, hb.opp_rs.shape[0] - 1)]
    rs = jnp.where(opp, rs_opp, rs_same)
    r_tab = (rs // norb).astype(jnp.int32)
    s_tab = (rs % norb).astype(jnp.int32)
    # swapped opposite rows (p_up > q_dn queried via row (q,p)):
    # up target is s_tab, dn target is r_tab (ref: chemistry.f90:7049-7053)
    r = jnp.where(sw, s_tab, r_tab)
    s = jnp.where(sw, r_tab, s_tab)
    # for opposite pairs: up excitation p->r, dn excitation q->s
    up_w = ref_up[b]
    dn_w = ref_dn[b]

    r_in_up = dets.get_orb(up_w, r)
    r_in_dn = dets.get_orb(dn_w, r)
    s_in_up = dets.get_orb(up_w, s)
    s_in_dn = dets.get_orb(dn_w, s)
    occupied = jnp.where(
        opp, r_in_up | s_in_dn,
        jnp.where(kk == 0, r_in_up | s_in_up, r_in_dn | s_in_dn))
    valid = valid & ~occupied

    same_up = kk == 0
    # new determinants
    up_2 = dets.set_orb(dets.set_orb(dets.clear_orb(dets.clear_orb(up_w, pp), qq), r), s)
    dn_2 = dets.set_orb(dets.set_orb(dets.clear_orb(dets.clear_orb(dn_w, pp), qq), r), s)
    up_o = dets.set_orb(dets.clear_orb(up_w, pp), r)
    dn_o = dets.set_orb(dets.clear_orb(dn_w, qq), s)
    new_up = jnp.where(opp[:, None], up_o,
                       jnp.where(same_up[:, None], up_2, up_w))
    new_dn = jnp.where(opp[:, None], dn_o,
                       jnp.where(same_up[:, None], dn_w, dn_2))

    # ---- signed elements via prefix-sum parity (scalar gathers) ----
    bits_up = dets.to_bits(ref_up, norb)
    bits_dn = dets.to_bits(ref_dn, norb)
    pref_up = jnp.cumsum(bits_up.astype(jnp.int32), axis=1)
    pref_up = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), pref_up], axis=1)
    pref_dn = jnp.cumsum(bits_dn.astype(jnp.int32), axis=1)
    pref_dn = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), pref_dn], axis=1)
    # pref[b, o] = #set bits at positions < o

    def in_window(x, a_pos, b_pos):
        lo_ = jnp.minimum(a_pos, b_pos)
        hi_ = jnp.maximum(a_pos, b_pos)
        return ((x >= lo_) & (x < hi_)).astype(jnp.int32)

    def wc(pref, a_pos, b_pos):
        lo_ = jnp.minimum(a_pos, b_pos)
        hi_ = jnp.maximum(a_pos, b_pos)
        return pref[b, hi_] - pref[b, lo_]

    # same-spin: gamma parity = [cnt in window(p,r) + cnt in window(q,s)]
    # over the det with {p,q} removed (r,s are unoccupied in the source),
    # matching permutation_factor2's XOR-mask formulation
    # (ref: tools.f90:1342).
    def wc_same(a_pos, b_pos):
        return jnp.where(same_up, wc(pref_up, a_pos, b_pos),
                         wc(pref_dn, a_pos, b_pos))

    c1 = wc_same(pp, r) - in_window(pp, pp, r) - in_window(qq, pp, r)
    c2 = wc_same(qq, s) - in_window(pp, qq, s) - in_window(qq, qq, s)
    gamma_same = jnp.where((c1 + c2) % 2 == 0, 1.0, -1.0)

    # opposite: product of single-excitation parities per spin channel
    cu = wc(pref_up, pp, r) - in_window(pp, pp, r)
    cd = wc(pref_dn, qq, s) - in_window(qq, qq, s)
    gamma_opp = jnp.where((cu + cd) % 2 == 0, 1.0, -1.0)

    # unsigned elements come straight from the (signed) heat-bath entries -
    # no integral gathers needed (value is invariant under the opposite-spin
    # row swap by spin symmetry)
    val_tab = jnp.where(opp,
                        hb.opp_val[jnp.clip(idx, 0, hb.opp_val.shape[0] - 1)],
                        hb.same_val[jnp.clip(idx, 0, hb.same_val.shape[0] - 1)])
    helem = jnp.where(opp, gamma_opp, gamma_same) * val_tab
    valid = valid & (helem != 0.0)

    return dict(new_up=new_up, new_dn=new_dn, ref=b.astype(jnp.int32),
                helem=helem, valid=valid)


@functools.partial(jax.jit, static_argnames=("nup", "ndn", "norb"))
def emit_singles(table: IntegralTable, orb_sym: jnp.ndarray, ref_up, ref_dn,
                 eps, min_H, *, nup: int, ndn: int, norb: int):
    """All symmetry-allowed single excitations with eps <= |H| <= min_H.

    (ref: chemistry.f90:6903-6992; singles keep |H| >= eps while doubles
    keep |H| > eps, matching the Fortran comparison directions.)

    Evaluation: element(p->r) = h[p,r] + sum_q n_q (pr|qq)
                                       - sum_{q same spin} n_q (pq|qr)
    The q in {p,r} exclusion terms vanish identically by 8-fold integral
    symmetry ((pr|pp)==(pp|pr)) and r being unoccupied, so the full sums
    are exact - computed for ALL (p,r) at once as matmuls against the
    precomputed sing_dir/sing_exch tensors.
    """
    nelec = nup + ndn
    B = ref_up.shape[0]
    bits_up = dets.to_bits(ref_up, norb)
    bits_dn = dets.to_bits(ref_dn, norb)
    occ_up = dets.occ_orbitals(bits_up, nup)
    occ_dn = dets.occ_orbitals(bits_dn, ndn)
    occ = jnp.concatenate([occ_up, occ_dn], axis=1)

    u = bits_up.astype(jnp.float64)
    d = bits_dn.astype(jnp.float64)
    Mdir = (u + d) @ table.sing_dir.T          # [B, norb*norb]
    Mex_u = u @ table.sing_exch.T
    Mex_d = d @ table.sing_exch.T
    h_flat = table.h.reshape(-1)
    M_up = h_flat[None, :] + Mdir - Mex_u
    M_dn = h_flat[None, :] + Mdir - Mex_d

    pref_up = jnp.cumsum(bits_up.astype(jnp.int32), axis=1)
    pref_up = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), pref_up], axis=1)
    pref_dn = jnp.cumsum(bits_dn.astype(jnp.int32), axis=1)
    pref_dn = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), pref_dn], axis=1)

    pb = jnp.repeat(jnp.arange(B, dtype=jnp.int32), nelec * norb)
    pe = jnp.tile(jnp.repeat(jnp.arange(nelec, dtype=jnp.int32), norb), B)
    rr = jnp.tile(jnp.arange(norb, dtype=jnp.int32), B * nelec)

    p = occ[pb, pe]
    up_sel = pe < nup

    r_occ = jnp.where(up_sel, bits_up[pb, rr] != 0, bits_dn[pb, rr] != 0)
    sym_ok = orb_sym[p] == orb_sym[rr]
    valid = (~r_occ) & sym_ok & (p != rr)

    unsigned = jnp.where(up_sel, M_up[pb, p * norb + rr], M_dn[pb, p * norb + rr])
    lo_ = jnp.minimum(p, rr)
    hi_ = jnp.maximum(p, rr)
    pref = jnp.where(up_sel, pref_up[pb, hi_] - pref_up[pb, lo_],
                     pref_dn[pb, hi_] - pref_dn[pb, lo_])
    n_between = pref - ((p >= lo_) & (p < hi_)).astype(jnp.int32)
    sign = jnp.where(n_between % 2 == 0, 1.0, -1.0)
    helem = sign * unsigned

    keep = (jnp.abs(helem) >= eps[pb]) & (jnp.abs(helem) <= min_H[pb])
    valid = valid & keep & (helem != 0.0)

    up_w = ref_up[pb]
    dn_w = ref_dn[pb]
    moved_up = dets.set_orb(dets.clear_orb(up_w, p), rr)
    moved_dn = dets.set_orb(dets.clear_orb(dn_w, p), rr)
    new_up = jnp.where(up_sel[:, None], moved_up, up_w)
    new_dn = jnp.where(up_sel[:, None], dn_w, moved_dn)

    return dict(new_up=new_up, new_dn=new_dn, ref=pb, helem=helem, valid=valid)


# ---------------------------------------------------------------------------
# Host driver
# ---------------------------------------------------------------------------

def _bucket(n: int, floor: int = 4096) -> int:
    c = floor
    while c < n:
        c *= 2
    return c


def generate_connections(system, ref_up: np.ndarray, ref_dn: np.ndarray,
                         eps: np.ndarray, min_H: np.ndarray | None = None,
                         batch: int = 2048, devices=None):
    """Generate all screened connections of a reference det list.

    system: FermionSystem (table, heatbath, orb_sym_arr, has_singles)
    ref_up/ref_dn: packed words [n, W] (host numpy)
    eps: [n] per-ref |H| thresholds (typically eps_var/|c_i|)
    min_H: optional [n] already-done thresholds (emit eps < |H| <= min_H)
    devices: optional device list (e.g. mesh.devices.flat) - reference
      batches are dispatched round-robin across them and all devices run
      concurrently (the TPU-native analog of find_doubly_excited's
      round-robin reference split, semistoch.f90:1743; contiguous batch
      slicing instead of det-hash ownership keeps the emit kernels'
      static shapes and balances work, while ownership still governs the
      downstream sharded dedup P5)

    Returns numpy (cand_up [m,W], cand_dn [m,W], helem [m], ref_idx [m]),
    unmerged (duplicates across refs are kept; callers sort/merge).
    """
    import jax

    n = len(ref_up)
    W = ref_up.shape[1]
    norb = system.norb
    if min_H is None:
        min_H = np.full(n, np.inf)
    devs = list(devices) if devices is not None else [None]

    outs_up, outs_dn, outs_h, outs_r = [], [], [], []
    # per-device replicas of the read-only tables (SURVEY P3: node-shared
    # windows -> per-chip HBM replication); one transfer per device per
    # call, reused by every batch dispatched there
    if devs[0] is None:
        tabs = [(system.heatbath, system.table, system.orb_sym_arr)]
    else:
        tabs = [jax.device_put((system.heatbath, system.table,
                                system.orb_sym_arr), d) for d in devs]

    # pass 1: dispatch the per-batch emission counts on their devices
    # (async - no host sync until every device has its counting work)
    counts = []
    for k, beg in enumerate(range(0, n, batch)):
        end = min(beg + batch, n)
        nb = end - beg
        pad = batch - nb
        ru = np.concatenate([ref_up[beg:end], np.repeat(ref_up[:1], pad, 0)])
        rd = np.concatenate([ref_dn[beg:end], np.repeat(ref_dn[:1], pad, 0)])
        ev = np.concatenate([eps[beg:end], np.full(pad, np.inf)])
        mh = np.concatenate([min_H[beg:end], np.full(pad, np.inf)])
        kd = k % len(devs)
        hb_k, _, _ = tabs[kd]
        dev = devs[kd]
        if dev is not None:
            ru_j, rd_j = jax.device_put(ru, dev), jax.device_put(rd, dev)
            ev_j, mh_j = jax.device_put(ev, dev), jax.device_put(mh, dev)
        else:
            ru_j, rd_j = jnp.asarray(ru), jnp.asarray(rd)
            ev_j, mh_j = jnp.asarray(ev), jnp.asarray(mh)
        n_emit, lo, desc = count_doubles(hb_k, ru_j, rd_j, ev_j, mh_j,
                                         nup=system.nup, ndn=system.ndn)
        counts.append((kd, beg, ru_j, rd_j, ev_j, mh_j, n_emit, lo, desc,
                       jnp.sum(n_emit)))

    # pass 2: dispatch doubles + singles emission (async round-robin);
    # device->host copies happen only in the final collection loop
    pend = []
    for (kd, beg, ru_j, rd_j, ev_j, mh_j, n_emit, lo, desc, tot) in counts:
        hb_k, table_k, sym_k = tabs[kd]
        total = int(tot)
        if total > 0:
            cap = _bucket(total)
            d = emit_doubles(hb_k, table_k, ru_j, rd_j, n_emit, lo, desc,
                             cap=cap, norb=norb)
            pend.append((beg, d))
        if system.has_singles:
            s = emit_singles(table_k, sym_k, ru_j, rd_j,
                             ev_j, mh_j, nup=system.nup, ndn=system.ndn,
                             norb=norb)
            pend.append((beg, s))
    for beg, d in pend:
        v = np.asarray(d["valid"])
        outs_up.append(np.asarray(d["new_up"])[v])
        outs_dn.append(np.asarray(d["new_dn"])[v])
        outs_h.append(np.asarray(d["helem"])[v])
        outs_r.append(np.asarray(d["ref"])[v].astype(np.int64) + beg)

    if not outs_up:
        zz = np.zeros((0, W), np.uint64)
        return zz, zz.copy(), np.zeros(0), np.zeros(0, np.int64)
    cu = np.concatenate(outs_up)
    cd = np.concatenate(outs_dn)
    h = np.concatenate(outs_h)
    ref = np.concatenate(outs_r).astype(np.int64)

    if getattr(system, "time_sym", False):
        cu, cd, h, ref = _time_sym_postprocess(system, ref_up, ref_dn,
                                               cu, cd, h, ref)
    return cu, cd, h, ref


def _time_sym_postprocess(system, ref_up, ref_dn, cu, cd, h, ref):
    """Map raw candidates to time-reversal representatives with the
    sqrt2 normalization factors and z sign flips
    (ref: chemistry.f90:6957-6992, 7100-7140):
      * drop self-symmetric candidates when z < 0,
      * drop candidates equal to the time-reverse of their reference
        (a diagonal move in the symmetrized basis),
      * h *= 1/sqrt2 when the reference is self-symmetric (cand not),
        h *= sqrt2 when the candidate is self-symmetric (ref not),
      * swap (up,dn) to the representative ordering, h *= z on swap.
    """
    from ..ops import setalg
    from ..systems.chem.slater import SQRT2, SQRT2INV

    z = system.z
    ru = ref_up[ref]
    rd = ref_dn[ref]
    sym_ref = np.all(ru == rd, axis=1)
    sym_cand = np.all(cu == cd, axis=1)

    keep = np.ones(len(cu), bool)
    if z < 0:
        keep &= ~sym_cand
    keep &= ~(np.all(cu == rd, axis=1) & np.all(cd == ru, axis=1))

    h = h * np.where(sym_ref & ~sym_cand, SQRT2INV, 1.0)
    h = h * np.where(sym_cand & ~sym_ref, SQRT2, 1.0)

    swap = setalg.keys_less(cd, cu, cu, cd)
    cu2 = np.where(swap[:, None], cd, cu)
    cd2 = np.where(swap[:, None], cu, cd)
    h = np.where(swap, z * h, h)
    return cu2[keep], cd2[keep], h[keep], ref[keep]
