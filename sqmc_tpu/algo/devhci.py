"""Device-resident HCI: the on-chip SHCI variational fast path.

The round-4 on-chip end-to-end ledger showed the variational stage losing
~10x to single-core Fortran wall time (1083 s vs 39.97 s, o_det_ref "END
OF variational part"), with ~431 s of host numpy sort/join glue between
device phases and hundreds of small tunnel dispatches.  This module keeps
the ENTIRE iteration state on the accelerator:

  * the determinant list lives on device as ONE sorted uint64 key per det
    (norb <= 32: up in the high 32 bits, dn in the low 32 - the same
    fusion the walk uses, walk.py _lexsort_walkers);
  * candidate dedup + set-difference + merge are device sorts
    (lax.sort + searchsorted) instead of host np.lexsort over void keys;
  * the sparse-H N-1 sort-join (ref: chemistry.f90
    generate_sparse_ham_chem_upper_triangular:7639 re-designed as
    sort-join, see sparseham.py) runs on device: removal keys by XOR of
    orbital bit pairs, group-pair emission by searchsorted over the
    count prefix sum, pair dedup by one u64 sort;
  * matrix elements evaluate with the word-level excitation-class
    kernels (systems/chem/slater.py) on class-sorted pair slices;
  * Davidson runs with device-resident V/W in a fixed-size masked
    subspace (one dispatch per iteration), block-ELL matvec
    (ops/spmv_pallas.blockell layout built on device), f32 throughout,
    refined by pulling x and y=Hx and forming the Rayleigh quotient in
    host f64 (symmetric H: eigenvalue error O(||r||^2); the element
    values themselves carry f32 rounding on the axon TPU - the honest
    accuracy statement, see tools/bench_hci_e2e_tpu.py).

All dynamic sizes are bucketed to powers of two so recompilation is
bounded (~4 size families over a 6-iteration C2 run) and the persistent
compilation cache covers repeat runs.

Scope gate (asserted): n_words == 1, norb <= 32, time_sym off, no
active-space masks - the C2 CAS benchmark family.  Other workloads take
the host-orchestrated run_hci path.
"""

from __future__ import annotations

import functools
from itertools import combinations

import jax
import jax.numpy as jnp
import numpy as np

from .. import dets
from ..systems.chem import slater
from ..utils.timers import phase
from .connect import count_doubles, emit_doubles, emit_singles
from .hci import HCIResult
from .sparseham import SparseHam

SENT = np.uint64(0xFFFFFFFFFFFFFFFF)
MASK32 = np.uint64(0xFFFFFFFF)
DIAG_PAD = np.float32(3e38)

# precomputed u64 single-bit tables (variable u64 shifts are catastrophic
# on TPU - PERF_NOTES round-2 lowering notes; a gather of a constant
# table is one VPU op)
_BIT_DN = (np.uint64(1) << np.arange(32, dtype=np.uint64))
_BIT_UP = (np.uint64(1) << (np.arange(32, dtype=np.uint64) + np.uint64(32)))


def _bucket(n: int, floor: int = 4096) -> int:
    c = floor
    while c < n:
        c *= 2
    return c


def _fuse_np(up: np.ndarray, dn: np.ndarray) -> np.ndarray:
    return (up[:, 0] << np.uint64(32)) | dn[:, 0]


def _fit(arr, cap: int, fill):
    """Slice or pad a device array to exactly cap rows (bucketing can
    round above the source length)."""
    if arr.shape[0] >= cap:
        return arr[:cap]
    return jnp.concatenate(
        [arr, jnp.full((cap - arr.shape[0],) + arr.shape[1:], fill,
                       arr.dtype)])


# ---------------------------------------------------------------------------
# candidate set algebra
# ---------------------------------------------------------------------------

@jax.jit
def _dedup_diff(cand, list_key):
    """Sorted-unique candidates not present in the (sorted, SENT-padded)
    resident list.  Returns (sorted keys with SENT pads, n_new)."""
    s = jax.lax.sort(cand)
    first = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
    pos = jnp.clip(jnp.searchsorted(list_key, s), 0, list_key.shape[0] - 1)
    member = list_key[pos] == s
    keep = first & ~member & (s != SENT)
    return jax.lax.sort(jnp.where(keep, s, SENT)), jnp.sum(keep)


@jax.jit
def _merge_lists(list_key, new_key):
    """Merge two sorted SENT-padded key lists; returns (merged keys,
    tag per merged row: old-list position or -1 for new rows)."""
    allk = jnp.concatenate([list_key, new_key])
    tag = jnp.concatenate([
        jnp.arange(list_key.shape[0], dtype=jnp.int32),
        jnp.full(new_key.shape[0], -1, jnp.int32)])
    return jax.lax.sort((allk, tag), num_keys=1)


@functools.partial(jax.jit, static_argnames=("cap_old",))
def _prev_map(tag_sorted, cap_old: int):
    """prev_map[old_pos] = merged position (or -1 for old SENT pads that
    fell off the merged slice)."""
    pos = jnp.arange(tag_sorted.shape[0], dtype=jnp.int32)
    idx = jnp.where(tag_sorted >= 0, tag_sorted, cap_old)
    return jnp.full(cap_old, -1, jnp.int32).at[idx].set(pos, mode="drop")


@functools.partial(jax.jit, donate_argnums=())
def _scatter_old(pm, old_vals, new_shape_ref, fill):
    """Scatter old per-det payloads to merged positions (drop pads)."""
    out = jnp.full(new_shape_ref.shape[:1] + old_vals.shape[1:],
                   fill, old_vals.dtype)
    idx = jnp.where(pm >= 0, pm, new_shape_ref.shape[0])
    return out.at[idx].set(old_vals, mode="drop")


# ---------------------------------------------------------------------------
# N-1 sort-join on device
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("family", "nup", "ndn", "norb"))
def _join_sort(key, family: str, nup: int, ndn: int, norb: int):
    """Removal-key join, phase 1: pooled family keys sorted with det
    index payload + group-rank counts (ref algorithm: sparseham.py
    connected_pairs, itself the TPU redesign of chemistry.f90:9819)."""
    up = (key >> jnp.uint64(32))[:, None]
    dn = (key & MASK32)[:, None]
    bits_up = dets.to_bits(up, norb)
    bits_dn = dets.to_bits(dn, norb)
    occ_up = dets.occ_orbitals(bits_up, nup)
    occ_dn = dets.occ_orbitals(bits_dn, ndn)
    bu = jnp.asarray(_BIT_UP)
    bd = jnp.asarray(_BIT_DN)
    jk = []
    if family == "F2":
        for c1, c2 in combinations(range(nup), 2):
            jk.append(key ^ bu[occ_up[:, c1]] ^ bu[occ_up[:, c2]])
    elif family == "F4":
        for c1, c2 in combinations(range(ndn), 2):
            jk.append(key ^ bd[occ_dn[:, c1]] ^ bd[occ_dn[:, c2]])
    else:  # F5
        for c1 in range(nup):
            for c2 in range(ndn):
                jk.append(key ^ bu[occ_up[:, c1]] ^ bd[occ_dn[:, c2]])
    nch = len(jk)
    jkf = jnp.stack(jk, axis=1).reshape(-1)          # [n * nch]
    idx = jnp.repeat(jnp.arange(key.shape[0], dtype=jnp.int32), nch)
    jkf = jnp.where(jnp.repeat(key, nch) != SENT, jkf, SENT)
    sk, si = jax.lax.sort((jkf, idx), num_keys=1)
    m = sk.shape[0]
    newg = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
    pos = jnp.arange(m, dtype=jnp.int32)
    gstart = jax.lax.associative_scan(jnp.maximum, jnp.where(newg, pos, 0))
    local = pos - gstart
    counts = jnp.where(sk != SENT, local, 0).astype(jnp.int64)
    cum = jnp.cumsum(counts)
    return si, gstart, counts, cum, cum[-1]


@functools.partial(jax.jit, static_argnames=("cap_pairs", "cap_dets"))
def _join_emit(si, gstart, counts, cum, is_new, cap_pairs: int,
               cap_dets: int):
    """Phase 2: emit fused pair keys lo*cap_dets+hi for group pairs
    touching at least one new det; SENT for dead slots."""
    off = cum - counts
    t = jnp.arange(cap_pairs, dtype=jnp.int64)
    seg = jnp.clip(jnp.searchsorted(cum, t, side="right"),
                   0, si.shape[0] - 1)
    valid = t < cum[-1]
    partner = gstart[seg] + (t - off[seg]).astype(jnp.int32)
    a = si[seg]
    b = si[jnp.clip(partner, 0, si.shape[0] - 1)]
    lo = jnp.minimum(a, b).astype(jnp.uint64)
    hi = jnp.maximum(a, b).astype(jnp.uint64)
    ok = valid & (a != b) & (is_new[a] | is_new[b])
    return jnp.where(ok, lo * jnp.uint64(cap_dets) + hi, SENT)


@jax.jit
def _sort_unique(keys):
    """Sort u64 keys, keep first occurrences, SENT-pad; returns
    (compacted sorted keys, count)."""
    s = jax.lax.sort(keys)
    first = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
    keep = first & (s != SENT)
    return jax.lax.sort(jnp.where(keep, s, SENT)), jnp.sum(keep)


@functools.partial(jax.jit, static_argnames=("cap_dets",))
def _classify_pairs(pk, key, cap_dets: int):
    """Excitation class per pair, pairs sorted by class.

    Returns (a, b sorted-by-class, counts[5] for classes
    [dn-single, dn-double, up-single, opp-double, up-double])."""
    a = jnp.clip((pk // jnp.uint64(cap_dets)).astype(jnp.int32),
                 0, cap_dets - 1)
    b = jnp.clip((pk % jnp.uint64(cap_dets)).astype(jnp.int32),
                 0, cap_dets - 1)
    ka, kb = key[a], key[b]
    nu = jax.lax.population_count((ka >> jnp.uint64(32)) &
                                  ~(kb >> jnp.uint64(32))).astype(jnp.int32)
    nd = jax.lax.population_count((ka & MASK32) &
                                  ~(kb & MASK32)).astype(jnp.int32)
    ex = nu + nd
    cls = jnp.where((pk != SENT) & (ex >= 1) & (ex <= 2),
                    nu * 3 + nd, 99).astype(jnp.int32)
    sc, sa, sb = jax.lax.sort((cls, a, b), num_keys=1)
    counts = jnp.stack([jnp.sum(sc == c) for c in (1, 2, 3, 4, 6)])
    return sa, sb, counts


@functools.partial(jax.jit, static_argnames=("cls", "norb", "cap_c"))
def _eval_class_at(table, key, a, b, off, cnt, vals_out, *, cls: int,
                   norb: int, cap_c: int):
    """Evaluate one excitation class over the class-sorted pair window
    [off, off+cnt) and scatter the elements into vals_out.  off/cnt are
    traced so bucketed cap_c bounds the executable count."""
    idx = off + jnp.arange(cap_c, dtype=jnp.int64)
    idc = jnp.clip(idx, 0, a.shape[0] - 1)
    v = _eval_class(table, key, a[idc], b[idc], cls, norb)
    tgt = jnp.where(idx < off + cnt, idx, a.shape[0])
    return vals_out.at[tgt].set(v.astype(jnp.float32), mode="drop")


def _eval_class(table, key, a, b, cls: int, norb: int):
    """Matrix elements for one excitation class (word-level kernels)."""
    ka, kb = key[a], key[b]
    ua = (ka >> jnp.uint64(32))[:, None]
    ub = (kb >> jnp.uint64(32))[:, None]
    da = (ka & MASK32)[:, None]
    db = (kb & MASK32)[:, None]
    if cls == 6:     # up double
        return slater.same_spin_double_words(table, ua, ub)
    if cls == 2:     # dn double
        return slater.same_spin_double_words(table, da, db)
    if cls == 4:     # opposite double
        return slater.opp_spin_double_words(table, ua, ub, da, db)
    if cls == 3:     # up single
        return slater.single_words(table, ua, ub, da, norb)
    if cls == 1:     # dn single
        return slater.single_words(table, da, db, ua, norb)
    raise ValueError(cls)


@functools.partial(jax.jit, static_argnames=("cap_dets",))
def _coo_finalize(prev_key, prev_val, pm, a, b, v, cap_dets: int):
    """Remap the previous COO through prev_map, append the new entries,
    drop zeros, sort row-major.  Returns (pair keys, vals, nnz)."""
    pr = pm[jnp.clip((prev_key // jnp.uint64(cap_dets)).astype(jnp.int32),
                     0, pm.shape[0] - 1)]
    pc = pm[jnp.clip((prev_key % jnp.uint64(cap_dets)).astype(jnp.int32),
                     0, pm.shape[0] - 1)]
    pk_prev = jnp.where(prev_key != SENT,
                        pr.astype(jnp.uint64) * jnp.uint64(cap_dets)
                        + pc.astype(jnp.uint64), SENT)
    pk_new = jnp.where(v != 0.0,
                       a.astype(jnp.uint64) * jnp.uint64(cap_dets)
                       + b.astype(jnp.uint64), SENT)
    allk = jnp.concatenate([pk_prev, pk_new])
    allv = jnp.concatenate([prev_val.astype(jnp.float32),
                            v.astype(jnp.float32)])
    sk, sv = jax.lax.sort((allk, allv), num_keys=1)
    return sk, sv, jnp.sum(sk != SENT)


# NOTE on prev-COO remapping across cap_dets growth: prev_key encodes
# (row, col) with the PREVIOUS iteration's cap; _coo_finalize must decode
# with that cap.  The driver passes prev entries re-encoded to the current
# cap beforehand (_reencode_pairs).
@functools.partial(jax.jit, static_argnames=("cap_from", "cap_to"))
def _reencode_pairs(pk, cap_from: int, cap_to: int):
    a = (pk // jnp.uint64(cap_from))
    b = (pk % jnp.uint64(cap_from))
    return jnp.where(pk != SENT, a * jnp.uint64(cap_to) + b, SENT)


@functools.partial(jax.jit, static_argnames=("norb",))
def _diag_all(table, key, norb: int):
    up = (key >> jnp.uint64(32))[:, None]
    dn = (key & MASK32)[:, None]
    d = slater.diag_elements(table, dets.to_bits(up, norb),
                             dets.to_bits(dn, norb)).astype(jnp.float32)
    return jnp.where(key != SENT, d, DIAG_PAD)


# ---------------------------------------------------------------------------
# block-ELL construction on device (layout: ops/spmv_pallas.blockell)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cap_dets",))
def _blockell_count(coo_key, cap_dets: int):
    """Row counts of the symmetric expansion (+diagonal) and the padded
    slot total P = 128 * sum(ceil(count/128))."""
    r = jnp.clip((coo_key // jnp.uint64(cap_dets)).astype(jnp.int32),
                 0, cap_dets - 1)
    c = jnp.clip((coo_key % jnp.uint64(cap_dets)).astype(jnp.int32),
                 0, cap_dets - 1)
    valid = coo_key != SENT
    ones = valid.astype(jnp.int32)
    counts = (jnp.zeros(cap_dets, jnp.int32)
              .at[r].add(ones).at[c].add(ones)) + 1   # +1 diagonal per row
    nb_r = jnp.maximum(-(-counts // 128), 1)
    return counts, nb_r, jnp.sum(nb_r) * 128


@functools.partial(jax.jit, static_argnames=("cap_dets", "cap_P"))
def _blockell_fill(coo_key, coo_val, diag, counts, nb_r,
                   cap_dets: int, cap_P: int):
    """Scatter the symmetric expansion into the 128-slot row blocks."""
    r = jnp.clip((coo_key // jnp.uint64(cap_dets)).astype(jnp.int32),
                 0, cap_dets - 1)
    c = jnp.clip((coo_key % jnp.uint64(cap_dets)).astype(jnp.int32),
                 0, cap_dets - 1)
    valid = coo_key != SENT
    ar = jnp.arange(cap_dets, dtype=jnp.int32)
    rows_all = jnp.concatenate([r, c, ar])
    cols_all = jnp.concatenate([c, r, ar])
    vals_all = jnp.concatenate([coo_val, coo_val,
                                jnp.where(diag < DIAG_PAD, diag, 0.0)])
    ok = jnp.concatenate([valid, valid, jnp.ones(cap_dets, bool)])
    rows_all = jnp.where(ok, rows_all, cap_dets)
    sr, sc, sv = jax.lax.sort(
        (rows_all, cols_all, vals_all), num_keys=1)
    block_start = (jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(nb_r)[:-1]]) * 128)
    csr_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]])
    pos = jnp.arange(sr.shape[0], dtype=jnp.int32)
    src = jnp.clip(sr, 0, cap_dets - 1)
    slot = block_start[src] + (pos - csr_start[src])
    slot = jnp.where(sr < cap_dets, slot, cap_P)
    ell_cols = jnp.zeros(cap_P, jnp.int32).at[slot].set(sc, mode="drop")
    ell_vals = jnp.zeros(cap_P, jnp.float32).at[slot].set(sv, mode="drop")
    nb_cum = jnp.cumsum(nb_r)
    ell_row = jnp.searchsorted(
        nb_cum, jnp.arange(cap_P // 128, dtype=jnp.int32), side="right"
    ).astype(jnp.int32)
    ell_row = jnp.clip(ell_row, 0, cap_dets - 1)
    return ell_cols, ell_vals, ell_row


@functools.partial(jax.jit, static_argnames=("n",))
def _spmv(x, ell_cols, ell_vals, ell_row, n: int):
    prod = ell_vals * x[ell_cols]
    blk = jnp.sum(prod.reshape(-1, 128), axis=1)
    return jax.ops.segment_sum(blk, ell_row, num_segments=n,
                               indices_are_sorted=True)


# ---------------------------------------------------------------------------
# device Davidson (masked fixed-size subspace)
# ---------------------------------------------------------------------------

# All subspace matmuls run at Precision.HIGHEST: the v5e MXU quantizes
# f32 matmul operands to bf16 at default precision (PERF_NOTES round-3i),
# which corrupts the Gram matrix at the 1e-2 level and stalls Davidson.
# HIGHEST is honored for these plain 2D dots (2e-7 rel, measured
# tools/microbench_rowsum.py).
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


@functools.partial(jax.jit, static_argnames=())
def _dav_gram(V, W, mask):
    """Masked Gram matrix G = V^T H V (small [m_max, m_max]); pulled to
    host each iteration, where the dense eigenproblem is solved in f64
    (the on-device f32 eigensolver under bf16 matmul quantization
    returned bf16-resolution eigenvalues - measured on the v5e)."""
    f32 = jnp.float32
    Vm = V * mask[None, :].astype(f32)
    Wm = W * mask[None, :].astype(f32)
    G = _mm(Vm.T, Wm)
    G = 0.5 * (G + G.T)
    big = (~mask).astype(f32) * jnp.asarray(1e12, f32)
    return G + jnp.diag(big)


@functools.partial(jax.jit, static_argnames=("k", "n", "m_max"))
def _dav_expand(V, W, mask, Sk, evals, diag, ell_cols, ell_vals, ell_row,
                k: int, n: int, m_max: int):
    """Expansion half of one Davidson iteration: Ritz vectors from the
    host-solved (Sk, evals), preconditioned residual directions,
    orthonormalization, spmv, column append (ref: davidson_sparse,
    more_tools.f90:2018; restart = collapse to the Ritz block)."""
    f32 = jnp.float32
    Vm = V * mask[None, :].astype(f32)
    Wm = W * mask[None, :].astype(f32)
    X = _mm(Vm, Sk)
    HX = _mm(Wm, Sk)
    R = HX - X * evals[None, :]
    res_norm = jnp.linalg.norm(R, axis=0)
    denom = evals[None, :] - diag[:, None]
    denom = jnp.where(jnp.abs(denom) < 1e-6, -1.0, denom)
    T = (R / denom).astype(f32)
    for _ in range(2):
        T = T - _mm(Vm, _mm(Vm.T, T))
    # per-column normalize + internal Gram-Schmidt (k is small)
    cols = []
    kept = []
    for i in range(k):
        t = T[:, i]
        for t_prev, kept_prev in zip(cols, kept):
            # elementwise-mul + reduce: exact f32 (never lowers to the
            # bf16-quantizing MXU, unlike a 1-D dot)
            t = t - t_prev * jnp.sum(t_prev * t) * kept_prev
        nrm = jnp.linalg.norm(t)
        ok = nrm > 1e-6
        t = t / jnp.where(ok, nrm, 1.0)
        cols.append(jnp.where(ok, t, 0.0))
        kept.append(ok.astype(f32))
    T = jnp.stack(cols, axis=1)
    keptv = jnp.stack([kk.astype(bool) for kk in kept])

    m = jnp.sum(mask.astype(jnp.int32)).astype(jnp.int32)
    restart = m + k > m_max

    def do_restart(_):
        V2 = jnp.zeros_like(V)
        W2 = jnp.zeros_like(W)
        V2 = jax.lax.dynamic_update_slice(V2, X, (0, 0))
        W2 = jax.lax.dynamic_update_slice(W2, HX, (0, 0))
        mask2 = jnp.arange(m_max) < k
        # re-orthogonalize T against the Ritz block
        T2 = T - _mm(X, _mm(X.T, T))
        nrms = jnp.linalg.norm(T2, axis=0)
        ok2 = keptv & (nrms > 1e-6)
        T2 = T2 / jnp.where(ok2, nrms, 1.0)[None, :]
        T2 = T2 * ok2[None, :].astype(f32)
        return V2, W2, mask2, T2, ok2, jnp.asarray(k, jnp.int32)

    def no_restart(_):
        return V, W, mask, T, keptv, m

    V1, W1, mask1, T1, kept1, m1 = jax.lax.cond(restart, do_restart,
                                                no_restart, None)
    HT = jnp.stack([_spmv(T1[:, i], ell_cols, ell_vals, ell_row, n)
                    for i in range(k)], axis=1)
    # append kept new columns at positions m1..m1+k-1 (zero columns for
    # dropped ones keep shapes static; their mask stays off)
    colpos = m1 + jnp.cumsum(kept1.astype(jnp.int32)) - kept1.astype(jnp.int32)
    colpos = jnp.where(kept1, colpos, m_max)
    Vt = V1.T
    Wt = W1.T
    Vt = Vt.at[colpos].set(T1.T, mode="drop")
    Wt = Wt.at[colpos].set(HT.T, mode="drop")
    mask_new = mask1 | (jnp.zeros(m_max, bool).at[colpos].set(
        jnp.ones(k, bool), mode="drop"))
    return Vt.T, Wt.T, mask_new, X, res_norm


def _dav_iter(V, W, mask, diag, ell_cols, ell_vals, ell_row,
              k: int, n: int, m_max: int):
    """One Davidson iteration: device Gram -> host f64 eigh of the tiny
    [m_max, m_max] subspace problem -> device expansion.  The host hop
    costs one extra small transfer per iteration on top of the
    convergence-check sync the driver already does."""
    G = np.asarray(_dav_gram(V, W, mask), np.float64)
    w, S = np.linalg.eigh(G)
    evals = jnp.asarray(w[:k], jnp.float32)
    Sk = jnp.asarray(S[:, :k], jnp.float32)
    V, W, mask, X, res = _dav_expand(V, W, mask, Sk, evals, diag,
                                     ell_cols, ell_vals, ell_row,
                                     k=k, n=n, m_max=m_max)
    return V, W, mask, jnp.asarray(w[:k]), X, res


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def run_hci_device(system, eps_var: float, eps_var_sched=None,
                   n_states: int = 1, max_iters: int = 50,
                   verbose: bool = True, batch_refs: int = 16384,
                   dav_tol: float = 3e-6, dav_max_iter: int = 200,
                   ledger: dict | None = None) -> HCIResult:
    """Device-resident variational HCI (see module docstring).

    Control flow mirrors run_hci exactly (eps schedule, min_H_done skip
    window, exit criteria 1 and 2 - ref hci.f90:359-517); only the data
    residency and kernel forms differ.  Returns the same HCIResult.
    """
    nup, ndn, norb = system.nup, system.ndn, system.norb
    assert system.n_words == 1 and norb <= 32, \
        "device HCI fast path requires norb <= 32 (use run_hci otherwise)"
    assert not getattr(system, "time_sym", False), \
        "device HCI fast path does not support time_sym"
    hb = system.heatbath
    table = system.table
    orb_sym = jnp.asarray(system.orb_sym_arr)
    k = n_states

    if eps_var_sched is None:
        eps_var_sched = [eps_var]
    final_eps = eps_var

    # resident state (device); caps are power-of-two buckets
    cap = _bucket(batch_refs, floor=batch_refs)
    key0 = _fuse_np(system.hf_up[None, :], system.hf_dn[None, :])[0]
    list_key = jnp.full(cap, SENT, jnp.uint64).at[0].set(key0)
    n = 1
    wts = jnp.zeros((cap, k), jnp.float32).at[0, 0].set(1.0)
    min_H_done = jnp.full(cap, jnp.inf, jnp.float32)
    diag = _diag_all(table, list_key, norb)
    e_hf = float(diag[0])
    energies = np.full(k, e_hf)
    coo_key = jnp.full(0, SENT, jnp.uint64)
    coo_val = jnp.zeros(0, jnp.float32)
    cap_prev = cap

    def _log(tag, t0):
        if ledger is not None:
            import time
            ledger[tag] = ledger.get(tag, 0.0) + (time.time() - t0)

    if verbose:
        print(f"Iteration   0 eps1={eps_var:8.1e} ndets={1:9d} energy=" +
              " ".join(f"{e:16.9f}" for e in energies), flush=True)

    import time
    n_iter_done = 0
    for it in range(1, max_iters + 1):
        eps = eps_var_sched[it - 1] if it <= len(eps_var_sched) else final_eps
        n_old = n

        # --- candidate generation (device batches over the resident list)
        t0 = time.time()
        with phase("get_next_det_list", enabled=verbose):
            coeffs = jnp.max(jnp.abs(wts), axis=1) if it > 1 else wts[:, 0]
            coeffs = jnp.maximum(jnp.abs(coeffs), 1e-30)
            eps_per_ref = (eps / coeffs).astype(jnp.float64)
            up_all = (list_key >> jnp.uint64(32))[:, None]
            dn_all = (list_key & MASK32)[:, None]
            batches = []
            for beg in range(0, cap, batch_refs):
                sl = slice(beg, beg + batch_refs)
                epr = jnp.where(list_key[sl] != SENT, eps_per_ref[sl],
                                jnp.inf)
                mh = jnp.where(list_key[sl] != SENT,
                               min_H_done[sl].astype(jnp.float64), jnp.inf)
                n_emit, lo, desc = count_doubles(
                    hb, up_all[sl], dn_all[sl], epr, mh, nup=nup, ndn=ndn)
                batches.append((sl, epr, mh, n_emit, lo, desc,
                                jnp.sum(n_emit)))
            totals = np.asarray(jnp.stack([b[-1] for b in batches]))
            chunks = []
            for (sl, epr, mh, n_emit, lo, desc, _), tot in zip(batches,
                                                               totals):
                if tot > 0:
                    cap_e = _bucket(int(tot))
                    d = emit_doubles(hb, table, up_all[sl], dn_all[sl],
                                     n_emit, lo, desc, cap=cap_e, norb=norb)
                    kk = (d["new_up"][:, 0] << jnp.uint64(32)) | \
                        d["new_dn"][:, 0]
                    chunks.append(jnp.where(d["valid"], kk, SENT))
                if system.has_singles:
                    s = emit_singles(table, orb_sym, up_all[sl], dn_all[sl],
                                     epr, mh, nup=nup, ndn=ndn, norb=norb)
                    kk = (s["new_up"][:, 0] << jnp.uint64(32)) | \
                        s["new_dn"][:, 0]
                    chunks.append(jnp.where(s["valid"], kk, SENT))
            min_H_done = jnp.minimum(min_H_done,
                                     eps_per_ref.astype(jnp.float32))
            if chunks:
                cand = jnp.concatenate(chunks)
                new_sorted, n_new_d = _dedup_diff(cand, list_key)
                n_new = int(n_new_d)
            else:
                new_sorted, n_new = None, 0
        _log("get_next_det_list", t0)

        n_total = n_old + n_new
        if n_new == 0:
            if verbose:
                print("Cycling hci iteration because no new dets", flush=True)
            if it >= len(eps_var_sched) or eps == eps_var_sched[-1]:
                break
            continue
        if (n_total <= int(1.00001 * n_old)
                and eps == (eps_var_sched[-1] if eps_var_sched else final_eps)):
            if verbose:
                print("Exiting variational part because of number of new "
                      "dets criterion", flush=True)
            break

        # --- merge (device)
        t0 = time.time()
        cap_new = _bucket(n_new)
        new_key = _fit(new_sorted, cap_new, SENT)
        cap_total = _bucket(n_total, floor=batch_refs)
        sk, st = _merge_lists(list_key, new_key)
        merged = _fit(sk, cap_total, SENT)
        tag_m = _fit(st, cap_total, np.int32(-1))
        pm = _prev_map(tag_m, cap)
        is_new = (tag_m == -1) & (merged != SENT)
        wts2 = _scatter_old(pm, wts, merged, np.float32(0.0))
        mhd2 = _scatter_old(pm, min_H_done, merged, np.float32(np.inf))
        _log("merge", t0)

        # --- sparse H by device sort-join
        t0 = time.time()
        with phase("generate_sparse_ham", enabled=verbose):
            pk_chunks = []
            fams = ["F2"] if nup >= 2 else []
            fams += ["F4"] if ndn >= 2 else []
            fams += ["F5"] if (nup >= 1 and ndn >= 1) else []
            for fam in fams:
                si, gstart, counts, cum, tot = _join_sort(
                    merged, fam, nup, ndn, norb)
                tot = int(tot)
                if tot == 0:
                    continue
                cap_p = _bucket(tot)
                pk_chunks.append(_join_emit(si, gstart, counts, cum,
                                            is_new, cap_p, cap_total))
            pks, n_pairs_d = _sort_unique(jnp.concatenate(pk_chunks))
            n_pairs = int(n_pairs_d)
            cap_pairs = _bucket(max(n_pairs, 1))
            pks = _fit(pks, cap_pairs, SENT)
            sa, sb, ccounts = _classify_pairs(pks, merged, cap_total)
            ccounts = np.asarray(ccounts)
            offs = np.concatenate([[0], np.cumsum(ccounts)])
            vals_new = jnp.zeros(cap_pairs, jnp.float32)
            # chunk each class window to <= 2^19 rows per dispatch (the
            # proven eval_pairs batch scale; a single multi-million-row
            # element kernel stalled the tunnel compile)
            CHUNK = 1 << 19
            for ci, cls in enumerate((1, 2, 3, 4, 6)):
                cnt = int(ccounts[ci])
                base = int(offs[ci])
                done = 0
                while done < cnt:
                    step_n = min(cnt - done, CHUNK)
                    vals_new = _eval_class_at(
                        table, merged, sa, sb,
                        jnp.asarray(base + done, jnp.int64),
                        jnp.asarray(step_n, jnp.int64), vals_new,
                        cls=cls, norb=norb,
                        cap_c=_bucket(step_n, floor=1024))
                    done += step_n
            # prev COO re-encoded to the current cap before remap
            prev_k = _reencode_pairs(coo_key, cap_prev, cap_total) \
                if cap_prev != cap_total else coo_key
            ck, cv, nnz_d = _coo_finalize(prev_k, coo_val, pm,
                                          sa, sb, vals_new, cap_total)
            nnz = int(nnz_d)
            cap_nnz = _bucket(nnz)
            coo_key = _fit(ck, cap_nnz, SENT)
            coo_val = _fit(cv, cap_nnz, np.float32(0.0))
            diag = _diag_all(table, merged, norb)
        _log("generate_sparse_ham", t0)

        # --- block-ELL + Davidson (device)
        t0 = time.time()
        with phase("davidson", enabled=verbose):
            counts_r, nb_r, P_d = _blockell_count(coo_key, cap_total)
            cap_P = _bucket(int(P_d), floor=1 << 16)
            ell_cols, ell_vals, ell_row = _blockell_fill(
                coo_key, coo_val, diag, counts_r, nb_r, cap_total, cap_P)
            m_max = max(8 * k, 48)
            V = jnp.zeros((cap_total, m_max), jnp.float32)
            X0 = wts2
            # extra states start as unit vectors on the lowest diagonals
            X0np_norm = np.asarray(jnp.linalg.norm(X0, axis=0))
            if (X0np_norm < 1e-12).any():
                d_host = np.asarray(diag)
                X0 = X0.copy()
                ordr = np.argsort(d_host)
                j = 0
                for s_i in range(k):
                    if X0np_norm[s_i] < 1e-12:
                        X0 = X0.at[ordr[j], s_i].set(1.0)
                        j += 1
            # orthonormalize X0 (host QR on the thin matrix is exact)
            X0h, _ = np.linalg.qr(np.asarray(X0, np.float64))
            V = V.at[:, :k].set(jnp.asarray(X0h, jnp.float32))
            W = jnp.zeros((cap_total, m_max), jnp.float32)
            for i in range(k):
                W = W.at[:, i].set(_spmv(V[:, i], ell_cols, ell_vals,
                                         ell_row, cap_total))
            mask = jnp.arange(m_max) < k
            theta_old = np.full(k, np.inf)
            X = V[:, :k]
            for dav_it in range(dav_max_iter):
                V, W, mask, evals_d, X, res = _dav_iter(
                    V, W, mask, diag, ell_cols, ell_vals, ell_row,
                    k, cap_total, m_max)
                evals_np = np.asarray(evals_d, np.float64)
                if np.max(np.abs(evals_np - theta_old)) < dav_tol:
                    break
                theta_old = evals_np
            # host-f64 Rayleigh refinement from x and y = Hx
            evals_ref = np.empty(k)
            Xh = np.asarray(X, np.float64)
            for i in range(k):
                y = np.asarray(_spmv(X[:, i], ell_cols, ell_vals,
                                     ell_row, cap_total), np.float64)
                x = Xh[:, i]
                nrm2 = float(x @ x)
                evals_ref[i] = float(x @ y) / nrm2
            wts = X / jnp.asarray(np.linalg.norm(Xh, axis=0), jnp.float32)
        _log("davidson", t0)

        list_key, min_H_done = merged, mhd2
        n, cap_prev, cap = n_total, cap_total, cap_total
        old_energies = energies
        energies = evals_ref
        n_iter_done = it
        if verbose:
            print(f"Iteration{it:4d} eps1={eps:8.1e} ndets={n_total:9d} "
                  f"energy=" + " ".join(f"{e:16.9f}" for e in energies),
                  flush=True)
        if (np.max(np.abs(energies - old_energies)) < 1e-5
                and eps == (eps_var_sched[-1] if eps_var_sched else final_eps)):
            if verbose:
                print("Exiting variational part because of energy criterion",
                      flush=True)
            break

    if verbose:
        print(f"Final Iteration{n_iter_done:4d} {n:9d} dets, energy=" +
              " ".join(f"{e:16.9f}" for e in energies), flush=True)
        print("Variational energy=" + f"{energies[0]:26.9f}".rjust(15),
              flush=True)

    # pull the final state to host (once)
    keys = np.asarray(list_key[:_bucket(n)])[:n]
    up = (keys >> np.uint64(32))[:, None]
    dn = (keys & np.uint64(0xFFFFFFFF))[:, None]
    wts_h = np.asarray(wts, np.float64)[:n]
    diag_h = np.asarray(diag, np.float64)[:n]
    ck_h = np.asarray(coo_key)
    cv_h = np.asarray(coo_val, np.float64)
    valid = ck_h != SENT
    rows = (ck_h[valid] // np.uint64(cap)).astype(np.int32)
    cols = (ck_h[valid] % np.uint64(cap)).astype(np.int32)
    H = SparseHam(n=n, rows=rows, cols=cols, vals=cv_h[valid], diag=diag_h)
    return HCIResult(up=up, dn=dn, wts=wts_h, energies=energies,
                     diag=diag_h, n_iters=n_iter_done, ham=H)
