"""Sorted set algebra over packed determinant keys.

The TPU-native replacement for the reference's hash tables and pointer-chasing
merges (ref: fhash.f90, tools.f90 merge_original_with_spawned3:411-1133,
do_walk.f90 merge_sort2_up_dn:5310): determinant sets are kept sorted by the
(up, dn) key and all set operations are sort / unique / segment-sum.

Host (numpy) implementations are provided for the variable-size driver loops
(HCI selection, sparse-H build) where result sizes are data dependent; the
fixed-capacity device versions used inside jitted walkers live in
sqmc_tpu.algo.walk.
"""

from __future__ import annotations

import numpy as np


def _key_columns(up: np.ndarray, dn: np.ndarray):
    """Columns for np.lexsort, least-significant first: dn words little->big,
    then up words little->big => primary key = up most-significant word."""
    cols = []
    for w in range(dn.shape[1]):
        cols.append(dn[:, w])
    for w in range(up.shape[1]):
        cols.append(up[:, w])
    return cols


def lexsort_dets(up: np.ndarray, dn: np.ndarray) -> np.ndarray:
    """Sort order of packed dets by (up, dn), up-major. [n,W]x2 -> perm [n]."""
    return np.lexsort(_key_columns(up, dn))


def dets_equal_adjacent(up: np.ndarray, dn: np.ndarray) -> np.ndarray:
    """Boolean [n]: row equals previous row (for sorted arrays)."""
    same = np.ones(len(up), dtype=bool)
    same[0] = False
    same[1:] = np.all(up[1:] == up[:-1], axis=1) & np.all(dn[1:] == dn[:-1], axis=1)
    return same


def unique_dets(up: np.ndarray, dn: np.ndarray, payloads: list | None = None,
                sum_payloads: bool = True):
    """Sort by key and merge duplicates.

    payloads: list of [n]- or [n,k]-shaped arrays; duplicates are summed
    (sum_payloads=True; the annihilation/accumulation primitive) or
    first-occurrence-kept (False).

    Returns (up_u, dn_u, payloads_u, inverse) where inverse maps each input
    row to its output row.
    """
    order = lexsort_dets(up, dn)
    up_s, dn_s = up[order], dn[order]
    dup = dets_equal_adjacent(up_s, dn_s)
    group = np.cumsum(~dup) - 1      # group id per sorted row
    n_u = group[-1] + 1 if len(group) else 0
    first = np.nonzero(~dup)[0]
    up_u, dn_u = up_s[first], dn_s[first]
    outs = []
    if payloads is not None:
        for p in payloads:
            p_s = np.asarray(p)[order]
            if sum_payloads and np.issubdtype(p_s.dtype, np.number):
                acc = np.zeros((n_u,) + p_s.shape[1:], dtype=p_s.dtype)
                np.add.at(acc, group, p_s)
                outs.append(acc)
            else:
                outs.append(p_s[first])
    inverse = np.empty(len(up), dtype=np.int64)
    inverse[order] = group
    return up_u, dn_u, outs, inverse


def search_dets(up_sorted: np.ndarray, dn_sorted: np.ndarray,
                up_q: np.ndarray, dn_q: np.ndarray) -> np.ndarray:
    """Binary search queries in a sorted det list.

    Returns int64 [m]: index into the sorted list, or -1 if absent
    (the TPU/sort analog of more_tools binary_search:3842).
    Works for any word count by successive-key refinement via np.searchsorted
    on a fused byte view.
    """
    key_s = fuse_key(up_sorted, dn_sorted)
    key_q = fuse_key(up_q, dn_q)
    idx = np.searchsorted(key_s, key_q)
    idx_c = np.clip(idx, 0, len(key_s) - 1)
    found = np.zeros(len(key_q), dtype=bool)
    if len(key_s):
        found = key_s[idx_c] == key_q
    return np.where(found, idx_c, -1)


def fuse_key(up: np.ndarray, dn: np.ndarray) -> np.ndarray:
    """Fuse packed det words into a single comparable void/structured key or,
    for the common W=1 case, an object-free (n,) array usable with
    np.searchsorted.  For W=1 we build a float-free composite by viewing the
    two uint64s as a big-endian byte string (void16)."""
    n, W = up.shape
    # big-endian word order: up most-significant first, then dn
    cols = [up[:, w] for w in range(W - 1, -1, -1)] + \
           [dn[:, w] for w in range(W - 1, -1, -1)]
    arr = np.stack(cols, axis=1)          # [n, 2W] uint64
    be = arr.astype(">u8")                # big-endian so byte compare == numeric
    return be.reshape(n, -1).view(f"V{16 * W}").ravel()


def keys_less(up_a, dn_a, up_b, dn_b):
    """Elementwise (up_a,dn_a) < (up_b,dn_b) in the (up-major, MSW-first)
    det ordering.  All [n,W] uint64."""
    n, W = up_a.shape
    lt = np.zeros(n, bool)
    gt = np.zeros(n, bool)
    for w in range(W - 1, -1, -1):
        a, b = up_a[:, w], up_b[:, w]
        lt |= ~gt & ~lt & (a < b)
        gt |= ~lt & ~gt & (a > b)
    for w in range(W - 1, -1, -1):
        a, b = dn_a[:, w], dn_b[:, w]
        lt |= ~gt & ~lt & (a < b)
        gt |= ~lt & ~gt & (a > b)
    return lt


def setdiff_dets(up_a, dn_a, up_b, dn_b):
    """Rows of (a) not present in sorted-or-not (b).  Returns mask over a."""
    if len(up_b) == 0:
        return np.ones(len(up_a), dtype=bool)
    order = lexsort_dets(up_b, dn_b)
    idx = search_dets(up_b[order], dn_b[order], up_a, dn_a)
    return idx < 0
