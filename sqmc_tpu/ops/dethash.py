"""Cuckoo-hash lookups into static determinant lists (round-4h).

Every generation the walk searches ~F fresh determinants against static
sorted lists — dominated by the C(T) psi_t-connected cache (129k dets
for the flagship C2 trial).  The sort-based ``searchsorted(method='sort')``
costs 6.2 ms/step at [32k queries x 129k list] on v5e because it re-sorts
queries+list every step (PERF_NOTES round-3k).  A cuckoo hash table
replaces it with a STATIC probe count of exactly two packed-row gathers +
plane compares: TPU gathers are cheap at [F]-row granularity and the
probe count is shape-static (no data-dependent while loop under jit).

Table layout: [T, 2W+2] uint32 rows (T a power of two) —
``up`` word planes (u64 split lo/hi... see below), ``dn`` planes, then the
value plane (the det's index in the sorted list).  For norb <= 32 (W=1,
words fit 32 bits) the key is 2 planes and rows are 16 B — one fused row
gather per probe.  Empty slots carry the all-ones key (an occupation word
with bits above norb set — impossible for a physical determinant).

The hash mixes the key planes FNV-1a style with two per-table odd seeds
(carried in the table's last row so the jitted lookup stays purely
array-driven); the host build retries seeds until cuckoo insertion
converges.

Ref parity: the reference binary-searches psi_t_connected on every
walker (semistoch.f90 binary_search / hash tables in fhash_module.f90 —
the reference itself uses open hashing for its det maps); results are
identical (sorted-list index, or -1 when absent).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = ["build_det_hash", "lookup_det_hash"]

_EMPTY = np.uint32(0xFFFFFFFF)


def _planes_np(up, dn, norb):
    """[n, P] uint32 key planes from packed [n, W] u64 det halves.
    norb <= 32: one plane per half (the words fit 32 bits).  Otherwise
    two planes (lo, hi) per word."""
    up = np.asarray(up, np.uint64).reshape(len(up), -1)
    dn = np.asarray(dn, np.uint64).reshape(len(dn), -1)
    cols = []
    for arr in (up, dn):
        for w in range(arr.shape[1]):
            word = arr[:, w]
            cols.append((word & np.uint64(0xFFFFFFFF)).astype(np.uint32))
            if norb is None or norb > 32:
                cols.append((word >> np.uint64(32)).astype(np.uint32))
    return np.stack(cols, axis=1)


def _hash_np(planes, seed, logT):
    h = np.full(planes.shape[0], np.uint32(2166136261 ^ seed), np.uint32)
    mult = np.uint32(16777619)
    for p in range(planes.shape[1]):
        h = (h ^ planes[:, p]) * mult
    # final avalanche then fold to logT bits (multiply-shift)
    h ^= h >> np.uint32(16)
    h = h * np.uint32(0x7FEB352D)
    h ^= h >> np.uint32(15)
    return (h >> np.uint32(32 - logT)).astype(np.int64)


def build_det_hash(up, dn, norb, min_logT=10, max_tries=8):
    """Host-side cuckoo build.  Returns a [T+1, P+1] uint32 table whose
    last row carries (seed1, seed2, logT, 0-pad); raises only if every
    seed pair fails (practically impossible at load <= 0.25)."""
    planes = _planes_np(up, dn, norb)
    n, P = planes.shape
    logT = max(min_logT, int(np.ceil(np.log2(max(n, 1) * 4))))
    T = 1 << logT
    vals = np.arange(n, dtype=np.uint32)
    for trial in range(max_tries):
        s1 = np.uint32(0x9E3779B1 + 0x85EBCA77 * trial)
        s2 = np.uint32(0xC2B2AE3D + 0x27D4EB2F * trial)
        h1 = _hash_np(planes, s1, logT)
        h2 = _hash_np(planes, s2, logT)
        slot_key = np.full((T, P), _EMPTY, np.uint32)
        slot_val = np.zeros(T, np.uint32)
        ok = True
        for i in range(n):
            key, val = planes[i], vals[i]
            a, b = int(h1[i]), int(h2[i])
            kh1, kh2 = h1, h2
            for _ in range(128):          # eviction chain bound
                if (slot_key[a] == _EMPTY).all():
                    slot_key[a] = key
                    slot_val[a] = val
                    break
                # evict the occupant of `a`, move it to its alternate
                key, slot_key[a] = slot_key[a].copy(), key
                val, slot_val[a] = int(slot_val[a]), val
                j = int(val)                      # evicted det id
                alt1, alt2 = int(kh1[j]), int(kh2[j])
                a = alt2 if a == alt1 else alt1
            else:
                ok = False
                break
        if ok:
            table = np.concatenate(
                [slot_key, slot_val[:, None]], axis=1)
            width = -(-(P + 1) // 4) * 4        # 16 B-aligned rows
            if width > P + 1:
                table = np.concatenate(
                    [table, np.zeros((T, width - P - 1), np.uint32)],
                    axis=1)
            meta = np.zeros((1, width), np.uint32)
            meta[0, 0] = s1
            meta[0, 1] = s2
            meta[0, 2] = np.uint32(logT)
            return np.concatenate([table, meta], axis=0)
    raise RuntimeError(
        f"cuckoo build failed for {n} keys at T={T} after {max_tries} seeds")


def _planes_jnp(up, dn, norb):
    cols = []
    for arr in (up, dn):
        for w in range(arr.shape[1]):
            word = arr[:, w]
            cols.append((word & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32))
            if norb is None or norb > 32:
                cols.append((word >> jnp.uint64(32)).astype(jnp.uint32))
    return cols


def _hash_jnp(cols, seed, logT):
    h = jnp.uint32(2166136261) ^ seed
    mult = jnp.uint32(16777619)
    for p in cols:
        h = (h ^ p) * mult
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> jnp.uint32(15))
    return (h >> (jnp.uint32(32) - logT)).astype(jnp.int32)


def lookup_det_hash(table, q_up, q_dn, norb):
    """Index of each query det in the hashed list, -1 if absent.  Exactly
    two [F]-row gathers; identical results to walk._searchsorted_dets.
    `table` is build_det_hash's output ([T+1, width] u32, width 16 B-
    aligned; logT is read from the static shape, seeds from the meta
    row; the plane count is re-derived from the query shape + norb)."""
    logT = int(np.log2(table.shape[0] - 1))
    assert (1 << logT) == table.shape[0] - 1
    seeds = table[-1]
    cols = _planes_jnp(q_up, q_dn, norb)
    P = len(cols)
    assert table.shape[1] >= P + 1, (table.shape, P)
    out = jnp.full(q_up.shape[0], -1, jnp.int32)
    for s in (seeds[0], seeds[1]):
        h = _hash_jnp(cols, s, jnp.uint32(logT))
        rows = jnp.take(table, h, axis=0)          # [F, P+1] row gather
        ok = jnp.ones(q_up.shape[0], bool)
        for p in range(P):
            ok = ok & (rows[:, p] == cols[p])
        out = jnp.where(ok & (out < 0), rows[:, P].astype(jnp.int32), out)
    return out
