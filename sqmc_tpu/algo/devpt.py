"""Device-resident second-order PT: the on-chip companion of devhci.

The round-4 on-chip PT ledger (tools/bench_hci_e2e_tpu.py --mode tpu)
spent ~26 s per stochastic sample: every sample shipped the full
candidate buffer (~100+ MB) device->host and np.lexsort'ed it on one
CPU core.  Here a sample is a handful of device dispatches and ONE
scalar (the sample estimate) crosses the tunnel; the candidate
merge/dedup is a device sort + segment sums, membership tests are
searchsorted over the fused u64 det keys, and the external-det diagonal
elements evaluate on device (ref: hci.f90 second_order_pt:1100,
second_order_pt_alias:1314; sample compression sort_and_merge
tools.f90:1574 -> device sort; Welford tools.f90:1761 stays host).

Scope gate: norb <= 32, n_words == 1, time_sym off (as devhci).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.alias import sample_alias, setup_alias_np
from ..utils.timers import phase
from .connect import count_doubles, emit_doubles, emit_singles
from .devhci import MASK32, SENT, _bucket, _diag_all, _fuse_np

INT_SENT = np.int32(2 ** 31 - 1)


@functools.partial(jax.jit, static_argnames=("n_mc",))
def _compress_sample(rng_key, J, q, prob, coeffs, eps_pt, n_mc: int):
    """Draw n_mc refs iid ~ p, compress duplicates (ref sort_and_merge,
    tools.f90:1574).  Returns (uniq [n_mc] i32 w/ INT_SENT pads,
    w_over_p [n_mc], eps_ref [n_mc], n_uniq)."""
    idx = sample_alias(rng_key, J, q, n_mc)
    si = jnp.sort(idx)
    first = jnp.concatenate([jnp.ones(1, bool), si[1:] != si[:-1]])
    uniq = jnp.where(first, si, INT_SENT)
    uniq = jnp.sort(uniq)
    lo = jnp.searchsorted(si, uniq, side="left")
    hi = jnp.searchsorted(si, uniq, side="right")
    counts = (hi - lo).astype(jnp.float32)
    pad = uniq == INT_SENT
    uc = jnp.clip(uniq, 0, prob.shape[0] - 1)
    w_over_p = jnp.where(pad, 0.0, counts / prob[uc])
    eps_ref = jnp.where(pad, jnp.inf, eps_pt / coeffs[uc])
    return uniq, w_over_p, eps_ref, jnp.sum(~pad)


@functools.partial(jax.jit, static_argnames=("cap_u", "n_mc", "norb"))
def _sample_estimate(skeys, svals, var_keys, table, var_energy,
                     n_mc: int, cap_u: int, norb: int = 0):
    """From class-sorted candidate (key, t1, t2, t1b, t2b) rows, compute
    the unbiased two-term sample estimate (ref: hci.f90:1454-1560)."""
    key, t1, t2, t1b, t2b = skeys, *svals
    first = jnp.concatenate([jnp.ones(1, bool), key[1:] != key[:-1]])
    gid = jnp.cumsum(first.astype(jnp.int32)) - 1
    n_seg = key.shape[0]
    T1 = jax.ops.segment_sum(t1, gid, num_segments=n_seg,
                             indices_are_sorted=True)[gid]
    T2 = jax.ops.segment_sum(t2, gid, num_segments=n_seg,
                             indices_are_sorted=True)[gid]
    T1b = jax.ops.segment_sum(t1b, gid, num_segments=n_seg,
                              indices_are_sorted=True)[gid]
    T2b = jax.ops.segment_sum(t2b, gid, num_segments=n_seg,
                              indices_are_sorted=True)[gid]
    ku = jnp.where(first & (key != SENT), key, SENT)
    sk, s1, s2, s1b, s2b = jax.lax.sort((ku, T1, T2, T1b, T2b), num_keys=1)
    sk, s1, s2, s1b, s2b = (x[:cap_u] for x in (sk, s1, s2, s1b, s2b))
    pos = jnp.clip(jnp.searchsorted(var_keys, sk), 0,
                   var_keys.shape[0] - 1)
    internal = var_keys[pos] == sk
    dex = _diag_all(table, sk, norb)
    ok = (sk != SENT) & ~internal
    contrib = jnp.where(
        ok, (s1 ** 2 + s2 - s1b ** 2 - s2b) / (var_energy - dex), 0.0)
    return jnp.sum(contrib.astype(jnp.float64)) / (n_mc * (n_mc - 1))


@functools.partial(jax.jit, static_argnames=())
def _cand_terms(new_up, new_dn, valid, helem, ref, wts_ref, wop_ref,
                eps_pt_big, n_mc_f):
    """Per-candidate term contributions t1/t2/t1b/t2b + fused keys."""
    kk = (new_up[:, 0] << jnp.uint64(32)) | new_dn[:, 0]
    kk = jnp.where(valid, kk, SENT)
    ci = wts_ref[ref]
    wop = wop_ref[ref]
    hc = (helem * ci).astype(jnp.float32)
    t1 = hc * wop
    t2 = hc * hc * ((n_mc_f - 1.0) * wop - wop * wop)
    big = jnp.abs(hc) > eps_pt_big
    z = jnp.float32(0.0)
    return kk, (jnp.where(valid, t1, z), jnp.where(valid, t2, z),
                jnp.where(valid & big, t1, z), jnp.where(valid & big, t2, z))


@functools.partial(jax.jit, static_argnames=("cap_u", "norb"))
def _det_accumulate(skeys, svals, var_keys, table, var_energy,
                    cap_u: int, norb: int = 0):
    """Deterministic PT: segment-sum num = sum H_ai c_i over sorted
    candidates, screen to external dets, return (delta_e2, n_unique,
    n_internal)."""
    key, num = skeys, svals
    first = jnp.concatenate([jnp.ones(1, bool), key[1:] != key[:-1]])
    gid = jnp.cumsum(first.astype(jnp.int32)) - 1
    NUM = jax.ops.segment_sum(num, gid, num_segments=key.shape[0],
                              indices_are_sorted=True)[gid]
    ku = jnp.where(first & (key != SENT), key, SENT)
    sk, sn = jax.lax.sort((ku, NUM), num_keys=1)
    sk, sn = sk[:cap_u], sn[:cap_u]
    pos = jnp.clip(jnp.searchsorted(var_keys, sk), 0, var_keys.shape[0] - 1)
    internal = (var_keys[pos] == sk) & (sk != SENT)
    dex = _diag_all(table, sk, norb)
    ok = (sk != SENT) & ~internal
    contrib = jnp.where(ok, sn.astype(jnp.float64) ** 2
                        / (var_energy - dex.astype(jnp.float64)), 0.0)
    return (jnp.sum(contrib), jnp.sum(sk != SENT),
            jnp.sum(internal))


def _generate_device(system, var_keys, ref_idx, eps_ref, wts_dev, wop,
                     n_mc_f, eps_pt_big, batch_refs=16384):
    """Screened candidate generation for device refs; returns class
    buffers (key, t1, t2, t1b, t2b) concatenated over batches, unmerged.

    ref_idx: [m] i32 positions into var_keys (INT_SENT pads), or None to
    use all of var_keys with per-position eps_ref.
    """
    hb, table = system.heatbath, system.table
    orb_sym = jnp.asarray(system.orb_sym_arr)
    nup, ndn, norb = system.nup, system.ndn, system.norb
    if ref_idx is not None:
        rc = jnp.clip(ref_idx, 0, var_keys.shape[0] - 1)
        keys = jnp.where(ref_idx == INT_SENT, SENT, var_keys[rc])
        wts_ref = wts_dev[rc]
    else:
        keys = var_keys
        wts_ref = wts_dev
    m = keys.shape[0]
    up_all = (keys >> jnp.uint64(32))[:, None]
    dn_all = (keys & MASK32)[:, None]
    batches = []
    # emission capacity guard: a single emit_doubles at cap 2^23 x
    # [2norb+2] f32 blew past the v5e's 16 GB HBM at compile time
    # (measured round 5); recursively split ref slices whose counted
    # emission exceeds EMIT_MAX so every emit compiles at a bounded cap.
    EMIT_MAX = 1 << 22
    stack = [(beg, min(beg + batch_refs, m))
             for beg in reversed(range(0, m, batch_refs))]
    while stack:
        beg, end = stack.pop()
        sl = slice(beg, end)
        epr = jnp.where(keys[sl] != SENT,
                        eps_ref[sl].astype(jnp.float64), jnp.inf)
        mh = jnp.full(end - beg, jnp.inf)
        n_emit, lo, desc = count_doubles(hb, up_all[sl], dn_all[sl], epr,
                                         mh, nup=nup, ndn=ndn)
        tot = int(jnp.sum(n_emit))
        if tot > EMIT_MAX and end - beg > 1:
            mid = (beg + end) // 2
            stack.extend([(mid, end), (beg, mid)])
            continue
        batches.append((sl, epr, mh, n_emit, lo, desc, tot))
    kk_all, tv_all = [], []
    for sl, epr, mh, n_emit, lo, desc, tot in batches:
        outs = []
        if tot > 0:
            cap_e = _bucket(int(tot))
            d = emit_doubles(hb, table, up_all[sl], dn_all[sl], n_emit, lo,
                             desc, cap=cap_e, norb=norb)
            outs.append(d)
        if system.has_singles:
            outs.append(emit_singles(table, orb_sym, up_all[sl],
                                     dn_all[sl], epr, mh, nup=nup,
                                     ndn=ndn, norb=norb))
        for d in outs:
            kk, tv = _cand_terms(d["new_up"], d["new_dn"], d["valid"],
                                 d["helem"], d["ref"], wts_ref[sl],
                                 wop[sl], eps_pt_big, n_mc_f)
            kk_all.append(kk)
            tv_all.append(tv)
    kk = jnp.concatenate(kk_all)
    tvs = tuple(jnp.concatenate([t[i] for t in tv_all]) for i in range(4))
    return kk, tvs


def second_order_pt_device(system, up, dn, wts, var_energy: float,
                           eps_pt: float, verbose: bool = True,
                           batch_refs: int = 16384):
    """Deterministic screened PT-2 on device (ref: hci.f90:1100).
    Same contract as pt.second_order_pt."""
    assert system.n_words == 1 and system.norb <= 32
    assert not getattr(system, "time_sym", False)
    n = len(up)
    keys_np = np.sort(_fuse_np(up, dn))
    cap = _bucket(n, floor=4096)
    var_keys = jnp.full(cap, SENT, jnp.uint64).at[:n].set(
        jnp.asarray(keys_np))
    wts_dev = jnp.zeros(cap, jnp.float32).at[:n].set(
        jnp.asarray(np.asarray(wts, np.float32)))
    coeffs = jnp.maximum(jnp.abs(wts_dev), 1e-30)
    with phase("Deterministic 2nd-order PT correction", enabled=verbose):
        # num accumulates t1 with w/p == 1 (use _cand_terms with wop=1,
        # n_mc_f=2, eps_big=inf: t1 == H_ai c_i, others unused)
        kk, (t1, _, _, _) = _generate_device(
            system, var_keys, None, eps_pt / coeffs, wts_dev,
            jnp.ones(cap, jnp.float32), 2.0, jnp.inf,
            batch_refs=batch_refs)
        sk, s1 = jax.lax.sort((kk, t1), num_keys=1)
        n_cand = int(jnp.sum(sk != SENT))
        cap_u = _bucket(max(n_cand, 1))
        de, n_uniq, n_int = _det_accumulate(sk, s1, var_keys, system.table,
                                            var_energy, cap_u=cap_u,
                                            norb=system.norb)
        delta_e2 = float(de)
        n_connected = int(n_uniq) + n - int(n_int)
    if verbose:
        print(f"Number of connected dets={n_connected}", flush=True)
        print(f"2nd-order PT energy lowering={delta_e2:26.9f}", flush=True)
    return delta_e2, n_connected


def second_order_pt_alias_device(system, up, dn, wts, var_energy: float,
                                 eps_pt: float, eps_pt_big: float,
                                 n_mc: int, target_error: float,
                                 pt_big: float, seed: int = 0,
                                 max_samples: int = 10 ** 6,
                                 min_samples: int = 10,
                                 verbose: bool = True):
    """Semistochastic difference estimator, device-resident
    (ref: hci.f90:1314).  Same contract as pt.second_order_pt_alias."""
    from .pt import StochasticPTResult

    assert system.n_words == 1 and system.norb <= 32
    n = len(up)
    keys_np = _fuse_np(up, dn)
    order = np.argsort(keys_np)
    keys_np = keys_np[order]
    wts_s = np.asarray(wts, np.float64)[order]
    cap = _bucket(n, floor=4096)
    var_keys = jnp.full(cap, SENT, jnp.uint64).at[:n].set(
        jnp.asarray(keys_np))
    wts_dev = jnp.zeros(cap, jnp.float32).at[:n].set(
        jnp.asarray(wts_s.astype(np.float32)))
    absw = np.abs(wts_s)
    prob_np = absw / absw.sum()
    J, q = setup_alias_np(prob_np)
    J_j = jnp.asarray(J)
    q_j = jnp.asarray(q)
    prob = jnp.zeros(cap, jnp.float32).at[:n].set(
        jnp.asarray(prob_np.astype(np.float32)))
    coeffs = jnp.maximum(jnp.abs(wts_dev), 1e-30)
    key = jax.random.PRNGKey(seed)

    mean, M2, nsamp, var = 0.0, 0.0, 0, np.inf
    cap_u_stable = None
    for sample in range(1, max_samples + 1):
        key, sub = jax.random.split(key)
        uniq, wop, eps_ref, _ = _compress_sample(sub, J_j, q_j, prob,
                                                 coeffs, eps_pt, n_mc)
        kk, tvs = _generate_device(system, var_keys, uniq, eps_ref,
                                   wts_dev, wop, float(n_mc), eps_pt_big,
                                   batch_refs=max(256, _bucket(n_mc, 256)))
        skeys, *svals = jax.lax.sort((kk,) + tvs, num_keys=1)
        n_cand = int(jnp.sum(skeys != SENT))
        cap_u = _bucket(max(n_cand, 1))
        if cap_u_stable is None or cap_u > cap_u_stable:
            cap_u_stable = cap_u
        e_sample = float(_sample_estimate(skeys, tuple(svals), var_keys,
                                          system.table, var_energy,
                                          n_mc=n_mc, cap_u=cap_u_stable,
                                          norb=system.norb))
        nsamp += 1
        d = e_sample - mean
        mean += d / nsamp
        M2 += d * (e_sample - mean)
        var = M2 / (nsamp * (nsamp - 1)) if nsamp > 1 else np.inf
        if verbose:
            print(f"Sample, E_2pt_now, E_2pt estimate, total energy="
                  f"{nsamp:6d}{e_sample:15.9f}{mean:12.8f}"
                  f"{var_energy + pt_big + mean:15.8f} "
                  f"+-{np.sqrt(var) if np.isfinite(var) else 0:12.8f}",
                  flush=True)
        if nsamp >= min_samples and var < target_error ** 2:
            break

    return StochasticPTResult(pt_diff=mean, std_dev=float(np.sqrt(var)),
                              n_samples=nsamp,
                              e_tot=var_energy + pt_big + mean)
