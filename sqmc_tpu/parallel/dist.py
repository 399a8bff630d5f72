"""Determinant sharding over a device mesh.

TPU mapping of the reference's MPI layer (SURVEY.md 2.3/2.4):
  P1  get_det_owner hash sharding  -> det_owner() below (same function on
      host numpy and device jnp), walkers live on their owner's shard
  P2  mpi_sendnewwalks alltoallv   -> bucket-by-owner + jax.lax.all_to_all
      inside shard_map (ICI)
  P4  distributed Davidson         -> row-sharded COO + all_gather'd vector
  P8  master-core I/O + broadcast  -> host reads, tables replicated

The walk step itself becomes axis-aware (sqmc_tpu.algo.walk with
cfg.axis_name set); this module holds the mesh/bucketing helpers and the
host-side sharded-state preparation.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_K1 = 0x9E3779B97F4A7C15
_K2 = 0xC2B2AE3D27D4EB4F


def det_owner_np(up: np.ndarray, dn: np.ndarray, n_dev: int) -> np.ndarray:
    """Owner device of each det (host).  up/dn: [n, W] uint64."""
    acc = np.zeros(len(up), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for w in range(up.shape[1]):
            acc = (acc ^ up[:, w]) * np.uint64(_K1)
            acc = (acc ^ dn[:, w]) * np.uint64(_K2)
        acc ^= acc >> np.uint64(29)
    return (acc % np.uint64(n_dev)).astype(np.int32)


def det_owner_jnp(up: jnp.ndarray, dn: jnp.ndarray, n_dev: int) -> jnp.ndarray:
    """Owner device of each det (device).  Must match det_owner_np."""
    acc = jnp.zeros(up.shape[0], dtype=jnp.uint64)
    for w in range(up.shape[1]):
        acc = (acc ^ up[:, w]) * jnp.uint64(_K1)
        acc = (acc ^ dn[:, w]) * jnp.uint64(_K2)
    acc = acc ^ (acc >> jnp.uint64(29))
    return (acc % jnp.uint64(n_dev)).astype(jnp.int32)


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"make_mesh({n_devices}): only {len(devs)} device(s) visible "
                f"({[d.platform for d in devs]}). For multi-device runs "
                "without hardware, start the process with JAX_PLATFORMS=cpu "
                "and XLA_FLAGS=--xla_force_host_platform_device_count=N "
                "(see __graft_entry__.dryrun_multichip).")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("d",))


# Measurement-only switch (tools/bench_sharded_mesh.py): when True, the
# all_to_all exchange in route_spawns is skipped at TRACE time, so timing
# the resulting program isolates the collective's cost.  The physics of
# such a program is WRONG (spawns land on the wrong shard) — never set
# this outside a timing A/B.
_TIMING_NO_ALL_TO_ALL = False


def route_spawns(axis_name: str, n_dev: int, owner: jnp.ndarray, valid,
                 arrays: dict):
    """Bucket spawn slots by owner and exchange over the mesh axis.

    owner: [CAP] destination shard ids; valid: [CAP] mask; arrays: dict of
    [CAP, ...] payloads.  Each destination bucket has capacity CAP//n_dev;
    returns (routed arrays [CAP, ...] = received spawns, valid mask,
    overflow flag).
    """
    CAP = owner.shape[0]
    cap_loc = CAP // n_dev
    owner = jnp.where(valid, owner, n_dev)  # invalid -> dropped bucket

    # pack every payload (incl. the valid mask) into u32 planes of ONE
    # [CAP, K] matrix: gather/scatter/all_to_all cost on TPU is per-row
    # DMA latency, so moving one wide row beats K separate planar moves
    planes = []
    meta = []
    for k, a in arrays.items():
        cols = a[:, None] if a.ndim == 1 else a
        if cols.dtype == jnp.uint64:
            for w in range(cols.shape[1]):
                planes += [(cols[:, w] >> jnp.uint64(32)).astype(jnp.uint32),
                           cols[:, w].astype(jnp.uint32)]
            meta.append((k, "u64", a.ndim, cols.shape[1]))
        elif cols.dtype == jnp.float64:
            bits = jax.lax.bitcast_convert_type(cols, jnp.uint32)
            for w in range(cols.shape[1]):
                planes += [bits[:, w, 0], bits[:, w, 1]]
            meta.append((k, "f64", a.ndim, cols.shape[1]))
        else:  # 32-bit (f32/i32/u32)
            for w in range(cols.shape[1]):
                planes.append(
                    jax.lax.bitcast_convert_type(cols[:, w], jnp.uint32))
            meta.append((k, str(a.dtype), a.ndim, cols.shape[1]))
    planes.append(valid.astype(jnp.uint32))
    packed = jnp.stack(planes, axis=1)                      # [CAP, K]

    order = jnp.argsort(owner, stable=True)
    owner_s = owner[order]
    # rank within destination bucket
    first_of = jnp.searchsorted(owner_s, jnp.arange(n_dev + 1))
    rank = jnp.arange(CAP) - first_of[jnp.clip(owner_s, 0, n_dev)]
    counts = first_of[1:] - first_of[:-1]  # per destination (w/o invalid)
    overflow = jnp.any(counts[:n_dev] > cap_loc)

    # gather formulation of the bucket layout: output slot s=(dev, r)
    # reads sorted row first_of[dev]+r when r < counts[dev] — one [CAP]
    # row gather instead of a [CAP]-row scatter (TPU scatters serialize,
    # microbench_scatter r4h), and exact even when a bucket overflows
    slot = jnp.arange(CAP, dtype=jnp.int32)
    sdev = slot // cap_loc
    srank = slot - sdev * cap_loc
    src = first_of[sdev] + srank
    svalid = srank < counts[jnp.clip(sdev, 0, n_dev - 1)]
    buf = jnp.where(svalid[:, None],
                    packed[order[jnp.clip(src, 0, CAP - 1)]], 0)
    if not _TIMING_NO_ALL_TO_ALL:
        buf = jax.lax.all_to_all(buf.reshape(n_dev, cap_loc, -1), axis_name,
                                 split_axis=0, concat_axis=0, tiled=False)
        buf = buf.reshape(CAP, -1)

    out = {}
    j = 0
    for k, kind, ndim, ncol in meta:
        cols = []
        for _ in range(ncol):
            if kind == "u64":
                hi, lo = buf[:, j], buf[:, j + 1]
                cols.append((hi.astype(jnp.uint64) << jnp.uint64(32)) |
                            lo.astype(jnp.uint64))
                j += 2
            elif kind == "f64":
                cols.append(jax.lax.bitcast_convert_type(
                    jnp.stack([buf[:, j], buf[:, j + 1]], axis=-1),
                    jnp.float64))
                j += 2
            else:
                cols.append(jax.lax.bitcast_convert_type(
                    buf[:, j], jnp.dtype(kind)))
                j += 1
        out[k] = cols[0] if ndim == 1 else jnp.stack(cols, axis=1)
    vmask = buf[:, j] != 0
    return out, vmask, overflow


def shard_initial_state(up, dn, wt, imp, init_flag, n_dev, mwalk_local):
    """Distribute an initial det population to owner shards (host).

    Returns per-shard stacked arrays [n_dev, mwalk_local, ...] plus
    per-shard counts; each shard's slice is sorted by det key.
    """
    from ..ops import setalg
    from ..algo.walk import SENTINEL

    W = up.shape[1]
    owner = det_owner_np(up, dn, n_dev)
    s_up = np.full((n_dev, mwalk_local, W), SENTINEL, dtype=np.uint64)
    s_dn = np.full((n_dev, mwalk_local, W), SENTINEL, dtype=np.uint64)
    s_wt = np.zeros((n_dev, mwalk_local))
    s_imp = np.full((n_dev, mwalk_local), 10 ** 6, np.int32)
    s_init = np.zeros((n_dev, mwalk_local), np.int32)
    counts = np.zeros(n_dev, np.int32)
    for d in range(n_dev):
        sel = owner == d
        u, v = up[sel], dn[sel]
        order = setalg.lexsort_dets(u, v)
        k = len(u)
        if k > mwalk_local:
            raise ValueError("initial population exceeds local capacity")
        s_up[d, :k] = u[order]
        s_dn[d, :k] = v[order]
        s_wt[d, :k] = wt[sel][order]
        s_imp[d, :k] = imp[sel][order]
        s_init[d, :k] = init_flag[sel][order]
        counts[d] = k
    return s_up, s_dn, s_wt, s_imp, s_init, counts


def shard_imp_space(imp_up, imp_dn, imp_ham, n_dev):
    """Split the deterministic space by owner; build row-complete COO with
    global column indices (host).

    Returns per-shard arrays stacked on axis 0:
      su, sd: [n_dev, m, W] padded local D dets (sorted)
      rows: [n_dev, nnz_m] local row ids; cols: [n_dev, nnz_m] GLOBAL ids
      vals: [n_dev, nnz_m]
    where global id of (dev, slot) = dev*m + slot.
    """
    from ..ops import setalg
    from ..algo.walk import SENTINEL

    n = len(imp_up)
    W = imp_up.shape[1]
    owner = det_owner_np(imp_up, imp_dn, n_dev)
    # local slot assignment (sorted within shard)
    local_idx = np.zeros(n, np.int64)
    perms = []
    m = 0
    for d in range(n_dev):
        sel = np.nonzero(owner == d)[0]
        order = setalg.lexsort_dets(imp_up[sel], imp_dn[sel])
        sel = sel[order]
        local_idx[sel] = np.arange(len(sel))
        perms.append(sel)
        m = max(m, len(sel))
    m = max(m, 1)
    gid = owner.astype(np.int64) * m + local_idx  # global id of each imp det

    su = np.full((n_dev, m, W), SENTINEL, np.uint64)
    sd = np.full((n_dev, m, W), SENTINEL, np.uint64)
    for d in range(n_dev):
        sel = perms[d]
        su[d, :len(sel)] = imp_up[sel]
        sd[d, :len(sel)] = imp_dn[sel]

    # row-complete symmetric COO (diag + both orientations)
    r_all = np.concatenate([imp_ham.rows, imp_ham.cols, np.arange(n)])
    c_all = np.concatenate([imp_ham.cols, imp_ham.rows, np.arange(n)])
    v_all = np.concatenate([imp_ham.vals, imp_ham.vals, imp_ham.diag])
    row_owner = owner[r_all]
    nnz_m = 1
    per = []
    for d in range(n_dev):
        sel = row_owner == d
        per.append((local_idx[r_all[sel]], gid[c_all[sel]], v_all[sel]))
        nnz_m = max(nnz_m, int(sel.sum()))
    rows = np.zeros((n_dev, nnz_m), np.int32)
    cols = np.zeros((n_dev, nnz_m), np.int32)
    vals = np.zeros((n_dev, nnz_m))
    for d, (r, c, v) in enumerate(per):
        rows[d, :len(r)] = r
        cols[d, :len(c)] = c
        vals[d, :len(v)] = v
    return su, sd, rows, cols, vals, m


def sharded_unique_dets(mesh: Mesh, up: np.ndarray, dn: np.ndarray):
    """Distributed candidate dedup (SURVEY P5; ref mpi_merge_sort2,
    mpi_routines.f90:2625 - owner-filtered distributed merge-sort).

    Candidates are split round-robin across the mesh, routed to their
    det-hash owner shard by all_to_all, sorted + uniqued per shard, and
    gathered (shards are disjoint by ownership, so the result is globally
    unique).  Returns (up_u, dn_u) sorted by det key.
    """
    from jax import shard_map
    from ..ops import setalg
    from ..algo.walk import SENTINEL

    n_dev = int(mesh.devices.size)
    n = len(up)
    W = up.shape[1]
    if n == 0:
        return up, dn
    # per-shard input length; x2 slack for ownership imbalance in the
    # all_to_all buckets (uniform hash keeps shards balanced)
    L = 2 * (-(-n // n_dev))
    L = -(-L // n_dev) * n_dev     # multiple of n_dev for the bucketing
    sup = np.full((n_dev, L, W), SENTINEL, np.uint64)
    sdn = np.full((n_dev, L, W), SENTINEL, np.uint64)
    val = np.zeros((n_dev, L), bool)
    for d in range(n_dev):
        chunk_u = up[d::n_dev]
        chunk_d = dn[d::n_dev]
        sup[d, :len(chunk_u)] = chunk_u
        sdn[d, :len(chunk_d)] = chunk_d
        val[d, :len(chunk_u)] = True

    def _local(u, d, v):
        u, d, v = u[0], d[0], v[0]
        owner = det_owner_jnp(u, d, n_dev)
        routed, v2, ovf = route_spawns("d", n_dev, owner, v,
                                       dict(up=u, dn=d))
        u2 = jnp.where(v2[:, None], routed["up"], jnp.uint64(SENTINEL))
        d2 = jnp.where(v2[:, None], routed["dn"], jnp.uint64(SENTINEL))
        # local sort (most-significant-word-first, up-major) + unique mask
        keys = tuple([u2[:, w] for w in range(W - 1, -1, -1)] +
                     [d2[:, w] for w in range(W - 1, -1, -1)])
        sorted_ = jax.lax.sort(keys, num_keys=2 * W)
        su = jnp.stack(sorted_[:W][::-1], axis=1)
        sd = jnp.stack(sorted_[W:][::-1], axis=1)
        neq = jnp.ones(L, bool).at[1:].set(
            jnp.any(su[1:] != su[:-1], axis=1) |
            jnp.any(sd[1:] != sd[:-1], axis=1))
        uniq = neq & jnp.all(su != jnp.uint64(SENTINEL), axis=1)
        return su[None], sd[None], uniq[None], ovf[None]

    P_ = P("d")
    fn = jax.jit(shard_map(_local, mesh=mesh,
                           in_specs=(P_, P_, P_),
                           out_specs=(P_, P_, P_, P_)))
    su, sd, uniq, ovf = fn(jnp.asarray(sup), jnp.asarray(sdn),
                           jnp.asarray(val))
    if bool(np.any(np.asarray(ovf))):
        # bucket overflow (pathological ownership skew): host fallback
        u_u, d_u, _, _ = setalg.unique_dets(up, dn)
        return u_u, d_u
    su = np.asarray(su).reshape(n_dev * L, W)
    sd = np.asarray(sd).reshape(n_dev * L, W)
    uniq = np.asarray(uniq).reshape(-1)
    out_u, out_d = su[uniq], sd[uniq]
    order = setalg.lexsort_dets(out_u, out_d)
    return out_u[order], out_d[order]


# ---------------------------------------------------------------------------
# Sharded Davidson matvec (SURVEY P4: davidson_sparse_mpi2 analog)
# ---------------------------------------------------------------------------

def make_sharded_matvec(H, mesh: Mesh):
    """y = H v with the COO entries sharded over the mesh and the vector
    replicated; each shard scatter-adds its partial contributions and a
    `psum` over ICI assembles the full product (ref:
    more_tools.f90 davidson_sparse_mpi2:2525 - local-row sparse matvec +
    allreduce; here entries rather than rows are sharded, which also
    load-balances dense rows).

    Pass the returned function as davidson(..., matvec_fn=...).
    """
    from jax import shard_map

    n_dev = mesh.devices.size
    n = H.n
    nnz = len(H.vals)
    chunk = -(-max(nnz, 1) // n_dev)
    pad = chunk * n_dev - nnz
    # padded entries point at row 0 with value 0 (harmless)
    rows = np.concatenate([H.rows, np.zeros(pad, H.rows.dtype)])
    cols = np.concatenate([H.cols, np.zeros(pad, H.cols.dtype)])
    vals = np.concatenate([H.vals, np.zeros(pad)])
    dchunk = -(-n // n_dev)
    diag_p = np.zeros(dchunk * n_dev)
    diag_p[:n] = H.diag

    P_ = P("d")
    repl = P()

    def _mv(r, c, v, dg, x):
        single = x.ndim == 1
        xm = x[:, None] if single else x
        y = jnp.zeros((n,) + xm.shape[1:])
        y = y.at[r].add(v[:, None] * xm[c])
        y = y.at[c].add(v[:, None] * xm[r])
        # diagonal: each shard owns a contiguous dchunk slice
        i = jax.lax.axis_index("d")
        base = i * dchunk
        idx = base + jnp.arange(dchunk)
        ok = idx < n
        y = y.at[jnp.where(ok, idx, 0)].add(
            jnp.where(ok, dg, 0.0)[:, None] * xm[jnp.where(ok, idx, 0)],
            mode="drop")
        y = jax.lax.psum(y, "d")
        return y[:, 0] if single else y

    fn = shard_map(_mv, mesh=mesh,
                   in_specs=(P_, P_, P_, P_, repl), out_specs=repl)
    fn = jax.jit(fn)
    r_j = jnp.asarray(rows.astype(np.int32))
    c_j = jnp.asarray(cols.astype(np.int32))
    v_j = jnp.asarray(vals)
    d_j = jnp.asarray(diag_p)

    def matvec_fn(x):
        return fn(r_j, c_j, v_j, d_j, jnp.asarray(x))

    return matvec_fn


# ---------------------------------------------------------------------------
# Sharded walk assembly
# ---------------------------------------------------------------------------

def _blockell_local(m, rows, cols, vals, gdiag_base):
    """One shard's block-ELL: row-complete local-rows/global-cols COO ->
    off-diagonal entries padded to 128-slot row blocks + dense diagonal.
    Diagonal entries are cols == gdiag_base + rows (global id of local
    slot r is gdiag_base + r).  Zero-valued COO padding is dropped.

    Returns (ell_cols [P] i32, ell_vals [P], ell_row [P//128] i32,
    diag [m])."""
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals, np.float64)
    keep = vals != 0.0
    rows, cols, vals = rows[keep], cols[keep], vals[keep]
    isdiag = cols == gdiag_base + rows
    diag = np.zeros(m)
    np.add.at(diag, rows[isdiag], vals[isdiag])
    r, c, v = rows[~isdiag], cols[~isdiag], vals[~isdiag]
    order = np.argsort(r, kind="stable")
    r, c, v = r[order], c[order], v[order]
    counts = np.bincount(r, minlength=m)
    nb_r = np.maximum(1, -(-counts // 128))
    block_starts = np.concatenate([[0], np.cumsum(nb_r)])[:-1] * 128
    csr_start = np.concatenate([[0], np.cumsum(counts)])
    P = int(np.sum(nb_r)) * 128
    ell_cols = np.zeros(P, np.int32)
    ell_vals = np.zeros(P)
    slot = block_starts[r] + (np.arange(len(r)) - csr_start[r])
    ell_cols[slot] = c
    ell_vals[slot] = v
    ell_row = np.repeat(np.arange(m, dtype=np.int32), nb_r)
    return ell_cols, ell_vals, ell_row, diag


def make_sharded_walk(system, trial, cfg, mesh: Mesh, w_abs_begin: float,
                      e_trial_initial: float, seed: int = 0,
                      nstep_per_call: int = 1):
    """Build (jitted sharded step_fn, sharded state, sharded tables).

    cfg: WalkConfig with axis_name='d', n_dev=len(mesh); mwalk/cap_spawn are
    PER-SHARD capacities.  State arrays live sharded on the mesh; tables are
    replicated except the D-space slices.
    """
    from jax import shard_map

    from ..algo import walk as walk_mod
    from ..algo.walk import (WalkState, WalkTables, build_walk_tables,
                             init_walk_state, walk_step, SENTINEL)

    n_dev = cfg.n_dev
    base = build_walk_tables(system, trial, cfg=cfg)

    # shard the deterministic space by owner
    su, sd, rows, cols, vals, m_loc = shard_imp_space(
        trial.imp_up, trial.imp_dn, trial.imp_ham, n_dev)

    # per-shard block-ELL of the row-complete COO (local rows, GLOBAL
    # cols into the all-gathered D-weight vector), diagonal split out for
    # the difference form - the same TPU-fast projection layout as the
    # single-device path (a [nnz] f64 scatter-add serializes on TPU)
    ell_parts = [_blockell_local(m_loc, rows[d], cols[d], vals[d],
                                 d * m_loc) for d in range(n_dev)]
    P_max = max(p[0].shape[0] for p in ell_parts)
    e_cols = np.zeros((n_dev, P_max), np.int32)
    e_vals = np.zeros((n_dev, P_max))
    # pad blocks carry row id m_loc -> dropped by the per-shard
    # segment_sum(num_segments=m_loc)
    e_row = np.full((n_dev, P_max // 128), m_loc, np.int32)
    e_diag = np.zeros((n_dev, m_loc))
    for d, (ec, ev, er, dg) in enumerate(ell_parts):
        e_cols[d, :ec.shape[0]] = ec
        e_vals[d, :ev.shape[0]] = ev
        e_row[d, :er.shape[0]] = er
        e_diag[d] = dg

    # per-shard DENSE projection (f32-state, small global D space): each
    # shard stores its row slice [m_loc, n_glob] of the off-diagonal
    # matrix and the step's matvec is one MXU matmul against the
    # all-gathered weight vector - same layout decision as the unsharded
    # dense_proj_max path (walk.py), row-sliced instead of gathered
    n_glob = n_dev * m_loc
    imp_dense = np.zeros((0, 0), np.float32)
    if cfg.f32_state and 0 < n_glob <= cfg.dense_proj_max:
        imp_dense = np.zeros((n_glob, n_glob), np.float32)
        for d in range(n_dev):
            rr, cc, vv = (np.asarray(rows[d], np.int64),
                          np.asarray(cols[d], np.int64),
                          np.asarray(vals[d], np.float64))
            keep = (vv != 0.0) & (cc != d * m_loc + rr)   # drop pad + diag
            np.add.at(imp_dense, (d * m_loc + rr[keep], cc[keep]),
                      vv[keep].astype(np.float32))

    # C(T)-in-D estimator vectors follow the per-shard D ordering: each
    # C(T) det is owned by exactly one shard (the subset check passed in
    # build_walk_tables), so scatter its (num, den) at its local slot
    ct_num_imp = np.zeros(0)
    ct_den_imp = np.zeros(0)
    if base.ct_num_imp.shape[0] > 0:
        from ..ops import setalg as _setalg
        ct_num_imp = np.zeros((n_dev, m_loc))
        ct_den_imp = np.zeros((n_dev, m_loc))
        num_g = np.asarray(base.ct_num_imp)
        den_g = np.asarray(base.ct_den_imp)
        # global position of each C(T) det (num/den were scattered there)
        gpos = np.asarray(_setalg.search_dets(
            trial.imp_up, trial.imp_dn,
            np.asarray(base.ct_up), np.asarray(base.ct_dn)))
        for d in range(n_dev):
            lpos = np.asarray(_setalg.search_dets(
                su[d], sd[d], np.asarray(base.ct_up), np.asarray(base.ct_dn)))
            own = lpos >= 0
            ct_num_imp[d, lpos[own]] = num_g[gpos[own]]
            ct_den_imp[d, lpos[own]] = den_g[gpos[own]]
        assert int((ct_num_imp != 0).sum()) == int((num_g != 0).sum())
        ct_num_imp = ct_num_imp.reshape(-1)
        ct_den_imp = ct_den_imp.reshape(-1)

    fdt = np.float32 if cfg.f32_state else np.float64
    tables = base._replace(
        ct_num_imp=jnp.asarray(ct_num_imp),
        ct_den_imp=jnp.asarray(ct_den_imp),
        imp_up=jnp.asarray(su.reshape(n_dev * m_loc, -1)),
        imp_dn=jnp.asarray(sd.reshape(n_dev * m_loc, -1)),
        imp_rows=jnp.asarray(rows.reshape(-1)),
        imp_cols=jnp.asarray(cols.reshape(-1)),
        imp_vals=jnp.asarray(vals.reshape(-1)),
        imp_ell_cols=jnp.asarray(e_cols.reshape(-1)),
        imp_ell_vals=jnp.asarray(e_vals.reshape(-1).astype(fdt)),
        imp_ell_row=jnp.asarray(e_row.reshape(-1)),
        imp_diag=jnp.asarray(e_diag.reshape(-1)),
        imp_dense=(jnp.asarray(imp_dense).astype(jnp.bfloat16)
                   if cfg.proj_bf16 else jnp.asarray(imp_dense)),
    )

    # initial population distributed by owner
    from ..ops import setalg
    all_up = np.concatenate([trial.psit_up, trial.imp_up])
    all_dn = np.concatenate([trial.psit_dn, trial.imp_dn])
    coefs = np.concatenate([trial.psit_coef, np.zeros(len(trial.imp_up))])
    u, d, (c,), _ = setalg.unique_dets(all_up, all_dn, [coefs])
    scale = w_abs_begin / np.sum(np.abs(c))
    in_imp = ~setalg.setdiff_dets(u, d, trial.imp_up, trial.imp_dn)
    imp0 = np.where(in_imp, 0, 1).astype(np.int32)
    init0 = np.full(len(u), 2, np.int32)
    s_up, s_dn, s_wt, s_imp, s_init, counts = shard_initial_state(
        u, d, c * scale, imp0, init0, n_dev, cfg.mwalk)

    st0 = init_walk_state(cfg, trial, w_abs_begin, e_trial_initial, seed)
    M, W = cfg.mwalk, cfg.n_words
    # global (stacked) state arrays: [n_dev * M, ...]
    keys = jax.random.split(jax.random.PRNGKey(seed), n_dev)
    state = st0._replace(
        up=jnp.asarray(s_up.reshape(n_dev * M, W)),
        dn=jnp.asarray(s_dn.reshape(n_dev * M, W)),
        wt=jnp.asarray(s_wt.reshape(-1).astype(
            np.float32 if cfg.f32_state else np.float64)),
        init=jnp.asarray(s_init.reshape(-1)),
        imp=jnp.asarray(s_imp.reshape(-1)),
        diag=jnp.full(n_dev * M, walk_mod.DIAG_UNKNOWN,
                      jnp.float32 if cfg.f32_state else jnp.float64),
        # ct=-2: diag/ct caches are filled per shard by the step's
        # cond-guarded fresh fill on the first generation
        ct=jnp.full(n_dev * M, -2, jnp.int32),
        nwalk=jnp.asarray(counts, jnp.int32),       # per-shard counts
        key=keys,
    )

    sharded = P("d")
    repl = P()

    state_specs = WalkState(
        up=sharded, dn=sharded, wt=sharded, init=sharded, imp=sharded,
        diag=sharded, ct=sharded, nwalk=sharded, key=sharded,
        e_trial=repl, e_est=repl, tau=repl, reweight_factor_inv=repl,
        reached_target=repl, equilibrated=repl,
        e_num_blkabs_cum=repl, e_den_blkabs_cum=repl,
        e_num_blk=repl, e_den_blk=repl, w_abs_gen=repl, overflow=repl,
        step=repl)
    table_specs = WalkTables(
        hb_alias_pack=repl, hb_row_scr=repl,
        hb_rs_dense=repl, hb_ro_dense=repl,
        kmap3=repl, ct_rate=repl,
        u_table=repl, u_rowsum=repl, u_alias_qJ=repl, sng_pack=repl,
        cs_c=repl, cs_rowsum=repl, cs_aliasJ=repl, cs_aliasq=repl,
        table=jax.tree_util.tree_map(lambda _: repl, base.table),
        ct_up=repl, ct_dn=repl, ct_num=repl, ct_den=repl, ct_hash=repl,
        ct_num_imp=(sharded if tables.ct_num_imp.shape[0] > 0 else repl),
        ct_den_imp=(sharded if tables.ct_den_imp.shape[0] > 0 else repl),
        imp_up=sharded, imp_dn=sharded, imp_rows=sharded, imp_cols=sharded,
        imp_vals=sharded,
        imp_ell_cols=sharded, imp_ell_vals=sharded, imp_ell_row=sharded,
        imp_diag=sharded,
        # active dense projection shards by row slice; the inactive [0,0]
        # placeholder replicates
        imp_dense=(sharded if tables.imp_dense.shape[0] > 0 else repl),
        guide=jax.tree_util.tree_map(lambda _: repl, base.guide))
    stats_specs = dict(e_num_gen=repl, e_den_gen=repl, w_abs_gen=repl,
                       nwalk=repl, e_gen=repl, n_spawn=repl,
                       reweight_factor_inv=repl, spawn_hist=repl)
    if nstep_per_call > 1:
        stats_specs["e_num_sum"] = repl
        stats_specs["e_den_sum"] = repl

    from ..algo.walk import _walk_step_impl

    def _local_step(st, tb):
        # inside shard_map: nwalk/key arrive with a leading size-1 shard dim
        st = st._replace(nwalk=st.nwalk[0], key=st.key[0])
        if nstep_per_call == 1:
            st2, stats = _walk_step_impl(st, tb, cfg)
        else:
            # a whole block per dispatch (collectives inside lax.scan)
            def body(s_, _):
                return _walk_step_impl(s_, tb, cfg)
            st2, stats_steps = jax.lax.scan(body, st, None,
                                            length=nstep_per_call)
            stats = jax.tree_util.tree_map(lambda x: x[-1], stats_steps)
            stats["e_num_sum"] = jnp.sum(stats_steps["e_num_gen"])
            stats["e_den_sum"] = jnp.sum(stats_steps["e_den_gen"])
        st2 = st2._replace(nwalk=st2.nwalk[None], key=st2.key[None])
        return st2, stats

    step = jax.jit(shard_map(
        _local_step, mesh=mesh,
        in_specs=(state_specs, table_specs),
        out_specs=(state_specs, stats_specs),
        check_vma=False,
    ))
    return step, state, tables
