"""On-chip A/B of the walk step's four hot planar-scatter patterns
(round-4h; profile r4f: walk.py:1419 4.6 ms, :2262+rowpack 6.2 ms,
:1031 2.4 ms, :1304 2.4 ms at bench-class shapes).

Each pattern is measured in its current .at[] scatter form against
alternatives that XLA lowers differently on TPU:
  - indices_are_sorted=True where the indices really are monotone
    (seed_par's off_child is a prefix sum);
  - stable-sort compaction (argsort of the keep mask) — sorts are nearly
    free on TPU, arbitrary scatters are not (PERF_NOTES r2 finding 3);
  - lax.top_k compaction for few-survivor patterns (fidx, imp_pos).

Equivalence notes per pattern are in the function docstrings; winners get
wired into walk.py with a bitwise-trajectory A/B on the bench config.

Usage: python tools/microbench_scatter.py [--m 458752] [--cap 262144]
"""

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def bench(fn, *args, n=30):
    import jax
    import jax.numpy as jnp
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    # force remote execution on the axon tunnel (block_until_ready alone
    # may not): fetch a scalar
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    s = float(jnp.sum(r[0] if isinstance(r, tuple) else r))
    dt = (time.perf_counter() - t0) / n * 1e3
    return dt, s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=458752)
    ap.add_argument("--cap", type=int, default=262144)
    ap.add_argument("--f", type=int, default=32768)
    ap.add_argument("--n-imp", type=int, default=11912)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    M, CAP, F, NI = args.m, args.cap, args.f, args.n_imp
    N = M + CAP
    rng = np.random.default_rng(0)
    print(f"# backend={jax.devices()[0].platform} M={M} CAP={CAP} F={F} "
          f"n_imp={NI}", flush=True)

    # ---- pattern 1: merge compaction src (walk.py:2262) -------------------
    keep = jnp.asarray(rng.random(N) < 0.47)

    def src_scatter(keep):
        pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
        dest = jnp.where(keep, pos, M)
        return jnp.zeros(M, jnp.int32).at[dest].set(
            jnp.arange(N, dtype=jnp.int32), mode="drop",
            unique_indices=True)

    def src_sort(keep):
        key = jnp.where(keep, jnp.uint32(0), jnp.uint32(1))
        _, order = jax.lax.sort((key, jnp.arange(N, dtype=jnp.int32)),
                                num_keys=1, is_stable=True)
        return order[:M]

    for name, fn in [("src scatter (current)", src_scatter),
                     ("src stable-sort", src_sort)]:
        dt, s = bench(fn, keep)
        print(f"{name:34s} {dt:8.3f} ms   (sum {s:.0f})", flush=True)

    # ---- pattern 2: fresh compaction fidx (walk.py:1031) ------------------
    need = jnp.asarray(rng.random(M) < (0.8 * F / M))

    def fidx_scatter(need):
        fpos = jnp.cumsum(need.astype(jnp.int32)) - 1
        fdest = jnp.where(need, fpos, F)
        return jnp.full(F, M, jnp.int32).at[fdest].set(
            jnp.arange(M, dtype=jnp.int32), mode="drop")

    def fidx_sort(need):
        fpos = jnp.cumsum(need.astype(jnp.int32)) - 1
        n_need = fpos[-1] + 1
        key = jnp.where(need, jnp.uint32(0), jnp.uint32(1))
        _, order = jax.lax.sort((key, jnp.arange(M, dtype=jnp.int32)),
                                num_keys=1, is_stable=True)
        return jnp.where(jnp.arange(F) < n_need, order[:F], M)

    def fidx_topk(need):
        fpos = jnp.cumsum(need.astype(jnp.int32)) - 1
        n_need = fpos[-1] + 1
        key = jnp.where(need, M - jnp.arange(M, dtype=jnp.int32), -1)
        _, idx = jax.lax.top_k(key, F)
        return jnp.where(jnp.arange(F) < n_need, idx, M)

    for name, fn in [("fidx scatter (current)", fidx_scatter),
                     ("fidx stable-sort", fidx_sort),
                     ("fidx top_k", fidx_topk)]:
        dt, s = bench(fn, need)
        print(f"{name:34s} {dt:8.3f} ms   (sum {s:.0f})", flush=True)

    # ---- pattern 3: D-position compaction imp_pos (walk.py:1304) ----------
    is_imp = jnp.asarray(rng.random(M) < (0.95 * NI / M))

    def imp_scatter(is_imp):
        rank = jnp.cumsum(is_imp.astype(jnp.int32)) - 1
        return jnp.full(NI, -1, jnp.int32).at[
            jnp.where(is_imp, rank, NI)].set(
            jnp.arange(M, dtype=jnp.int32), mode="drop")

    def imp_sort(is_imp):
        rank = jnp.cumsum(is_imp.astype(jnp.int32)) - 1
        n = rank[-1] + 1
        key = jnp.where(is_imp, jnp.uint32(0), jnp.uint32(1))
        _, order = jax.lax.sort((key, jnp.arange(M, dtype=jnp.int32)),
                                num_keys=1, is_stable=True)
        return jnp.where(jnp.arange(NI) < n, order[:NI], -1)

    def imp_topk(is_imp):
        rank = jnp.cumsum(is_imp.astype(jnp.int32)) - 1
        n = rank[-1] + 1
        key = jnp.where(is_imp, M - jnp.arange(M, dtype=jnp.int32), -1)
        _, idx = jax.lax.top_k(key, NI)
        return jnp.where(jnp.arange(NI) < n, idx, -1)

    for name, fn in [("imp_pos scatter (current)", imp_scatter),
                     ("imp_pos stable-sort", imp_sort),
                     ("imp_pos top_k", imp_topk)]:
        dt, s = bench(fn, is_imp)
        print(f"{name:34s} {dt:8.3f} ms   (sum {s:.0f})", flush=True)

    # ---- pattern 4: spawn slot -> parent map seed_par (walk.py:1419) ------
    n_child = rng.integers(0, 3, M).astype(np.int32)
    scale = CAP * 0.85 / max(n_child.sum(), 1)
    n_child = (n_child * scale).astype(np.int32) if scale < 1 else n_child
    off = jnp.asarray(np.concatenate([[0], np.cumsum(n_child)[:-1]])
                      .astype(np.int32))

    def seed_scatter(off):
        sp = jnp.full(CAP, -1, jnp.int32).at[
            jnp.clip(off, 0, CAP - 1)].max(
            jnp.arange(M, dtype=jnp.int32), mode="drop")
        return jax.lax.cummax(sp)

    def seed_scatter_sorted(off):
        sp = jnp.full(CAP, -1, jnp.int32).at[
            jnp.clip(off, 0, CAP - 1)].max(
            jnp.arange(M, dtype=jnp.int32), mode="drop",
            indices_are_sorted=True)
        return jax.lax.cummax(sp)

    def seed_cummax_only(off):
        return jax.lax.cummax(jnp.clip(off, 0, CAP - 1)[:CAP])

    for name, fn in [("seed_par scatter (current)", seed_scatter),
                     ("seed_par scatter sorted", seed_scatter_sorted),
                     ("  (cummax alone, for scale)", seed_cummax_only)]:
        dt, s = bench(fn, off)
        print(f"{name:34s} {dt:8.3f} ms   (sum {s:.0f})", flush=True)

    # sanity: equivalences
    a = np.asarray(src_scatter(keep))
    b = np.asarray(src_sort(keep))
    nw = int(np.asarray(jnp.sum(keep)))
    assert (a[:nw] == b[:nw]).all(), "src forms disagree"
    a = np.asarray(fidx_scatter(need))
    assert (a == np.asarray(fidx_sort(need))).all(), "fidx sort disagrees"
    assert (a == np.asarray(fidx_topk(need))).all(), "fidx topk disagrees"
    a = np.asarray(imp_scatter(is_imp))
    assert (a == np.asarray(imp_sort(is_imp))).all(), "imp sort disagrees"
    assert (a == np.asarray(imp_topk(is_imp))).all(), "imp topk disagrees"
    a = np.asarray(seed_scatter(off))
    assert (a == np.asarray(seed_scatter_sorted(off))).all(), \
        "seed sorted disagrees"
    print("# equivalence checks OK", flush=True)


if __name__ == "__main__":
    main()
