"""Microbenchmark TPU gather/scatter lowerings at walk-step shapes.

Answers, with measurements instead of folklore, which data-movement
formulation the merge/proposal should use (PERF_NOTES r3h item 5):
  * planar u32 gather vs u64 gather vs multi-plane row gather
  * row gather cost vs row WIDTH (4B .. 328B)
  * planar u32 scatter-set vs wide-row scatter-set vs scatter-add
  * the inverse-compaction pattern (1 scatter + 1 wide gather) vs
    K planar scatters

Run: python tools/microbench_gs.py  (on the axon chip)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

M = 458752          # mwalk at bench shape
N = 720896          # M + cap_spawn
CAP = 262144


_OVERHEAD = [0.0]


def bench(name, fn, *args, iters=50):
    # NOTE: on the axon remote backend block_until_ready returns at
    # dispatch, not completion - a value FETCH is the only sync.  Chain
    # `iters` dispatches (in-order execution on the core), fetch one
    # element of the last output, subtract the measured null overhead.
    fetch = jax.jit(lambda o: jnp.ravel(o if not isinstance(o, tuple)
                                        else o[0])[:1])
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    np.asarray(jax.device_get(fetch(out)))   # warm both executables
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(*args)
    np.asarray(jax.device_get(fetch(out)))
    dt = (time.perf_counter() - t0 - _OVERHEAD[0]) / iters
    print(f"{name:55s} {dt * 1e3:8.3f} ms")
    return dt


def calibrate():
    z = jnp.zeros(8, jnp.float32)
    _OVERHEAD[0] = 0.0
    t = bench("null (fetch overhead, subtracted from all rows)",
              lambda x: x + 1.0, z)
    _OVERHEAD[0] = max(t * 50, 0.0)


def main():
    print(f"# device: {jax.devices()[0]}")
    calibrate()
    rng = np.random.default_rng(0)
    # gather indices: CAP slots -> M parents (sorted-ish like parent[])
    idx_cap = jnp.asarray(np.sort(rng.integers(0, M, CAP)).astype(np.int32))
    idx_m = jnp.asarray(np.sort(rng.integers(0, N, M)).astype(np.int32))
    # scatter destinations: unique ascending prefix (like the merge dest)
    ndst = int(0.6 * N)
    dst = np.full(N, M, np.int32)
    dst[:ndst] = np.arange(ndst) % M
    dst_j = jnp.asarray(dst)

    src_u32 = jnp.asarray(rng.integers(0, 2**31, N).astype(np.uint32))
    src_u64 = src_u32.astype(jnp.uint64) << jnp.uint64(32) | \
        src_u32.astype(jnp.uint64)
    tbl_u32_m = jnp.asarray(rng.integers(0, 2**31, M).astype(np.uint32))
    tbl_u64_m = tbl_u32_m.astype(jnp.uint64)
    tbl_f32_28 = jnp.asarray(rng.random((M, 28), np.float32))
    for k in (2, 6, 12, 28, 82):
        t = jnp.asarray(rng.integers(0, 2**31, (N, k)).astype(np.uint32))
        bench(f"row gather [{M}] <- [{N},{k}] u32 ({4*k}B)",
              lambda tb, ix: jnp.take(tb, ix, axis=0), t, idx_m)
    bench(f"planar gather [{M}] <- [{N}] u32",
          lambda tb, ix: tb[ix], src_u32, idx_m)
    bench(f"planar gather [{M}] <- [{N}] u64",
          lambda tb, ix: tb[ix], src_u64, idx_m)
    bench(f"u64 via 2xu32-plane row gather [{M}]",
          lambda tb, ix: jax.lax.bitcast_convert_type(
              jnp.take(jax.lax.bitcast_convert_type(tb, jnp.uint32),
                       ix, axis=0), jnp.uint64), src_u64, idx_m)

    bench(f"planar gather [{CAP}] <- [{M}] u32",
          lambda tb, ix: tb[ix], tbl_u32_m, idx_cap)
    bench(f"planar gather [{CAP}] <- [{M}] u64",
          lambda tb, ix: tb[ix], tbl_u64_m, idx_cap)
    bench(f"row gather [{CAP},28] <- [{M},28] f32 (pair_cum)",
          lambda tb, ix: jnp.take(tb, ix, axis=0), tbl_f32_28, idx_cap)
    t82 = jnp.asarray(rng.integers(0, 2**31, (M, 82)).astype(np.uint32))
    bench(f"row gather [{CAP},82] <- [{M},82] u32 (328B mega)",
          lambda tb, ix: jnp.take(tb, ix, axis=0), t82, idx_cap)

    # 2-D gather like p_pair[b, pair_i]
    pair_i = jnp.asarray(rng.integers(0, 28, CAP).astype(np.int32))
    bench(f"2-D gather [{CAP}] <- [{M},28] (b,pair_i)",
          lambda tb, b, pi: tb[b, pi], tbl_f32_28, idx_cap, pair_i)
    # take_along_axis on already-gathered rows
    rows = jnp.take(tbl_f32_28, idx_cap, axis=0)
    bench(f"take_along_axis [{CAP},28] minor",
          lambda r, pi: jnp.take_along_axis(r, pi[:, None], axis=1)[:, 0],
          rows, pair_i)

    # scatters
    vals_u32 = src_u32
    bench(f"planar scatter-set [{N}] -> [{M}] u32 (drop,unique)",
          lambda d, v: jnp.zeros(M, jnp.uint32).at[d].set(
              v, mode="drop", unique_indices=True), dst_j, vals_u32)
    v3 = jnp.asarray(rng.integers(0, 2**31, (N, 3)).astype(np.uint32))
    bench(f"wide scatter-set [{N},3] -> [{M},3] u32",
          lambda d, v: jnp.zeros((M, 3), jnp.uint32).at[d].set(
              v, mode="drop", unique_indices=True), dst_j, v3)
    v6 = jnp.asarray(rng.integers(0, 2**31, (N, 6)).astype(np.uint32))
    bench(f"wide scatter-set [{N},6] -> [{M},6] u32",
          lambda d, v: jnp.zeros((M, 6), jnp.uint32).at[d].set(
              v, mode="drop", unique_indices=True), dst_j, v6)
    f32v = jnp.asarray(rng.random(N, np.float32))
    bench(f"planar scatter-add [{N}] -> [{M}] f32",
          lambda d, v: jnp.zeros(M, jnp.float32).at[d].add(
              v, mode="drop"), dst_j, f32v)

    # the inverse-compaction composite: 1 planar i32 scatter + wide gather
    def inv_compact(d, payload):
        src = jnp.zeros(M, jnp.int32).at[d].set(
            jnp.arange(N, dtype=jnp.int32), mode="drop",
            unique_indices=True)
        return jnp.take(payload, src, axis=0)
    p6 = v6
    bench(f"inverse-compaction: i32 scatter + [{M},6] row gather",
          inv_compact, dst_j, p6)


if __name__ == "__main__":
    main()
