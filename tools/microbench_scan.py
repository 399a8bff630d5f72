"""On-chip A/B of scan formulations and the pair-rowsum chain.

Candidates measured (v5e, bench shapes):
 1. segmented scan [720k] x 6 mixed-dtype fields:
    flat lax.associative_scan (current, ops/segscan.py) vs a two-level
    blocked scan (within-block scan along axis=1 + tiny cross-block
    carry scan + one elementwise apply).
 2. plain max-scan [262k] i32 (the slot->parent forward fill,
    walk.py:1117): associative_scan(maximum) vs lax.cummax vs blocked.
 3. pair rowsum chain [CAP=262k, nelec=12]: one-hot einsum chain
    (current, walk.py:1188-1199) vs direct scattered gather from the
    [2n,2n] table vs row-gather G2=A2[occ2] + take_along_axis.

Usage: python tools/microbench_scan.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, n=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".cache", "jax_cache"))
    jax.config.update("jax_enable_x64", True)
    from sqmc_tpu.ops import segscan

    rng = np.random.default_rng(0)

    # ---- 1. segmented scan, merge shapes ----
    N = 720896  # M + CS at bench
    start = np.zeros(N, bool)
    start[0] = True
    start[np.sort(rng.choice(N, 300000, replace=False))] = True
    u = rng.integers(0, 130, N).astype(np.int32)
    init_row = rng.integers(0, 3, N).astype(np.int32)
    wt = rng.normal(size=N).astype(np.float32)
    dwt = rng.normal(size=N).astype(np.float32)
    diag = rng.normal(size=N).astype(np.float32)
    ct = rng.integers(-2, 2000, N).astype(np.int32)
    fields = (u, init_row, wt, dwt, diag, ct)
    ops = ("min", "max", "sum", "sum", "min", "max")
    d_start = jnp.asarray(start)
    d_fields = tuple(jnp.asarray(f) for f in fields)

    flat = jax.jit(lambda s, *f: segscan.seg_scan(f, ops, s))
    ms = timeit(flat, d_start, *d_fields)
    print(f"segscan flat [{N}] x6: {ms:.3f} ms")

    def seg_scan_blocked(fields_, ops_, start_, B):
        # the two-level form that LOST the A/B (kept here so the negative
        # result stays reproducible; ops/segscan.py ships the flat scan)
        _OPS = {"sum": lambda a, b: a + b, "min": jnp.minimum,
                "max": jnp.maximum}
        fns = [_OPS[o] for o in ops_]

        def combine(a, b):
            out = [a[0] | b[0]]
            for fn, xa, xb in zip(fns, a[1:], b[1:]):
                out.append(jnp.where(b[0], xb, fn(xa, xb)))
            return tuple(out)

        def ident(o, dt):
            if o == "sum":
                return jnp.zeros((), dt)
            big = (jnp.iinfo(dt).max if jnp.issubdtype(dt, jnp.integer)
                   else jnp.array(jnp.inf, dt))
            return big if o == "min" else -big

        Nn = start_.shape[0]
        assert Nn % B == 0, f"N={Nn} must be divisible by block B={B}"
        G = Nn // B
        xb = tuple(x.reshape(G, B) for x in (start_, *tuple(fields_)))
        s1 = jax.lax.associative_scan(combine, xb, axis=1)
        summ = tuple(r[:, -1] for r in s1)
        carry = jax.lax.associative_scan(combine, summ)
        ids = [jnp.zeros(1, bool)] + [
            jnp.full(1, ident(o, f.dtype), f.dtype)
            for o, f in zip(ops_, fields_)]
        carry = tuple(jnp.concatenate([i, c[:-1]])
                      for i, c in zip(ids, carry))
        flag = s1[0]
        out = []
        for fn, c, r in zip(fns, carry[1:], s1[1:]):
            out.append(jnp.where(flag, r, fn(c[:, None], r)).reshape(Nn))
        return out

    for B in (256, 512, 1024, 2048):
        blk = jax.jit(lambda s, *f, B=B: seg_scan_blocked(f, ops, s, B))
        ms_b = timeit(blk, d_start, *d_fields)
        # correctness vs flat at end rows (min/max exact; sums re-ordered)
        ref = flat(d_start, *d_fields)
        got = blk(d_start, *d_fields)
        ok_exact = all(bool(jnp.all(r == g)) for r, g, o in
                       zip(ref, got, ops) if o != "sum")
        ok_sum = all(bool(jnp.allclose(r, g, rtol=1e-5, atol=1e-5))
                     for r, g, o in zip(ref, got, ops) if o == "sum")
        print(f"segscan blocked B={B}: {ms_b:.3f} ms  "
              f"exact_minmax={ok_exact} sum_close={ok_sum}")

    # ---- 2. plain max scan [CAP] i32 ----
    CAP = 262144
    seed = rng.integers(-1, CAP, CAP).astype(np.int32)
    d_seed = jnp.asarray(seed)

    f_assoc = jax.jit(lambda x: jax.lax.associative_scan(jnp.maximum, x))
    f_cummax = jax.jit(lambda x: jax.lax.cummax(x))
    print(f"maxscan assoc  [{CAP}] i32: {timeit(f_assoc, d_seed):.3f} ms")
    print(f"maxscan cummax [{CAP}] i32: {timeit(f_cummax, d_seed):.3f} ms")
    ok = bool(jnp.all(f_assoc(d_seed) == f_cummax(d_seed)))
    print(f"maxscan agree: {ok}")

    def blocked_max(x, B=512):
        G = x.shape[0] // B
        xb = x.reshape(G, B)
        s1 = jax.lax.associative_scan(jnp.maximum, xb, axis=1)
        carry = jax.lax.associative_scan(jnp.maximum, s1[:, -1])
        carry = jnp.concatenate(
            [jnp.full(1, jnp.iinfo(x.dtype).min, x.dtype), carry[:-1]])
        return jnp.maximum(s1, carry[:, None]).reshape(-1)

    for B in (512, 1024):
        fb = jax.jit(lambda x, B=B: blocked_max(x, B))
        okb = bool(jnp.all(f_assoc(d_seed) == fb(d_seed)))
        print(f"maxscan blocked B={B}: {timeit(fb, d_seed):.3f} ms "
              f"agree={okb}")

    # ---- 3. pair rowsum chain ----
    norb, nup, ndn = 26, 6, 6
    nelec = nup + ndn
    S = CAP
    R2 = rng.normal(size=(2 * norb, 2 * norb)).astype(np.float32)
    u_rowsum = np.abs(rng.normal(size=2 * norb)).astype(np.float32)
    occ2 = np.stack([rng.choice(2 * norb, nelec, replace=False)
                     for _ in range(64)]).astype(np.int32)
    occ2 = occ2[rng.integers(0, 64, S)]
    iu, ju = np.triu_indices(nup, 1)
    idn, jdn = np.triu_indices(ndn, 1)
    io_, jo_ = np.meshgrid(np.arange(nup), np.arange(ndn), indexing="ij")
    flat_pairs = np.concatenate(
        [iu * nelec + ju, (nup + idn) * nelec + (nup + jdn),
         io_.ravel() * nelec + (nup + jo_.ravel())]).astype(np.int32)
    npairs = len(flat_pairs)
    d_occ2 = jnp.asarray(occ2)
    d_R2 = jnp.asarray(R2)
    A2 = jnp.concatenate([d_R2, jnp.asarray(u_rowsum)[:, None]], axis=1)

    def einsum_chain(occ2_):
        O2 = jax.nn.one_hot(occ2_, 2 * norb, dtype=jnp.float32)
        G2 = jnp.einsum("mio,oq->miq", O2, A2)
        P2 = jnp.einsum("miq,mjq->mij", G2[:, :, :2 * norb], O2)
        pr = P2.reshape(S, nelec * nelec)[:, flat_pairs]
        sing = G2[:, :, 2 * norb]
        return pr, sing

    def gather_chain(occ2_):
        # scattered scalar gather from the tiny [2n*2n] table
        pi = flat_pairs // nelec
        pj = flat_pairs % nelec
        oi = occ2_[:, pi]
        oj = occ2_[:, pj]
        pr = d_R2.reshape(-1)[oi * (2 * norb) + oj]
        sing = jnp.asarray(u_rowsum)[occ2_]
        return pr, sing

    def rowgather_chain(occ2_):
        G2 = A2[occ2_]                          # [S, ne, 2n+1] row gather
        pi = flat_pairs // nelec
        pj = flat_pairs % nelec
        Gp = G2[:, pi, :2 * norb]               # [S, npairs, 2n]
        oj = occ2_[:, flat_pairs % nelec]
        pr = jnp.take_along_axis(Gp, oj[:, :, None], axis=2)[:, :, 0]
        sing = G2[:, :, 2 * norb]
        return pr, sing

    fe = jax.jit(einsum_chain)
    fg = jax.jit(gather_chain)
    fr = jax.jit(rowgather_chain)
    print(f"pair-rowsum einsum  [{S},{nelec}] npairs={npairs}: "
          f"{timeit(fe, d_occ2):.3f} ms")
    print(f"pair-rowsum gather  : {timeit(fg, d_occ2):.3f} ms")
    try:
        print(f"pair-rowsum rowgath : {timeit(fr, d_occ2):.3f} ms")
    except Exception as e:  # [S,npairs,2n] temps can exceed compile limits
        print(f"pair-rowsum rowgath : FAILED ({type(e).__name__})")
    pe, se = fe(d_occ2)
    pg, sg = fg(d_occ2)
    print(f"einsum-vs-gather max rel err "
          f"{float(jnp.max(jnp.abs(pe - pg)) / jnp.max(jnp.abs(pg))):.2e} "
          f"(expected ~2^-9: MXU bf16 quantization of the einsum path)")


if __name__ == "__main__":
    main()
