"""Run the C2 variational stage with device-resident Davidson on the TPU
chip (VERDICT r2 item 7): A/B the COO scatter-add matvec against the ELL
row-gather formulation at the ~88k/182k-det scale, with f64 Rayleigh
refinement of the f32 device eigenpair.

Why mixed precision: the axon TPU backend silently computes f64 as f32
(PERF_NOTES round-3 correction), so a bitwise-f64 device Davidson is
impossible on this chip generation.  The TPU-native design runs the
subspace expansion in f32 (search directions only need a few digits) and
refines the final eigenvalue as a host-f64 Rayleigh quotient: for a
symmetric H the eigenvalue error is O(||r||^2), so an f32-converged
residual (~1e-6) yields ~1e-12 eigenvalue accuracy after refinement.

Usage: python tools/bench_variational_tpu.py [--eps 2e-4] [--states 1]
Ref: davidson_sparse_mpi2 more_tools.f90:2525 (the per-core sparse matvec
+ allreduce this replaces with one chip's HBM).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rayleigh_f64(H, x):
    """Host-f64 Rayleigh quotient over the symmetric upper COO."""
    import numpy as np
    x = x.astype(np.float64)
    x = x / np.linalg.norm(x)
    hx = H.diag * x
    np.add.at(hx, H.rows, H.vals * x[H.cols])
    np.add.at(hx, H.cols, H.vals * x[H.rows])
    return float(x @ hx)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eps", type=float, default=2e-4)
    ap.add_argument("--states", type=int, default=1)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = os.path.join(root, ".cache")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(cache, "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from sqmc_tpu.systems.base import make_chem_system
    from sqmc_tpu.algo.hci import run_hci
    from sqmc_tpu.algo.davidson import davidson, _matvec

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    print(f"# device: {tpu}", file=sys.stderr)

    t0 = time.time()
    with jax.default_device(cpu):
        system = make_chem_system(
            "/root/reference/C2_v2z_curve/r1.24253/FCIDUMP")
        res = run_hci(system, eps_var=args.eps,
                      eps_var_sched=[2e-3, 2e-3, 1e-3, 5e-4, args.eps],
                      n_states=args.states, max_iters=24, verbose=False,
                      keep_ham=True, wf_cache_dir=cache)
    H = res.ham
    n, nnz = H.n, len(H.vals)
    e_ref = res.energies[0]
    print(f"# built n={n} nnz={nnz} e_var={e_ref:.9f} "
          f"({time.time() - t0:.0f}s)", file=sys.stderr)

    x0 = res.wts[:, :args.states].astype(np.float64)

    out = {"n": n, "nnz": nnz, "e_var_host_f64": e_ref}

    # ---- TPU COO f32 ------------------------------------------------------
    rows32 = jax.device_put(H.rows.astype(np.int32), tpu)
    cols32 = jax.device_put(H.cols.astype(np.int32), tpu)
    vals32 = jax.device_put(H.vals.astype(np.float32), tpu)
    diag32 = jax.device_put(H.diag.astype(np.float32), tpu)

    def mv_coo(v):
        return _matvec(rows32, cols32, vals32,
                       diag32, jnp.asarray(v, jnp.float32))

    # compile + time one matvec
    v1 = np.random.default_rng(0).normal(size=n).astype(np.float32)
    w = mv_coo(v1); w.block_until_ready()
    t0 = time.time()
    for _ in range(10):
        w = mv_coo(v1)
    float(jnp.sum(w))
    out["coo_matvec_ms"] = (time.time() - t0) / 10 * 1e3

    t0 = time.time()
    ev, X = davidson(H, n_states=args.states, initial=x0, tol=3e-6,
                     max_iter=60, matvec_fn=mv_coo)
    e_coo = rayleigh_f64(H, np.asarray(X[:, 0]))
    out["coo_solve_s"] = time.time() - t0
    out["e_var_tpu_coo_refined"] = e_coo
    out["coo_delta_uHa"] = 1e6 * (e_coo - e_ref)
    print(f"# COO: matvec {out['coo_matvec_ms']:.1f} ms, solve "
          f"{out['coo_solve_s']:.1f}s, refined e={e_coo:.9f} "
          f"(delta {out['coo_delta_uHa']:.2f} uHa)", file=sys.stderr)

    # ---- TPU ELL f32 ------------------------------------------------------
    from sqmc_tpu.ops.spmv_pallas import EllSpmv

    t0 = time.time()
    spmv = EllSpmv(H)               # ELL arrays land on the default (TPU)
    out["ell_build_s"] = time.time() - t0
    K = spmv.K
    out["ell_K"] = K
    out["ell_bytes"] = int(spmv.cols.size * 8)
    mv_ell = spmv

    w = mv_ell(v1); w.block_until_ready()
    t0 = time.time()
    for _ in range(10):
        w = mv_ell(v1)
    float(jnp.sum(w))
    out["ell_matvec_ms"] = (time.time() - t0) / 10 * 1e3

    t0 = time.time()
    ev, X = davidson(H, n_states=args.states, initial=x0, tol=3e-6,
                     max_iter=60, matvec_fn=mv_ell)
    e_ell = rayleigh_f64(H, np.asarray(X[:, 0]))
    out["ell_solve_s"] = time.time() - t0
    out["e_var_tpu_ell_refined"] = e_ell
    out["ell_delta_uHa"] = 1e6 * (e_ell - e_ref)
    print(f"# ELL: K={K}, matvec {out['ell_matvec_ms']:.1f} ms, solve "
          f"{out['ell_solve_s']:.1f}s, refined e={e_ell:.9f} "
          f"(delta {out['ell_delta_uHa']:.2f} uHa)", file=sys.stderr)

    # ---- TPU block-ELL f32 (the walk's D-projection layout) ---------------
    from sqmc_tpu.ops.spmv_pallas import BlockEllSpmv

    t0 = time.time()
    spmv_b = BlockEllSpmv(H)
    out["bell_build_s"] = time.time() - t0
    out["bell_bytes"] = int(spmv_b.cols.size * 8)

    w = spmv_b(v1); w.block_until_ready()
    t0 = time.time()
    for _ in range(10):
        w = spmv_b(v1)
    float(jnp.sum(w))
    out["bell_matvec_ms"] = (time.time() - t0) / 10 * 1e3

    t0 = time.time()
    ev, X = davidson(H, n_states=args.states, initial=x0, tol=3e-6,
                     max_iter=60, matvec_fn=spmv_b)
    e_bell = rayleigh_f64(H, np.asarray(X[:, 0]))
    out["bell_solve_s"] = time.time() - t0
    out["e_var_tpu_bell_refined"] = e_bell
    out["bell_delta_uHa"] = 1e6 * (e_bell - e_ref)
    print(f"# blockELL: matvec {out['bell_matvec_ms']:.1f} ms, solve "
          f"{out['bell_solve_s']:.1f}s, refined e={e_bell:.9f} "
          f"(delta {out['bell_delta_uHa']:.2f} uHa)", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
