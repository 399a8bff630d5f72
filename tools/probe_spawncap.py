"""Probe the actual per-step spawn-slot demand at the bench configuration
(round-4): every [CAP]-shaped op in the step (proposal, singles, spawn
construction, the merge's CS rows) scales with cap_spawn, so if the
realized total_spawn sits well below CAP the capacity is pure overhead.
Prints the n_spawn trace stats over measured blocks; capacity escalation
(test_walk.py::test_capacity_escalation) makes shrinking CAP safe.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pop", type=float, default=200_000.0)
    ap.add_argument("--g", type=float, default=2.0)
    ap.add_argument("--min-wt", type=float, default=0.5)
    ap.add_argument("--r-init", type=float, default=0.5)
    ap.add_argument("--n-imp", type=int, default=20000)
    ap.add_argument("--n-psit", type=int, default=2000)
    ap.add_argument("--eps-var", type=float, default=1e-3)
    ap.add_argument("--mwalk", type=int, default=458752)
    ap.add_argument("--cap", type=int, default=262144)
    ap.add_argument("--nblk", type=int, default=6)
    ap.add_argument("--nstep", type=int, default=25)
    args = ap.parse_args()

    import numpy as np
    import jax
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".cache", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    jax.config.update("jax_default_prng_impl", "rbg")
    from sqmc_tpu.systems.base import make_chem_system
    from sqmc_tpu.algo.walk import (WalkConfig, build_walk_tables,
                                    init_walk_state, walk_block)
    from scan_walk import get_trial

    with jax.default_device(jax.devices("cpu")[0]):
        system = make_chem_system(
            "/root/reference/C2_v2z_curve/r1.24253/FCIDUMP")
        trial = get_trial(system, args.eps_var, args.n_psit, args.n_imp, root)
    cfg = WalkConfig(mwalk=args.mwalk, cap_spawn=args.cap, norb=system.norb,
                     nup=system.nup, ndn=system.ndn, n_words=system.n_words,
                     tau=2e-3, w_abs_target=args.pop, has_singles=True,
                     spawn_granularity=args.g, min_wt=args.min_wt,
                     r_initiator=args.r_init, f32_state=True, proj_bf16=True)
    tables = build_walk_tables(system, trial, cfg=cfg)
    state = init_walk_state(cfg, trial, 0.7 * args.pop, trial.e_trial,
                            tables=tables)
    for blk in range(args.nblk):
        state, stats = walk_block(state, tables, cfg, args.nstep)
        ns = np.asarray(stats["n_spawn"])
        nw = np.asarray(stats["nwalk"])
        print(f"blk {blk + 1}: n_spawn mean={ns.mean():.0f} "
              f"max={ns.max()} p99={np.percentile(ns, 99):.0f} "
              f"cap={args.cap} frac={ns.max() / args.cap:.3f} "
              f"nwalk_last={nw[-1]}", flush=True)


if __name__ == "__main__":
    main()
