"""Parameterized C2 walk runner: one (r_initiator, D-size, pop, g, min_wt)
configuration per invocation, appending a JSON line with BOTH halves of the
north-star metric (walker-steps/s AND bias vs the small-eps oracle) to an
output file.

Used for the round-3 bias characterization (VERDICT r2 item 2): scan
r_initiator in {1, 0.5, 0.25, 0.1} and n_imp in {12k, 30k, 60k} at fixed
population and confirm the residual extrapolates to the oracle
(HCI eps_var=1e-4 + eps_pt=1e-7: E0 = -75.72859 Ha).

Ref knobs: r_initiator = do_walk.f90 initiator card / check_initiator:6838;
D-space size = semistochastic space cards (do_walk.f90:887-1012).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ORACLE_E0 = -75.72859  # HCI eps_var=1e-4 (-75.727145) + PT eps_pt=1e-7 (-0.0014428)


def get_trial(system, eps_var, n_psi_t, n_imp, root, verbose=False):
    """Build-or-load a trial keyed by its construction parameters."""
    from sqmc_tpu.algo.semistoch import (build_trial_wavefunction,
                                         save_trial, load_trial)
    cache = os.path.join(root, ".cache")
    os.makedirs(cache, exist_ok=True)
    tag = f"c2_trial_e{eps_var:g}_t{n_psi_t}_i{n_imp}"
    path = os.path.join(cache, tag + ".npz")
    if os.path.exists(path):
        return load_trial(path)
    t0 = time.time()
    trial = build_trial_wavefunction(system, eps_var=eps_var,
                                     n_psi_t=n_psi_t, n_imp=n_imp,
                                     verbose=verbose)
    save_trial(trial, path)
    sys.stderr.write(f"# built {tag} in {time.time() - t0:.0f}s\n")
    return trial


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pop", type=float, default=60_000.0)
    ap.add_argument("--g", type=float, default=1.0)
    ap.add_argument("--min-wt", type=float, default=0.25)
    ap.add_argument("--r-init", type=float, default=1.0)
    ap.add_argument("--eps-var", type=float, default=1e-3)
    ap.add_argument("--n-psit", type=int, default=2000)
    ap.add_argument("--n-imp", type=int, default=20000)
    ap.add_argument("--tau", type=float, default=2e-3)
    ap.add_argument("--mwalk-bits", type=int, default=15)
    ap.add_argument("--cap-bits", type=int, default=17)
    ap.add_argument("--mwalk", type=int, default=0, help="absolute override")
    ap.add_argument("--cap", type=int, default=0, help="absolute override")
    ap.add_argument("--nstep", type=int, default=100)
    ap.add_argument("--nblk", type=int, default=30)
    ap.add_argument("--nblk-eq", type=int, default=12)
    ap.add_argument("--max-eq-ext", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None, help="append JSON line here")
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--two-level", action="store_true",
                    help="use the two-level merge instead of the full sort")
    ap.add_argument("--proj-bf16", action="store_true",
                    help="store the dense D-projection matrix bf16 (bitwise-free on the v5e MXU)")
    ap.add_argument("--dense-proj-max", type=int, default=0,
                    help="override cfg.dense_proj_max (with --proj-bf16 the "
                         "dense MXU projection scales to ~48k D dets: "
                         "[48k,48k] bf16 = 4.8 GB streamed per step, far "
                         "cheaper than the ELL gather form)")
    ap.add_argument("--f32", action="store_true",
                    help="f32 walker-state mode (cfg.f32_state)")
    ap.add_argument("--cap-compact", type=int, default=0,
                    help="compact valid spawns into this many slots "
                         "before the annihilation sort (0 = off)")
    ap.add_argument("--no-pipeline", action="store_true",
                    help="disable the 1-block dispatch lookahead")
    ap.add_argument("--cap-single", type=int, default=0,
                    help="compact the singles channel to this many slots")
    ap.add_argument("--w-begin", type=float, default=0.0,
                    help="initial |weight| (default pop)")
    args = ap.parse_args()

    import numpy as np
    import jax
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".cache", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    jax.config.update("jax_default_prng_impl", "rbg")
    from sqmc_tpu.systems.base import make_chem_system
    from sqmc_tpu.algo.walk import WalkConfig, run_walk

    with jax.default_device(jax.devices("cpu")[0]):
        system = make_chem_system(
            "/root/reference/C2_v2z_curve/r1.24253/FCIDUMP")
        trial = get_trial(system, args.eps_var, args.n_psit, args.n_imp,
                          root, verbose=not args.quiet)
    sys.stderr.write(f"# trial: n_psit={len(trial.psit_up)} "
                     f"n_imp={len(trial.imp_up)} "
                     f"nnz={len(trial.imp_ham.vals)} "
                     f"e_trial={trial.e_trial:.6f}\n")

    cfg = WalkConfig(mwalk=args.mwalk or (1 << args.mwalk_bits),
                     cap_spawn=args.cap or (1 << args.cap_bits),
                     norb=system.norb, nup=system.nup, ndn=system.ndn,
                     n_words=system.n_words, tau=args.tau,
                     w_abs_target=args.pop, has_singles=True,
                     spawn_granularity=args.g, min_wt=args.min_wt,
                     r_initiator=args.r_init,
                     full_sort_merge=not args.two_level,
                     f32_state=args.f32, cap_single=args.cap_single,
                     cap_compact=args.cap_compact,
                     proj_bf16=args.proj_bf16,
                     **({"dense_proj_max": args.dense_proj_max}
                        if args.dense_proj_max else {}))
    out = run_walk(system, trial, cfg, nstep=args.nstep, nblk=args.nblk,
                   nblk_eq=args.nblk_eq,
                   w_abs_begin=args.w_begin or args.pop,
                   e_trial_initial=trial.e_trial, seed=args.seed,
                   verbose=not args.quiet, mode="scan",
                   max_eq_extensions=args.max_eq_ext,
                   pipeline_blocks=not args.no_pipeline)
    pop = float(np.mean(out.w_abs_trace[-min(1000, args.nblk * args.nstep):]))
    rec = {
        "r_init": args.r_init, "n_imp": int(len(trial.imp_up)),
        "n_psit": int(len(trial.psit_up)), "g": args.g,
        "min_wt": args.min_wt, "pop_target": args.pop, "tau": args.tau,
        "seed": args.seed,
        "e_mixed": out.e_mixed, "e_err": out.e_err, "t_corr": out.t_corr,
        "bias_mHa": 1e3 * (out.e_mixed - ORACLE_E0),
        "pop": pop, "nwalk": int(out.nwalk_trace[-1]),
        "gen_per_sec": out.steps_per_sec,
        # occupied-determinant updates/sec: the reference's per-walker
        # work unit (its walker loop runs over occupied dets)
        "walker_steps_per_sec": float(np.mean(
            out.nwalk_trace[-min(1000, args.nblk * args.nstep):]))
        * out.steps_per_sec,
        "weight_steps_per_sec": pop * out.steps_per_sec,
        "merge": "two_level" if args.two_level else "full_sort",
        "cap_compact": args.cap_compact,
        "pipeline": not args.no_pipeline,
        "f32_state": args.f32, "cap_single": args.cap_single,
        "mwalk": cfg.mwalk, "cap_spawn": cfg.cap_spawn,
    }
    line = json.dumps(rec)
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
