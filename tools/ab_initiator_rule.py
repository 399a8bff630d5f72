"""A/B the two initiator-combine semantics inside the annihilation merge
(round-4, VERDICT r3 item 6):

  group_max   — a merged group's initiator is the max over its rows; the
                order-independent variant the reference itself proposes in
                a comment (do_walk.f90:5898-5900) and this framework uses
                in production.
  sequential  — the reference's ACTUAL order-dependent pairwise rule
                (merge_original_with_spawned2 do_walk.f90:5897-5950):
                same-sign pair -> max, opposite-sign pair -> the
                initiator follows the sign-winning walker (tie -> 0).

Measured on an FCI-solvable HEG (3D, N=4) at a small population where the
initiator bias at r_initiator=1 is several sigma of a long run, over many
independent seeds; reports each rule's bias +- sem and the per-seed
PAIRED difference (same seeds, so the difference error bar excludes most
of the shared stochastic noise).

Usage: python tools/ab_initiator_rule.py [--seeds 16] [--pop 300] ...
Appends one JSON record to .cache/ab_initiator_r4.jsonl.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# CPU-only measurement: the workload is thousands of small-system runs
# (compiles dominate through the TPU tunnel), and the sequential rule's
# f64 lax.scan carry hits the TPU X64-demotion rewriter's unimplemented
# u64 bitcast-convert.
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=16)
    ap.add_argument("--pop", type=float, default=300.0)
    ap.add_argument("--r-init", type=float, default=1.0)
    ap.add_argument("--min-wt", type=float, default=0.25)
    ap.add_argument("--tau", type=float, default=5e-3)
    ap.add_argument("--nstep", type=int, default=100)
    ap.add_argument("--nblk", type=int, default=12)
    ap.add_argument("--nblk-eq", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import numpy as np
    from sqmc_tpu.systems.heg.system import make_heg_system
    from sqmc_tpu.algo.hci import run_hci
    from sqmc_tpu.algo.semistoch import build_trial_wavefunction
    from sqmc_tpu.algo.walk import WalkConfig, run_walk

    sys_ = make_heg_system(3, 1.0, 4, 2, 1.6)
    res = run_hci(sys_, eps_var=1e-9, eps_var_sched=[1e-9] * 30,
                  max_iters=60, verbose=False)
    e0 = float(res.energies[0])
    trial = build_trial_wavefunction(sys_, eps_var=1e-3, n_psi_t=30,
                                     n_imp=1, verbose=False)
    print(f"# HEG 3D N=4: FCI e0={e0:.8f}, ndet={len(res.up)}", flush=True)

    base = WalkConfig(mwalk=4096, cap_spawn=16384, norb=sys_.norb, nup=2,
                      ndn=2, n_words=1, tau=args.tau,
                      w_abs_target=args.pop, has_singles=False,
                      r_initiator=args.r_init, min_wt=args.min_wt)

    results = {}
    for rule in ("group_max", "sequential"):
        cfg = dataclasses.replace(base, initiator_rule=rule)
        biases = []
        t0 = time.time()
        for seed in range(args.seeds):
            out = run_walk(sys_, trial, cfg, nstep=args.nstep,
                           nblk=args.nblk, nblk_eq=args.nblk_eq,
                           w_abs_begin=args.pop,
                           e_trial_initial=e0, verbose=False, seed=seed,
                           max_eq_extensions=0)
            biases.append(out.e_mixed - e0)
            print(f"# {rule} seed {seed}: bias={1e3 * biases[-1]:+.4f} mHa "
                  f"(err {1e3 * out.e_err:.4f})", flush=True)
        b = np.asarray(biases)
        results[rule] = b
        print(f"# {rule}: bias = {1e3 * b.mean():+.4f} +- "
              f"{1e3 * b.std(ddof=1) / np.sqrt(len(b)):.4f} mHa "
              f"({time.time() - t0:.0f}s)", flush=True)

    gm, sq = results["group_max"], results["sequential"]
    diff = sq - gm                       # paired by seed
    rec = {
        "system": "heg3d_n4_fci", "e0": e0, "r_init": args.r_init,
        "pop": args.pop, "min_wt": args.min_wt, "tau": args.tau,
        "seeds": args.seeds,
        "steps_per_seed": args.nstep * (args.nblk + args.nblk_eq),
        "bias_group_max_mHa": 1e3 * float(gm.mean()),
        "sem_group_max_mHa": 1e3 * float(gm.std(ddof=1) / len(gm) ** 0.5),
        "bias_sequential_mHa": 1e3 * float(sq.mean()),
        "sem_sequential_mHa": 1e3 * float(sq.std(ddof=1) / len(sq) ** 0.5),
        "paired_diff_mHa": 1e3 * float(diff.mean()),
        "sem_paired_diff_mHa": 1e3 * float(diff.std(ddof=1)
                                           / len(diff) ** 0.5),
    }
    print(json.dumps(rec), flush=True)
    out = args.out or os.path.join(ROOT, ".cache", "ab_initiator_r4.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
