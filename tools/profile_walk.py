"""Device-profile the walk step on the bench workload.

Runs a few generations under jax.profiler.trace and aggregates
device_duration_ps by HLO category / op name from the trace proto, printing
a ms/step breakdown (the tool behind PERF_NOTES.md's tables).

Usage: python tools/profile_walk.py [nstep] [outdir]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build():
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    from sqmc_tpu.systems.base import make_chem_system
    from sqmc_tpu.algo.semistoch import load_trial, build_trial_wavefunction, save_trial
    from sqmc_tpu.algo.walk import (WalkConfig, build_walk_tables,
                                    init_walk_state, walk_block)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = os.path.join(root, ".cache")
    trial_path = os.path.join(cache, "c2_bench_trial.npz")
    with jax.default_device(jax.devices("cpu")[0]):
        system = make_chem_system(
            "/root/reference/C2_v2z_curve/r1.24253/FCIDUMP")
        if os.path.exists(trial_path):
            trial = load_trial(trial_path)
        else:
            trial = build_trial_wavefunction(system, eps_var=5e-3,
                                             n_psi_t=200, n_imp=500,
                                             verbose=False)
            save_trial(trial, trial_path)
    cfg = WalkConfig(mwalk=1 << 14, cap_spawn=1 << 17, norb=system.norb,
                     nup=system.nup, ndn=system.ndn, n_words=system.n_words,
                     tau=2e-3, w_abs_target=200_000.0, has_singles=True,
                     spawn_granularity=2.0)
    tables = build_walk_tables(system, trial)
    state = init_walk_state(cfg, trial, 50_000.0, trial.e_trial)
    return cfg, tables, state, walk_block


def main():
    import jax
    import time
    nstep = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/walk_trace"
    cfg, tables, state, walk_block = build()

    # warm up: grow the population to target + compile (the same
    # 100-step block program the bench runs, so the compile is cached)
    nstep = 100
    for _ in range(3):
        state, _ = walk_block(state, tables, cfg, nstep)
    jax.block_until_ready(state.wt)
    print(f"# warmed up: w_abs={float(state.w_abs_gen):.0f} "
          f"nwalk={int(state.nwalk)}", flush=True)

    t0 = time.time()
    state, _ = walk_block(state, tables, cfg, nstep)
    jax.block_until_ready(state.wt)
    dt = time.time() - t0
    print(f"# un-traced: {dt / nstep * 1000:.1f} ms/step", flush=True)

    with jax.profiler.trace(outdir):
        state, _ = walk_block(state, tables, cfg, nstep)
        jax.block_until_ready(state.wt)

    # aggregate the trace
    files = sorted(glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not files:
        print("no trace file found under", outdir)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    by_cat = defaultdict(float)
    by_op = defaultdict(float)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        args = ev.get("args") or {}
        # device-side complete events carry hlo_category
        cat = args.get("hlo_category")
        if cat is None:
            continue
        dur = ev.get("dur", 0)  # microseconds
        name = ev.get("name", "?")
        by_cat[cat] += dur
        by_op[f"{cat:24s} {name.split('.')[0][:60]}"] += dur
        total += dur
    print(f"\n# total device time {total / 1000 / nstep:.1f} ms/step over "
          f"{nstep} steps")
    print("\n# by category (ms/step):")
    for k, v in sorted(by_cat.items(), key=lambda x: -x[1]):
        print(f"  {v / 1000 / nstep:8.2f}  {k}")
    print("\n# top 30 ops (ms/step):")
    for k, v in sorted(by_op.items(), key=lambda x: -x[1])[:30]:
        print(f"  {v / 1000 / nstep:8.3f}  {k}")


if __name__ == "__main__":
    main()
