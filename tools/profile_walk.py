"""Device-profile the walk step on a configurable workload.

Runs a few generations under jax.profiler.trace and aggregates
device_duration_ps by HLO category / op name from the trace proto, printing
a ms/step breakdown (the tool behind PERF_NOTES.md's tables).

Usage: python tools/profile_walk.py [--pop P --g G --min-wt W --n-imp N ...]
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build(args):
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
    cfg = WalkConfig(mwalk=1 << args.mwalk_bits,
                     cap_spawn=1 << args.cap_bits, norb=system.norb,
                     nup=system.nup, ndn=system.ndn, n_words=system.n_words,
                     tau=2e-3, w_abs_target=args.pop, has_singles=True,
                     spawn_granularity=args.g, min_wt=args.min_wt,
                     f32_state=args.f32, r_initiator=args.r_init,
                     proj_bf16=args.proj_bf16,
                     axis_name="d" if args.sharded else None,
                     n_dev=1 if args.sharded else 1)
    if args.sharded:
        from sqmc_tpu.parallel.dist import make_mesh, make_sharded_walk
        mesh = make_mesh(1)
        step, state, tables = make_sharded_walk(
            system, trial, cfg, mesh, 0.5 * args.pop, trial.e_trial,
            nstep_per_call=args.steps_per_call)

        def block(state, tables, cfg, nstep):
            stats = None
            for _ in range(nstep // args.steps_per_call):
                state, stats = step(state, tables)
            return state, stats

        return cfg, tables, state, block
    tables = build_walk_tables(system, trial, cfg=cfg)
    state = init_walk_state(cfg, trial, 0.5 * args.pop, trial.e_trial)
    return cfg, tables, state, walk_block


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pop", type=float, default=200_000.0)
    ap.add_argument("--g", type=float, default=2.0)
    ap.add_argument("--min-wt", type=float, default=0.5)
    ap.add_argument("--eps-var", type=float, default=5e-3)
    ap.add_argument("--n-psit", type=int, default=200)
    ap.add_argument("--n-imp", type=int, default=500)
    ap.add_argument("--mwalk-bits", type=int, default=14)
    ap.add_argument("--cap-bits", type=int, default=17)
    ap.add_argument("--nstep", type=int, default=100)
    ap.add_argument("--outdir", default="/tmp/walk_trace")
    ap.add_argument("--proj-bf16", action="store_true",
                    help="store the dense D-projection matrix bf16 (bitwise-free on the v5e MXU)")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--r-init", type=float, default=1.0)
    ap.add_argument("--sharded", action="store_true",
                    help="profile the shard_map program on a 1-device mesh")
    ap.add_argument("--steps-per-call", type=int, default=1,
                    help="sharded mode: steps fused per dispatch")
    args = ap.parse_args()

    import jax
    import time
    nstep = args.nstep
    outdir = args.outdir
    cfg, tables, state, walk_block = build(args)

    # warm up: grow the population to target + compile (the same
    # 100-step block program the bench runs, so the compile is cached)
    for _ in range(3):
        state, _ = walk_block(state, tables, cfg, nstep)
    jax.block_until_ready(state.wt)
    import numpy as np
    print(f"# warmed up: w_abs={float(np.sum(state.w_abs_gen)):.0f} "
          f"nwalk={int(np.sum(state.nwalk))}", flush=True)

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
    by_src = defaultdict(float)
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
        # "while" events CONTAIN their body ops (double-counted below);
        # skip them in the per-line table so it sums to the real step
        if cat != "while":
            src = args.get("source", "?")
            src = src.replace("/root/repo/", "")
            by_src[f"{src:36s} {cat}"] += dur
        by_cat[cat] += dur
        by_op[f"{cat:24s} {name.split('.')[0][:60]}"] += dur
        total += dur
    print(f"\n# total device time {total / 1000 / nstep:.1f} ms/step over "
          f"{nstep} steps (while containers double-count their bodies)")
    print("\n# by category (ms/step):")
    for k, v in sorted(by_cat.items(), key=lambda x: -x[1]):
        print(f"  {v / 1000 / nstep:8.2f}  {k}")
    print("\n# top 40 source lines (ms/step, while containers excluded):")
    for k, v in sorted(by_src.items(), key=lambda x: -x[1])[:40]:
        print(f"  {v / 1000 / nstep:8.3f}  {k}")
    print("\n# top 30 ops (ms/step):")
    for k, v in sorted(by_op.items(), key=lambda x: -x[1])[:30]:
        print(f"  {v / 1000 / nstep:8.3f}  {k}")


if __name__ == "__main__":
    main()
