"""Full-physics SHARDED walk on a virtual n-device CPU mesh at realistic
shapes (round-4): per-shard population ~25k (global 2e5), ~12k-det
deterministic space, >=20 measured blocks with population control and
blocking statistics, through make_sharded_walk(nstep_per_call=nstep) —
collectives (all_to_all spawn routing, psum'd population control) run
INSIDE the per-block lax.scan, exactly the multi-chip program.

What this measures honestly:
  * the PHYSICS of the sharded program at bench-like shapes: e_mixed with
    a blocking error bar, population control stability, routing-overflow
    behavior, per-shard load balance;
  * the all_to_all routing fraction of step time ON THE CPU MESH (A/B
    against a no-routing variant of the same program).  CPU-mesh timing
    is NOT an ICI number — per-op latencies differ by orders of
    magnitude — but the routing VOLUME per step (spawns crossing shards)
    is shape-accurate and is also reported.

Runs its body in a subprocess with JAX_PLATFORMS=cpu and
--xla_force_host_platform_device_count=N (same cluster bring-up as
__graft_entry__.dryrun_multichip; ref analog: cluster_init
mpi_routines.f90:766).  Ref: block loop do_walk.f90:2113; per-step spawn
exchange mpi_sendnewwalks mpi_routines.f90:2522-2622.

Usage: python tools/bench_sharded_mesh.py [--n-dev 8] [--nblk 20] ...
Appends one JSON record to --out (default .cache/sharded_mesh_r4.jsonl).
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ORACLE_E0 = -75.72859


def parent(args):
    env = dict(os.environ)
    import re
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", ""))
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={args.n_dev}"
    ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [sys.executable, os.path.abspath(__file__), "--child"] + sys.argv[1:]
    proc = subprocess.run(cmd, env=env, cwd=ROOT)
    sys.exit(proc.returncode)


def child(args):
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from sqmc_tpu.systems.base import make_chem_system
    from sqmc_tpu.algo.walk import WalkConfig, end_of_block
    from sqmc_tpu.parallel import dist
    from sqmc_tpu.utils.blocking import ratio_stats, reblock
    from scan_walk import get_trial

    n_dev = args.n_dev
    assert len(jax.devices()) >= n_dev, jax.devices()

    system = make_chem_system("/root/reference/C2_v2z_curve/r1.24253/FCIDUMP")
    trial = get_trial(system, args.eps_var, args.n_psit, args.n_imp, ROOT)
    print(f"# trial n_imp={len(trial.imp_up)} n_psit={len(trial.psit_up)} "
          f"e_trial={trial.e_trial:.6f}", flush=True)

    mesh = dist.make_mesh(n_dev)
    cfg = WalkConfig(mwalk=args.mwalk, cap_spawn=args.cap,
                     norb=system.norb, nup=system.nup, ndn=system.ndn,
                     n_words=system.n_words, tau=args.tau,
                     w_abs_target=args.pop, has_singles=True,
                     spawn_granularity=args.g, min_wt=args.min_wt,
                     r_initiator=args.r_init, f32_state=True,
                     axis_name="d", n_dev=n_dev)

    def build(nstep_per_call):
        return dist.make_sharded_walk(system, trial, cfg, mesh,
                                      w_abs_begin=args.pop,
                                      e_trial_initial=trial.e_trial,
                                      seed=args.seed,
                                      nstep_per_call=nstep_per_call)

    step, state, tables = build(args.nstep)

    t0 = time.time()
    state, stats = step(state, tables)
    jax.block_until_ready(state.wt)
    print(f"# compile+first block {time.time() - t0:.0f}s", flush=True)
    state = end_of_block(state)

    # ---- equilibration ----------------------------------------------------
    for i in range(args.nblk_eq - 1):
        state, stats = step(state, tables)
        state = end_of_block(state)
        print(f"# eq blk {i + 2}: w_abs={float(stats['w_abs_gen']):.0f} "
              f"nwalk={int(stats['nwalk'])} "
              f"e_blk={float(stats['e_num_sum'] / stats['e_den_sum']):.6f}",
              flush=True)
    state = state._replace(equilibrated=jnp.asarray(True))

    # ---- measured blocks ---------------------------------------------------
    e_num, e_den, w_tr, n_tr = [], [], [], []
    shard_nwalk_last = None
    t0 = time.time()
    for i in range(args.nblk):
        state, stats = step(state, tables)
        jax.block_until_ready(state.wt)
        e_num.append(float(stats["e_num_sum"]))
        e_den.append(float(stats["e_den_sum"]))
        w_tr.append(float(stats["w_abs_gen"]))
        n_tr.append(int(stats["nwalk"]))
        overflow = bool(state.overflow)
        if overflow:
            raise RuntimeError(f"capacity/routing overflow in block {i + 1}")
        # per-shard occupied counts: load balance of the det-hash sharding
        shard_nwalk_last = np.asarray(state.nwalk).reshape(-1).tolist()
        state = end_of_block(state)
        print(f"# blk {i + 1}: e_blk={e_num[-1] / e_den[-1]:.6f} "
              f"w_abs={w_tr[-1]:.0f} nwalk={n_tr[-1]} "
              f"shards={shard_nwalk_last}", flush=True)
    dt_full = time.time() - t0
    nstep_total = args.nblk * args.nstep

    num = np.asarray(e_num)
    den = np.asarray(e_den)
    e_mixed = float(num.sum() / den.sum())
    e_blocks = num / den
    e_err = float(np.std(e_blocks, ddof=1) / np.sqrt(len(e_blocks)))
    # per-generation stats are unavailable (blocks are device-fused);
    # reblock over blocks instead for a plateau check
    rb = reblock(e_blocks)
    err_rb = max((e for s, e in rb if len(e_blocks) // s >= 8), default=0.0)
    e_err = float(max(e_err, err_rb))

    # ---- routing fraction (CPU mesh; labeled as such) ----------------------
    # A/B against the SAME program retraced with the all_to_all skipped
    # (dist._TIMING_NO_ALL_TO_ALL).  BOTH variants step from the SAME
    # warmed end-of-run state (the no-route program's physics is wrong,
    # so its states are discarded; starting it cold lets its population
    # diverge and poisons the comparison — seen in the first smoke run).
    # Per-variant nwalk trajectories are recorded so residual divergence
    # over the short timing window is visible.
    def time_blocks(step_fn, tbl):
        st_t, traj = state, []
        st_t2, _ = step_fn(st_t, tbl)                # compile / warm trace
        jax.block_until_ready(st_t2.wt)
        t0 = time.time()
        for _ in range(args.timing_blocks):
            st_t, stt = step_fn(st_t, tbl)
            traj.append(int(stt["nwalk"]))
        jax.block_until_ready(st_t.wt)
        dt = (time.time() - t0) / (args.timing_blocks * args.nstep)
        return dt, traj

    t_full, traj_full = time_blocks(step, tables)
    dist._TIMING_NO_ALL_TO_ALL = True
    try:
        step_nr, _state_nr, tables_nr = build(args.nstep)
        t_nr, traj_nr = time_blocks(step_nr, tables_nr)
    finally:
        dist._TIMING_NO_ALL_TO_ALL = False

    route_ms = 1e3 * (t_full - t_nr)
    route_frac = 1.0 - t_nr / t_full
    print(f"# step {1e3 * t_full:.2f} ms full vs {1e3 * t_nr:.2f} ms "
          f"without all_to_all -> routing {route_ms:.2f} ms "
          f"({100 * route_frac:.1f}%) [CPU mesh, not ICI] "
          f"nwalk traj full={traj_full} no_route={traj_nr}", flush=True)

    rec = {
        "mode": f"sharded_mesh_cpu_n{n_dev}",
        "n_dev": n_dev, "mwalk_per_shard": args.mwalk,
        "cap_per_shard": args.cap, "pop_target_global": args.pop,
        "n_imp": int(len(trial.imp_up)), "n_psit": int(len(trial.psit_up)),
        "tau": args.tau, "g": args.g, "min_wt": args.min_wt,
        "r_init": args.r_init, "seed": args.seed,
        "nblk": args.nblk, "nstep": args.nstep, "nblk_eq": args.nblk_eq,
        "e_mixed": e_mixed, "e_err": e_err,
        "bias_vs_oracle_mHa": 1e3 * (e_mixed - ORACLE_E0),
        "e_blocks": e_blocks.tolist(),
        "pop_mean": float(np.mean(w_tr)), "nwalk_mean": float(np.mean(n_tr)),
        "shard_nwalk_last": shard_nwalk_last,
        "ms_per_step_cpu_mesh": 1e3 * dt_full / nstep_total,
        "ms_per_step_timed": 1e3 * t_full,
        "ms_per_step_no_all_to_all": 1e3 * t_nr,
        "route_ms_per_step": route_ms,
        "route_fraction": route_frac,
        "nwalk_traj_timed": traj_full,
        "nwalk_traj_no_route": traj_nr,
        "note": "CPU-mesh wall times are not ICI numbers; the cross-shard "
                "spawn fraction under the det hash is (n_dev-1)/n_dev by "
                "construction",
    }
    print(json.dumps(rec), flush=True)
    out = args.out or os.path.join(ROOT, ".cache", "sharded_mesh_r4.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--n-dev", type=int, default=8)
    ap.add_argument("--pop", type=float, default=200_000.0)
    ap.add_argument("--mwalk", type=int, default=65536, help="per shard")
    ap.add_argument("--cap", type=int, default=32768, help="per shard")
    ap.add_argument("--n-imp", type=int, default=12000)
    ap.add_argument("--n-psit", type=int, default=2000)
    ap.add_argument("--eps-var", type=float, default=1e-3)
    ap.add_argument("--tau", type=float, default=2e-3)
    ap.add_argument("--g", type=float, default=2.0)
    ap.add_argument("--min-wt", type=float, default=0.5)
    ap.add_argument("--r-init", type=float, default=0.5)
    ap.add_argument("--nstep", type=int, default=25)
    ap.add_argument("--nblk", type=int, default=24)
    ap.add_argument("--nblk-eq", type=int, default=14)
    ap.add_argument("--timing-blocks", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.child:
        child(args)
    else:
        parent(args)


if __name__ == "__main__":
    main()
