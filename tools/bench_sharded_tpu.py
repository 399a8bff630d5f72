"""Run the axis-aware SHARDED walk program on the real TPU chip at
n_dev=1 (VERDICT r2 item 4b): the shard_map lowering (all_to_all spawn
routing, psum'd population control) has to compile and execute on TPU,
and its overhead vs the unsharded single-chip bench is the collective
cost floor of the multi-chip path.

Usage: python tools/bench_sharded_tpu.py [--steps 100] [--pop 2e5]
Prints one JSON line {gen_per_sec, walker_steps_per_sec, e_blocks, ...}.
Ref: mpi_sendnewwalks mpi_routines.f90:2522 (the alltoallv this replaces).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100, help="measured steps")
    ap.add_argument("--eq-steps", type=int, default=250)
    ap.add_argument("--pop", type=float, default=200_000.0)
    ap.add_argument("--mwalk", type=int, default=393216)
    ap.add_argument("--cap", type=int, default=262144)
    ap.add_argument("--dispatch", type=int, default=25,
                    help="steps per device dispatch (axon tunnel limit)")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".cache", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    jax.config.update("jax_default_prng_impl", "rbg")

    from sqmc_tpu.systems.base import make_chem_system
    from sqmc_tpu.algo.walk import WalkConfig, end_of_block
    from sqmc_tpu.parallel.dist import make_mesh, make_sharded_walk
    from scan_walk import get_trial, ORACLE_E0

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        system = make_chem_system(
            "/root/reference/C2_v2z_curve/r1.24253/FCIDUMP")
        trial = get_trial(system, 1e-3, 2000, 20000, root)

    mesh = make_mesh(1)
    print(f"# mesh: {mesh}", file=sys.stderr)
    cfg = WalkConfig(mwalk=args.mwalk, cap_spawn=args.cap,
                     norb=system.norb, nup=system.nup, ndn=system.ndn,
                     n_words=system.n_words, tau=2e-3,
                     w_abs_target=args.pop, has_singles=True,
                     spawn_granularity=2.0, min_wt=0.5, r_initiator=1.0,
                     f32_state=True, axis_name="d", n_dev=1)
    step, state, tables = make_sharded_walk(system, trial, cfg, mesh,
                                            args.pop, trial.e_trial)

    def run_block(state, n):
        num = den = 0.0
        for _ in range(n):
            state, stats = step(state, tables)
            num += float(stats["e_num_gen"])
            den += float(stats["e_den_gen"])
        return state, num, den

    t0 = time.time()
    state, _, _ = run_block(state, 1)          # compile
    compile_s = time.time() - t0
    print(f"# compile {compile_s:.0f}s", file=sys.stderr)

    done = 0
    while done < args.eq_steps:                # equilibrate
        n = min(args.dispatch, args.eq_steps - done)
        state, _, _ = run_block(state, n)
        state = end_of_block(state)
        done += n
    state = state._replace(equilibrated=jnp.asarray(True))

    e_blocks = []
    w_mean = 0.0
    t0 = time.time()
    done = 0
    while done < args.steps:
        n = min(args.dispatch, args.steps - done)
        state, num, den = run_block(state, n)
        e_blocks.append(num / den)
        w_mean += float(jnp.sum(jnp.abs(state.wt))) * n
        state = end_of_block(state)
        done += n
    dt = time.time() - t0
    gen_per_sec = args.steps / dt
    w_mean /= args.steps
    nwalk = int(jnp.sum(state.wt != 0.0))
    e_mean = float(np.mean(e_blocks))

    print(json.dumps({
        "mode": "sharded_n_dev_1_tpu", "gen_per_sec": gen_per_sec,
        "walker_steps_per_sec": gen_per_sec * nwalk,
        "weight_steps_per_sec": gen_per_sec * w_mean,
        "nwalk": nwalk, "pop": w_mean, "e_mixed_raw_mean": e_mean,
        "bias_vs_oracle_mHa": 1e3 * (e_mean - ORACLE_E0),
        "compile_s": compile_s, "steps": args.steps,
        "mwalk": args.mwalk, "cap_spawn": args.cap,
    }))


if __name__ == "__main__":
    main()
