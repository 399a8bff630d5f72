"""Roofline statement for the walk step (VERDICT r4 weak-4 / item 1):
what is the HBM-traffic floor of one generation at the bench shape, and
how close is the achieved ms/step to it?

Methodology: compile the EXACT bench program (walk_block at the bench.py
configuration, nstep=1) for the real TPU and read XLA's own cost
analysis of the optimized executable — bytes accessed (HBM traffic after
all fusion) and flops.  The v5e roofline:

    t_floor = max(bytes_accessed / 819e9 B/s, flops / 394e12 flop/s)

A step is HBM-bound if the first term dominates (it does here: the walk
is gathers/sorts/scans over ~30 MB of state with only the [n_imp,n_imp]
bf16 projection as real MXU work).  `bytes accessed` counts each
operand/output of each *fused* computation once — the compiler's own
measure of unavoidable traffic for THIS program — so achieved/floor is
a statement about how much of the dispatch is memory-stall-free, not
about a hypothetical better algorithm.

Usage: python tools/roofline_walk.py [--nstep 1] [--out FILE]
Writes the table to stdout and appends a JSON record to
.cache/roofline_r5.jsonl.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_HBM_BYTES_PER_S = 819e9     # v5e: 819 GB/s HBM BW (public spec)
V5E_BF16_FLOPS = 394e12         # v5e: 394 TFLOP/s bf16 MXU (public spec)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nstep", type=int, default=1)
    ap.add_argument("--measured-ms", type=float, default=0.0,
                    help="measured ms/step from the bench ledger to "
                         "compare against (0 = skip the ratio)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import numpy as np
    import jax

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".cache", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    jax.config.update("jax_default_prng_impl", "rbg")

    from sqmc_tpu.systems.base import make_chem_system
    from sqmc_tpu.algo.semistoch import load_trial
    from sqmc_tpu.algo.walk import (WalkConfig, walk_block,
                                    build_walk_tables, init_walk_state)

    dev = jax.devices()[0]
    assert dev.platform != "cpu", "roofline must compile for the TPU"

    with jax.default_device(jax.devices("cpu")[0]):
        system = make_chem_system(
            "/root/reference/C2_v2z_curve/r1.24253/FCIDUMP")
        trial = load_trial(os.path.join(
            root, ".cache", "c2_trial_e0.001_t2000_i20000.npz"))

    cfg = WalkConfig(mwalk=458752, cap_spawn=262144, norb=system.norb,
                     nup=system.nup, ndn=system.ndn, n_words=system.n_words,
                     tau=2e-3, w_abs_target=200_000.0, has_singles=True,
                     spawn_granularity=2.0, min_wt=0.5, r_initiator=0.5,
                     f32_state=True, proj_bf16=True)
    tables = build_walk_tables(system, trial, cfg=cfg)
    state = init_walk_state(cfg, trial, 140_000.0, trial.e_trial, 0,
                            tables=tables)

    t0 = time.time()
    lowered = jax.jit(walk_block, static_argnames=("cfg", "nstep")).lower(
        state, tables, cfg, nstep=args.nstep)
    compiled = lowered.compile()
    t_compile = time.time() - t0
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    bytes_acc = float(ca.get("bytes accessed", 0.0))
    flops = float(ca.get("flops", 0.0))
    # per-step quantities
    per = args.nstep
    b_step = bytes_acc / per
    f_step = flops / per
    t_hbm_ms = b_step / V5E_HBM_BYTES_PER_S * 1e3
    t_mxu_ms = f_step / V5E_BF16_FLOPS * 1e3
    floor_ms = max(t_hbm_ms, t_mxu_ms)
    mem_sizes = {k: float(v) for k, v in ca.items()
                 if "bytes accessed" in k and k != "bytes accessed"}

    print(f"# compiled walk_block nstep={args.nstep} in {t_compile:.1f}s")
    print(f"bytes accessed/step : {b_step/1e9:.3f} GB")
    print(f"flops/step          : {f_step/1e12:.4f} Tflop")
    print(f"HBM floor           : {t_hbm_ms:.2f} ms/step @ 819 GB/s")
    print(f"MXU floor           : {t_mxu_ms:.2f} ms/step @ 394 Tflop/s")
    print(f"roofline floor      : {floor_ms:.2f} ms/step "
          f"({'HBM' if t_hbm_ms >= t_mxu_ms else 'MXU'}-bound)")
    rec = {"nstep": args.nstep, "bytes_per_step": b_step,
           "flops_per_step": f_step, "hbm_floor_ms": t_hbm_ms,
           "mxu_floor_ms": t_mxu_ms, "floor_ms": floor_ms,
           "hbm_gbps_assumed": V5E_HBM_BYTES_PER_S / 1e9,
           "mxu_tflops_assumed": V5E_BF16_FLOPS / 1e12}
    if args.measured_ms:
        rec["measured_ms"] = args.measured_ms
        rec["achieved_over_floor"] = args.measured_ms / floor_ms
        print(f"measured            : {args.measured_ms:.2f} ms/step -> "
              f"{args.measured_ms / floor_ms:.2f}x the floor")
    rec["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S+00:00",
                                       time.gmtime())
    out = args.out or os.path.join(root, ".cache", "roofline_r5.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
