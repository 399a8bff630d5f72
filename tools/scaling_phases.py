"""Distributed-phase scaling log (round-4, VERDICT r3 item 8): per-phase
wall times of the C2 CAS variational stage + stochastic PT sample phase
at n_dev in {1, 4, 8} on the virtual CPU mesh, for the ~88k-det workload
(eps_var=2e-4).

What this can and cannot show on THIS host: the container exposes ONE
physical core, so the virtual devices time-slice a single core and no
wall-clock speedup is possible — the deliverable is (a) the work SPLIT
(per-device batch counts for candidate generation / sparse-H eval / PT
sample slices are printed by the run), and (b) the sharding OVERHEAD
(phase times at n_dev=4/8 vs 1: dispatch + assembly cost of the split on
fixed total compute).  On real hardware the same program maps each
round-robin batch to its own chip (ref: find_doubly_excited round-robin
semistoch.f90:1743; PT sample split hci.f90:1482-1520).

Each n_dev runs in a subprocess with
--xla_force_host_platform_device_count=N (same bring-up as
__graft_entry__.dryrun_multichip).

Usage: python tools/scaling_phases.py [--n-devs 1,4,8] [--eps-var 2e-4]
Appends JSON records to .cache/scaling_phases_r4.jsonl.
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def child(args):
    import numpy as np
    import jax
    # sitecustomize registers the axon backend before this runs, so the
    # env JAX_PLATFORMS is too late - force the CPU platform via config
    # (the proven dryrun_multichip / sharded_equiv bring-up pattern);
    # the XLA_FLAGS device-count env from the parent is honored at the
    # CPU client's lazy init
    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh

    devs = jax.devices()
    assert len(devs) >= args.n_dev, (len(devs), args.n_dev)
    mesh = Mesh(np.array(devs[:args.n_dev]), ("d",)) \
        if args.n_dev > 1 else None

    from sqmc_tpu.systems.base import make_chem_system
    from sqmc_tpu.algo.hci import run_hci
    from sqmc_tpu.algo.pt import do_pt
    from sqmc_tpu.utils import timers

    system = make_chem_system("/root/reference/C2_v2z_curve/r1.24253/FCIDUMP")

    timers.start_ledger()
    t0 = time.time()
    res = run_hci(system, eps_var=args.eps_var, verbose=True, mesh=mesh)
    t_var = time.time() - t0
    ledger = timers.read_ledger()

    t0 = time.time()
    pt = do_pt(system, res.up, res.dn, res.wts[:, 0], res.diag,
               float(res.energies[0]), eps_var=args.eps_var,
               eps_pt=args.eps_pt, n_mc=200, target_error=-1.0,
               # force the semistochastic path with a bounded sample count
               # (we time the per-sample phase, not convergence)
               eps_pt_big=args.eps_pt * 30.0,
               n_max_connections=40_000_000, verbose=False, mesh=mesh,
               max_pt_samples=args.pt_samples)
    t_pt = time.time() - t0

    rec = {
        "n_dev": args.n_dev, "eps_var": args.eps_var,
        "ndets": int(len(res.up)), "e_var": float(res.energies[0]),
        "t_variational_s": round(t_var, 2),
        "phases_s": {k: round(v, 2) for k, v in ledger.items()},
        "t_pt_s": round(t_pt, 2), "pt_n_samples": pt.get("n_samples"),
        "e_tot": pt["e_tot"],
    }
    print("CHILD_RESULT " + json.dumps(rec), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-devs", default="1,4,8")
    ap.add_argument("--eps-var", type=float, default=2e-4)
    ap.add_argument("--eps-pt", type=float, default=1e-6)
    ap.add_argument("--pt-samples", type=int, default=20)
    ap.add_argument("--n-dev", type=int, default=0, help="(child)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.n_dev:
        return child(args)

    out_path = args.out or os.path.join(ROOT, ".cache",
                                        "scaling_phases_r4.jsonl")
    for n_dev in [int(x) for x in args.n_devs.split(",")]:
        env = dict(os.environ)
        flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                       env.get("XLA_FLAGS", ""))
        env["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_dev}"
        ).strip()
        env["JAX_PLATFORMS"] = "cpu"
        cmd = [sys.executable, os.path.abspath(__file__),
               "--n-dev", str(n_dev), "--eps-var", str(args.eps_var),
               "--eps-pt", str(args.eps_pt),
               "--pt-samples", str(args.pt_samples)]
        print(f"=== n_dev={n_dev}", flush=True)
        r = subprocess.run(cmd, env=env, capture_output=True, text=True)
        sys.stderr.write(r.stderr[-2000:])
        rec = None
        for line in r.stdout.splitlines():
            if line.startswith("CHILD_RESULT "):
                rec = json.loads(line[len("CHILD_RESULT "):])
        if rec is None:
            print(f"n_dev={n_dev} FAILED rc={r.returncode}\n"
                  + r.stdout[-2000:], flush=True)
            continue
        print(json.dumps(rec), flush=True)
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
