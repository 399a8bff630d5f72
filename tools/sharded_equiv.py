"""Sharded-vs-serial full-physics equivalence (VERDICT r4 item 3).

Runs the exact _DRYRUN configuration (C2 CAS trial, singles, initiator
r=0.5, D-projection, f32 state) at a given n_dev/seed/nblk on virtual CPU
devices and appends one JSON record to .cache/sharded_equiv_r5.jsonl.
A systematic n-device bias would show as |e_n - e_1| exceeding the
combined blocking errors (ref analog: the MPI path's per-run energy
comparisons, mpi_routines.f90:2522).

Usage: python tools/sharded_equiv.py --n-dev 1 --nblk 300 --seed 1
(must run in a fresh process: forces JAX_PLATFORMS=cpu + virtual devices
via a subprocess exec, mirroring __graft_entry__.dryrun_multichip).
"""

import argparse
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-dev", type=int, required=True)
    ap.add_argument("--nblk", type=int, default=300)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--out", default=os.path.join(
        ROOT, ".cache", "sharded_equiv_r5.jsonl"))
    args = ap.parse_args()

    env = dict(os.environ)
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", ""))
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={args.n_dev}"
    ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    code = f"""
import json, time
import jax; jax.config.update('jax_platforms', 'cpu')
import __graft_entry__ as g
t0 = time.time()
e, err, stats, overflow = g._sharded_blocks(
    {args.n_dev}, {args.nblk}, g._DRYRUN['nstep'], g._DRYRUN['nblk_eq'],
    seed={args.seed})
rec = dict(n_dev={args.n_dev}, nblk={args.nblk}, seed={args.seed},
           nstep=g._DRYRUN['nstep'], nblk_eq=g._DRYRUN['nblk_eq'],
           e_mixed=e, e_err=err, overflow=bool(overflow),
           nwalk=int(stats['nwalk']), wall_s=round(time.time() - t0, 1))
print("RESULT " + json.dumps(rec))
"""
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=ROOT,
                          capture_output=True, text=True, timeout=10 * 3600)
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr[-3000:])
    m = re.search(r"RESULT (.*)", proc.stdout)
    if proc.returncode != 0 or not m:
        sys.exit(f"run failed rc={proc.returncode}")
    with open(args.out, "a") as f:
        f.write(m.group(1).strip() + "\n")


if __name__ == "__main__":
    main()
