"""Generate the dryrun_multichip golden: a LONG independent-seed run of
the exact `__graft_entry__._sharded_blocks` program (scaled bench-knob
sharded walk) on the virtual 8-device CPU mesh.  Paste the printed
constants into __graft_entry__._DRYRUN_GOLDEN_E / _DRYRUN_GOLDEN_ERR.

The golden makes the dryrun's energy check sigma-based (VERDICT r3
item 3 / weak-8): |e_mixed - golden| < 4 * hypot(err_run, err_golden)
instead of the old 0.5 Ha window.
"""
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_DEV = 8
NBLK = 300
NSTEP = 50
NBLK_EQ = 30
SEED = 1


def main():
    if "--child" in sys.argv:
        sys.path.insert(0, ROOT)
        import jax
        jax.config.update("jax_platforms", "cpu")
        import __graft_entry__ as g
        e, err, stats, overflow = g._sharded_blocks(
            N_DEV, NBLK, NSTEP, NBLK_EQ, seed=SEED)
        assert not overflow
        print(f"# golden run: n_dev={N_DEV} nblk={NBLK} nstep={NSTEP} "
              f"nblk_eq={NBLK_EQ} seed={SEED}")
        print(f"_DRYRUN_GOLDEN_E = {e!r}")
        print(f"_DRYRUN_GOLDEN_ERR = {err!r}")
        return
    env = dict(os.environ)
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", ""))
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N_DEV}").strip()
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child"],
        env=env, cwd=ROOT)
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
