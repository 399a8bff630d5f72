"""Calibrate the initiator-bias semantics test (VERDICT r2 item 2):
hubbardk 3x3, HF-only trial, small population; measure e_mixed bias vs the
exact (sector) energy as r_initiator scans {1.0, 0.5, 0.25, 0.0}."""

import os
import sys
import time

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from sqmc_tpu.systems.hubbard.system import make_hubbard_k_system
from sqmc_tpu.algo.hci import run_hci
from sqmc_tpu.algo.semistoch import build_trial_wavefunction
from sqmc_tpu.algo.walk import WalkConfig, run_walk


def main():
    U = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    pop = float(sys.argv[2]) if len(sys.argv) > 2 else 200.0
    hub = make_hubbard_k_system(3, 3, t=1.0, U=U, nup=3, ndn=3)
    res = run_hci(hub, eps_var=1e-12, eps_var_sched=[1e-12] * 40,
                  max_iters=80, verbose=False)
    e0 = res.energies[0]
    print(f"# exact sector energy e0={e0:.9f} ndets={len(res.up)}")

    trial = build_trial_wavefunction(hub, eps_var=1e-12, n_psi_t=1, n_imp=1,
                                     verbose=False)
    for r in (1.0, 0.5, 0.25, 0.0):
        t0 = time.time()
        cfg = WalkConfig(mwalk=4096, cap_spawn=16384, norb=hub.norb,
                         nup=3, ndn=3, n_words=1, tau=0.01,
                         w_abs_target=pop, has_singles=False,
                         r_initiator=r)
        out = run_walk(hub, trial, cfg, nstep=100, nblk=30, nblk_eq=10,
                       w_abs_begin=pop, e_trial_initial=e0,
                       verbose=False, seed=11, max_eq_extensions=2)
        b = 1e3 * (out.e_mixed - e0)
        print(f"r={r:4.2f}  e_mixed={out.e_mixed:.6f} +- {out.e_err:.6f} "
              f" bias={b:8.3f} mHa ({b / (1e3 * max(out.e_err, 1e-12)):.1f} sigma)"
              f"  [{time.time() - t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
