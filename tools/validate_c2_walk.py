"""Physics validation: long semistochastic initiator-FCIQMC run on the
C2 CAS(8e,26o) against the small-eps HCI+PT oracle (-75.72859 Ha; HCI
eps_var=1e-4 E_var=-75.727145 + eps_pt=1e-7 PT -0.0014428).

Measured on one v5e chip (2026-08, 3-4k generations each, tau=2e-3,
r_initiator=1):

  pop 2e5, g=2, min_wt=0.5, 500-det D space (the throughput-bench
  settings):
      e_mixed = -75.662761 +- 0.000016    (65.8 mHa bias)
  pop 6e4, g=1, min_wt=0.25, 12k-det D space + 2k-det Psi_T:
      e_mixed = -75.716319 +- 0.0000016   (12.3 mHa)
  pop 2e5, g=1, min_wt=0.25, same big D space:
      e_mixed = -75.716315 +- 0.0000028   (12.3 mHa)

  pop 6e4, g=1, min_wt=0.05, same big D space:
      e_mixed = -75.716316 +- 0.0000042   (12.3 mHa)

Reading: the semistochastic deterministic space is the dominant bias
control (66 -> 12 mHa); the residual is the r_initiator=1 initiator bias
proper - INSENSITIVE to population (6e4 vs 2e5) and to min_wt (0.25 vs
0.05), so it shrinks only by lowering r_initiator or growing D, exactly
the knobs the reference exposes.  The framework's unbiasedness itself is
pinned by the r_initiator=0 statistical tests
(test_walk/test_time_sym_walk/test_fixed_node) and the exact
deterministic-limit tests.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".cache", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    jax.config.update("jax_default_prng_impl", "rbg")
    from sqmc_tpu.systems.base import make_chem_system
    from sqmc_tpu.algo.semistoch import (build_trial_wavefunction,
                                         save_trial, load_trial)
    from sqmc_tpu.algo.walk import WalkConfig, run_walk

    with jax.default_device(jax.devices("cpu")[0]):
        system = make_chem_system(
            "/root/reference/C2_v2z_curve/r1.24253/FCIDUMP")
        path = os.path.join(root, ".cache", "c2_big_trial.npz")
        if os.path.exists(path):
            trial = load_trial(path)
        else:
            trial = build_trial_wavefunction(system, eps_var=1e-3,
                                             n_psi_t=2000, n_imp=20000,
                                             verbose=False)
            save_trial(trial, path)
    sys.stderr.write(f"# trial: n_psit={len(trial.psit_up)} "
                     f"n_imp={len(trial.imp_up)} "
                     f"e_trial={trial.e_trial:.6f}\n")

    cfg = WalkConfig(mwalk=1 << 15, cap_spawn=1 << 17, norb=system.norb,
                     nup=system.nup, ndn=system.ndn,
                     n_words=system.n_words, tau=2e-3,
                     w_abs_target=60_000.0, has_singles=True,
                     spawn_granularity=1.0, min_wt=0.25)
    out = run_walk(system, trial, cfg, nstep=100, nblk=30, nblk_eq=12,
                   w_abs_begin=40_000.0, e_trial_initial=trial.e_trial,
                   verbose=True, mode="scan", max_eq_extensions=5)
    print(json.dumps({"e_mixed": out.e_mixed, "e_err": out.e_err,
                      "t_corr": out.t_corr,
                      "pop": float(np.mean(out.w_abs_trace[-1000:])),
                      "nwalk": int(out.nwalk_trace[-1]),
                      "oracle_e0": -75.72859}))


if __name__ == "__main__":
    main()
