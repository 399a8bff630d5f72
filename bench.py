"""North-star benchmark: C2 FCIQMC walker throughput AND energy accuracy
measured in the SAME run (BASELINE.json: walker-steps/sec per chip + energy
error in mHa at matched stochastic error).

Physics-qualified configuration (tools/validate_c2_walk.py): 12k-det
semistochastic deterministic space (HCI eps_var=1e-3), 2k-det Psi_T,
spawn granularity g=1, min_wt=0.25, r_initiator=1, pop 2e5, tau=2e-3.
Long-run validation of these settings measured e_mixed = -75.7163 Ha
against the small-eps oracle -75.72859 (HCI eps_var=1e-4 + eps_pt=1e-7),
i.e. ~12.3 mHa initiator bias - vs 66 mHa at the round-2 bench settings
(500-det D space).  bias_mHa below is measured in THIS run.

vs_baseline is computed against an ASSUMED reference throughput of
1.0e6 walker-steps/s for the MPI Fortran code on 8 CPU cores (~8 us per
walker update per core, consistent with the reference's e2e timings; the
Fortran binary cannot be built in this container - no gfortran - so the
exact figure is measured at comparison time per BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import sys
import time

ASSUMED_FORTRAN_8CORE_WALKER_STEPS_PER_SEC = 1.0e6
ORACLE_E0 = -75.72859   # HCI eps_var=1e-4 E_var + eps_pt=1e-7 PT


def main():
    import numpy as np
    import jax

    root = os.path.dirname(os.path.abspath(__file__))
    cache = os.path.join(root, ".cache")
    os.makedirs(os.path.join(cache, "jax_cache"), exist_ok=True)
    try:
        # persist compiled executables across bench invocations (TPU
        # compiles of the big walk step take minutes through the
        # remote-compile tunnel)
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(cache, "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        # hardware RngBitGenerator instead of threefry: the walk draws ~6
        # uniform [CAP] vectors per generation and threefry's software
        # rounds showed up at ~18 ms/step in the device profile
        jax.config.update("jax_default_prng_impl", "rbg")
    except Exception:
        pass

    from sqmc_tpu.systems.base import make_chem_system
    from sqmc_tpu.algo.semistoch import (build_trial_wavefunction,
                                         load_trial, save_trial)
    from sqmc_tpu.algo.walk import WalkConfig, run_walk

    t0 = time.time()
    trial_path = os.path.join(cache, "c2_trial_e0.001_t2000_i20000.npz")
    # setup kernels on CPU (TPU-tunnel compiles are slow); walk on TPU
    with jax.default_device(jax.devices("cpu")[0]):
        system = make_chem_system(
            "/root/reference/C2_v2z_curve/r1.24253/FCIDUMP")
        if os.path.exists(trial_path):
            trial = load_trial(trial_path)
        else:
            trial = build_trial_wavefunction(system, eps_var=1e-3,
                                             n_psi_t=2000, n_imp=20000,
                                             verbose=False)
            save_trial(trial, trial_path)
    print(f"# setup {time.time() - t0:.1f}s  n_imp={len(trial.imp_up)} "
          f"n_psit={len(trial.psit_up)} e_trial={trial.e_trial:.6f}",
          file=sys.stderr)

    cfg = WalkConfig(mwalk=40960, cap_spawn=1 << 18, norb=system.norb,
                     nup=system.nup, ndn=system.ndn, n_words=system.n_words,
                     tau=2e-3, w_abs_target=200_000.0, has_singles=True,
                     spawn_granularity=1.0, min_wt=0.25, r_initiator=1.0)
    out = run_walk(system, trial, cfg, nstep=100, nblk=20, nblk_eq=10,
                   w_abs_begin=140_000.0, e_trial_initial=trial.e_trial,
                   verbose=True, mode="scan", max_eq_extensions=3)
    pop = float(np.mean(out.w_abs_trace[-2000:]))
    walker_steps = pop * out.steps_per_sec
    bias_mha = 1e3 * (out.e_mixed - ORACLE_E0)
    print(f"# e_mixed={out.e_mixed:.6f} +- {out.e_err:.6f}  "
          f"bias={bias_mha:.2f} mHa  pop={pop:.0f}  "
          f"gen/s={out.steps_per_sec:.2f}", file=sys.stderr)

    print(json.dumps({
        "metric": "c2_fciqmc_walker_steps_per_sec_per_chip",
        "value": walker_steps,
        "unit": "walker-steps/s",
        "vs_baseline": walker_steps / ASSUMED_FORTRAN_8CORE_WALKER_STEPS_PER_SEC,
        "e_mixed": out.e_mixed,
        "e_err": out.e_err,
        "bias_mHa": bias_mha,
        "oracle_e0": ORACLE_E0,
        "pop": pop,
        "gen_per_sec": out.steps_per_sec,
        "config": {"n_imp": int(len(trial.imp_up)),
                   "n_psit": int(len(trial.psit_up)), "g": 1.0,
                   "min_wt": 0.25, "r_initiator": 1.0, "tau": 2e-3,
                   "pop_target": 200_000.0},
    }))


if __name__ == "__main__":
    main()
