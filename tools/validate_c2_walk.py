"""Physics validation: long semistochastic initiator-FCIQMC run on the
C2 CAS(8e,26o) against the small-eps HCI+PT oracle (-75.72859 Ha; HCI
eps_var=1e-4 E_var=-75.727145 + eps_pt=1e-7 PT -0.0014428).

ROUND-2 TABLE SUPERSEDED.  The round-2 numbers previously recorded here
(66 mHa at the 500-det D space, 12.3 mHa at the 12k-det D space,
"insensitive to population and min_wt") were measured under the TPU
f64-demotion bug (PERF_NOTES.md "ROUND-3 CORRECTION"): the chip stored
the 1e51 unknown-diagonal sentinel as inf, the diagonal repair never
fired, and every stochastic walker outside the deterministic space died
one step after being spawned.  Those runs effectively measured the
D-space projection plus one generation of stochastic corrections - which
is WHY the residual looked insensitive to population and min_wt.

Round-3 re-validation runs at the corrected dynamics (occupied dets ~
w_abs/min_wt + n_imp, the reference's own MWALK sizing) live in
tools/scan_walk.py output; this script remains the single-config
long-run driver.  The framework's unbiasedness is pinned by the
r_initiator=0 statistical tests (test_walk/test_time_sym_walk/
test_fixed_node) and the exact deterministic-limit tests, all CPU f64.
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

    # mwalk ~ 1.3 * (w_abs/min_wt + n_imp): the CORRECT equilibrium
    # occupied-det count (ref MWALK sizing do_walk.f90:652-674)
    cfg = WalkConfig(mwalk=340_000, cap_spawn=1 << 18, norb=system.norb,
                     nup=system.nup, ndn=system.ndn,
                     n_words=system.n_words, tau=2e-3,
                     w_abs_target=60_000.0, has_singles=True,
                     spawn_granularity=1.0, min_wt=0.25)
    out = run_walk(system, trial, cfg, nstep=50, nblk=60, nblk_eq=24,
                   w_abs_begin=40_000.0, e_trial_initial=trial.e_trial,
                   verbose=True, mode="scan", max_eq_extensions=5)
    print(json.dumps({"e_mixed": out.e_mixed, "e_err": out.e_err,
                      "t_corr": out.t_corr,
                      "pop": float(np.mean(out.w_abs_trace[-1000:])),
                      "nwalk": int(out.nwalk_trace[-1]),
                      "oracle_e0": -75.72859}))


if __name__ == "__main__":
    main()
