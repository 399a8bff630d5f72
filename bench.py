"""North-star benchmark: C2 FCIQMC walker propagation throughput per chip.

Runs the jitted walk engine on the committed C2 CAS(8e,26o) FCIDUMP
(the reference's tutorial workload, BASELINE.json configs[0]) and reports
walker-steps/second = (mean total |weight|) x (generations/second).

vs_baseline is computed against an assumed reference throughput of
1.0e6 walker-steps/s for the MPI Fortran code on 8 CPU cores (~8 us per
walker update per core, consistent with the reference's e2e timings; the
Fortran binary cannot be built in this container - no gfortran - so the
exact figure is measured at comparison time per BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

ASSUMED_FORTRAN_8CORE_WALKER_STEPS_PER_SEC = 1.0e6


def main():
    import numpy as np
    import jax as _jax
    # persist compiled executables across bench invocations (TPU compiles of
    # the big walk step take minutes through the remote-compile tunnel)
    import os as _os
    _cache_dir = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                               ".cache", "jax_cache")
    _os.makedirs(_cache_dir, exist_ok=True)
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        # hardware RngBitGenerator instead of threefry: the walk draws ~6
        # uniform [CAP] vectors per generation and threefry's software
        # rounds showed up at ~18 ms/step in the device profile
        _jax.config.update("jax_default_prng_impl", "rbg")
    except Exception:
        pass
    from sqmc_tpu.systems.base import make_chem_system
    from sqmc_tpu.algo.semistoch import build_trial_wavefunction
    from sqmc_tpu.algo.walk import WalkConfig, run_walk

    import os
    import jax
    from sqmc_tpu.algo.semistoch import load_trial, save_trial

    t0 = time.time()
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
    os.makedirs(cache, exist_ok=True)
    trial_path = os.path.join(cache, "c2_bench_trial.npz")
    # setup kernels on CPU (TPU-tunnel compiles are slow); walk on TPU
    with jax.default_device(jax.devices("cpu")[0]):
        system = make_chem_system("/root/reference/C2_v2z_curve/r1.24253/FCIDUMP")
        if os.path.exists(trial_path):
            trial = load_trial(trial_path)
        else:
            trial = build_trial_wavefunction(system, eps_var=5e-3, n_psi_t=200,
                                             n_imp=500, verbose=False)
            save_trial(trial, trial_path)
    print(f"# setup {time.time() - t0:.1f}s  e_trial={trial.e_trial:.6f}",
          file=sys.stderr)

    cfg = WalkConfig(mwalk=1 << 14, cap_spawn=1 << 17, norb=system.norb,
                     nup=system.nup, ndn=system.ndn, n_words=system.n_words,
                     tau=2e-3, w_abs_target=200_000.0, has_singles=True,
                     spawn_granularity=2.0)
    out = run_walk(system, trial, cfg, nstep=100, nblk=3, nblk_eq=2,
                   w_abs_begin=50_000.0, e_trial_initial=trial.e_trial,
                   verbose=True, mode="scan", max_eq_extensions=0)
    pop = float(np.mean(out.w_abs_trace[-300:]))
    walker_steps = pop * out.steps_per_sec
    print(f"# e_mixed={out.e_mixed:.6f} +- {out.e_err:.6f}  "
          f"pop={pop:.0f}  gen/s={out.steps_per_sec:.2f}", file=sys.stderr)

    print(json.dumps({
        "metric": "c2_fciqmc_walker_steps_per_sec_per_chip",
        "value": walker_steps,
        "unit": "walker-steps/s",
        "vs_baseline": walker_steps / ASSUMED_FORTRAN_8CORE_WALKER_STEPS_PER_SEC,
    }))


if __name__ == "__main__":
    main()
