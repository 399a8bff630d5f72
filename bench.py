"""North-star benchmark: C2 FCIQMC walker throughput AND energy accuracy
measured in the SAME run (BASELINE.json: walker-steps/sec per chip + energy
error in mHa at matched stochastic error).

Configuration (round-3/4, selected by the on-chip scans in
.cache/scan_r3*.jsonl + scan_r4_frontier.jsonl / tools/scan_walk.py):
12k-det semistochastic deterministic space (HCI eps_var=1e-3), 2k-det
Psi_T, granularity g=2, min_wt=0.5, r_initiator=0.5, f32 walker state,
pop 2e5, tau=2e-3.  The protocol equilibrates 1,200 steps before
measuring: the walk's projection transient from the trial start lasts
~1,100 steps (tau 2e-3), and the round-<=4h bench protocol (300-step
equilibration, 400-step measurement) sat mid-transient — its "1.60 +-
0.65 mHa bias" was the transient, not initiator bias (PERF_NOTES
round-4i).  The stationary frontier at these settings (13k-step rungs,
bias vs the eps_var=1e-4+PT oracle -75.72859 Ha):
    n_imp 12k, r=0.5:  0.142 +- 0.014 mHa at 13.35M walker-steps/s  (this config)
    n_imp 12k, r=1.0:  0.185 +- 0.007 mHa at 10.14M
    n_imp 24k, r=0.5:  0.103 +- 0.009 mHa at 12.89M
    n_imp 48k, r=0.5:  0.078 +- 0.009 mHa at 10.54M
r=0.5 dominates r=1 on BOTH axes (initiator suppression kills fewer
walkers, so more occupied dets update per generation at the same step
cost); bigger D spaces buy accuracy at modest throughput cost
(do_walk.f90:2260-2330 is the reference's same lever).  bias_mHa below
is measured in THIS run.  The spawn weights carry
the exact S/diff unbiasedness correction (PERF_NOTES round-3i: the MXU
quantizes the f32 selection tables to bf16; the correction makes
E[spawn] = -tau*H*w independent of matmul rounding).

"walker-steps/s" counts occupied-determinant updates per second (the
reference's walker loop runs over occupied dets).  vs_baseline is computed
against an ASSUMED reference throughput of 1.0e6 walker-steps/s for the
MPI Fortran code on 8 CPU cores (~8 us per walker update per core,
consistent with the reference's e2e timings; the Fortran binary cannot be
built in this container - no gfortran - so the exact figure is measured
at comparison time per BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import sys
import time

ASSUMED_FORTRAN_8CORE_WALKER_STEPS_PER_SEC = 1.0e6
ORACLE_E0 = -75.72859   # HCI eps_var=1e-4 E_var + eps_pt=1e-7 PT

_LEDGER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       ".cache", "bench_ledger.jsonl")


def _tpu_reachable(probe_timeout_s=150):
    """Probe the axon TPU tunnel in a subprocess with a hard timeout.

    Backend init returns in seconds when the tunnel is up and blocks in a
    ~25-minute internal retry loop when it is down, so a bounded subprocess
    probe cleanly separates the two without hanging this process."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.devices()[0].platform != 'cpu'"],
            timeout=probe_timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _wait_for_tpu(max_wait_s):
    t0 = time.time()
    while True:
        if _tpu_reachable():
            return True
        if time.time() - t0 > max_wait_s:
            return False
        print(f"# TPU tunnel down, retrying ({time.time() - t0:.0f}s)",
              file=sys.stderr)
        time.sleep(60)


def _stale_fallback():
    """The TPU tunnel is down at bench time: report the most recent on-chip
    measurement from the ledger, explicitly marked stale (or an explicit
    failure record if no prior measurement exists)."""
    last = None
    try:
        with open(_LEDGER) as f:
            for line in f:
                line = line.strip()
                if line:
                    last = json.loads(line)
    except OSError:
        pass
    if last is None:
        print(json.dumps({
            "metric": "c2_fciqmc_walker_steps_per_sec_per_chip",
            "value": 0.0, "unit": "walker-steps/s", "vs_baseline": 0.0,
            "error": "TPU tunnel unavailable and no prior on-chip "
                     "measurement ledger"}))
    else:
        last["stale"] = True
        last["note"] = ("TPU tunnel unavailable at bench time; value is the "
                        "most recent completed on-chip bench run "
                        f"(measured_at={last.get('measured_at', '?')})")
        print(json.dumps(last))


def main():
    # Bounded tunnel probe BEFORE importing jax in this process (a dead
    # tunnel otherwise blocks backend init for ~25 min).  Wait up to
    # SQMC_BENCH_TPU_WAIT_S (default 30 min) for the tunnel, then fall back
    # to the latest ledgered on-chip run, marked stale.
    if os.environ.get("SQMC_BENCH_ALLOW_CPU") != "1":
        max_wait = float(os.environ.get("SQMC_BENCH_TPU_WAIT_S", "1800"))
        if not _wait_for_tpu(max_wait):
            _stale_fallback()
            return

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

    cfg = WalkConfig(mwalk=458752, cap_spawn=262144, norb=system.norb,
                     nup=system.nup, ndn=system.ndn, n_words=system.n_words,
                     tau=2e-3, w_abs_target=200_000.0, has_singles=True,
                     spawn_granularity=2.0, min_wt=0.5, r_initiator=0.5,
                     f32_state=True, proj_bf16=True)
    # 100-step blocks (2.5 s dispatches, far under the tunnel's 2-4 min
    # dispatch kill, PERF_NOTES "dispatch-length limit"); 12 equilibration
    # blocks = 1,200 steps clears the ~1,100-step projection transient
    # (PERF_NOTES round-4i), 30 measured blocks = 3,000 steps -> ~0.03 mHa
    # blocking error at t_corr ~ 220 steps
    out = run_walk(system, trial, cfg, nstep=100, nblk=30, nblk_eq=12,
                   w_abs_begin=140_000.0, e_trial_initial=trial.e_trial,
                   verbose=True, mode="scan", max_eq_extensions=2)
    ntail = min(1000, 30 * 100)
    pop = float(np.mean(out.w_abs_trace[-ntail:]))
    nwalk_mean = float(np.mean(out.nwalk_trace[-ntail:]))
    walker_steps = nwalk_mean * out.steps_per_sec
    bias_mha = 1e3 * (out.e_mixed - ORACLE_E0)
    print(f"# e_mixed={out.e_mixed:.6f} +- {out.e_err:.6f}  "
          f"bias={bias_mha:.2f} mHa  pop={pop:.0f}  nwalk={nwalk_mean:.0f} "
          f"gen/s={out.steps_per_sec:.2f}", file=sys.stderr)
    print(f"# occupied-det walker-steps/s={walker_steps:.3g} "
          f"(nwalk x gen/s); weight walker-steps/s="
          f"{pop * out.steps_per_sec:.3g} (|w| x gen/s) - both definitions "
          f"reported, headline is the occupied-det rate (the reference's "
          f"loop runs over occupied dets, do_walk.f90:2225)",
          file=sys.stderr)

    record = {
        "metric": "c2_fciqmc_walker_steps_per_sec_per_chip",
        "value": walker_steps,
        "unit": "walker-steps/s",
        "vs_baseline": walker_steps / ASSUMED_FORTRAN_8CORE_WALKER_STEPS_PER_SEC,
        "assumed_baseline": ASSUMED_FORTRAN_8CORE_WALKER_STEPS_PER_SEC,
        "baseline_note": ("vs_baseline divides by an ASSUMED 1.0e6 "
                          "walker-steps/s for 8-core MPI Fortran (~8 us/"
                          "walker-update/core); gfortran is absent here so "
                          "the true figure is measured at comparison time"),
        "e_mixed": out.e_mixed,
        "e_err": out.e_err,
        "bias_mHa": bias_mha,
        "oracle_e0": ORACLE_E0,
        "pop": pop,
        "nwalk": nwalk_mean,
        "gen_per_sec": out.steps_per_sec,
        "weight_steps_per_sec": pop * out.steps_per_sec,
        "config": {"n_imp": int(len(trial.imp_up)),
                   "n_psit": int(len(trial.psit_up)), "g": 2.0,
                   "min_wt": 0.5, "r_initiator": 0.5, "tau": 2e-3,
                   "pop_target": 200_000.0, "f32_state": True},
    }
    try:
        import datetime
        record["measured_at"] = datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds")
        with open(_LEDGER, "a") as f:
            f.write(json.dumps(record) + "\n")
            record.pop("measured_at")
    except OSError:
        pass
    print(json.dumps(record))


if __name__ == "__main__":
    main()
