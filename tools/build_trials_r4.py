"""Build the round-4 bias-frontier trial wavefunctions, ONE HCI run per
eps_var (build_trial_wavefunction re-runs HCI for every n_imp; the
frontier needs several n_imp cuts of the SAME variational wavefunction,
so assemble them all from one run).

Rungs (VERDICT r3 item 2): n_imp in {12k, 24k, 48k}.  The eps_var=1e-3
space holds only 11,912 dets (the bench "12k" D space), so the 24k/48k
cuts come from the eps_var=2e-4 wavefunction (87,868 dets).

Ref: bigger deterministic spaces are the reference's own bias lever
(do_walk.f90:2260-2330); space construction semistoch.f90.

Run with JAX_PLATFORMS=cpu (host build; the walk runs load the .npz).
"""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CACHE = os.path.join(ROOT, ".cache")
FCIDUMP = "/root/reference/C2_v2z_curve/r1.24253/FCIDUMP"


def main():
    os.makedirs(CACHE, exist_ok=True)
    # Force the CPU backend BEFORE any sqmc import: the container's
    # sitecustomize re-registers the axon TPU platform over the
    # JAX_PLATFORMS env var, and a host HCI build dispatching tiny ops
    # through the TPU tunnel crawls (same pattern as
    # __graft_entry__.dryrun_multichip).
    import jax
    jax.config.update("jax_platforms", "cpu")
    from sqmc_tpu.systems.base import make_chem_system
    from sqmc_tpu.algo.semistoch import (_top_by_coef, _assemble_trial,
                                         save_trial)
    from sqmc_tpu.algo.hci import run_hci

    system = make_chem_system(FCIDUMP)

    def build(eps_var, n_imps, n_psit=2000):
        todo = []
        for n_imp in n_imps:
            tag = f"c2_trial_e{eps_var:g}_t{n_psit}_i{n_imp}"
            path = os.path.join(CACHE, tag + ".npz")
            if not os.path.exists(path):
                todo.append((n_imp, tag, path))
        if not todo:
            print(f"# eps_var={eps_var:g}: all trials cached", flush=True)
            return
        t0 = time.time()
        res = run_hci(system, eps_var=eps_var, eps_var_sched=[eps_var] * 10,
                      verbose=True)
        wts = res.wts[:, 0]
        print(f"# HCI eps_var={eps_var:g}: {len(res.up)} dets, "
              f"e_var={res.energies[0]:.9f}, {time.time() - t0:.0f}s",
              flush=True)
        for n_imp, tag, path in todo:
            t1 = time.time()
            iu, idn, _ = _top_by_coef(res.up, res.dn, wts, n_imp)
            trial = _assemble_trial(system, res.up, res.dn, wts, n_psit,
                                    iu, idn)
            save_trial(trial, path)
            print(f"# saved {tag}: n_imp={len(trial.imp_up)} "
                  f"nnz={len(trial.imp_ham.vals)} "
                  f"e_trial={trial.e_trial:.9f} ({time.time() - t1:.0f}s)",
                  flush=True)

    # bench / 12k-rung / sharded-mesh trials (identical content, two keys)
    build(1e-3, [12000, 20000])
    # frontier 24k / 48k rungs
    build(2e-4, [24000, 48000])
    print("# BUILD DONE", flush=True)


if __name__ == "__main__":
    main()
