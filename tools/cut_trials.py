"""Cut walk trials with larger deterministic spaces from a saved
variational wavefunction (round-4, VERDICT r3 item 2: the sub-mHa lever is
a bigger D space, the reference's own bias knob — growing the
deterministic projection, do_walk.f90:2260-2330).

Loads a wf_eps_var npz (e.g. the eps_var=1e-4 187k-det C2 CAS state saved
by tools/bench_hci_e2e_tpu.py), then assembles trials with n_imp cuts of
its top-|c| determinants — ONE variational solve feeds every cut, instead
of re-running HCI per trial.  Output names follow tools/scan_walk.py's
get_trial cache tag so the frontier scans load them directly.

Usage: python tools/cut_trials.py --wf .cache/wf_e2e_tpu_0.0001.npz \
           --eps-var 1e-4 --n-imps 24576,49152 [--n-psit 2000]
"""

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

FCIDUMP = "/root/reference/C2_v2z_curve/r1.24253/FCIDUMP"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wf", required=True)
    ap.add_argument("--eps-var", type=float, required=True,
                    help="eps_var tag for the output cache names")
    ap.add_argument("--n-imps", default="24576,49152")
    ap.add_argument("--n-psit", type=int, default=2000)
    args = ap.parse_args()

    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")

    from sqmc_tpu.systems.base import make_chem_system
    from sqmc_tpu.utils.checkpoint import load_wf_var
    from sqmc_tpu.algo.semistoch import (_assemble_trial, _top_by_coef,
                                         save_trial)

    system = make_chem_system(FCIDUMP)
    z = load_wf_var(args.wf)
    assert z is not None, args.wf
    up, dn, wts = z["up"], z["dn"], np.asarray(z["wts"])[:, 0]
    print(f"# wf: {len(up)} dets, e_var={float(z['energies'][0]):.9f}",
          flush=True)

    for n_imp in [int(x) for x in args.n_imps.split(",")]:
        tag = f"c2_trial_e{args.eps_var:g}_t{args.n_psit}_i{n_imp}"
        path = os.path.join(ROOT, ".cache", tag + ".npz")
        if os.path.exists(path):
            print(f"# {tag}: exists, skipping", flush=True)
            continue
        t0 = time.time()
        iu, idn, _ = _top_by_coef(up, dn, wts, n_imp)
        trial = _assemble_trial(system, up, dn, wts, args.n_psit, iu, idn)
        save_trial(trial, path)
        print(f"# {tag}: n_imp={len(trial.imp_up)} "
              f"nnz={len(trial.imp_ham.vals)} e_trial={trial.e_trial:.6f} "
              f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
