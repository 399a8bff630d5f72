"""End-to-end HCI + semistochastic PT wall time with the per-phase ledger
(round-4, VERDICT r3 items 4+5): the C2 CAS (8e,26o) workload at
eps_var=1e-4 (~182k dets), run twice —

  --mode host  every phase on the host (the mesh=None serial path);
  --mode tpu   generation batches, sparse-H evaluation batches, the
               Davidson matvec (f32 block-ELL + host-f64 Rayleigh
               refinement) and the PT per-sample connection generation
               all dispatched to the TPU chip via run_hci(mesh=) /
               do_pt(mesh=) with a 1-device mesh.

Reports the phase ledger {get_next_det_list, generate_sparse_ham,
davidson} + variational wall, then the PT wall / sample count / sample
rate at a fixed target error, and the e_var / e_tot agreement between the
two modes (the axon TPU computes f64 as f32 — PERF_NOTES round-3
correction — so the TPU-mode sparse-H elements carry ~1e-7 relative
noise; the energy delta printed here is the honest measure of what that
costs).

Ref analog: the single-core reference e2e ledger (o_det_ref "END OF
variational part" 39.97 s CP, "END OF HCI" 45.90 s; o_st_ref stochastic
PT 31.05 s) — src/hci.f90:359-517 (variational loop), :1314 (alias PT).

Usage: python tools/bench_hci_e2e_tpu.py --mode tpu [--eps-var 1e-4] ...
Appends one JSON record to --out (default .cache/hci_e2e_r4.jsonl).
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

FCIDUMP = "/root/reference/C2_v2z_curve/r1.24253/FCIDUMP"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["host", "tpu", "tpu-dev"],
                    required=True)
    ap.add_argument("--eps-var", type=float, default=1e-4)
    ap.add_argument("--eps-pt", type=float, default=1e-6)
    ap.add_argument("--eps-pt-big", type=float, default=3e-5,
                    help="force the semistochastic split (the reference "
                         "e2e comparison point is the alias-method PT, "
                         "o_st_ref); <=0 lets do_pt choose")
    ap.add_argument("--n-mc", type=int, default=200)
    ap.add_argument("--target-error", type=float, default=1e-4)
    ap.add_argument("--skip-pt", action="store_true")
    ap.add_argument("--load-wf", default=None,
                    help="skip the variational stage, load this saved wf "
                         "(timing rec then covers PT only)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out_path = args.out or os.path.join(ROOT, ".cache", "hci_e2e_r4.jsonl")

    import numpy as np
    import jax

    if args.mode == "host":
        # never touch the axon backend for a pure-host run: its init
        # blocks for many minutes when the tunnel is down (and the env
        # JAX_PLATFORMS is too late under sitecustomize)
        jax.config.update("jax_platforms", "cpu")

    cache = os.path.join(ROOT, ".cache")
    os.makedirs(os.path.join(cache, "jax_cache"), exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(cache, "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    mesh = None
    device_davidson = False
    if args.mode == "tpu-dev":
        # round-5 device-resident fast path (algo/devhci.py): the whole
        # variational iteration state lives on the chip
        dev = jax.devices()[0]
        assert dev.platform != "cpu", \
            "--mode tpu-dev requires the TPU tunnel"
        from jax.sharding import Mesh
        mesh = Mesh(np.array([dev]), ("d",))
    elif args.mode == "tpu":
        dev = jax.devices()[0]
        assert dev.platform != "cpu", \
            "--mode tpu requires the TPU tunnel (jax.devices()[0] is CPU)"
        from jax.sharding import Mesh
        mesh = Mesh(np.array([dev]), ("d",))
        device_davidson = True

    from sqmc_tpu.systems.base import make_chem_system
    from sqmc_tpu.algo.hci import run_hci
    from sqmc_tpu.algo.pt import do_pt
    from sqmc_tpu.utils import timers

    # system setup (integral tables) always on host — tiny, and the TPU
    # tunnel compile latency would dominate
    with jax.default_device(jax.devices("cpu")[0]):
        system = make_chem_system(FCIDUMP)

    timers.start_ledger()
    dev_ledger = {}
    t0 = time.time()
    if args.load_wf:
        import types
        from sqmc_tpu.utils.checkpoint import load_wf_var
        z = load_wf_var(args.load_wf)
        assert z is not None, args.load_wf
        res = types.SimpleNamespace(up=z["up"], dn=z["dn"], wts=z["wts"],
                                    energies=z["energies"], diag=z["diag"])
    elif args.mode == "tpu-dev":
        from sqmc_tpu.algo.devhci import run_hci_device
        res = run_hci_device(system, eps_var=args.eps_var, verbose=True,
                             ledger=dev_ledger)
    else:
        res = run_hci(system, eps_var=args.eps_var, verbose=True, mesh=mesh,
                      device_davidson=device_davidson)
    t_var = time.time() - t0
    ledger = timers.read_ledger()
    e_var = float(res.energies[0])
    print(f"# variational: {t_var:.1f}s  ndets={len(res.up)} "
          f"e_var={e_var:.9f}", file=sys.stderr)
    print(f"# phases: " + " ".join(f"{k}={v:.1f}s"
                                   for k, v in sorted(ledger.items())),
          file=sys.stderr)

    rec = {
        "mode": args.mode, "eps_var": args.eps_var,
        "ndets": int(len(res.up)), "e_var": e_var,
        "t_variational_s": t_var,
        "phases_s": {k: round(v, 2) for k, v in ledger.items()},
    }
    if args.mode == "tpu-dev":
        rec["phases_s"].update(
            {k: round(v, 2) for k, v in dev_ledger.items()})

    if args.load_wf:
        rec["loaded_wf"] = args.load_wf

    # persist the variational wavefunction OUTSIDE the timed region (host
    # runs feed the frontier-trial cuts; mode-specific name so a later run
    # never silently reads it as a cache and skips the stage)
    try:
        from sqmc_tpu.utils.checkpoint import save_wf_var
        wf_path = os.path.join(cache,
                               f"wf_e2e_{args.mode}_{args.eps_var:g}.npz")
        save_wf_var(wf_path, res.up, res.dn, res.wts, res.energies, res.diag)
        print(f"# saved wf to {wf_path}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001 - timing tool; wf dump is best-effort
        print(f"# wf save failed: {e}", file=sys.stderr)

    if not args.skip_pt:
        t0 = time.time()
        pt = do_pt(system, res.up, res.dn, res.wts[:, 0], res.diag, e_var,
                   eps_var=args.eps_var, eps_pt=args.eps_pt,
                   eps_pt_big=args.eps_pt_big,
                   n_mc=args.n_mc, target_error=args.target_error,
                   n_max_connections=0, verbose=True, mesh=mesh,
                   device=(args.mode == "tpu-dev"))
        t_pt = time.time() - t0
        rec.update(
            eps_pt=args.eps_pt, t_pt_s=t_pt, pt_mode=pt["mode"],
            e_pt=pt["pt"], e_pt_err=pt["pt_err"], e_tot=pt["e_tot"],
            pt_n_samples=pt.get("n_samples"),
            pt_samples_per_sec=(pt["n_samples"] / t_pt
                                if pt.get("n_samples") else None))
        print(f"# pt[{pt['mode']}]: {t_pt:.1f}s  dE2={pt['pt']:.9f} "
              f"+-{pt['pt_err']:.9f}  e_tot={pt['e_tot']:.9f} "
              f"samples={pt.get('n_samples')}", file=sys.stderr)

    rec["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S+00:00",
                                       time.gmtime())
    line = json.dumps(rec)
    print(line)
    with open(out_path, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
