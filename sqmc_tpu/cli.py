"""Command-line driver: `python -m sqmc_tpu -i input [-f FCIDUMP]`.

Runs reference card-format inputs unchanged (ref: sqmc_main.f90) and emits
the grep-able result lines the reference's e2e checker parses
(src/e2e_tests/e2e_check.py: "Variational energy=",
"Second-order PT energy lowering=", "Total energy=").
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from .config import parse_input
from .utils.timers import my_second


def run_from_config(cfg, fcidump: str | None = None, verbose: bool = True):
    from .algo.hci import run_hci
    from .algo.pt import do_pt

    if cfg.hamiltonian_type == "chem":
        from .systems.base import make_chem_system
        system = make_chem_system(
            fcidump or "FCIDUMP", nup=cfg.nup or None,
            ndn=(cfg.nelec - cfg.nup) if cfg.nelec else None,
            time_sym=cfg.time_sym, z=cfg.z, point_group=cfg.point_group,
            hf_symmetry=cfg.hf_symmetry)
    elif cfg.hamiltonian_type == "heg":
        from .systems.heg.system import make_heg_system
        system = make_heg_system(cfg.n_dim, cfg.r_s, cfg.nelec, cfg.nup,
                                 cfg.cutoff_radius)
        print(f"For this cell, HF kinetic, exchange, total energies = "
              f"{system.extra['energy_hf']:.8f}")
        print(f"Madelung energy ={system.extra['energy_madelung']:10.6f}")
    elif cfg.hamiltonian_type in ("hubbardk", "hubbard2"):
        raise SystemExit("hubbard card input not wired yet; use the API")
    else:
        raise SystemExit(f"unknown hamiltonian_type {cfg.hamiltonian_type}")

    if cfg.run_type != "hci":
        raise SystemExit(f"run_type {cfg.run_type} not wired into the CLI "
                         "yet; use the API (algo.walk)")

    my_second("BEG", "variational part")
    res = run_hci(system, eps_var=cfg.eps_var,
                  eps_var_sched=cfg.eps_var_sched, n_states=cfg.n_states,
                  verbose=verbose, dump_wf_var=cfg.dump_wf_var,
                  wf_cache_dir=".")
    my_second("END", "variational part")
    print(f"Variational energy={res.energies[0]:26.9f}")

    outs = []
    for state in range(cfg.n_states):
        if cfg.n_states > 1:
            print(f"State {state + 1}: variational energy="
                  f"{res.energies[state]:26.9f}")
        out = do_pt(system, res.up, res.dn, res.wts[:, state], res.diag,
                    float(res.energies[state]), eps_var=min(cfg.eps_var_sched),
                    eps_pt=cfg.eps_pt, eps_pt_big=cfg.eps_pt_big,
                    target_error=cfg.target_error, n_mc=cfg.n_mc,
                    n_max_connections=int(cfg.n_max_connections),
                    verbose=verbose)
        if out["mode"] == "deterministic":
            print(f"Second-order PT energy lowering={out['pt']:26.9f}")
        else:
            print(f"Second-order PT energy lowering={out['pt']:26.9f} "
                  f"+- {out['pt_err']:.9f}")
        print(f"Total energy({state + 1})={out['e_tot']:26.9f}")
        if state == 0:
            print(f"Total energy={out['e_tot']:26.9f}")
        if cfg.hamiltonian_type == "heg":
            print(f"Total energy (includ. Madelung)="
                  f"{out['e_tot'] + system.extra['energy_madelung']:22.9f}")
        outs.append(out)
    my_second("END", "HCI")
    return res, outs


def main(argv=None):
    p = argparse.ArgumentParser(prog="sqmc_tpu")
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-f", "--fcidump", default=None,
                   help="FCIDUMP path (default: ./FCIDUMP)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend")
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    print("*" * 47)
    print("** SQMC-TPU (Semistochastic Quantum Monte Carlo) **")
    print("*" * 47)
    with open(args.input) as f:
        cfg = parse_input(f.read())
    run_from_config(cfg, fcidump=args.fcidump)


if __name__ == "__main__":
    main()
