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


def run_toy(cfg, verbose: bool = True):
    """Toy dense-matrix path: `fictitious`, `read`, and dense `hubbard`
    (ref: hamiltonian_mod.f90:81-92,273-344,393-410) driven through the
    dense-vector walk engine with the requested run_type."""
    import numpy as np
    from .systems.toy import (make_fictitious_system, make_read_system,
                              toy_psi_t)
    from .algo.densewalk import DenseWalkConfig, run_dense_walk

    if cfg.hamiltonian_type == "fictitious":
        print(f"bosonic, spectrum_coef, spectrum_power, ham_diag_fluc, "
              f"ham_offdiag_fluc ={cfg.bosonic:2d}{cfg.spectrum_coef:8.3f}"
              f"{cfg.spectrum_power:8.3f}{cfg.ham_diag_fluc:8.3f}"
              f"{cfg.ham_offdiag_fluc:8.3f}")
        system = make_fictitious_system(
            cfg.ndet_toy, cfg.bosonic, cfg.spectrum_coef, cfg.spectrum_power,
            cfg.ham_diag_fluc, cfg.ham_offdiag_fluc,
            seed=_seed4(cfg.seeds[0]))
    elif cfg.hamiltonian_type == "read":
        system = make_read_system("hamiltonian")
    else:  # dense hubbard toy
        from .systems.hubbard.system import make_hubbard_dense_system
        system = make_hubbard_dense_system(cfg.l_x, cfg.l_y, cfg.t_hub,
                                           cfg.u_hub, cfg.nup,
                                           cfg.nelec - cfg.nup, pbc=cfg.pbc)
    ndet = system.ndet
    print(f"ndet={ndet:15d}")

    e_trial = cfg.e_trial_initial
    if cfg.diagonalize_ham:
        w, g = system.diagonalize(verbose=verbose)
        print(f"Setting e_trial (from diagonalizing Hamiltonian) ="
              f"{w[0]:10.5f}")
        print(f"energy_exact={w[0]:10.5f}")
        e_trial = float(w[0])

    if cfg.ndet_psi_t > 0:
        psi_t, psi_g = toy_psi_t(ndet, cfg.iwdet_psi_t, cfg.cdet_psi_t)
    else:
        psi_t = np.zeros(ndet)
        psi_t[0] = 1.0
        psi_g = np.full(ndet, 1.0 / np.sqrt(ndet))

    tau = cfg.tau
    if tau == 0.0:
        _, _, tau = system.tau_optimal(cfg.tau_multiplier)
        print(f"tau_multiplier, tau={cfg.tau_multiplier:10.6f}{tau:10.6f}")

    run_type = "none" if cfg.run_type in ("no_fixed_node",) else cfg.run_type
    wcfg = DenseWalkConfig(
        ndet=ndet, tau=tau, w_abs_target=cfg.w_abs_target,
        run_type=run_type, importance_sampling=cfg.importance_sampling,
        partial_node_eps=cfg.partial_node_eps,
        release_step=cfg.nstep * cfg.nblk_eq // 2 or 1,
        min_wt=cfg.min_wt, pop_ctrl_exponent=cfg.population_control_exponent,
        reweight_factor_inv_max=cfg.reweight_factor_inv_max)
    out = run_dense_walk(system, wcfg, psi_t, psi_g, nstep=cfg.nstep,
                         nblk=cfg.nblk, nblk_eq=cfg.nblk_eq,
                         w_abs_begin=cfg.w_abs_begin,
                         e_trial_initial=e_trial if e_trial else None,
                         seed=cfg.seeds[0], verbose=verbose)
    print(f"e_mixed={out.e_mixed:26.9f} +-{out.e_err:.9f}")
    if system.energy_exact is not None:
        print(f"error vs exact={out.e_mixed - system.energy_exact:14.9f}")
    return out


def _seed4(seed: int):
    """Split an integer seed into rannyu's 4x12-bit state."""
    return ((seed >> 36) & 0xFFF, (seed >> 24) & 0xFFF,
            (seed >> 12) & 0xFFF, seed & 0xFFF)


def run_det_walk(cfg, system, verbose: bool = True):
    """SQMC walk on a determinant system (chem/heg/hubbardk/hubbard2)
    driven from card input (ref: do_walk.f90 walk:1462), including the
    fixed-node run_type family with Gutzwiller guiding (ref dispatch
    do_walk.f90:38-50; hubbard.f90 wf_type 'gutz':244-253)."""
    from .algo.semistoch import build_trial_wavefunction
    from .algo.walk import WalkConfig, run_walk

    run_type = cfg.run_type if cfg.run_type in (
        "fixed_node1", "fixed_node2", "fixed_node3", "fixed_node4",
        "partial_node", "release_node", "sr") else "none"
    guide = None
    guiding = "none"
    if run_type != "none" or cfg.importance_sampling:
        from .algo.guiding import make_gutzwiller_guiding
        g = cfg.gutz_g if cfg.wf_type.startswith(("gutz", "cgutz")) else 1.0
        guide = make_gutzwiller_guiding(system, g=g)
        guiding = "gutzwiller"
        if verbose and cfg.wf_type:
            print(f"trial_wf_type={cfg.wf_type}")
            print(f"g={g:8.3f}")

    if cfg.diff_from_psi_t and cfg.imp_iters > 0:
        # iterated deterministic-space construction from the
        # diff_from_psi_t cards (ref generate_space_iterate inputs,
        # do_walk.f90:954-960)
        from .algo.semistoch import build_trial_iterate
        trial = build_trial_iterate(
            system, cfg.imp_iters, cfg.n_imp_init, cfg.n_imp_trunc,
            norb_active=cfg.norb_imp or None,
            n_psi_t=max(cfg.n_truncate_det or 200, 1), verbose=verbose)
    elif cfg.trial_wf_iters >= 0:
        # reference-faithful default: Psi_T from the deck's trial_wf cards
        # (ref hamiltonian_mod.f90:113-115), D = top size_deterministic of
        # the same final expansion (ref semistoch.f90:263,403-420)
        from .algo.semistoch import build_trial_from_cards
        if verbose:
            print(f"trial_wf_iters, norb_trial_wf, n_initiators_trial_wf, "
                  f"n_truncate_trial_wf: {cfg.trial_wf_iters} "
                  f"{cfg.norb_trial_wf} {cfg.n_initiators_trial_wf} "
                  f"{cfg.n_truncate_trial_wf}")
        trial = build_trial_from_cards(
            system, cfg.trial_wf_iters, cfg.norb_trial_wf,
            cfg.n_initiators_trial_wf, cfg.n_truncate_trial_wf,
            cfg.size_deterministic or 1, verbose=verbose)
    else:
        # deck carries no trial-wf cards (not a complete reference walk
        # deck): fall back to an HCI-built trial and SAY SO - this is a
        # framework convenience, not a reference construction
        eps_fallback = cfg.eps_var if cfg.eps_var < 1 else 2e-3
        if verbose:
            print(f"WARNING: no trial_wf cards in deck; building Psi_T "
                  f"from HCI eps_var={eps_fallback:g} "
                  f"(n_psi_t={max(cfg.n_truncate_det or 200, 1)}, "
                  f"n_imp={cfg.size_deterministic or 1000}) - not a "
                  "reference-card construction")
        trial = build_trial_wavefunction(
            system, eps_var=eps_fallback,
            n_psi_t=max(cfg.n_truncate_det or 200, 1),
            n_imp=cfg.size_deterministic or 1000, verbose=verbose)

    if cfg.hf_to_psit:
        # ref hf_to_psit card (do_walk.f90:2281-2296): walkers on Psi_T
        # propagate through the exact Psi_T column.  Here: force
        # Psi_T into D so the exact D-space projection covers them.
        from .algo.semistoch import ensure_psit_in_imp
        trial = ensure_psit_in_imp(system, trial, verbose=verbose)

    tau = cfg.tau
    if tau == 0.0:
        # tau deduced from the diagonal spectral range (ref:
        # chemistry.f90:447-454 tau = tau_multiplier/(diag_hi - diag_lo)):
        # lowest diagonal from the HF/starting det, highest from the det
        # occupying the top orbitals
        import jax.numpy as jnp
        from . import dets as dets_mod
        from .systems.chem import slater
        lo_up = system.hf_up
        lo_dn = system.hf_dn
        hi_up = dets_mod.det_from_orbs(
            range(system.norb - system.nup, system.norb), system.norb)
        hi_dn = dets_mod.det_from_orbs(
            range(system.norb - system.ndn, system.norb), system.norb)
        pair_u = np.stack([lo_up, hi_up])
        pair_d = np.stack([lo_dn, hi_dn])
        dg = np.asarray(slater.diag_elements(
            system.table, dets_mod.to_bits(jnp.asarray(pair_u), system.norb),
            dets_mod.to_bits(jnp.asarray(pair_d), system.norb)))
        tau = cfg.tau_multiplier / (dg[1] - dg[0])
        if verbose:
            print(f"diagonal_ham_lowest, diagonal_ham_highest, "
                  f"tau_multiplier, tau={dg[0]:13.6f}{dg[1]:13.6f}"
                  f"{cfg.tau_multiplier:10.6f}{tau:10.6f}")

    proposal = {"uniform": "uniform", "uniform2": "uniform",
                "CauchySchwarz": "cauchy_schwarz"}.get(
                    cfg.proposal_method, "fast_heatbath")
    if verbose and cfg.proposal_method.startswith("heat_bath"):
        # the reference's factorized heat_bath2/3 1-4-orbital-table
        # samplers (chemistry.f90:998-1233) are deliberately replaced by
        # the exact-joint-|H| sampler: every accepted double carries the
        # SAME magnitude, which strictly dominates the factorized scheme
        # statistically (and the proposal probability is exact by
        # construction instead of check_heatbath_unbiased-verified)
        print(f"proposal_method {cfg.proposal_method} -> fast_heatbath "
              "(exact joint-|H| heat bath)")

    # MWALK auto-size (ref do_walk.f90:652-674): the equilibrium number of
    # occupied determinants is ~ w_abs_target/min_wt (every unit of weight
    # fragments down to the min_wt floor) plus the always-resident D space
    if cfg.mwalk:
        mwalk = cfg.mwalk
    elif cfg.semistochastic:
        mwalk = int(3.5 * (cfg.w_abs_target / cfg.min_wt
                           + len(trial.imp_up)))
        if verbose:
            print(f"1Setting MWALK=3.5*(w_abs_gen_target/min_wt+n_imp)="
                  f"{mwalk:10d}")
    else:
        mwalk = int(4 * cfg.w_abs_target / cfg.min_wt)
        if verbose:
            print(f"2Setting MWALK=4*(w_abs_gen_target/min_wt)={mwalk:10d}")
    mwalk = max(mwalk, 4096)
    # spawn slots per generation ~ 2*w_abs/g (sea walkers draw 0-or-1
    # children at probability |w|/(0.5 g); heavier walkers |w|/g each)
    cap_spawn = max(int(3 * cfg.w_abs_target), 4 * 4096)
    wcfg = WalkConfig(
        mwalk=mwalk, cap_spawn=cap_spawn, norb=system.norb, nup=system.nup,
        ndn=system.ndn, n_words=system.n_words, tau=tau or 2e-3,
        w_abs_target=cfg.w_abs_target, r_initiator=cfg.r_initiator,
        initiator_power=cfg.initiator_power, min_wt=cfg.min_wt,
        always_spawn_cutoff=cfg.always_spawn_cutoff,
        pop_ctrl_exponent=cfg.population_control_exponent,
        reweight_factor_inv_max=cfg.reweight_factor_inv_max,
        has_singles=system.has_singles,
        c_t_initiator=cfg.c_t_initiator,
        run_type=run_type, partial_node_eps=cfg.partial_node_eps,
        release_step=cfg.nstep * cfg.nblk_eq // 2 or 1,
        guiding=guiding, time_sym=system.time_sym, z=system.z,
        proposal=proposal,
        use_exponential_projector=cfg.use_exponential_projector,
        # the reference skips the deterministic projection in exponential
        # mode (do_walk.f90:2255)
        semistochastic=cfg.semistochastic
        and not cfg.use_exponential_projector)
    out = run_walk(system, trial, wcfg, nstep=cfg.nstep, nblk=cfg.nblk,
                   nblk_eq=cfg.nblk_eq, w_abs_begin=cfg.w_abs_begin,
                   e_trial_initial=cfg.e_trial_initial or trial.e_trial,
                   seed=cfg.seeds[0], verbose=verbose, guide=guide)
    print(f"e_mixed={out.e_mixed:26.9f} +-{out.e_err:.9f}")
    return out


def run_from_config(cfg, fcidump: str | None = None, verbose: bool = True):
    from .algo.hci import run_hci
    from .algo.pt import do_pt

    if cfg.hamiltonian_type in ("fictitious", "read", "hubbard"):
        return run_toy(cfg, verbose=verbose)

    if cfg.hamiltonian_type == "chem":
        from .systems.base import make_chem_system
        system = make_chem_system(
            fcidump or "FCIDUMP", nup=cfg.nup or None,
            ndn=(cfg.nelec - cfg.nup) if cfg.nelec else None,
            time_sym=cfg.time_sym, z=cfg.z, point_group=cfg.point_group,
            hf_symmetry=cfg.hf_symmetry, hf_up_occ_in=cfg.hf_up_occ,
            hf_dn_occ_in=cfg.hf_dn_occ)
    elif cfg.hamiltonian_type == "heg":
        from .systems.heg.system import make_heg_system
        system = make_heg_system(cfg.n_dim, cfg.r_s, cfg.nelec, cfg.nup,
                                 cfg.cutoff_radius)
        print(f"For this cell, HF kinetic, exchange, total energies = "
              f"{system.extra['energy_hf']:.8f}")
        if system.extra["madelung_implemented"]:
            print(f"Madelung energy ={system.extra['energy_madelung']:10.6f}")
        else:
            print("Madelung energy not implemented for 2D "
                  "(ref heg.f90:2845); totals exclude it")
    elif cfg.hamiltonian_type == "hubbardk":
        from .systems.hubbard.system import make_hubbard_k_system
        system = make_hubbard_k_system(cfg.l_x, cfg.l_y, cfg.t_hub,
                                       cfg.u_hub, cfg.nup,
                                       cfg.nelec - cfg.nup)
    elif cfg.hamiltonian_type == "hubbard2":
        from .systems.hubbard.system import make_hubbard_real_system
        system = make_hubbard_real_system(cfg.l_x, cfg.l_y, cfg.t_hub,
                                          cfg.u_hub, cfg.nup,
                                          cfg.nelec - cfg.nup, pbc=cfg.pbc)
    else:
        raise SystemExit(f"unknown hamiltonian_type {cfg.hamiltonian_type}")

    if cfg.run_type == "selected_ci":
        from .algo.legacy_ci import perform_selected_ci
        my_second("BEG", "generate deterministically selected subspace")
        res = perform_selected_ci(system, iters=cfg.nblk_eq or 4,
                                  n_initiators=cfg.n_truncate_det or 1000,
                                  n_truncate=cfg.n_truncate_det or 1000,
                                  verbose=verbose)
        my_second("END", "generate deterministically selected subspace")
        print(f"Selected CI energy={res.energy:26.9f}  ndet={len(res.up)}")
        return res
    if cfg.run_type == "trunc_lanc":
        from .algo.legacy_ci import perform_truncated_lanczos
        my_second("BEG", "truncated lanczos")
        res = perform_truncated_lanczos(system, iters=cfg.nblk_eq or 8,
                                        n_initiators=cfg.n_truncate_det or
                                        1000,
                                        n_truncate=cfg.n_truncate_det or
                                        1000, verbose=verbose)
        my_second("END", "truncated lanczos")
        print(f"Truncated Lanczos energy={res.energy:26.9f}")
        return res
    if cfg.run_type == "vmc" and cfg.hamiltonian_type == "hubbard2":
        # Gutzwiller VMC with Sherman-Morrison ratios (ref run_type 'vmc'
        # -> compute_vmc_energy_gutz_wf, hubbard.f90:1061)
        from .systems.hubbard.vmc import run_vmc
        my_second("BEG", "vmc")
        e, err = run_vmc(cfg.l_x, cfg.l_y, cfg.t_hub, cfg.u_hub, cfg.nup,
                         cfg.nelec - cfg.nup, g=cfg.gutz_g, pbc=cfg.pbc,
                         seed=cfg.seeds[0] & 0xFFFF)
        my_second("END", "vmc")
        print(f"e_vmc={e:26.9f} +-{err:.9f}")
        print(f"e_mixed={e:26.9f} +-{err:.9f}")
        return e, err
    if cfg.run_type != "hci":
        my_second("BEG", "walk")
        out = run_det_walk(cfg, system, verbose=verbose)
        my_second("END", "walk")
        return out

    my_second("BEG", "variational part")
    res = run_hci(system, eps_var=cfg.eps_var,
                  eps_var_sched=cfg.eps_var_sched, n_states=cfg.n_states,
                  verbose=verbose, dump_wf_var=cfg.dump_wf_var,
                  wf_cache_dir=".", active_space=cfg.active_space)
    my_second("END", "variational part")
    print(f"Variational energy={res.energies[0]:26.9f}")

    if cfg.get_natorbs:
        # natural-orbital FCIDUMP restart (ref: hci.f90:683-745,
        # generate_natorb_integrals:3554)
        from .algo.rdm import (generate_natorb_fcidump, get_1rdm,
                               get_1rdm_with_pt)
        my_second("BEG", "natorb")
        if cfg.natorb_use_pt:
            gamma = get_1rdm_with_pt(
                system, res.up, res.dn, res.wts[:, 0],
                float(res.energies[0]),
                eps_pt_big=cfg.eps_pt_big if cfg.eps_pt_big > 0
                else cfg.eps_var)
            from .algo.rdm import natural_orbitals, rotate_integrals, \
                write_fcidump
            import numpy as _np
            sym = _np.asarray(system.table.orb_sym)
            occ, U = natural_orbitals(gamma, sym)
            h2, eri2 = rotate_integrals(system.table, U)
            write_fcidump("FCIDUMP.natorb", h2, eri2,
                          system.table.core_energy, sym,
                          nelec=system.nup + system.ndn)
        else:
            generate_natorb_fcidump(system, res.up, res.dn, res.wts[:, 0],
                                    "FCIDUMP.natorb",
                                    nelec=system.nup + system.ndn)
        print("Wrote FCIDUMP.natorb")
        my_second("END", "natorb")

    if cfg.get_greens_function:
        from .algo.greens import greens_function_g0
        my_second("BEG", "greens_function")
        w_grid = np.linspace(cfg.w_min, cfg.w_max, cfg.n_w)
        g_np1, g_nm1 = greens_function_g0(system, res.up, res.dn,
                                          res.wts[:, 0],
                                          float(res.energies[0]), w_grid)
        for i, w in enumerate(w_grid):
            print(f"G0(w={w:10.5f}): trace={np.trace(g_np1[i]).real + np.trace(g_nm1[i]).real:14.8f}")
        my_second("END", "greens_function")

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
        if cfg.hamiltonian_type == "heg" and \
                system.extra["madelung_implemented"]:
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
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace into DIR (the "
                        "gprof/TAU analog; view with tensorboard)")
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    print("*" * 47)
    print("** SQMC-TPU (Semistochastic Quantum Monte Carlo) **")
    print("*" * 47)
    with open(args.input) as f:
        cfg = parse_input(f.read())
    if args.profile:
        import jax
        with jax.profiler.trace(args.profile):
            run_from_config(cfg, fcidump=args.fcidump)
    else:
        run_from_config(cfg, fcidump=args.fcidump)


if __name__ == "__main__":
    main()
