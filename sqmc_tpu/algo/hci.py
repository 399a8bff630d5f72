"""HCI variational determinant selection driver.

Re-design of perform_hci's variational loop (ref: hci.f90:66-560):
  iterate { select connections with |H_ij c_j| > eps_var  ->  union ->
            build sparse H (incremental)  ->  Davidson  ->  convergence }
with the reference's exact control flow: eps_var schedule, the
min_H_already_done skip window (ref: hci.f90:1014, chemistry.f90:7043),
exit criterion 1 (det-count growth < 1e-5 relative, before diagonalizing)
and criterion 2 (energy change < 1e-5 after).

The determinant list is kept globally sorted by the (up,dn) key at all
times (unlike the reference's [old, new-sorted] append order); weights and
bookkeeping arrays are permuted alongside, which makes merging, searching,
and PT membership tests pure sorted-set operations.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..ops import setalg
from ..utils.timers import phase
from .connect import generate_connections
from .davidson import davidson
from .sparseham import SparseHam, build_sparse_ham


@dataclasses.dataclass
class HCIResult:
    up: np.ndarray          # [n, W] sorted
    dn: np.ndarray
    wts: np.ndarray         # [n, n_states]
    energies: np.ndarray    # [n_states]
    diag: np.ndarray        # [n] diagonal elements
    n_iters: int
    ham: SparseHam | None = None


def _active_space_mask(cu, cd, active_space, nup, ndn, norb):
    """Candidate filter for the variational active space: frozen core
    always occupied, frozen virtuals never (ref: hci.f90:149-191 masks)."""
    from .. import dets as dets_mod
    n_var_e_up, n_var_e_dn, n_var_orbs = active_space
    n_core_up = nup - n_var_e_up
    n_core_dn = ndn - n_var_e_dn
    core_up = dets_mod.det_from_orbs(range(n_core_up), norb)
    core_dn = dets_mod.det_from_orbs(range(n_core_dn), norb)
    virt_up = dets_mod.det_from_orbs(
        range(min(n_core_up + n_var_orbs, norb), norb), norb)
    virt_dn = dets_mod.det_from_orbs(
        range(min(n_core_dn + n_var_orbs, norb), norb), norb)
    ok = np.ones(len(cu), bool)
    for w in range(cu.shape[1]):
        ok &= (cu[:, w] & core_up[w]) == core_up[w]
        ok &= (cd[:, w] & core_dn[w]) == core_dn[w]
        ok &= (cu[:, w] & virt_up[w]) == 0
        ok &= (cd[:, w] & virt_dn[w]) == 0
    return ok


def _rayleigh_f64(H: SparseHam, x: np.ndarray) -> float:
    """Host-f64 Rayleigh quotient over the symmetric upper COO; refines
    f32 device-Davidson eigenvalues (error O(||r||^2) for symmetric H)."""
    x = np.asarray(x, np.float64)
    x = x / np.linalg.norm(x)
    hx = H.diag * x
    np.add.at(hx, H.rows, H.vals * x[H.cols])
    np.add.at(hx, H.cols, H.vals * x[H.rows])
    return float(x @ hx)


def run_eps_series(system, eps_list, eps_pt: float, verbose: bool = False,
                   **hci_kwargs):
    """(E_var, dE2) for a descending eps_var series + the linear
    extrapolation to dE2 -> 0 (ref: energies_for_extrapolation,
    hci.f90:1824 - batched variational+PT energies over the schedule).

    Returns dict(eps, e_var, e_pt, e_tot, e_extrapolated, slope)."""
    from .pt import do_pt

    eps_list = sorted(set(float(e) for e in eps_list), reverse=True)
    e_var, e_pt = [], []
    for i, eps in enumerate(eps_list):
        res = run_hci(system, eps_var=eps,
                      eps_var_sched=eps_list[:i + 1], verbose=verbose,
                      **hci_kwargs)
        out = do_pt(system, res.up, res.dn, res.wts[:, 0], res.diag,
                    float(res.energies[0]), eps_var=eps, eps_pt=eps_pt,
                    verbose=verbose)
        e_var.append(float(res.energies[0]))
        e_pt.append(out["pt"])
        if verbose:
            print(f"eps_var={eps:.2e}  E_var={e_var[-1]:.9f} "
                  f"dE2={e_pt[-1]:.9f}", flush=True)
    e0, slope = extrapolate_energy(np.asarray(e_var), np.asarray(e_pt))
    return dict(eps=eps_list, e_var=np.asarray(e_var),
                e_pt=np.asarray(e_pt),
                e_tot=np.asarray(e_var) + np.asarray(e_pt),
                e_extrapolated=e0, slope=slope)


def extrapolate_energy(e_var: np.ndarray, e_pt: np.ndarray):
    """Linear extrapolation of E_tot = E_var + dE2 against dE2 -> 0 over
    an eps_var series (ref: energies_for_extrapolation, hci.f90:1824).
    Returns (e_extrapolated, slope)."""
    e_var = np.asarray(e_var, np.float64)
    e_pt = np.asarray(e_pt, np.float64)
    e_tot = e_var + e_pt
    A = np.stack([np.ones_like(e_pt), e_pt], axis=1)
    coef, *_ = np.linalg.lstsq(A, e_tot, rcond=None)
    return float(coef[0]), float(coef[1])


def run_hci(system, eps_var: float, eps_var_sched=None, n_states: int = 1,
            max_iters: int = 50, verbose: bool = True,
            keep_ham: bool = False, dump_wf_var: bool = False,
            wf_cache_dir: str | None = None, mesh=None,
            active_space=None, device_davidson: bool = False,
            diagonalizer: str = "davidson") -> HCIResult:
    """mesh: optional jax.sharding.Mesh - Davidson matvecs run sharded
    over it (SURVEY P4, davidson_sparse_mpi2 analog).

    diagonalizer: "davidson" (default) or "arpack" - the ARPACK
    alternative of the reference's optional PARPACK build
    (more_tools.f90:2869; scipy bundles the same ARPACK library).
    "arpack" is host-only (ignores mesh/device_davidson).

    device_davidson: run the Davidson matvec on the accelerator in the
    f32 128-slot row-block (block-ELL) layout, with host-f64 Rayleigh
    refinement of the converged eigenvalues (symmetric H => eigenvalue
    error is O(||r||^2) of the f32 residual, so ~1e-6 residual refines
    to ~1e-12 Ha).  The TPU-fast form: 43 ms/matvec on the C2 88k-det
    9.7M-nnz H vs 8.1 s for COO scatter-add (tools/bench_variational_tpu).

    active_space: optional (n_var_e_up, n_var_e_dn, n_var_orbs) - the
    variational active space of the reference's &active_space namelist
    (ref: hci.f90:149-191): the lowest nup-n_var_e_up (ndn-n_var_e_dn)
    orbitals are frozen core, and orbitals above core+n_var_orbs are
    frozen virtuals; generated candidates violating either mask are
    discarded (ref: hci.f90:384-412)."""
    nup, ndn, norb = system.nup, system.ndn, system.norb
    # mesh devices: candidate generation and sparse-H evaluation batches
    # fan out round-robin across them (SURVEY P5 compute side; ref
    # find_doubly_excited round-robin semistoch.f90:1743 and the MPI
    # sparse-H row split chemistry.f90:8012)
    devices = list(mesh.devices.flat) if mesh is not None else None

    # variational wavefunction cache (ref: hci.f90 wf_eps_var=<eps> files)
    if wf_cache_dir is not None:
        import os
        from ..utils.checkpoint import load_wf_var, wf_var_filename
        fname = wf_var_filename(min(eps_var_sched or [eps_var]), wf_cache_dir)
        cached = load_wf_var(fname)
        if cached is None and os.path.exists(fname):
            # a REFERENCE-generated unformatted cache (interop,
            # SURVEY 5.4): read it and compute the diagonal here
            from ..utils.refio import read_wf_eps_var
            from .sparseham import build_sparse_ham as _bsh
            u_r, d_r, w_r, e_r = read_wf_eps_var(fname, system.norb)
            order = setalg.lexsort_dets(u_r, d_r)
            H_r = _bsh(system.table, u_r[order], d_r[order], system.nup,
                       system.ndn, system.norb, time_sym=system.time_sym,
                       z=system.z)
            cached = dict(up=u_r[order], dn=d_r[order], wts=w_r[order],
                          energies=e_r, diag=H_r.diag)
        if cached is not None and cached["wts"].shape[1] >= n_states:
            if verbose:
                print(f"Reading variational wavefn from {fname}", flush=True)
            return HCIResult(up=cached["up"], dn=cached["dn"],
                             wts=cached["wts"][:, :n_states],
                             energies=cached["energies"][:n_states],
                             diag=cached["diag"], n_iters=0)

    up = system.hf_up[None, :].copy()
    dn = system.hf_dn[None, :].copy()
    wts = np.zeros((1, n_states))
    wts[0, 0] = 1.0
    min_H_done = np.full(1, 1e99)

    ts = dict(time_sym=system.time_sym, z=system.z)
    H = build_sparse_ham(system.table, up, dn, nup, ndn, norb, **ts)
    energies = np.full(n_states, H.diag[0])
    if verbose:
        print(f"Iteration   0 eps1={eps_var:8.1e} ndets={1:9d} "
              f"energy=" + " ".join(f"{e:16.9f}" for e in energies), flush=True)

    if eps_var_sched is None:
        eps_var_sched = [eps_var]
    final_eps = eps_var

    n_iter_done = 0
    for it in range(1, max_iters + 1):
        eps = eps_var_sched[it - 1] if it <= len(eps_var_sched) else final_eps
        n_old = len(up)

        if it > 1:
            coeffs = np.max(np.abs(wts), axis=1)
        else:
            coeffs = wts[:, 0].copy()
        coeffs = np.where(coeffs == 0.0, 1e-300, np.abs(coeffs))

        # generation with the already-done window
        gen_mask = coeffs * min_H_done > eps
        eps_per_ref = eps / coeffs
        with phase("get_next_det_list", enabled=verbose):
            if gen_mask.any():
                cu, cd, _, _ = generate_connections(
                    system, up[gen_mask], dn[gen_mask],
                    eps_per_ref[gen_mask], min_H_done[gen_mask],
                    devices=devices)
            else:
                cu = np.zeros((0, up.shape[1]), np.uint64)
                cd = cu.copy()
        min_H_done = np.minimum(min_H_done, eps_per_ref)

        if len(cu):
            if mesh is not None and len(cu) > 20000:
                # distributed owner-filtered dedup (SURVEY P5; ref
                # mpi_merge_sort2): route candidates to their det-hash
                # owner shard, sort/unique per shard, gather
                from ..parallel.dist import sharded_unique_dets
                cu, cd = sharded_unique_dets(mesh, cu, cd)
            else:
                cu, cd, _, _ = setalg.unique_dets(cu, cd)
            new_mask = setalg.setdiff_dets(cu, cd, up, dn)
            cu, cd = cu[new_mask], cd[new_mask]
        if len(cu) and active_space is not None:
            keep = _active_space_mask(cu, cd, active_space, nup, ndn, norb)
            cu, cd = cu[keep], cd[keep]
        n_new_dets = len(cu)
        n_total = n_old + n_new_dets

        if n_total == n_old:
            if verbose:
                print("Cycling hci iteration because no new dets", flush=True)
            if it >= len(eps_var_sched) or eps == eps_var_sched[-1]:
                break
            continue

        # exit criterion 1: relative growth below 1e-5 at final eps
        if (n_total <= int(1.00001 * n_old)
                and eps == (eps_var_sched[-1] if eps_var_sched else final_eps)):
            if verbose:
                print("Exiting variational part because of number of new dets "
                      "criterion", flush=True)
            break

        # merge: keep the global list sorted
        up2 = np.concatenate([up, cu])
        dn2 = np.concatenate([dn, cd])
        order = setalg.lexsort_dets(up2, dn2)
        up2, dn2 = up2[order], dn2[order]
        # previous rows land at positions where order < n_old
        prev_map = np.empty(n_old, dtype=np.int64)
        prev_pos = np.nonzero(order < n_old)[0]
        prev_map[order[prev_pos]] = prev_pos

        wts2 = np.zeros((n_total, n_states))
        wts2[prev_map] = wts
        mhd2 = np.full(n_total, 1e99)
        mhd2[prev_map] = min_H_done

        with phase("generate_sparse_ham", enabled=verbose):
            H = build_sparse_ham(system.table, up2, dn2, nup, ndn, norb,
                                 prev=H, prev_map=prev_map,
                                 devices=devices, **ts)

        # starting vectors: previous wavefunction; extra states get unit
        # vectors on the lowest unneeded diagonal elements
        X0 = wts2.copy()
        for s in range(n_states):
            if np.linalg.norm(X0[:, s]) < 1e-12:
                X0[np.argsort(H.diag)[s], s] = 1.0

        with phase("davidson", enabled=verbose):
            mv, f32_dev = None, False
            if (device_davidson and H.n >= 2000
                    and (mesh is None or mesh.devices.size == 1)):
                # on a single device the 128-slot row-block (block-ELL)
                # matvec dominates the COO scatter-add sharded form
                # (43 ms vs 8.1 s per matvec on the C2 88k-det H,
                # tools/bench_variational_tpu) — prefer it whenever the
                # mesh would not actually split the work
                from ..ops.spmv_pallas import BlockEllSpmv
                mv, f32_dev = BlockEllSpmv(H), True
            elif mesh is not None and H.n >= 200:
                from ..parallel.dist import make_sharded_matvec
                mv = make_sharded_matvec(H, mesh)
            elif device_davidson and H.n >= 2000:
                # device-resident f32 matvec in the 128-slot row-block
                # layout (the TPU-fast form; ops/spmv_pallas.BlockEllSpmv)
                from ..ops.spmv_pallas import BlockEllSpmv
                mv, f32_dev = BlockEllSpmv(H), True
            if diagonalizer == "arpack":
                from .davidson import arpack_diagonalize
                evals, evecs = arpack_diagonalize(H, n_states, initial=X0)
                f32_dev = False
            else:
                evals, evecs = davidson(
                    H, n_states, initial=X0, matvec_fn=mv,
                    tol=3e-6 if f32_dev else 1e-10)
            if f32_dev:
                evals = np.array([_rayleigh_f64(H, evecs[:, s])
                                  for s in range(n_states)])

        up, dn, wts, min_H_done = up2, dn2, evecs, mhd2
        old_energies = energies
        energies = evals
        n_iter_done = it
        if verbose:
            print(f"Iteration{it:4d} eps1={eps:8.1e} ndets={n_total:9d} "
                  f"energy=" + " ".join(f"{e:16.9f}" for e in energies),
                  flush=True)

        # exit criterion 2: energy change below 1e-5 at final eps
        if (np.max(np.abs(energies - old_energies)) < 1e-5
                and eps == (eps_var_sched[-1] if eps_var_sched else final_eps)):
            if verbose:
                print("Exiting variational part because of energy criterion",
                      flush=True)
            break

    if verbose:
        print(f"Final Iteration{n_iter_done:4d} {len(up):9d} dets, energy=" +
              " ".join(f"{e:16.9f}" for e in energies), flush=True)
        print("Variational energy=" + f"{energies[0]:26.9f}".rjust(15), flush=True)

    if dump_wf_var and wf_cache_dir is not None:
        from ..utils.checkpoint import save_wf_var, wf_var_filename
        fname = wf_var_filename(min(eps_var_sched or [eps_var]), wf_cache_dir)
        save_wf_var(fname, up, dn, wts, energies, H.diag)
        if verbose:
            print(f"Writing variational wavefn to {fname}", flush=True)

    return HCIResult(up=up, dn=dn, wts=wts, energies=energies, diag=H.diag,
                     n_iters=n_iter_done, ham=H if keep_ham else None)
