"""Trial wavefunction, deterministic space, and C(T) construction.

Re-design of generate_space_iterate / generate_psi_t_connected_e_loc
(ref: semistoch.f90:145,:27).  The reference builds Psi_T and the
deterministic (semistochastic) space by iterated apply-H / truncate /
rediagonalize; here both come from the HCI machinery directly (HCI *is*
that iteration, with a principled selection criterion):

  * Psi_T   = top n_psi_t dets of a loose-eps HCI wavefunction by |coef|
  * D space = top n_imp dets of the same wavefunction
  * projector = sparse H over D (the walk applies 1 + tau(E_T - H) exactly
    on D each step; ref: do_walk.f90:2260-2330)
  * C(T)    = all dets connected to Psi_T, with precomputed local-energy
    pieces e_loc_num(j) = sum_i H_ji c_i and e_loc_den(j) = c_j
    (ref: common_psi_t commons, psi_t_connected_e_loc_*)
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..ops import setalg
from .connect import generate_connections
from .hci import run_hci
from .sparseham import SparseHam, build_sparse_ham


@dataclasses.dataclass
class TrialWavefunction:
    # Psi_T (sorted by det key)
    psit_up: np.ndarray
    psit_dn: np.ndarray
    psit_coef: np.ndarray
    e_trial: float                # variational energy of Psi_T
    # C(T): connections of Psi_T incl. Psi_T itself (sorted)
    ct_up: np.ndarray
    ct_dn: np.ndarray
    ct_num: np.ndarray            # sum_i H_ji c_i
    ct_den: np.ndarray            # c_j (0 outside Psi_T)
    # deterministic space (sorted) + projector H (COO over D)
    imp_up: np.ndarray
    imp_dn: np.ndarray
    imp_ham: SparseHam


def _top_by_coef(up, dn, coef, n_keep):
    order = np.argsort(-np.abs(coef), kind="stable")[:n_keep]
    u, d, c = up[order], dn[order], coef[order]
    s = setalg.lexsort_dets(u, d)
    return u[s], d[s], c[s]


def _assemble_trial(system, up, dn, wts, n_psi_t: int,
                    imp_up, imp_dn) -> TrialWavefunction:
    """Shared trail-end: pick Psi_T, build its C(T) local-energy cache
    and the D-space projector H (ref: generate_psi_t_connected_e_loc,
    semistoch.f90:27)."""
    pu, pd, pc = _top_by_coef(up, dn, wts, n_psi_t)
    pc = pc / np.linalg.norm(pc)
    # Rayleigh quotient of the truncated Psi_T as e_trial seed
    Hp = build_sparse_ham(system.table, pu, pd, system.nup, system.ndn,
                          system.norb, time_sym=system.time_sym, z=system.z)
    Hm = np.zeros((len(pu), len(pu)))
    Hm[Hp.rows, Hp.cols] = Hp.vals
    Hm = Hm + Hm.T + np.diag(Hp.diag)
    e_trial = float(pc @ Hm @ pc)

    imp_ham = build_sparse_ham(system.table, imp_up, imp_dn, system.nup,
                               system.ndn, system.norb,
                               time_sym=system.time_sym, z=system.z)

    # C(T): all connections of Psi_T (unscreened: eps -> 0+ keeps every
    # nonzero |H| entry of the heat-bath rows) with summed H*c
    eps_tiny = np.full(len(pu), 1e-300)
    cu, cd, h, ref = generate_connections(system, pu, pd,
                                          eps_tiny / np.maximum(np.abs(pc), 1e-300))
    contrib = h * pc[ref]
    # include Psi_T's own rows: diagonal contributions H_jj c_j for j in T
    # (local energy numerator includes the diagonal term; ref:
    # semistoch.f90 generate_psi_t_connected_e_loc)
    all_up = np.concatenate([cu, pu])
    all_dn = np.concatenate([cd, pd])
    diag_T = Hp.diag  # diagonal elements of Psi_T dets
    all_num = np.concatenate([contrib, diag_T * pc])
    cu_u, cd_u, (num,), _ = setalg.unique_dets(all_up, all_dn, [all_num])
    # denominator: c_j at Psi_T dets
    den = np.zeros(len(cu_u))
    pos = setalg.search_dets(cu_u, cd_u, pu, pd)
    den[pos] = pc

    return TrialWavefunction(psit_up=pu, psit_dn=pd, psit_coef=pc,
                             e_trial=e_trial, ct_up=cu_u, ct_dn=cd_u,
                             ct_num=num, ct_den=den, imp_up=imp_up,
                             imp_dn=imp_dn, imp_ham=imp_ham)


def build_trial_wavefunction(system, eps_var: float = 2e-3,
                             n_psi_t: int = 200, n_imp: int = 1000,
                             verbose: bool = False) -> TrialWavefunction:
    """One-stop construction of Psi_T + D + C(T) for the SQMC walk."""
    res = run_hci(system, eps_var=eps_var, eps_var_sched=[eps_var] * 10,
                  verbose=verbose)
    wts = res.wts[:, 0]
    iu, idn, _ = _top_by_coef(res.up, res.dn, wts, n_imp)
    return _assemble_trial(system, res.up, res.dn, wts, n_psi_t, iu, idn)


def generate_space_iterate(system, n_iters: int, n_initiators, n_truncate,
                           norb_active=None, init_up=None, init_dn=None,
                           init_wts=None, verbose: bool = False):
    """Iterated deterministic-space / trial-wavefunction construction
    (ref: semistoch.f90 generate_space_iterate:145): starting from the
    initiator dets (HF by default), each iteration
      1. expands by the connected dets of the top-|c| n_initiators[it]
         dets, restricted to the lowest norb_active[it] orbitals,
      2. screens candidates by the first-order PT coefficient
         |sum_i H_ai c_i| / (E - H_aa) keeping the top 10*n_truncate
         (ref :259-300 keeps ~top 10%),
      3. diagonalizes the expanded space (Davidson),
      4. truncates to the n_truncate[it] largest |c| and rediagonalizes
         on exit of the last iteration.
    Returns (up, dn, coefs, energy).
    """
    from .davidson import davidson
    from .. import dets as dets_mod

    def per_it(x, it):
        if np.isscalar(x) or x is None:
            return x
        return x[min(it, len(x) - 1)]

    if init_up is None:
        up = system.hf_up[None, :].copy()
        dn = system.hf_dn[None, :].copy()
        wts = np.ones(1)
    else:
        order = setalg.lexsort_dets(init_up, init_dn)
        up, dn = init_up[order], init_dn[order]
        wts = np.asarray(init_wts, np.float64)[order]

    ts = dict(time_sym=system.time_sym, z=system.z)
    H = build_sparse_ham(system.table, up, dn, system.nup, system.ndn,
                         system.norb, **ts)
    energy = float(H.diag[0]) if len(up) == 1 else float("nan")

    for it in range(n_iters):
        n_init = int(per_it(n_initiators, it))
        n_trunc = int(per_it(n_truncate, it))
        norb_a = per_it(norb_active, it)
        iu, idn, ic = _top_by_coef(up, dn, wts, n_init)
        coeffs = np.where(np.abs(ic) == 0.0, 1e-300, np.abs(ic))
        cu, cd, h, ref = generate_connections(system, iu, idn,
                                              1e-300 / coeffs)
        if norb_a is not None and int(norb_a) < system.norb:
            # restrict to the lowest norb_active orbitals (ref norb_imp)
            mask_det = dets_mod.det_from_orbs(
                range(int(norb_a), system.norb), system.norb)
            ok = np.ones(len(cu), bool)
            for w in range(cu.shape[1]):
                ok &= (cu[:, w] & mask_det[w]) == 0
                ok &= (cd[:, w] & mask_det[w]) == 0
            cu, cd, h, ref = cu[ok], cd[ok], h[ok], ref[ok]
        # 1st-order-PT screening of the merged candidates
        num = h * ic[ref]
        cu_u, cd_u, (num_u,), _ = setalg.unique_dets(cu, cd, [num])
        new_mask = setalg.setdiff_dets(cu_u, cd_u, up, dn)
        cu_u, cd_u, num_u = cu_u[new_mask], cd_u[new_mask], num_u[new_mask]
        if len(cu_u):
            from .sparseham import eval_pairs  # noqa: F401 (diag below)
            from ..systems.chem import slater
            import jax.numpy as jnp
            bu = dets_mod.to_bits(jnp.asarray(cu_u), system.norb)
            bd = dets_mod.to_bits(jnp.asarray(cd_u), system.norb)
            dg = np.asarray(slater.diag_elements(system.table, bu, bd))
            pt_c = np.abs(num_u) / np.maximum(dg - energy, 1e-10)
            keep_n = min(len(cu_u), max(10 * n_trunc, 100))
            top = np.argsort(-pt_c, kind="stable")[:keep_n]
            cu_u, cd_u = cu_u[top], cd_u[top]
        up2 = np.concatenate([up, cu_u])
        dn2 = np.concatenate([dn, cd_u])
        order = setalg.lexsort_dets(up2, dn2)
        up2, dn2 = up2[order], dn2[order]
        H2 = build_sparse_ham(system.table, up2, dn2, system.nup,
                              system.ndn, system.norb, **ts)
        evals, evecs = davidson(H2, 1)
        energy = float(evals[0])
        wts2 = evecs[:, 0]
        # truncate to n_trunc by |coef|
        up, dn, wts = _top_by_coef(up2, dn2, wts2, n_trunc)
        if verbose:
            print(f"space_iterate {it + 1}: expanded={len(up2)} "
                  f"kept={len(up)} E={energy:.8f}", flush=True)

    # final rediagonalization in the truncated space (ref :1240-style)
    Hf = build_sparse_ham(system.table, up, dn, system.nup, system.ndn,
                          system.norb, **ts)
    evals, evecs = davidson(Hf, 1)
    return up, dn, evecs[:, 0], float(evals[0])


def build_trial_iterate(system, n_iters: int, n_initiators, n_truncate,
                        norb_active=None, n_psi_t: int = 200,
                        verbose: bool = False) -> TrialWavefunction:
    """TrialWavefunction via the reference's iterated construction
    (the `diff_from_psi_t` card path; ref do_walk.f90:954-960): the final
    iterated space IS the deterministic space and Psi_T is its top-|c|
    slice."""
    up, dn, coefs, energy = generate_space_iterate(
        system, n_iters, n_initiators, n_truncate, norb_active,
        verbose=verbose)
    return _assemble_trial(system, up, dn, coefs, n_psi_t, up, dn)


def build_trial_from_cards(system, trial_wf_iters: int, norb_trial_wf,
                           n_initiators_trial_wf, n_truncate_trial_wf,
                           size_deterministic: int,
                           verbose: bool = False) -> TrialWavefunction:
    """Reference-faithful Psi_T + D construction for walk-mode card decks
    (ref: Psi_T via generate_space_iterate with the trial_wf cards,
    hamiltonian_mod.f90:113-115; when diff_from_psi_t is false the
    deterministic space is the top size_deterministic dets of the same
    final expansion, semistoch.f90:263,403-420).

    trial_wf_iters == 0 reproduces the reference's iters<=0 path: Psi_T is
    the initial space (HF) and D its top size_deterministic slice."""
    size_det = max(int(size_deterministic), 1)
    n_psi_t = int(n_truncate_trial_wf[-1]) if trial_wf_iters > 0 else 1
    n_trunc = [int(x) for x in n_truncate_trial_wf]
    if n_trunc:
        # ref :263: last iteration keeps >= 1.5*size_deterministic so the
        # D-space truncation has material to cut from
        n_trunc[-1] = max(n_trunc[-1], size_det)
    up, dn, coefs, _energy = generate_space_iterate(
        system, max(trial_wf_iters, 0),
        list(n_initiators_trial_wf) or [1],
        n_trunc or [1],
        norb_active=list(norb_trial_wf) or None, verbose=verbose)
    iu, idn, _ = _top_by_coef(up, dn, coefs, size_det)
    return _assemble_trial(system, up, dn, coefs, n_psi_t, iu, idn)


def load_trial_from_reference(system, psit_con_file: str,
                              dtm_file: str | None = None,
                              n_imp: int = 1) -> TrialWavefunction:
    """TrialWavefunction from REFERENCE-generated restart artifacts
    (interop, SURVEY 5.4): psit_connections supplies Psi_T and the C(T)
    local-energy cache (ref do_walk.f90:687-878), dtm_projector supplies
    the deterministic space + its Hamiltonian (ref :887-1012).  Without a
    dtm file, the top-|c| n_imp Psi_T dets form the space and H is built
    here."""
    from ..utils.refio import read_psit_connections, read_dtm_projector

    d = read_psit_connections(psit_con_file, system.nup, system.ndn,
                              system.norb)
    order = setalg.lexsort_dets(d["ct_up"], d["ct_dn"])
    cu, cd = d["ct_up"][order], d["ct_dn"][order]
    num, den = d["ct_num"][order], d["ct_den"][order]
    po = setalg.lexsort_dets(d["psit_up"], d["psit_dn"])
    pu, pd_, pc = d["psit_up"][po], d["psit_dn"][po], d["psit_coef"][po]

    if dtm_file is not None:
        iu, idn, imp_ham = read_dtm_projector(dtm_file, system.nup,
                                              system.ndn, system.norb)
        io = setalg.lexsort_dets(iu, idn)
        # re-sort the COO to the sorted det order (restore rows < cols)
        inv = np.empty(len(io), np.int64)
        inv[io] = np.arange(len(io))
        r2 = inv[imp_ham.rows]
        c2 = inv[imp_ham.cols]
        imp_ham = SparseHam(n=imp_ham.n,
                            rows=np.minimum(r2, c2).astype(np.int32),
                            cols=np.maximum(r2, c2).astype(np.int32),
                            vals=imp_ham.vals, diag=imp_ham.diag[io])
        iu, idn = iu[io], idn[io]
    else:
        iu, idn, _ = _top_by_coef(pu, pd_, pc, n_imp)
        imp_ham = build_sparse_ham(system.table, iu, idn, system.nup,
                                   system.ndn, system.norb,
                                   time_sym=system.time_sym, z=system.z)

    e_trial = d["e_trial"]
    if not np.isfinite(e_trial):
        e_trial = float(num[0] / den[0]) if den[0] else 0.0
    return TrialWavefunction(psit_up=pu, psit_dn=pd_,
                             psit_coef=pc / np.linalg.norm(pc),
                             e_trial=float(e_trial), ct_up=cu, ct_dn=cd,
                             ct_num=num, ct_den=den, imp_up=iu, imp_dn=idn,
                             imp_ham=imp_ham)


def ensure_psit_in_imp(system, trial: TrialWavefunction,
                       verbose: bool = False) -> TrialWavefunction:
    """Force Psi_T into the deterministic space D (the exact semantics the
    reference's hf_to_psit card buys via its special Psi_T-column move,
    do_walk.f90:2281-2296: walkers on Psi_T dets propagate to the Psi_T
    connections exactly).  With Psi_T a subset of D, the D-space sparse
    projection applies -tau(H-E) exactly on every Psi_T det, which is the
    same guarantee with no special-cased column."""
    pos = setalg.search_dets(trial.imp_up, trial.imp_dn,
                             trial.psit_up, trial.psit_dn)
    missing = pos < 0
    if not missing.any():
        return trial
    iu = np.concatenate([trial.imp_up, trial.psit_up[missing]])
    idn = np.concatenate([trial.imp_dn, trial.psit_dn[missing]])
    iu, idn, _, _ = setalg.unique_dets(iu, idn, [])
    imp_ham = build_sparse_ham(system.table, iu, idn, system.nup,
                               system.ndn, system.norb,
                               time_sym=system.time_sym, z=system.z)
    if verbose:
        print(f"hf_to_psit: forcing Psi_T into the deterministic space "
              f"({int(missing.sum())} Psi_T dets added, n_imp "
              f"{len(trial.imp_up)} -> {len(iu)}); the exact D-space "
              "projection subsumes the reference's Psi_T-column move "
              "(do_walk.f90:2281-2296)")
    return dataclasses.replace(trial, imp_up=iu, imp_dn=idn,
                               imp_ham=imp_ham)


def save_trial(trial: TrialWavefunction, path: str):
    """Serialize a trial wavefunction (the SQMC checkpoint analog of the
    reference's psit/psit_connections/dtm_projector files; ref:
    commons/common_psi_t.f90:14-19)."""
    np.savez_compressed(
        path, psit_up=trial.psit_up, psit_dn=trial.psit_dn,
        psit_coef=trial.psit_coef, e_trial=trial.e_trial,
        ct_up=trial.ct_up, ct_dn=trial.ct_dn, ct_num=trial.ct_num,
        ct_den=trial.ct_den, imp_up=trial.imp_up, imp_dn=trial.imp_dn,
        h_rows=trial.imp_ham.rows, h_cols=trial.imp_ham.cols,
        h_vals=trial.imp_ham.vals, h_diag=trial.imp_ham.diag)


def load_trial(path: str) -> TrialWavefunction:
    z = np.load(path)
    ham = SparseHam(n=len(z["imp_up"]), rows=z["h_rows"], cols=z["h_cols"],
                    vals=z["h_vals"], diag=z["h_diag"])
    return TrialWavefunction(
        psit_up=z["psit_up"], psit_dn=z["psit_dn"], psit_coef=z["psit_coef"],
        e_trial=float(z["e_trial"]), ct_up=z["ct_up"], ct_dn=z["ct_dn"],
        ct_num=z["ct_num"], ct_den=z["ct_den"], imp_up=z["imp_up"],
        imp_dn=z["imp_dn"], imp_ham=ham)
