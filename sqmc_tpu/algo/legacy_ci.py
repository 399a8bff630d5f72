"""Older deterministic selection algorithms: initiator-style selected CI
and truncated Lanczos.

Re-designs of the reference's pre-HCI selection methods (ref:
semistoch.f90 perform_selected_ci:893-1297 and
perform_truncated_lanczos:1299-1578; dispatched from
hamiltonian_mod.f90:158-185 for run_type selected_ci / trunc_lanc):

  * selected_ci(iters, n_initiators[], n_truncate[]): starting from HF,
    each iteration applies the projector 1 + tau*(E_ref - H) through the
    connections of the largest-|c| `n_initiators` determinants, truncates
    the result to `n_truncate` by |coefficient|, and finally diagonalizes
    H in the surviving determinant set.
  * truncated_lanczos(iters, n_initiators, n_truncate): Krylov vectors
    built by applying H through the top-|c| initiators, orthogonalized
    against all previous vectors, truncated to n_truncate, and the exact
    Hamiltonian in the truncated Krylov space diagonalized each iteration.

Both reuse the batched screened-connection kernel (algo/connect.py) with
eps=0 (all nonzero connections) and the sort/segment set algebra - no
per-determinant host loops.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..ops import setalg
from .sparseham import build_sparse_ham
from .davidson import davidson


def _diag_elements(system, up, dn):
    import jax.numpy as jnp
    from ..systems.chem import slater
    from .. import dets as dets_mod
    out = np.empty(len(up))
    bs = 1 << 16
    for beg in range(0, len(up), bs):
        end = min(beg + bs, len(up))
        bu = dets_mod.to_bits(jnp.asarray(up[beg:end]), system.norb)
        bd = dets_mod.to_bits(jnp.asarray(dn[beg:end]), system.norb)
        out[beg:end] = np.asarray(slater.diag_elements(system.table, bu, bd))
    return out


def apply_h(system, up, dn, c, n_initiators: int | None = None):
    """y = H @ c expanded through the connections of the top-|c|
    n_initiators reference determinants (all references contribute to
    existing rows; only initiators open NEW rows - the initiator rule of
    ref semistoch.f90:988-1016).

    Returns (u_up, u_dn, y, c_on_union) over the sorted union det list.
    """
    from .connect import generate_connections

    n = len(up)
    n_init = n if n_initiators is None else min(n_initiators, n)
    order = np.argsort(-np.abs(c), kind="stable")
    init_rows = order[:n_init]

    # candidate rows opened by initiators (eps=0: every |H|>0 connection)
    cu, cd, _, _ = generate_connections(
        system, up[init_rows], dn[init_rows], eps=np.zeros(n_init))
    all_up = np.concatenate([up, cu])
    all_dn = np.concatenate([dn, cd])
    u_up, u_dn, _, _ = setalg.unique_dets(all_up, all_dn)

    # off-diagonal contributions from ALL references into the union
    cu2, cd2, h2, ref2 = generate_connections(system, up, dn,
                                              eps=np.zeros(n))
    pos = setalg.search_dets(u_up, u_dn, cu2, cd2)
    ok = pos >= 0
    y = np.zeros(len(u_up))
    np.add.at(y, pos[ok], h2[ok] * c[ref2[ok]])
    # diagonal contributions
    ref_pos = setalg.search_dets(u_up, u_dn, up, dn)
    diag_u = _diag_elements(system, u_up, u_dn)
    y[ref_pos] += diag_u[ref_pos] * c
    c_u = np.zeros(len(u_up))
    c_u[ref_pos] = c
    return u_up, u_dn, y, c_u


def _truncate(up, dn, w, n_keep: int):
    order = np.argsort(-np.abs(w), kind="stable")[:n_keep]
    order = order[np.abs(w[order]) > 0]
    so = setalg.lexsort_dets(up[order], dn[order])
    keep = order[so]
    return up[keep], dn[keep], w[keep]


class LegacyCIResult(NamedTuple):
    energy: float
    up: np.ndarray
    dn: np.ndarray
    coef: np.ndarray
    energies_per_iter: list


def perform_selected_ci(system, iters: int, n_initiators, n_truncate,
                        tau: float = 0.01, verbose: bool = False,
                        start=None) -> LegacyCIResult:
    """ref: perform_selected_ci (semistoch.f90:893).  n_initiators and
    n_truncate may be scalars or per-iteration schedules.  start: optional
    (up, dn, coef) initial vector - e.g. the degenerate-HF multiplet the
    reference uses for hubbardk (k_hf_deg_up/dn, semistoch.f90:966-973)."""
    n_init = np.broadcast_to(np.asarray(n_initiators), (iters,))
    n_trunc = np.broadcast_to(np.asarray(n_truncate), (iters,))

    if start is not None:
        up, dn, c = (np.asarray(start[0]), np.asarray(start[1]),
                     np.asarray(start[2], np.float64))
    else:
        up = system.hf_up[None].copy()
        dn = system.hf_dn[None].copy()
        c = np.ones(1)
    e_ref = float(_diag_elements(system, up, dn)[0])
    energies = []
    for it in range(iters):
        u_up, u_dn, y, c_u = apply_h(system, up, dn, c,
                                     n_initiators=int(n_init[it]))
        w = c_u + tau * (e_ref * c_u - y)
        up, dn, c = _truncate(u_up, u_dn, w, int(n_trunc[it]))
        c = c / np.linalg.norm(c)
        # Rayleigh quotient for the running energy estimate
        _, _, y2, c2 = apply_h(system, up, dn, c, n_initiators=0)
        e_ref = float(np.dot(c2, y2) / np.dot(c2, c2))
        energies.append(e_ref)
        if verbose:
            print(f"selected_ci iter {it + 1}: ndet={len(up)} "
                  f"E={e_ref:.8f}")

    # final diagonalization in the selected space (ref :1240
    # rediagonalize=.true.)
    H = build_sparse_ham(system.table, up, dn, system.nup, system.ndn,
                         system.norb, time_sym=system.time_sym, z=system.z)
    evals, evecs = davidson(H, n_states=1)
    if verbose:
        print(f"selected_ci final: ndet={len(up)} E={evals[0]:.8f}")
    return LegacyCIResult(float(evals[0]), up, dn,
                          np.asarray(evecs[:, 0]), energies)


def perform_truncated_lanczos(system, iters: int, n_initiators: int,
                              n_truncate: int, verbose: bool = False,
                              start=None) -> LegacyCIResult:
    """ref: perform_truncated_lanczos (semistoch.f90:1299).  Returns the
    Krylov ground state of the final iteration, expressed in the union of
    the truncated Krylov vectors' determinants.  Lanczos converges to the
    lowest eigenstate with nonzero overlap on `start` (default: the HF
    determinant; pass the symmetrized degenerate-HF multiplet for
    degenerate shells, as the reference does via c_sym_psi_t,
    semistoch.f90:1370-1376)."""
    vecs = []                      # list of (up, dn, coef), orthonormal

    if start is not None:
        up, dn, c = (np.asarray(start[0]), np.asarray(start[1]),
                     np.asarray(start[2], np.float64))
        c = c / np.linalg.norm(c)
    else:
        up = system.hf_up[None].copy()
        dn = system.hf_dn[None].copy()
        c = np.ones(1)
    vecs.append((up, dn, c))
    hu0, hd0, hy0, _ = apply_h(system, up, dn, c, n_initiators=0)
    pos0 = setalg.search_dets(hu0, hd0, up, dn)
    h00 = float(np.dot(hy0[pos0], c))
    K = np.zeros((iters, iters))
    K[0, 0] = h00
    energies = [h00]

    def dot(a, b):
        """Dot of two sparse det-vectors (b searched in a)."""
        au, ad, ac = a
        pos = setalg.search_dets(au, ad, b[0], b[1])
        ok = pos >= 0
        return float(np.dot(ac[pos[ok]], b[2][ok]))

    for it in range(1, iters):
        pu, pd, pc = vecs[-1]
        u_up, u_dn, y, _ = apply_h(system, pu, pd, pc,
                                   n_initiators=n_initiators)
        # orthogonalize H v against all previous vectors (ref step 2)
        w = y.copy()
        for (vu, vd, vc) in vecs:
            ov = dot((u_up, u_dn, w), (vu, vd, vc))
            pos = setalg.search_dets(u_up, u_dn, vu, vd)
            ok = pos >= 0
            w[pos[ok]] -= ov * vc[ok]
        up2, dn2, w2 = _truncate(u_up, u_dn, w, n_truncate)
        # re-orthogonalize the truncated vector (ref step 4)
        for (vu, vd, vc) in vecs:
            ov = dot((up2, dn2, w2), (vu, vd, vc))
            pos = setalg.search_dets(up2, dn2, vu, vd)
            ok = pos >= 0
            w2[pos[ok]] -= ov * vc[ok]
        nrm = np.linalg.norm(w2)
        if nrm < 1e-12:
            break
        w2 /= nrm
        vecs.append((up2, dn2, w2))

        # exact H in the Krylov space (ref step 6): H v_k dotted against
        # every v_i.  H v_k must be expanded through ALL connections so
        # that rows in other vectors' supports are represented.
        hu, hd, hy, _ = apply_h(system, up2, dn2, w2)
        k = len(vecs) - 1
        for i, v in enumerate(vecs):
            K[i, k] = K[k, i] = dot((hu, hd, hy), v)
        evals, evecs = np.linalg.eigh(K[:k + 1, :k + 1])
        energies.append(float(evals[0]))
        if verbose:
            print(f"trunc_lanc iter {it + 1}: ndet={len(up2)} "
                  f"E={evals[0]:.8f}")

    # assemble the ground state over the union of Krylov supports
    m = len(vecs)
    evals, evecs = np.linalg.eigh(K[:m, :m])
    all_up = np.concatenate([v[0] for v in vecs])
    all_dn = np.concatenate([v[1] for v in vecs])
    g_up, g_dn, _, _ = setalg.unique_dets(all_up, all_dn)
    coef = np.zeros(len(g_up))
    for i, (vu, vd, vc) in enumerate(vecs):
        pos = setalg.search_dets(g_up, g_dn, vu, vd)
        coef[pos] += evecs[i, 0] * vc
    coef /= np.linalg.norm(coef)
    return LegacyCIResult(float(evals[0]), g_up, g_dn, coef, energies)


def apply_h_on_the_fly(system, up, dn, x):
    """y = H x restricted to a FIXED sorted det list, matrix-free: the
    connections are regenerated per application instead of storing the
    sparse matrix (ref: apply_H_on_the_fly, chemistry.f90:8865).
    up/dn must be key-sorted."""
    from .connect import generate_connections

    y = _diag_elements(system, up, dn) * x
    cu, cd, h, ref = generate_connections(system, up, dn,
                                          eps=np.zeros(len(up)))
    pos = setalg.search_dets(up, dn, cu, cd)
    ok = pos >= 0
    np.add.at(y, pos[ok], h[ok] * x[ref[ok]])
    return y


def matrix_lanczos_on_the_fly(system, up, dn, iters: int = 40,
                              tol: float = 1e-10, seed: int = 0,
                              verbose: bool = False):
    """Lowest eigenpair of H over a fixed det list by Lanczos with
    matrix-free H applications and full reorthogonalization (ref:
    matrix_lanczos_on_the_fly, chemistry.f90:8680 - used when the sparse
    matrix does not fit memory).  Returns (energy, vec)."""
    order = setalg.lexsort_dets(up, dn)
    up, dn = up[order], dn[order]
    n = len(up)
    v = np.zeros(n)
    v[int(np.argmin(_diag_elements(system, up, dn)))] = 1.0
    V = [v]
    alphas, betas = [], []
    e_prev = np.inf
    for it in range(min(iters, n)):
        w = apply_h_on_the_fly(system, up, dn, V[-1])
        a = float(np.dot(V[-1], w))
        alphas.append(a)
        for vk in V:                      # full reorthogonalization
            w -= np.dot(vk, w) * vk
        T = np.diag(alphas)
        for k, b in enumerate(betas):
            T[k, k + 1] = T[k + 1, k] = b
        evals, evecs = np.linalg.eigh(T)
        e = float(evals[0])
        if verbose:
            print(f"lanczos_on_the_fly it={it + 1} E={e:.10f}", flush=True)
        b = float(np.linalg.norm(w))
        if abs(e - e_prev) < tol or b < 1e-12:
            break
        e_prev = e
        betas.append(b)
        V.append(w / b)
    coef = evecs[:, 0]
    vec = np.zeros(n)
    for k, c in enumerate(coef[:len(V)]):
        vec += c * V[k]
    vec /= np.linalg.norm(vec)
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    return e, vec[inv]


def hubbard_lanczos_full(system, iters: int = 60, tol: float = 1e-10,
                         verbose: bool = False):
    """Full-space Lanczos ground state for a Hubbard system (ref:
    arnoldi_hubbard_binary_search, hubbard.f90:6700 - enumerate the whole
    Sz sector, apply H matrix-free, binary-search det lookups).  The TPU
    redesign reuses matrix_lanczos_on_the_fly (sort-join H application
    over the lex-sorted det list replaces the reference's per-connection
    binary search).  Returns (energy, vec, up, dn) with dets in
    lex-sorted order.
    """
    from itertools import combinations

    from .. import dets as dets_mod
    from ..ops import setalg

    norb, nup, ndn = system.norb, system.nup, system.ndn
    ups = np.stack([dets_mod.det_from_orbs(c, norb)
                    for c in combinations(range(norb), nup)])
    dns = np.stack([dets_mod.det_from_orbs(c, norb)
                    for c in combinations(range(norb), ndn)])
    up = np.repeat(ups, len(dns), axis=0)
    dn = np.tile(dns, (len(ups), 1))
    order = setalg.lexsort_dets(up, dn)
    up, dn = up[order], dn[order]
    e, vec = matrix_lanczos_on_the_fly(system, up, dn, iters=iters,
                                       tol=tol, verbose=verbose)
    return e, vec, up, dn
