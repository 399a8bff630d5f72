"""Block Davidson eigensolver on the sparse COO Hamiltonian.

Re-design of davidson_sparse (ref: more_tools.f90:2018) with the matvec as a
jitted XLA scatter-add over the symmetric COO (strictly-upper entries stored
once; both orientations applied + diagonal), diagonal preconditioning, and a
restarted Krylov space.  The multi-device version shards rows over the mesh
and psums the dot products (ref: davidson_sparse_mpi2:2525 -> SURVEY P4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .sparseham import SparseHam


@functools.partial(jax.jit, donate_argnums=())
def _matvec(rows, cols, vals, diag, v):
    """y = H v for symmetric COO. v: [n] or [n, k]."""
    single = v.ndim == 1
    if single:
        v = v[:, None]
    n = diag.shape[0]
    contrib_u = vals[:, None] * v[cols]
    contrib_l = vals[:, None] * v[rows]
    y = diag[:, None] * v
    y = y.at[rows].add(contrib_u)
    y = y.at[cols].add(contrib_l)
    return y[:, 0] if single else y


def matvec(H: SparseHam, v):
    return _matvec(jnp.asarray(H.rows), jnp.asarray(H.cols),
                   jnp.asarray(H.vals), jnp.asarray(H.diag), v)


def davidson(H: SparseHam, n_states: int = 1,
             initial: np.ndarray | None = None,
             tol: float = 1e-10, max_iter: int = 200,
             m_max: int | None = None, verbose: bool = False,
             matvec_fn=None):
    """Lowest n_states eigenpairs.  Returns (evals [k], evecs [n,k]).

    initial: optional [n, k] starting vectors (previous HCI iteration's
    wavefunction; ref: hci.f90 starting_wts).
    matvec_fn: optional replacement for the local COO matvec - e.g. the
    mesh-sharded matvec of parallel.dist.make_sharded_matvec (the
    davidson_sparse_mpi2 analog, SURVEY P4).
    """
    n = H.n
    k = n_states
    if matvec_fn is None and (n <= k or n < 50):
        # dense fallback for tiny problems
        M = np.zeros((n, n))
        M[H.rows, H.cols] = H.vals
        M = M + M.T + np.diag(H.diag)
        w, U = np.linalg.eigh(M)
        return w[:k], U[:, :k]

    rows = jnp.asarray(H.rows)
    cols = jnp.asarray(H.cols)
    vals = jnp.asarray(H.vals)
    diag = jnp.asarray(H.diag)
    diag_np = H.diag
    if matvec_fn is None:
        def matvec_fn(v):
            return _matvec(rows, cols, vals, diag, v)
    if m_max is None:
        m_max = max(8 * k, 48)

    rng = np.random.default_rng(0)
    if initial is not None and initial.shape[1] >= 1:
        V = initial[:, :k].astype(np.float64).copy()
    else:
        V = np.zeros((n, k))
        order = np.argsort(diag_np)
        for i in range(k):
            V[order[i], i] = 1.0
    # orthonormalize
    V, _ = np.linalg.qr(V)
    if V.shape[1] < k:  # degenerate start
        V = np.concatenate([V, rng.normal(size=(n, k - V.shape[1]))], axis=1)
        V, _ = np.linalg.qr(V)

    W = np.asarray(matvec_fn(jnp.asarray(V)))
    theta_old = np.full(k, np.inf)
    evals = None
    X = V[:, :k]

    for it in range(max_iter):
        G = V.T @ W
        G = 0.5 * (G + G.T)
        w_r, S = np.linalg.eigh(G)
        evals = w_r[:k]
        X = V @ S[:, :k]
        HX = W @ S[:, :k]

        if np.max(np.abs(evals - theta_old)) < tol:
            break
        theta_old = evals.copy()
        if verbose:
            print(f"davidson iter {it}: " + " ".join(f"{e:.9f}" for e in evals))

        # residuals + preconditioner
        R = HX - X * evals[None, :]
        denom = evals[None, :] - diag_np[:, None]
        denom = np.where(np.abs(denom) < 1e-8, -1.0, denom)
        T = R / denom

        # orthogonalize against V (twice for stability)
        for _ in range(2):
            T = T - V @ (V.T @ T)
        # normalize, drop tiny
        keep = []
        for i in range(T.shape[1]):
            nrm = np.linalg.norm(T[:, i])
            if nrm > 1e-8:
                T[:, i] /= nrm
                # orthogonalize against previously kept
                for j_ in keep:
                    T[:, i] -= T[:, j_] * (T[:, j_] @ T[:, i])
                nrm2 = np.linalg.norm(T[:, i])
                if nrm2 > 1e-6:
                    T[:, i] /= nrm2
                    keep.append(i)
        if not keep:
            break
        T = T[:, keep]

        if V.shape[1] + T.shape[1] > m_max:
            # restart with the current Ritz vectors (X is orthonormal since
            # V was and S is orthogonal), re-orthogonalize T against them
            V = X.copy()
            W = HX.copy()
            T = T - V @ (V.T @ T)
            nrms = np.linalg.norm(T, axis=0)
            T = T[:, nrms > 1e-8] / np.maximum(nrms[nrms > 1e-8], 1e-30)
            if T.shape[1] == 0:
                break
        HT = np.asarray(matvec_fn(jnp.asarray(T)))
        V = np.concatenate([V, T], axis=1)
        W = np.concatenate([W, HT], axis=1)

    return np.asarray(evals), np.asarray(X)


def arpack_diagonalize(H: SparseHam, n_states: int = 1,
                       initial: np.ndarray | None = None,
                       tol: float = 0.0):
    """ARPACK alternative diagonalizer (ref: parpack_diagonalize,
    more_tools.f90:2869 — the reference's optional PARPACK path; scipy
    bundles the same ARPACK library, single-process here).  Same
    contract as davidson(): returns (evals [k], evecs [n, k]).
    """
    from scipy.sparse import coo_matrix
    from scipy.sparse.linalg import eigsh

    n, k = H.n, n_states
    if n <= max(2 * k + 1, 16):
        M = np.zeros((n, n))
        M[H.rows, H.cols] = H.vals
        M = M + M.T + np.diag(H.diag)
        w, v = np.linalg.eigh(M)
        return w[:k], v[:, :k]
    A = coo_matrix((np.concatenate([H.vals, H.vals, H.diag]),
                    (np.concatenate([H.rows, H.cols, np.arange(n)]),
                     np.concatenate([H.cols, H.rows, np.arange(n)]))),
                   shape=(n, n)).tocsr()
    v0 = None
    if initial is not None and initial.shape[0] == n:
        v0 = np.asarray(initial[:, 0], np.float64)
        nrm = np.linalg.norm(v0)
        v0 = v0 / nrm if nrm > 0 else None
    w, v = eigsh(A, k=k, which="SA", v0=v0, tol=tol)
    order = np.argsort(w)
    return w[order], v[:, order]
