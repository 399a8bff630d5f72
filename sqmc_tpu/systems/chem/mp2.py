"""Orbital energies and deterministic MP2 (the reference's built-in
cross-check of the integrals + excitation machinery).

ref: chemistry.f90 compute_orbital_energies:9378-9443 (eps_i = h_ii +
(direct + exchange)/2 over the HF occupancies) and mp2_deterministic:
9445-9560 (sum over all HF connections of H_0k^2 / (sum eps_removed -
sum eps_added), Moller-Plesset denominators from the orbital energies).
"""

from __future__ import annotations

import numpy as np

from ... import dets


def _occ_vector(det_words: np.ndarray, norb: int) -> np.ndarray:
    import jax.numpy as jnp
    return np.asarray(dets.to_bits(jnp.asarray(det_words)[None], norb))[0]


def compute_orbital_energies(system) -> np.ndarray:
    """eps_p for the system's HF determinant."""
    norb = system.norb
    t = system.table
    h = t.h_np()
    n_up = _occ_vector(system.hf_up, norb).astype(np.float64)
    n_dn = _occ_vector(system.hf_dn, norb).astype(np.float64)

    P, J = np.meshgrid(np.arange(norb), np.arange(norb), indexing="ij")
    J_dir = t.eri_value_np(P.ravel(), P.ravel(), J.ravel(), J.ravel())
    J_dir = np.asarray(J_dir, np.float64).reshape(norb, norb)   # (ii|jj)
    K_exc = t.eri_value_np(P.ravel(), J.ravel(), J.ravel(), P.ravel())
    K_exc = np.asarray(K_exc, np.float64).reshape(norb, norb)   # (ij|ji)

    off = 1.0 - np.eye(norb)
    # ref 9399-9435: same-spin direct terms exclude j==i, cross-spin terms
    # do not; exchange excludes j==i for both spins; all halved.
    direct = ((off * J_dir) @ n_up + J_dir @ n_dn +
              (off * J_dir) @ n_dn + J_dir @ n_up)
    exchange = -(off * K_exc) @ (n_up + n_dn)
    return np.diag(h) + 0.5 * (direct + exchange)


def mp2_deterministic(system, orbital_energies: np.ndarray | None = None):
    """(E_mp2_correction, orbital_energies): second-order Moller-Plesset
    energy lowering from the HF determinant."""
    from ...algo.connect import generate_connections

    eps = (compute_orbital_energies(system)
           if orbital_energies is None else orbital_energies)
    norb = system.norb
    hf_up = system.hf_up[None]
    hf_dn = system.hf_dn[None]
    cu, cd, helem, _ = generate_connections(system, hf_up, hf_dn,
                                            eps=np.zeros(1))
    if len(cu) == 0:
        return 0.0, eps
    import jax.numpy as jnp
    b_hu = np.asarray(dets.to_bits(jnp.asarray(hf_up), norb))[0]
    b_hd = np.asarray(dets.to_bits(jnp.asarray(hf_dn), norb))[0]
    b_cu = np.asarray(dets.to_bits(jnp.asarray(cu), norb))
    b_cd = np.asarray(dets.to_bits(jnp.asarray(cd), norb))
    removed = (b_hu & ~b_cu) @ eps + (b_hd & ~b_cd) @ eps
    added = (~b_hu & b_cu) @ eps + (~b_hd & b_cd) @ eps
    den = removed - added
    ok = np.abs(den) > 1e-12
    e2 = float(np.sum(helem[ok] ** 2 / den[ok]))
    return e2, eps
