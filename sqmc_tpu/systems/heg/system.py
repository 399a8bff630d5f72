"""Homogeneous electron gas (2D/3D plane-wave basis).

Re-design of the reference's heg.f90 (read_heg:102, generate_k_vectors:643,
hamiltonian_heg:845, madelung_energy:2828): instead of bespoke matrix-element
code, the HEG is expressed EXACTLY as a molecular-type system through its
analytic integrals,

    h[p,q]   = delta_pq * |k_p|^2 / 2
    (pq|rs)  = V(k_p - k_q) * delta_{k_p - k_q, k_s - k_r}   (V(0) -> 0)

with V(t) = 4pi/(L^3 t^2) in 3D and 2pi/(L^2 |t|) in 2D; the zero-transfer
component is dropped (neutralizing background).  Plane waves are complex, so
the 8-fold-symmetric compact ERI array does NOT apply; the IntegralTable HEG
backend evaluates (pq|rs) analytically on the fly (integrals.py from_heg).
Consequences reproduced for free by the generic Slater-Condon kernels:
  * diagonal = kinetic - same-spin exchange sum (direct (pp|qq) = 0),
  * single excitations vanish identically,
  * doubles conserve momentum.
The generic heat-bath tables then have <= norb entries per pair (s is
determined by r through momentum conservation) - the analog of the
reference's momentum-transfer-keyed dtm_hb (heg.f90:243).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..base import FermionSystem
from ..chem.integrals import IntegralTable
from ..heatbath import build_heatbath
from ... import dets

EPS = 1e-10


def generate_k_vectors(n_dim: int, length_cell: float, cutoff_radius: float):
    """All integer k-vectors with |n| <= cutoff_radius, sorted by |k|
    (ref: heg.f90:643).  Returns (k_phys [norb,n_dim], k_rel int [norb,n_dim])."""
    n_max = int(cutoff_radius + EPS)
    rng = np.arange(-n_max, n_max + 1)
    if n_dim == 3:
        grids = np.meshgrid(rng, rng, rng, indexing="ij")
    elif n_dim == 2:
        grids = np.meshgrid(rng, rng, indexing="ij")
    else:
        raise ValueError("only 2D and 3D HEG")
    rel = np.stack([g.ravel() for g in grids], axis=1)
    mag2 = np.sum(rel * rel, axis=1)
    keep = mag2 <= cutoff_radius * cutoff_radius + EPS
    rel = rel[keep]
    mag2 = mag2[keep]
    order = np.argsort(mag2, kind="stable")
    rel = rel[order]
    k = rel * (2 * np.pi / length_cell)
    return k, rel


def madelung_energy(n_dim: int, length_cell: float, nelec: int) -> float:
    """Ewald self-interaction constant (3D only; ref: heg.f90:2828).

    The reference hard-stops for n_dim /= 3 (heg.f90:2845); we raise the
    equivalent error and let make_heg_system record the absence explicitly
    instead of silently folding a 0 into "total incl. Madelung" lines."""
    if n_dim != 3:
        raise ValueError(
            "Madelung energy is only implemented for 3D (ref heg.f90:2845)")
    kappa = 10.0 / length_cell
    n_max = 1
    while True:
        g_max = 2 * np.pi * n_max / length_cell
        if 4 * np.pi / length_cell**3 * np.exp(-(g_max / (2 * kappa))**2) / g_max**2 < 1e-10:
            break
        n_max += 1
    rng = np.arange(-n_max, n_max + 1)
    gx, gy, gz = np.meshgrid(rng, rng, rng, indexing="ij")
    g2 = (gx**2 + gy**2 + gz**2).astype(np.float64) * (2 * np.pi / length_cell) ** 2
    g2 = g2[g2 > 1e-10]
    e = np.sum(np.exp(-g2 / (2 * kappa) ** 2) / g2) * 4 * np.pi / length_cell**3
    e = e - np.pi / length_cell**3 / kappa**2 - 2 * kappa / np.sqrt(np.pi)
    return float(e * nelec / 2.0)


def make_heg_system(n_dim: int, r_s: float, nelec: int, nup: int,
                    cutoff_radius: float, with_heatbath: bool = True) -> FermionSystem:
    """Build the HEG as a FermionSystem with analytic integrals."""
    ndn = nelec - nup
    if n_dim == 2:
        density = 1.0 / (np.pi * r_s**2)
    else:
        density = 3.0 / (4.0 * np.pi * r_s**3)
    length_cell = (nelec / density) ** (1.0 / n_dim)

    k, k_rel = generate_k_vectors(n_dim, length_cell, cutoff_radius)
    norb = len(k)

    dk = k[:, None, :] - k[None, :, :]
    dk2 = np.sum(dk * dk, axis=-1)
    with np.errstate(divide="ignore"):
        if n_dim == 3:
            V = 4 * np.pi / (length_cell**3 * dk2)
        else:
            V = 2 * np.pi / (length_cell**2 * np.sqrt(dk2))
    np.fill_diagonal(V, 0.0)

    h = np.diag(0.5 * np.sum(k * k, axis=1))
    table = IntegralTable.from_heg(h, V, k_rel)

    hf_up = dets.det_from_orbs(range(nup), norb)
    hf_dn = dets.det_from_orbs(range(ndn), norb)
    hb = build_heatbath(table) if with_heatbath else None

    # HF energy (kinetic + exchange) and Madelung for reporting
    u = np.zeros(norb); u[:nup] = 1
    d = np.zeros(norb); d[:ndn] = 1
    X = np.asarray(table.exchange)
    e_kin = float(np.sum((u + d) * np.diag(h)))
    e_x = float(-0.5 * (u @ X @ u) - 0.5 * (d @ X @ d))
    # madelung_implemented=False (2D) means energy_madelung carries NO
    # physics and must not be folded into "incl. Madelung" totals
    madelung_ok = n_dim == 3
    e_mad = madelung_energy(n_dim, length_cell, nelec) if madelung_ok else 0.0

    return FermionSystem(
        name="heg", norb=norb, nup=nup, ndn=ndn, table=table, heatbath=hb,
        orb_sym_arr=jnp.asarray(np.ones(norb, np.int32)),
        has_singles=False, hf_up=hf_up, hf_dn=hf_dn,
        extra=dict(n_dim=n_dim, r_s=r_s, length_cell=length_cell,
                   k_vectors=k, k_rel=k_rel, energy_hf=e_kin + e_x,
                   energy_madelung=e_mad, madelung_implemented=madelung_ok),
    )
