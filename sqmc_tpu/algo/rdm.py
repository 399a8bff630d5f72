"""One-body reduced density matrix, natural orbitals, and the natural-orbital
FCIDUMP rewrite.

Re-design of get_1rdm / generate_natorb_integrals (ref: hci.f90:3198, :3554):
the RDM accumulates over single-excitation det pairs found by the same
sort-join used for the sparse Hamiltonian; natural orbitals diagonalize the
RDM within irrep blocks (preserving symmetry labels); the integral rotation
is a dense einsum.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import dets as dets_mod
from ..systems.chem.integrals import IntegralTable, n_eri, pair_index, quad_index
from .sparseham import connected_pairs


def get_1rdm(system, up: np.ndarray, dn: np.ndarray, wts: np.ndarray,
             batch: int = 1 << 18) -> np.ndarray:
    """Spin-summed 1-RDM gamma[p,q] of a CI wavefunction (host numpy +
    batched device kernels)."""
    norb = system.norb
    n = len(up)
    bu = np.asarray(dets_mod.to_bits(jnp.asarray(up), norb))
    bd = np.asarray(dets_mod.to_bits(jnp.asarray(dn), norb))

    gamma = np.zeros((norb, norb))
    # diagonal
    occ = (bu + bd).astype(np.float64)
    gamma[np.diag_indices(norb)] = (wts[:, None] ** 2 * occ).sum(axis=0)

    # single-excitation pairs
    a, b = connected_pairs(up, dn, system.nup, system.ndn, norb)
    for beg in range(0, len(a), batch):
        ai = a[beg:beg + batch]
        bi = b[beg:beg + batch]
        du = bu[ai] ^ bu[bi]
        dd = bd[ai] ^ bd[bi]
        n_up = du.sum(axis=1) // 2
        n_dn = dd.sum(axis=1) // 2
        sing_up = (n_up == 1) & (n_dn == 0)
        sing_dn = (n_dn == 1) & (n_up == 0)
        sel = sing_up | sing_dn
        if not sel.any():
            continue
        ai, bi = ai[sel], bi[sel]
        du, dd = du[sel], dd[sel]
        u_sel = sing_up[sel]
        diff = np.where(u_sel[:, None], du, dd)
        src_bits = np.where(u_sel[:, None], bu[ai], bd[ai])
        # p occupied in i, q occupied in j
        pos = np.argsort(~(diff > 0), axis=1, kind="stable")[:, :2]
        p1, p2 = pos[:, 0], pos[:, 1]
        p_in_i = src_bits[np.arange(len(ai)), p1] > 0
        p = np.where(p_in_i, p1, p2)
        q = np.where(p_in_i, p2, p1)
        # fermion sign: parity of occupied between p and q in the source
        pref = np.cumsum(src_bits, axis=1) - src_bits
        lo = np.minimum(p, q)
        hi = np.maximum(p, q)
        cnt = pref[np.arange(len(ai)), hi] - pref[np.arange(len(ai)), lo] \
            - (src_bits[np.arange(len(ai)), lo] * 0 + 1) * ((p >= lo) & (p < hi))
        sign = np.where(cnt % 2 == 0, 1.0, -1.0)
        val = wts[ai] * wts[bi] * sign
        np.add.at(gamma, (p, q), val)
        np.add.at(gamma, (q, p), val)
    return gamma


def natural_orbitals(gamma: np.ndarray, orb_sym: np.ndarray):
    """Diagonalize the RDM within irrep blocks; returns (occupations,
    rotation U [norb, norb]) with descending occupation inside each block."""
    norb = gamma.shape[0]
    U = np.zeros((norb, norb))
    occs = np.zeros(norb)
    for irrep in np.unique(orb_sym):
        idx = np.nonzero(orb_sym == irrep)[0]
        block = gamma[np.ix_(idx, idx)]
        w, v = np.linalg.eigh(block)
        order = np.argsort(-w)
        w, v = w[order], v[:, order]
        occs[idx] = w
        U[np.ix_(idx, idx)] = v
    return occs, U


def rotate_integrals(table: IntegralTable, U: np.ndarray) -> tuple:
    """Rotate h and the compact ERI into a new orbital basis (dense einsum).
    Returns (h2, eri2_compact)."""
    norb = table.norb
    h2 = U.T @ np.asarray(table.h) @ U
    # dense 4-index tensor from the compact array
    p = np.arange(norb)
    P, Q, R, S = np.meshgrid(p, p, p, p, indexing="ij")
    eri_np = np.asarray(table.eri)
    V = eri_np[quad_index(pair_index(P, Q), pair_index(R, S))]
    V = np.einsum("pi,pqrs->iqrs", U, V, optimize=True)
    V = np.einsum("qj,iqrs->ijrs", U, V, optimize=True)
    V = np.einsum("rk,ijrs->ijks", U, V, optimize=True)
    V = np.einsum("sl,ijks->ijkl", U, V, optimize=True)
    out = np.zeros(n_eri(norb))
    out[quad_index(pair_index(P, Q), pair_index(R, S))] = V
    return h2, out


def write_fcidump(path: str, h: np.ndarray, eri_compact: np.ndarray,
                  core: float, orb_sym: np.ndarray, nelec: int, ms2: int = 0,
                  thresh: float = 1e-12):
    """Write a Molpro-format FCIDUMP (the natural-orbital restart file;
    ref: hci.f90 FCIDUMP.natorb)."""
    norb = h.shape[0]
    with open(path, "w") as f:
        f.write(f" &FCI NORB={norb},NELEC={nelec},MS2={ms2},\n")
        f.write("  ORBSYM=" + ",".join(str(int(s)) for s in orb_sym) + ",\n")
        f.write("  ISYM=1,\n &END\n")
        for pq in range(norb * (norb + 1) // 2):
            pass
        # two-body: unique 8-fold entries
        for p_ in range(norb):
            for q_ in range(p_ + 1):
                for r_ in range(p_ + 1):
                    smax = q_ if r_ == p_ else r_
                    for s_ in range(smax + 1):
                        v = eri_compact[quad_index(pair_index(p_, q_),
                                                   pair_index(r_, s_))]
                        if abs(v) > thresh:
                            f.write(f"{v:23.16e} {p_ + 1:3d} {q_ + 1:3d} "
                                    f"{r_ + 1:3d} {s_ + 1:3d}\n")
        for p_ in range(norb):
            for q_ in range(p_ + 1):
                if abs(h[p_, q_]) > thresh:
                    f.write(f"{h[p_, q_]:23.16e} {p_ + 1:3d} {q_ + 1:3d}   0   0\n")
        f.write(f"{core:23.16e}   0   0   0   0\n")


def generate_natorb_fcidump(system, up, dn, wts, path: str, nelec: int):
    """Full pipeline: 1-RDM -> natural orbitals -> rotated FCIDUMP."""
    gamma = get_1rdm(system, up, dn, wts)
    occs, U = natural_orbitals(gamma, np.asarray(system.table.orb_sym))
    h2, eri2 = rotate_integrals(system.table, U)
    write_fcidump(path, h2, eri2, system.table.core_energy,
                  np.asarray(system.table.orb_sym), nelec)
    return occs, U


def first_order_pt_vector(system, up, dn, wts, var_energy: float,
                          eps_pt_big: float):
    """PT dets outside the variational space with first-order coefficients
    c_a = sum_j H_aj c_j / (E_var - H_aa), |H_aj c_j| screened at
    eps_pt_big (the deterministic part of the reference's semistochastic
    split; ref: hci.f90 get_1rdm_with_pt:3400-3470)."""
    from .connect import generate_connections
    from .pt import _diag_elements_np
    from ..ops import setalg

    coeffs = np.where(np.abs(wts) == 0.0, 1e-300, np.abs(wts))
    cu, cd, h, ref = generate_connections(system, up, dn,
                                          eps_pt_big / coeffs)
    contrib = h * wts[ref]
    cu_u, cd_u, (num,), _ = setalg.unique_dets(cu, cd, [contrib])
    ext = setalg.setdiff_dets(cu_u, cd_u, up, dn)
    cu_e, cd_e, num_e = cu_u[ext], cd_u[ext], num[ext]
    diag_e = _diag_elements_np(system.table, cu_e, cd_e, system.norb,
                               time_sym=system.time_sym, z=system.z)
    c1 = num_e / (var_energy - diag_e)
    return cu_e, cd_e, c1


def get_1rdm_with_pt(system, up, dn, wts, var_energy: float,
                     eps_pt_big: float) -> np.ndarray:
    """1-RDM to lowest nonzero order in PT:
    <psi|rho|psi> ~ <psi0|rho|psi0> + 2 <psi0|rho|psi1>
    (ref: get_1rdm_with_pt, hci.f90:3400)."""
    from .sparseham import connected_pairs

    gamma = get_1rdm(system, up, dn, wts)
    pu, pd, c1 = first_order_pt_vector(system, up, dn, wts, var_energy,
                                       eps_pt_big)
    if len(pu) == 0:
        return gamma
    norb = system.norb
    n0 = len(up)
    # cross transition RDM: join var + pt lists, keep only cross pairs
    all_up = np.concatenate([up, pu])
    all_dn = np.concatenate([dn, pd])
    all_c = np.concatenate([wts, c1])
    a, b = connected_pairs(all_up, all_dn, system.nup, system.ndn, norb)
    cross = ((a < n0) & (b >= n0)) | ((a >= n0) & (b < n0))
    a, b = a[cross], b[cross]

    bu = np.asarray(dets_mod.to_bits(jnp.asarray(all_up), norb))
    bd = np.asarray(dets_mod.to_bits(jnp.asarray(all_dn), norb))
    du = bu[a] ^ bu[b]
    dd = bd[a] ^ bd[b]
    n_up = du.sum(axis=1) // 2
    n_dn = dd.sum(axis=1) // 2
    sing_up = (n_up == 1) & (n_dn == 0)
    sing_dn = (n_dn == 1) & (n_up == 0)
    sel = sing_up | sing_dn
    a, b = a[sel], b[sel]
    du, dd = du[sel], dd[sel]
    u_sel = sing_up[sel]
    diff = np.where(u_sel[:, None], du, dd)
    src_bits = np.where(u_sel[:, None], bu[a], bd[a])
    pos = np.argsort(~(diff > 0), axis=1, kind="stable")[:, :2]
    p1, p2 = pos[:, 0], pos[:, 1]
    p_in_i = src_bits[np.arange(len(a)), p1] > 0
    p = np.where(p_in_i, p1, p2)
    q = np.where(p_in_i, p2, p1)
    pref = np.cumsum(src_bits, axis=1) - src_bits
    lo = np.minimum(p, q)
    hi = np.maximum(p, q)
    cnt = pref[np.arange(len(a)), hi] - pref[np.arange(len(a)), lo] \
        - ((p >= lo) & (p < hi)).astype(np.int64)
    sign = np.where(cnt % 2 == 0, 1.0, -1.0)
    val = all_c[a] * all_c[b] * sign          # each cross pair once per
    np.add.at(gamma, (p, q), val)             # orientation: the factor 2
    np.add.at(gamma, (q, p), val)             # of 2<psi0|rho|psi1>
    return gamma


def expand_time_symmetrized(up, dn, wts, z: int = 1):
    """Convert a time-symmetrized wavefunction (representatives with
    up <= dn) to the plain determinant basis (ref:
    convert_time_symmetrized_to_dets, hci.f90:4365):
    |rep_ts> = (|up,dn> + z |dn,up>)/sqrt2 for up != dn, |up,up> as-is.

    Returns (up2, dn2, wts2) sorted by det key."""
    from ..ops import setalg

    up = np.asarray(up)
    dn = np.asarray(dn)
    wts = np.asarray(wts, np.float64)
    sym = np.all(up == dn, axis=1)
    s2 = 1.0 / np.sqrt(2.0)
    u_out = [up[sym], up[~sym], dn[~sym]]
    d_out = [dn[sym], dn[~sym], up[~sym]]
    w_out = [wts[sym], wts[~sym] * s2, z * wts[~sym] * s2]
    up2 = np.concatenate(u_out)
    dn2 = np.concatenate(d_out)
    w2 = np.concatenate(w_out)
    order = setalg.lexsort_dets(up2, dn2)
    return up2[order], dn2[order], w2[order]
