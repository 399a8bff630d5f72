"""Variational Monte Carlo for Gutzwiller-projected Slater wavefunctions
on the Hubbard lattice: psi(R) = g^{D(R)} det(Phi_up[R_up]) det(Phi_dn[R_dn]).

ref: hubbard.f90 wf_type 'gutz' machinery - set_gutzwiller:1432,
compute_vmc_energy_gutz_wf:1061, Sherman-Morrison determinant ratios
det_ratio_hubbard:4346, choose_random_electron:1027.

TPU-native design: the whole walker population advances in ONE jitted
program - electron positions [nw, ne], per-walker inverse Slater matrices
[nw, ne, ne] updated by vectorized Sherman-Morrison row replacements, and
the local energy evaluated batched over all electron hops.  No
per-walker host loops; Metropolis steps run under lax.fori_loop.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .meanfield import hopping_matrix


def neighbor_table(l_x: int, l_y: int, pbc: bool = True):
    """[nsites, 4] neighbor site ids (or -1 if not allowed): the four
    hop directions of the reference's get_nbr."""
    nsites = l_x * l_y
    nbr = -np.ones((nsites, 4), np.int32)

    def site(ix, iy):
        return ix * l_y + iy

    for ix in range(l_x):
        for iy in range(l_y):
            for d, (dx, dy) in enumerate(((1, 0), (-1, 0), (0, 1), (0, -1))):
                jx, jy = ix + dx, iy + dy
                ok = 0 <= jx < l_x and 0 <= jy < l_y
                if not ok and pbc:
                    # mirror make_hubbard_real_system: wrap only when the
                    # wrapped bond is not a duplicate of the open bond
                    if (dx and l_x > 2) or (dy and l_y > 2):
                        jx %= l_x
                        jy %= l_y
                        ok = True
                if ok:
                    nbr[site(ix, iy), d] = site(jx, jy)
    return nbr


class VmcState(NamedTuple):
    r_up: jnp.ndarray       # [nw, nup] electron sites
    r_dn: jnp.ndarray       # [nw, ndn]
    minv_up: jnp.ndarray    # [nw, nup, nup] inverse of Phi_up[r_up, :]
    minv_dn: jnp.ndarray
    key: jnp.ndarray


def _occ(r, nsites):
    """[nw, nsites] occupancy (0/1) from electron site lists."""
    nw = r.shape[0]
    out = jnp.zeros((nw, nsites), jnp.int32)
    return out.at[jnp.arange(nw)[:, None], r].set(1)


def _sm_row_update(minv, k, v):
    """Sherman-Morrison row replacement: row k of A becomes v.
    minv: [ne, ne]; returns (ratio, new_minv)."""
    vm = v @ minv                       # [ne]
    ratio = vm[k]
    corr = minv[:, k][:, None] * (vm[None, :] -
                                  jax.nn.one_hot(k, minv.shape[0],
                                                 dtype=minv.dtype))
    return ratio, minv - corr / ratio


def init_vmc(phi_up, phi_dn, l_x, l_y, n_walkers: int, seed: int = 0,
             pbc: bool = True):
    """Start walkers from random non-overlapping (per spin) positions with
    nonsingular Slater matrices."""
    nsites = l_x * l_y
    nup = phi_up.shape[1]
    ndn = phi_dn.shape[1]
    rng = np.random.default_rng(seed)
    r_up = np.empty((n_walkers, nup), np.int32)
    r_dn = np.empty((n_walkers, ndn), np.int32)
    for w in range(n_walkers):
        while True:
            ru = rng.choice(nsites, nup, replace=False)
            rd = rng.choice(nsites, ndn, replace=False)
            if (abs(np.linalg.det(phi_up[ru])) > 1e-10 and
                    abs(np.linalg.det(phi_dn[rd])) > 1e-10):
                r_up[w], r_dn[w] = np.sort(ru), np.sort(rd)
                break
    minv_up = np.linalg.inv(phi_up[r_up])
    minv_dn = np.linalg.inv(phi_dn[r_dn])
    return VmcState(jnp.asarray(r_up), jnp.asarray(r_dn),
                    jnp.asarray(minv_up), jnp.asarray(minv_dn),
                    jax.random.PRNGKey(seed))


def _local_energy_one(r_up, r_dn, minv_up, minv_dn, phi_up, phi_dn, nbr,
                      g, U, t, nsites):
    """E_L = U*D + sum_hops (-t) * psi(R')/psi(R) for one walker."""
    occ_u = jnp.zeros(nsites, jnp.int32).at[r_up].set(1)
    occ_d = jnp.zeros(nsites, jnp.int32).at[r_dn].set(1)
    D = jnp.sum(occ_u * occ_d)

    def hops(r, minv, phi, occ_same, occ_opp):
        ne = r.shape[0]
        sites = r[:, None]                         # [ne, 1]
        tgt = nbr[r]                               # [ne, 4]
        ok = (tgt >= 0) & (occ_same[jnp.clip(tgt, 0)] == 0)
        dD = jnp.where(ok, occ_opp[jnp.clip(tgt, 0)] -
                       occ_opp[sites], 0)
        # det ratio for electron k -> site tgt[k,d]: phi[tgt] @ minv[:,k]
        vr = phi[jnp.clip(tgt, 0)]                 # [ne, 4, ne_orb]
        ratio = jnp.einsum("kdo,ok->kd", vr, minv)
        amp = jnp.where(ok, (g ** dD) * ratio, 0.0)
        return jnp.sum(amp)

    kin = -t * (hops(r_up, minv_up, phi_up, occ_u, occ_d) +
                hops(r_dn, minv_dn, phi_dn, occ_d, occ_u))
    return U * D + kin


def _metropolis_step_one(key, r_up, r_dn, minv_up, minv_dn, phi_up,
                         phi_dn, nbr, g, nsites):
    nup = r_up.shape[0]
    ndn = r_dn.shape[0]
    k_e, k_d, k_a = jax.random.split(key, 3)
    ie = jax.random.randint(k_e, (), 0, nup + ndn)
    d = jax.random.randint(k_d, (), 0, 4)
    is_up = ie < nup
    k = jnp.where(is_up, ie, ie - nup)
    occ_u = jnp.zeros(nsites, jnp.int32).at[r_up].set(1)
    occ_d = jnp.zeros(nsites, jnp.int32).at[r_dn].set(1)
    src = jnp.where(is_up, r_up[jnp.clip(k, 0, nup - 1)],
                    r_dn[jnp.clip(k, 0, ndn - 1)])
    tgt = nbr[src, d]
    same = jnp.where(is_up, occ_u, occ_d)
    opp = jnp.where(is_up, occ_d, occ_u)
    ok = (tgt >= 0) & (same[jnp.clip(tgt, 0)] == 0)
    tgt_s = jnp.clip(tgt, 0)
    dD = opp[tgt_s] - opp[src]

    ru_up, new_minv_up = _sm_row_update(minv_up, jnp.clip(k, 0, nup - 1),
                                        phi_up[tgt_s])
    ru_dn, new_minv_dn = _sm_row_update(minv_dn, jnp.clip(k, 0, ndn - 1),
                                        phi_dn[tgt_s])
    ratio = jnp.where(is_up, ru_up, ru_dn) * g ** dD
    accept = ok & (jax.random.uniform(k_a, ()) < jnp.minimum(1.0, ratio ** 2))

    up_sel = accept & is_up
    dn_sel = accept & ~is_up
    r_up = jnp.where(up_sel, r_up.at[jnp.clip(k, 0, nup - 1)].set(tgt_s),
                     r_up)
    r_dn = jnp.where(dn_sel, r_dn.at[jnp.clip(k, 0, ndn - 1)].set(tgt_s),
                     r_dn)
    minv_up = jnp.where(up_sel, new_minv_up, minv_up)
    minv_dn = jnp.where(dn_sel, new_minv_dn, minv_dn)
    return r_up, r_dn, minv_up, minv_dn


@functools.partial(jax.jit, static_argnames=("nsteps", "nsites"))
def vmc_sweep(state: VmcState, phi_up, phi_dn, nbr, g, U, t,
              nsteps: int, nsites: int):
    """nsteps Metropolis steps for every walker + one local-energy
    measurement.  Returns (new_state, e_loc [nw])."""

    def body(i, st):
        r_up, r_dn, mu, md, key = st
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, r_up.shape[0])
        r_up, r_dn, mu, md = jax.vmap(
            _metropolis_step_one,
            in_axes=(0, 0, 0, 0, 0, None, None, None, None, None))(
                keys, r_up, r_dn, mu, md, phi_up, phi_dn, nbr, g, nsites)
        return VmcState(r_up, r_dn, mu, md, key)

    state = jax.lax.fori_loop(0, nsteps, body, state)
    e_loc = jax.vmap(_local_energy_one,
                     in_axes=(0, 0, 0, 0, None, None, None, None, None,
                              None, None))(
        state.r_up, state.r_dn, state.minv_up, state.minv_dn,
        phi_up, phi_dn, nbr, g, U, t, nsites)
    return state, e_loc


def run_vmc(l_x, l_y, t, U, nup, ndn, g: float, phi_up=None, phi_dn=None,
            n_walkers: int = 256, n_sweeps: int = 200, n_eq: int = 50,
            steps_per_sweep: int = 10, seed: int = 0, pbc: bool = True):
    """Gutzwiller VMC energy (mean, error) - ref
    compute_vmc_energy_gutz_wf (hubbard.f90:1061)."""
    if phi_up is None:
        from .meanfield import hartree_fock
        phi_up, phi_dn, _ = hartree_fock(l_x, l_y, t, U, nup, ndn, pbc)
    nsites = l_x * l_y
    nbr = jnp.asarray(neighbor_table(l_x, l_y, pbc))
    pu = jnp.asarray(phi_up)
    pd = jnp.asarray(phi_dn)
    state = init_vmc(np.asarray(phi_up), np.asarray(phi_dn), l_x, l_y,
                     n_walkers, seed, pbc)
    es = []
    for sweep in range(n_sweeps):
        state, e_loc = vmc_sweep(state, pu, pd, nbr, g, U, t,
                                 steps_per_sweep, nsites)
        if sweep >= n_eq:
            es.append(float(jnp.mean(e_loc)))
        if (sweep + 1) % 50 == 0:
            # refresh inverses to kill Sherman-Morrison drift
            mu = np.linalg.inv(np.asarray(pu)[np.asarray(state.r_up)])
            md = np.linalg.inv(np.asarray(pd)[np.asarray(state.r_dn)])
            state = state._replace(minv_up=jnp.asarray(mu),
                                   minv_dn=jnp.asarray(md))
    es = np.asarray(es)
    return float(es.mean()), float(es.std() / np.sqrt(max(len(es) - 1, 1)))


def exact_vmc_energy(l_x, l_y, t, U, nup, ndn, g, phi_up, phi_dn,
                     pbc: bool = True):
    """Brute-force <psi|H|psi>/<psi|psi> of the Gutzwiller wavefunction by
    full enumeration (small lattices; test oracle)."""
    import itertools
    nsites = l_x * l_y
    h = hopping_matrix(l_x, l_y, t, pbc)
    configs_u = list(itertools.combinations(range(nsites), nup))
    configs_d = list(itertools.combinations(range(nsites), ndn))

    def amp(u, d):
        D = len(set(u) & set(d))
        return (g ** D * np.linalg.det(phi_up[list(u)]) *
                np.linalg.det(phi_dn[list(d)]))

    # dense H in the (u, d) ordered basis with fermion signs from the
    # position-ordered convention
    num = 0.0
    den = 0.0
    psi = {}
    for u in configs_u:
        for d in configs_d:
            psi[(u, d)] = amp(u, d)
    for (u, d), a in psi.items():
        den += a * a
        num += a * a * U * len(set(u) & set(d))
        # hopping: move one electron, sign = (-1)^(crossings)
        for spin, occ in ((0, u), (1, d)):
            for k, s in enumerate(occ):
                for s2 in range(nsites):
                    if h[s, s2] == 0 or s2 in occ:
                        continue
                    new = sorted(occ[:k] + occ[k + 1:] + (s2,))
                    # fermion sign: permutation parity of reinsertion
                    pos_new = new.index(s2)
                    sign = (-1) ** (k + pos_new)
                    b = psi[(tuple(new), d)] if spin == 0 else \
                        psi[(u, tuple(new))]
                    num += a * h[s, s2] * sign * b
    return num / den
