"""FermionSystem: the uniform per-system interface.

The reference exposes one module per physics model with a uniform surface
(read_X / system_setup_X / hamiltonian_X / off_diagonal_move_X /
find_important_connected_dets_X / energy_pieces_X; SURVEY.md L3).  Here every
second-quantized system reduces to an IntegralTable (+ heat-bath tables), so
the algorithm layer (HCI, PT, Davidson, SQMC walk) is system-agnostic; only
construction differs (FCIDUMP for chem, analytic momentum integrals for HEG,
lattice hoppings for Hubbard-k).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .. import dets
from .chem.integrals import IntegralTable
from .heatbath import HeatbathTable, build_heatbath


@dataclasses.dataclass
class FermionSystem:
    name: str
    norb: int
    nup: int
    ndn: int
    table: IntegralTable
    heatbath: HeatbathTable | None
    orb_sym_arr: jnp.ndarray        # int32 [norb] irrep labels (1-based)
    has_singles: bool               # False when singles vanish (HEG)
    hf_up: np.ndarray               # packed words [W]
    hf_dn: np.ndarray
    extra: dict
    time_sym: bool = False          # time-reversal symmetrized basis
    z: int = 1                      # +1 singlet-like / -1 triplet-like

    @property
    def nelec(self):
        return self.nup + self.ndn

    @property
    def n_words(self):
        return dets.n_words(self.norb)

    def hf_det(self):
        return self.hf_up.copy(), self.hf_dn.copy()


def make_chem_system(fcidump_path: str, nup: int | None = None,
                     ndn: int | None = None, reorder: bool = True,
                     with_heatbath: bool = True, time_sym: bool = False,
                     z: int = 1, point_group: str | None = None,
                     hf_symmetry: int | None = None,
                     hf_up_occ_in=None, hf_dn_occ_in=None) -> FermionSystem:
    """Molecular system from an FCIDUMP (ref workload: chemistry.f90).

    hf_symmetry: if given, re-pick the starting det as the lowest-diagonal
    det of that spatial irrep within CISD of the aufbau det (ref:
    auto_assign_hci0_occs / find_lowest_energy_det_in_cisd
    chemistry.f90:10359,10457).
    hf_up_occ_in/hf_dn_occ_in: explicit starting-det occupations (1-based
    ORIGINAL orbital labels, the reference's `&hf_det up=... dn=...`
    namelist; mapped through the reordering permutation).
    """
    from .chem.fcidump import load_fcidump_system

    table, hf_up_occ, hf_dn_occ, info = load_fcidump_system(
        fcidump_path, nup=nup, ndn=ndn, reorder=reorder)
    if hf_up_occ_in is not None:
        perm = np.asarray(info["perm"])       # perm[new] = original index
        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm))      # original -> new

        def _map(orbs):
            return np.sort(inv[np.asarray(orbs, np.int64) - 1])

        hf_up_occ = _map(hf_up_occ_in)
        hf_dn_occ = _map(hf_dn_occ_in if hf_dn_occ_in is not None
                         else hf_up_occ_in)
    hf_up = dets.det_from_orbs(hf_up_occ, table.norb)
    hf_dn = dets.det_from_orbs(hf_dn_occ, table.norb)
    hb = build_heatbath(table) if with_heatbath else None
    system = FermionSystem(
        name="chem", norb=table.norb, nup=info["nup"], ndn=info["ndn"],
        table=table, heatbath=hb,
        orb_sym_arr=jnp.asarray(table.orb_sym.astype(np.int32)),
        has_singles=True, hf_up=hf_up, hf_dn=hf_dn,
        extra=dict(info=info), time_sym=time_sym, z=z,
    )
    if point_group is not None:
        from .chem.pointgroup import PointGroup
        system.extra["point_group"] = PointGroup(point_group, table.orb_sym)
    if hf_symmetry is not None:
        assign_hf_by_symmetry(system, hf_symmetry)
    if time_sym:
        if z < 0 and np.array_equal(system.hf_up, system.hf_dn):
            raise ValueError(
                "triplet (z=-1) run starting from a self-symmetric det; "
                "specify hf_symmetry to pick an open-shell start "
                "(ref: chemistry.f90 singlet/triplet error)")
        # representative orientation: up <= dn by det key
        from ..ops import setalg
        if setalg.keys_less(system.hf_dn[None], system.hf_up[None],
                            system.hf_up[None], system.hf_dn[None])[0]:
            system.hf_up, system.hf_dn = system.hf_dn, system.hf_up
    return system


def assign_hf_by_symmetry(system: FermionSystem, hf_symmetry: int):
    """Replace the starting det by the lowest-diagonal det with the target
    spatial irrep, searched within CISD of the aufbau det."""
    from .chem.pointgroup import PointGroup
    from .chem import slater
    import jax.numpy as _jnp

    pg = system.extra.get("point_group")
    if pg is None:
        raise ValueError("assign_hf_by_symmetry needs a point_group")
    # candidates: aufbau det + ALL singles/doubles regardless of symmetry
    # (the heat-bath generator is symmetry-filtered, so enumerate directly)
    from itertools import combinations

    norb = system.norb
    occ_u = dets.orbs_from_det(system.hf_up, norb)
    occ_d = dets.orbs_from_det(system.hf_dn, norb)
    virt_u = [o for o in range(norb) if o not in occ_u]
    virt_d = [o for o in range(norb) if o not in occ_d]
    cands = [(tuple(occ_u), tuple(occ_d))]
    for p in occ_u:
        for r in virt_u:
            cands.append((tuple(sorted(set(occ_u) - {p} | {r})), tuple(occ_d)))
    for p in occ_d:
        for r in virt_d:
            cands.append((tuple(occ_u), tuple(sorted(set(occ_d) - {p} | {r}))))
    for p, q in combinations(occ_u, 2):
        for r, s in combinations(virt_u, 2):
            cands.append((tuple(sorted(set(occ_u) - {p, q} | {r, s})),
                          tuple(occ_d)))
    for p, q in combinations(occ_d, 2):
        for r, s in combinations(virt_d, 2):
            cands.append((tuple(occ_u),
                          tuple(sorted(set(occ_d) - {p, q} | {r, s}))))
    for p in occ_u:
        for r in virt_u:
            for q in occ_d:
                for s in virt_d:
                    cands.append((tuple(sorted(set(occ_u) - {p} | {r})),
                                  tuple(sorted(set(occ_d) - {q} | {s}))))
    cu = np.stack([dets.det_from_orbs(u, norb) for u, _ in cands])
    cd = np.stack([dets.det_from_orbs(d, norb) for _, d in cands])
    bu = dets.to_bits(jnp.asarray(cu), system.norb)
    bd = dets.to_bits(jnp.asarray(cd), system.norb)
    diag = np.asarray(slater.diag_elements(system.table, bu, bd))
    # spatial symmetry of each candidate
    sym_pow = np.asarray(pg.orb_sym)
    bu_np = np.asarray(bu)
    bd_np = np.asarray(bd)
    syms = np.ones(len(cu), dtype=np.int64)
    for o in range(system.norb):
        occ_cnt = bu_np[:, o].astype(np.int64) + bd_np[:, o]
        both = occ_cnt % 2 == 1   # doubly occupied contributes identity
        syms = np.where(both, pg.product(syms, sym_pow[o]), syms)
    ok = syms == hf_symmetry
    if not ok.any():
        raise ValueError(f"no CISD det with symmetry {hf_symmetry}")
    best = np.argmin(np.where(ok, diag, np.inf))
    system.hf_up = cu[best]
    system.hf_dn = cd[best]
