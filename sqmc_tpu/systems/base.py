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
                     with_heatbath: bool = True) -> FermionSystem:
    """Molecular system from an FCIDUMP (ref workload: chemistry.f90)."""
    from .chem.fcidump import load_fcidump_system

    table, hf_up_occ, hf_dn_occ, info = load_fcidump_system(
        fcidump_path, nup=nup, ndn=ndn, reorder=reorder)
    W = dets.n_words(table.norb)
    hf_up = dets.det_from_orbs(hf_up_occ, table.norb)
    hf_dn = dets.det_from_orbs(hf_dn_occ, table.norb)
    hb = build_heatbath(table) if with_heatbath else None
    return FermionSystem(
        name="chem", norb=table.norb, nup=info["nup"], ndn=info["ndn"],
        table=table, heatbath=hb,
        orb_sym_arr=jnp.asarray(table.orb_sym.astype(np.int32)),
        has_singles=True, hf_up=hf_up, hf_dn=hf_dn,
        extra=dict(info=info),
    )
