"""FCIDUMP reader + HF-aware orbital reordering.

Mirrors the behavior of the reference's read_integrals + sort_integrals
(ref: chemistry.f90:538-872, :8921 sort_integrals, :9155
compute_orbital_energies): integrals are read into the 8-fold compact array,
orbitals are reordered by an estimated orbital energy with HF-occupied
orbitals first, and the HF determinant is re-expressed in the new labels.
The reordering makes the HF det the lowest `nup`/`ndn` bits, which the HCI
driver relies on, and puts energetically similar orbitals next to each other
(better heat-bath table locality on device).
"""

from __future__ import annotations

import dataclasses
import re

import numpy as np

from .integrals import IntegralTable, n_eri, pair_index, quad_index


@dataclasses.dataclass
class FCIDumpData:
    norb: int
    nelec: int
    ms2: int
    orb_sym: np.ndarray           # int32 [norb], 1-based irrep labels
    h: np.ndarray                 # float64 [norb, norb]
    eri: np.ndarray               # float64 compact 8-fold
    core_energy: float
    hf_up_orbs: np.ndarray | None  # optional 0-based occupied lists from header
    hf_dn_orbs: np.ndarray | None


def read_fcidump(path: str) -> FCIDumpData:
    """Parse an FCIDUMP file (Molpro format, as consumed by the reference).

    Header: &FCI NORB=..,NELEC=..,MS2=.., ORBSYM=..., ISYM=.., [optional
    hf_up / hf_dn occupation lines] ... &END.  Body lines: value p q r s
    (1-based); p q 0 0 -> one-body h_pq; 0 0 0 0 -> core energy.

    Small |value|<=1e-9 entries do NOT overwrite existing ones, matching the
    reference's guard against zeroing D-inf-h-permuted duplicates
    (ref: chemistry.f90:683).
    """
    with open(path) as f:
        text = f.read()

    # --- header ---
    m = re.search(r"&FCI(.*?)(?:&END|/)", text, re.S | re.I)
    if not m:
        raise ValueError(f"no &FCI header in {path}")
    header = m.group(1)
    end = m.end()

    def _get_int(name, default=None):
        mm = re.search(rf"{name}\s*=\s*(\d+)", header, re.I)
        if mm:
            return int(mm.group(1))
        if default is None:
            raise ValueError(f"missing {name} in FCIDUMP header")
        return default

    norb = _get_int("NORB")
    nelec = _get_int("NELEC")
    ms2 = _get_int("MS2", 0)
    mm = re.search(r"ORBSYM\s*=\s*([\d,\s]+)", header, re.I)
    orb_sym = np.array([int(x) for x in mm.group(1).replace(",", " ").split()][:norb],
                       dtype=np.int32) if mm else np.ones(norb, dtype=np.int32)

    hf_up = hf_dn = None
    mm = re.search(r"^\s*([\d\s]+?)\s*hf_up", header, re.M)
    if mm:
        hf_up = np.array([int(x) - 1 for x in mm.group(1).split()], dtype=np.int32)
    mm = re.search(r"^\s*([\d\s]+?)\s*hf_dn", header, re.M)
    if mm:
        hf_dn = np.array([int(x) - 1 for x in mm.group(1).split()], dtype=np.int32)

    # --- body ---
    body = text[end:]
    from ...native import parse_records
    rec = parse_records(body.encode())
    if rec is not None:
        vals, idx = rec
        p = idx[:, 0].astype(np.int64)
        q = idx[:, 1].astype(np.int64)
        r = idx[:, 2].astype(np.int64)
        s = idx[:, 3].astype(np.int64)
    else:
        toks = body.split()
        vals = np.array(toks[0::5], dtype=np.float64)
        p = np.array(toks[1::5], dtype=np.int64)
        q = np.array(toks[2::5], dtype=np.int64)
        r = np.array(toks[3::5], dtype=np.int64)
        s = np.array(toks[4::5], dtype=np.int64)

    h = np.zeros((norb, norb), dtype=np.float64)
    eri = np.zeros(n_eri(norb), dtype=np.float64)
    core = 0.0

    two = (p > 0) & (q > 0) & (r > 0) & (s > 0)
    one = (p > 0) & (q > 0) & ~two
    zero = p == 0

    # core energy: the 0 0 0 0 line
    for v in vals[zero & (q == 0) & (r == 0) & (s == 0)]:
        core = float(v)

    # one-body
    hp, hq, hv = p[one] - 1, q[one] - 1, vals[one]
    keep = np.abs(hv) > 1e-9
    h[hp[keep], hq[keep]] = hv[keep]
    h[hq[keep], hp[keep]] = hv[keep]

    # two-body
    tp, tq, tr, ts, tv = p[two] - 1, q[two] - 1, r[two] - 1, s[two] - 1, vals[two]
    idx = quad_index(pair_index(tp, tq), pair_index(tr, ts))
    keep = np.abs(tv) > 1e-9
    eri[idx[keep]] = tv[keep]

    return FCIDumpData(norb=norb, nelec=nelec, ms2=ms2, orb_sym=orb_sym, h=h,
                       eri=eri, core_energy=core, hf_up_orbs=hf_up,
                       hf_dn_orbs=hf_dn)


def orbital_energies(h: np.ndarray, eri: np.ndarray, hf_up_occ: np.ndarray,
                     hf_dn_occ: np.ndarray) -> np.ndarray:
    """Reference's estimated orbital energies (chemistry.f90:9155):

    e_i = h_ii + 1/2 * [ sum_{j occ(up+dn), j!=i} ((ii|jj) - (ij|ji))
                         + sum over all direct terms as coded ]

    Concretely, following the Fortran exactly:
      exchange_i = - sum_{j!=i, j in up} (ij|ji) - sum_{j!=i, j in dn} (ij|ji)
      direct_i   =   sum_{j!=i, j in up} (ii|jj) + sum_{j in dn} (ii|jj)
                   + sum_{j!=i, j in dn} (ii|jj) + sum_{j in up} (ii|jj)
      e_i = h_ii + (exchange_i + direct_i)/2
    """
    norb = h.shape[0]
    pidx = np.arange(norb)
    diag_pair = pair_index(pidx, pidx)
    D = eri[quad_index(diag_pair[:, None], diag_pair[None, :])]
    pq = pair_index(pidx[:, None], pidx[None, :])
    X = eri[quad_index(pq, pq)]

    up_occ = np.zeros(norb)
    up_occ[hf_up_occ] = 1.0
    dn_occ = np.zeros(norb)
    dn_occ[hf_dn_occ] = 1.0

    e = np.diag(h).copy()
    for i in range(norb):
        exch = -(np.dot(X[i], up_occ) - X[i, i] * up_occ[i]) \
               - (np.dot(X[i], dn_occ) - X[i, i] * dn_occ[i])
        # direct as in the Fortran: up-up and dn-dn exclude j==i; the
        # cross-spin sums include j==i
        dir_ = (np.dot(D[i], up_occ) - D[i, i] * up_occ[i]) \
             + np.dot(D[i], dn_occ) \
             + (np.dot(D[i], dn_occ) - D[i, i] * dn_occ[i]) \
             + np.dot(D[i], up_occ)
        e[i] += 0.5 * (exch + dir_)
    return e


def reorder_orbitals(data: FCIDumpData, hf_up_occ: np.ndarray,
                     hf_dn_occ: np.ndarray):
    """Reorder orbitals as in sort_integrals (chemistry.f90:8921):
    HF-occupied orbitals first, then by ascending estimated orbital energy.
    Stable within ties by original label (the Fortran picks the first min).

    Returns (perm, h2, eri2, orb_sym2, new_hf_up_occ, new_hf_dn_occ, orb_e)
    where perm[new] = old label, integrals/symmetries are permuted, and the HF
    occupations are re-expressed in new labels.
    """
    norb = data.norb
    orb_e = orbital_energies(data.h, data.eri, hf_up_occ, hf_dn_occ)
    keyed = orb_e.copy()
    occ_any = np.zeros(norb, dtype=bool)
    occ_any[hf_up_occ] = True
    keyed[hf_up_occ] -= 1e9
    dn_extra = np.asarray(hf_dn_occ)
    keyed[dn_extra] -= 1e9
    # stable sort by (keyed, original index) == Fortran's first-minimum scan
    perm = np.argsort(keyed, kind="stable")
    inv = np.empty(norb, dtype=np.int64)
    inv[perm] = np.arange(norb)

    h2 = data.h[np.ix_(perm, perm)]
    # permute compact eri: build index map via dense gather
    pidx = np.arange(norb)
    P, Q = np.meshgrid(pidx, pidx, indexing="ij")
    # new (p,q,r,s) -> old (perm[p], perm[q], perm[r], perm[s])
    # Permute by materializing only the compact set: iterate over compact
    # indices vectorized.
    npair = norb * (norb + 1) // 2
    tri_p, tri_q = np.tril_indices(norb)  # p>=q pairs in pair_index order?
    # pair_index(a,b) = hi*(hi+1)/2+lo; enumerate (hi,lo) with hi>=lo:
    hi, lo = tri_p, tri_q  # tril gives row>=col -> hi=row, lo=col
    order = pair_index(hi, lo)
    pair_hi = np.empty(npair, dtype=np.int64)
    pair_lo = np.empty(npair, dtype=np.int64)
    pair_hi[order] = hi
    pair_lo[order] = lo
    # old pair index of new pair k: pair_index(perm[hi_k], perm[lo_k])
    old_pair = pair_index(perm[pair_hi], perm[pair_lo])
    qa, qb = np.tril_indices(npair)
    qorder = quad_index(qa, qb)
    quad_a = np.empty_like(qorder)
    quad_b = np.empty_like(qorder)
    quad_a[qorder] = qa
    quad_b[qorder] = qb
    eri2 = data.eri[quad_index(old_pair[quad_a], old_pair[quad_b])]

    orb_sym2 = data.orb_sym[perm]
    new_up = np.sort(inv[hf_up_occ])
    new_dn = np.sort(inv[dn_extra])
    return perm, h2, eri2, orb_sym2, new_up, new_dn, orb_e


def load_fcidump_system(path: str, nup: int | None = None,
                        ndn: int | None = None,
                        reorder: bool = True):
    """Read an FCIDUMP and return (IntegralTable, hf_up_occ, hf_dn_occ, info).

    HF occupations default to the first nup/ndn orbitals (original labels),
    overridden by header hf_up/hf_dn lines if present - then the orbital
    reordering puts them first, as the reference does.
    """
    data = read_fcidump(path)
    nelec = data.nelec
    if nup is None:
        nup = (nelec + data.ms2) // 2
    if ndn is None:
        ndn = nelec - nup
    hf_up = data.hf_up_orbs if data.hf_up_orbs is not None else np.arange(nup)
    hf_dn = data.hf_dn_orbs if data.hf_dn_orbs is not None else np.arange(ndn)

    if reorder:
        perm, h2, eri2, sym2, hf_up, hf_dn, orb_e = reorder_orbitals(data, hf_up, hf_dn)
    else:
        perm = np.arange(data.norb)
        h2, eri2, sym2 = data.h, data.eri, data.orb_sym
        orb_e = orbital_energies(data.h, data.eri, hf_up, hf_dn)

    table = IntegralTable.from_dense_arrays(h2, eri2, data.core_energy, sym2)
    info = dict(perm=perm, nelec=nelec, nup=nup, ndn=ndn, ms2=data.ms2,
                orb_energies=orb_e)
    return table, np.asarray(hf_up), np.asarray(hf_dn), info
