"""Selected CI and truncated Lanczos vs exact diagonalization.

Reference behavior: semistoch.f90 perform_selected_ci:893,
perform_truncated_lanczos:1299 (run_type selected_ci / trunc_lanc).
"""

import itertools

import numpy as np
import pytest

from sqmc_tpu import dets
from sqmc_tpu.algo.davidson import davidson
from sqmc_tpu.algo.legacy_ci import (apply_h, perform_selected_ci,
                                     perform_truncated_lanczos)
from sqmc_tpu.algo.sparseham import build_sparse_ham
from sqmc_tpu.systems.hubbard.system import make_hubbard_k_system


@pytest.fixture(scope="module")
def hub():
    return make_hubbard_k_system(2, 2, t=1.0, U=4.0, nup=2, ndn=2)


@pytest.fixture(scope="module")
def fci(hub):
    ups = [dets.det_from_orbs(c, hub.norb)
           for c in itertools.combinations(range(hub.norb), hub.nup)]
    up = np.repeat(np.stack(ups), len(ups), axis=0)
    dn = np.tile(np.stack(ups), (len(ups), 1))
    H = build_sparse_ham(hub.table, up, dn, hub.nup, hub.ndn, hub.norb)
    evals, evecs = davidson(H, n_states=1)
    return float(evals[0]), (up, dn, np.asarray(evecs[:, 0]))


def test_apply_h_matches_dense(hub, fci):
    """H @ c through apply_h == dense H @ c on the full space."""
    e0, (up, dn, c) = fci
    u_up, u_dn, y, c_u = apply_h(hub, up, dn, c)
    # H c = E0 c for the exact ground state
    assert np.allclose(y, e0 * c_u, atol=1e-8)


def test_selected_ci_reaches_fci(hub, fci):
    res = perform_selected_ci(hub, iters=6, n_initiators=100,
                              n_truncate=100)
    assert res.energy == pytest.approx(fci[0], abs=1e-8)


def test_selected_ci_truncated_is_variational(hub, fci):
    res = perform_selected_ci(hub, iters=4, n_initiators=5, n_truncate=8)
    assert res.energy >= fci[0] - 1e-10
    assert len(res.up) <= 8


def _dense_h(hub, up, dn):
    H = build_sparse_ham(hub.table, up, dn, hub.nup, hub.ndn, hub.norb)
    M = np.zeros((len(up), len(up)))
    M[H.rows, H.cols] = H.vals
    M[H.cols, H.rows] = H.vals
    M[np.diag_indices(len(up))] = H.diag
    return M


def test_truncated_lanczos_converges(hub, fci):
    """Lanczos converges to the lowest eigenstate overlapping the start
    vector (the 2x2 Hubbard ground state is orthogonal to a single HF
    det, so the expected value comes from the overlap spectrum)."""
    from sqmc_tpu.ops import setalg
    e0, (up, dn, c) = fci
    M = _dense_h(hub, up, dn)
    w, v = np.linalg.eigh(M)
    hf = setalg.search_dets(up, dn, hub.hf_up[None], hub.hf_dn[None])[0]
    reach = np.abs(v[hf, :]) > 1e-10
    e_expected = float(np.min(w[reach]))
    res = perform_truncated_lanczos(hub, iters=10, n_initiators=100,
                                    n_truncate=200)
    assert res.energy == pytest.approx(e_expected, abs=1e-6)
    e = np.asarray(res.energies_per_iter)
    assert np.all(np.diff(e) < 1e-10)


def test_truncated_lanczos_multiplet_start_reaches_fci(hub, fci):
    """Starting from the exact ground state's top-4 determinants (the
    analog of the reference's symmetrized degenerate-HF start,
    semistoch.f90:1370) Lanczos reaches the global FCI energy."""
    e0, (up, dn, c) = fci
    top = np.argsort(-np.abs(c))[:4]
    from sqmc_tpu.ops import setalg
    so = setalg.lexsort_dets(up[top], dn[top])
    start = (up[top][so], dn[top][so], c[top][so])
    res = perform_truncated_lanczos(hub, iters=12, n_initiators=100,
                                    n_truncate=200, start=start)
    assert res.energy == pytest.approx(e0, abs=1e-6)


def test_truncated_lanczos_truncation_variational(hub, fci):
    res = perform_truncated_lanczos(hub, iters=6, n_initiators=10,
                                    n_truncate=12)
    assert res.energy >= fci[0] - 1e-9


def test_lanczos_on_the_fly_matches_davidson():
    """Matrix-free fixed-space Lanczos == stored-H Davidson (ref:
    matrix_lanczos_on_the_fly, chemistry.f90:8680)."""
    import numpy as np
    from sqmc_tpu.algo.hci import run_hci
    from sqmc_tpu.algo.legacy_ci import matrix_lanczos_on_the_fly
    from sqmc_tpu.systems.heg.system import make_heg_system

    sys_ = make_heg_system(3, 1.0, 4, 2, 1.6)
    res = run_hci(sys_, eps_var=1e-9, eps_var_sched=[1e-9] * 30,
                  max_iters=60, verbose=False)
    e, vec = matrix_lanczos_on_the_fly(sys_, res.up, res.dn, iters=60)
    assert e == pytest.approx(float(res.energies[0]), abs=1e-9)
    ov = abs(float(np.dot(vec, res.wts[:, 0])))
    assert ov > 1 - 1e-8


def test_hubbard_lanczos_full_matches_dense():
    """Full-space Hubbard Lanczos (ref: arnoldi_hubbard_binary_search,
    hubbard.f90:6700) against dense diagonalization."""
    import numpy as np
    from sqmc_tpu.systems.hubbard.system import make_hubbard_k_system
    from sqmc_tpu.algo.legacy_ci import hubbard_lanczos_full
    from sqmc_tpu.algo.sparseham import build_sparse_ham

    hub = make_hubbard_k_system(2, 2, t=1.0, U=4.0, nup=2, ndn=2)
    e, vec, up, dn = hubbard_lanczos_full(hub, iters=60)
    H = build_sparse_ham(hub.table, up, dn, 2, 2, hub.norb)
    n = H.n
    M = np.zeros((n, n))
    M[H.rows, H.cols] = H.vals
    M = M + M.T + np.diag(H.diag)
    w, v = np.linalg.eigh(M)
    assert abs(e - w[0]) < 1e-9, (e, w[0])
    # eigenvector agreement up to sign
    ov = abs(float(vec @ v[:, 0]))
    assert ov > 1 - 1e-8, ov
