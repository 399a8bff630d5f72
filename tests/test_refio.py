"""Reference restart-artifact interop (SURVEY 5.4): wf_eps_var
(Fortran unformatted), psit_connections, dtm_projector.  Round-trips plus
an end-to-end restart: run_hci must pick up a reference-format cache."""

import numpy as np
import pytest

from sqmc_tpu.utils import refio
from sqmc_tpu.systems.heg.system import make_heg_system
from sqmc_tpu.algo.hci import run_hci


@pytest.fixture(scope="module")
def heg():
    sys_ = make_heg_system(3, 1.0, 4, 2, 1.6)
    res = run_hci(sys_, eps_var=1e-4, eps_var_sched=[1e-4] * 6,
                  verbose=False)
    return sys_, res


def test_wf_eps_var_roundtrip(tmp_path, heg):
    sys_, res = heg
    p = str(tmp_path / "wf_eps_var=1.0E-04")
    refio.write_wf_eps_var(p, res.up, res.dn, res.wts, res.energies)
    up, dn, wts, en = refio.read_wf_eps_var(p, sys_.norb)
    np.testing.assert_array_equal(up, res.up)
    np.testing.assert_array_equal(dn, res.dn)
    np.testing.assert_allclose(wts, res.wts, rtol=0, atol=0)
    np.testing.assert_allclose(en, res.energies)


def test_run_hci_reads_reference_cache(tmp_path, heg):
    """A reference-format unformatted cache must skip the variational
    stage entirely (ref: hci.f90:194-259)."""
    from sqmc_tpu.utils.checkpoint import wf_var_filename

    sys_, res = heg
    fname = wf_var_filename(1e-4, str(tmp_path))
    refio.write_wf_eps_var(fname, res.up, res.dn, res.wts, res.energies)
    res2 = run_hci(sys_, eps_var=1e-4, eps_var_sched=[1e-4],
                   wf_cache_dir=str(tmp_path), verbose=False)
    assert res2.n_iters == 0                      # skipped the loop
    assert res2.energies[0] == pytest.approx(res.energies[0], abs=1e-12)
    np.testing.assert_array_equal(res2.up, res.up)
    np.testing.assert_allclose(res2.diag, res.diag, atol=1e-9)


def test_psit_connections_roundtrip(tmp_path, heg):
    sys_, _ = heg
    from sqmc_tpu.algo.semistoch import build_trial_wavefunction
    trial = build_trial_wavefunction(sys_, eps_var=1e-3, n_psi_t=10,
                                     n_imp=5, verbose=False)
    p = str(tmp_path / "psit_connections")
    refio.write_psit_connections(p, trial.ct_up, trial.ct_dn,
                                 trial.ct_num, trial.ct_den,
                                 sys_.nup, sys_.ndn, sys_.norb)
    d = refio.read_psit_connections(p, sys_.nup, sys_.ndn, sys_.norb)
    keep = np.abs(trial.ct_num) > 1e-10
    np.testing.assert_array_equal(d["ct_up"], trial.ct_up[keep])
    np.testing.assert_allclose(d["ct_num"], trial.ct_num[keep],
                               atol=1e-13)
    np.testing.assert_allclose(d["ct_den"], trial.ct_den[keep],
                               atol=1e-13)
    # Psi_T recovered from the nonzero denominators
    member = np.abs(trial.ct_den[keep]) > 1e-12
    assert len(d["psit_up"]) == int(np.sum(member))


def test_dtm_projector_roundtrip_and_trial(tmp_path, heg):
    sys_, _ = heg
    from sqmc_tpu.algo.semistoch import (build_trial_wavefunction,
                                         load_trial_from_reference)
    trial = build_trial_wavefunction(sys_, eps_var=1e-3, n_psi_t=10,
                                     n_imp=8, verbose=False)
    pd_ = str(tmp_path / "dtm_projector")
    refio.write_dtm_projector(pd_, trial.imp_up, trial.imp_dn,
                              trial.imp_ham, sys_.nup, sys_.ndn,
                              sys_.norb)
    iu, idn, H = refio.read_dtm_projector(pd_, sys_.nup, sys_.ndn,
                                          sys_.norb)
    np.testing.assert_array_equal(iu, trial.imp_up)
    np.testing.assert_allclose(H.diag, trial.imp_ham.diag, atol=1e-12)
    # dense reconstruction equality (entry order may differ)
    def dense(h, n):
        m = np.zeros((n, n))
        m[h.rows, h.cols] = h.vals
        m = m + m.T + np.diag(h.diag)
        return m
    np.testing.assert_allclose(dense(H, H.n),
                               dense(trial.imp_ham, trial.imp_ham.n),
                               atol=1e-12)

    pc = str(tmp_path / "psit_connections")
    refio.write_psit_connections(pc, trial.ct_up, trial.ct_dn,
                                 trial.ct_num, trial.ct_den,
                                 sys_.nup, sys_.ndn, sys_.norb)
    t2 = load_trial_from_reference(sys_, pc, pd_)
    np.testing.assert_array_equal(t2.imp_up, trial.imp_up)
    assert t2.e_trial == pytest.approx(trial.ct_num[0] / trial.ct_den[0]
                                       if trial.ct_den[0] else 0.0,
                                       abs=1e-6) or np.isfinite(t2.e_trial)
