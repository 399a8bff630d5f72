"""Device-resident HCI + PT fast paths (algo/devhci.py, algo/devpt.py)
against the host-orchestrated reference paths.

On CPU both paths compute in f64 except where the device path
deliberately holds f32 state (selection coefficients, H values), so
energies agree to ~1e-5 and PT estimates match to float-reduction order.
"""

import numpy as np
import pytest

from sqmc_tpu.systems.base import make_chem_system

FCIDUMP = "/root/reference/C2_v2z_curve/r1.24253/FCIDUMP"


@pytest.fixture(scope="module")
def c2():
    return make_chem_system(FCIDUMP)


@pytest.fixture(scope="module")
def c2_small_wf(c2):
    from sqmc_tpu.algo.hci import run_hci
    return run_hci(c2, eps_var=4e-3, eps_var_sched=[4e-3], verbose=False)


@pytest.mark.slow
def test_run_hci_device_matches_host(c2):
    """Same schedule, same criteria: the device driver's variational
    energy must match the host driver's to the f32-screening level
    (coefficients are f32 on device, so the det sets can differ by a few
    marginal dets; ref control flow hci.f90:359-517)."""
    from sqmc_tpu.algo.devhci import run_hci_device
    from sqmc_tpu.algo.hci import run_hci
    rh = run_hci(c2, eps_var=2e-3, eps_var_sched=[4e-3, 2e-3],
                 verbose=False)
    rd = run_hci_device(c2, eps_var=2e-3, eps_var_sched=[4e-3, 2e-3],
                        verbose=False)
    assert abs(rd.energies[0] - rh.energies[0]) < 5e-5, \
        (rd.energies, rh.energies)
    assert abs(len(rd.up) - len(rh.up)) < 0.01 * len(rh.up)
    # the returned COO must reproduce the energy as a Rayleigh quotient
    x = rd.wts[:, 0] / np.linalg.norm(rd.wts[:, 0])
    hx = rd.ham.diag * x
    np.add.at(hx, rd.ham.rows, rd.ham.vals * x[rd.ham.cols])
    np.add.at(hx, rd.ham.cols, rd.ham.vals * x[rd.ham.rows])
    assert abs(float(x @ hx) - rd.energies[0]) < 2e-6


def test_devpt_deterministic_matches_host(c2, c2_small_wf):
    """Device deterministic PT == host deterministic PT (same screened
    sum; only float reduction order differs; ref hci.f90:1100)."""
    from sqmc_tpu.algo.devpt import second_order_pt_device
    from sqmc_tpu.algo.pt import second_order_pt
    r = c2_small_wf
    e_var = float(r.energies[0])
    pt_h, nc_h = second_order_pt(c2, r.up, r.dn, r.wts[:, 0], e_var,
                                 3e-4, verbose=False)
    pt_d, nc_d = second_order_pt_device(c2, r.up, r.dn, r.wts[:, 0],
                                        e_var, 3e-4, verbose=False)
    assert nc_d == nc_h
    assert abs(pt_d - pt_h) < 1e-7, (pt_d, pt_h)


def test_devpt_alias_matches_host(c2, c2_small_wf):
    """Device alias-method PT reproduces the host estimator draw-for-draw
    (same PRNG keys, same compression, same two-term estimator; ref
    hci.f90:1314)."""
    from sqmc_tpu.algo.devpt import second_order_pt_alias_device
    from sqmc_tpu.algo.pt import second_order_pt_alias
    r = c2_small_wf
    e_var = float(r.energies[0])
    kw = dict(eps_pt=1e-4, eps_pt_big=1e-3, n_mc=100, target_error=1e30,
              pt_big=0.0, seed=7, min_samples=4, verbose=False)
    rh = second_order_pt_alias(c2, r.up, r.dn, r.wts[:, 0], e_var, **kw)
    rd = second_order_pt_alias_device(c2, r.up, r.dn, r.wts[:, 0],
                                      e_var, **kw)
    assert rh.n_samples == rd.n_samples
    assert abs(rh.pt_diff - rd.pt_diff) < 1e-6, (rh.pt_diff, rd.pt_diff)


@pytest.mark.slow
def test_pipelined_blocks_bit_identical(c2):
    """run_walk with the 1-block dispatch lookahead must produce the
    bitwise-identical trajectory (the chain is functional; the lookahead
    stalls at the eq-extension decision block)."""
    from sqmc_tpu.algo.semistoch import build_trial_wavefunction
    from sqmc_tpu.algo.walk import WalkConfig, run_walk
    trial = build_trial_wavefunction(c2, eps_var=2e-2, n_psi_t=50,
                                     n_imp=100, verbose=False)
    cfg = WalkConfig(mwalk=2048, cap_spawn=4096, norb=c2.norb,
                     nup=c2.nup, ndn=c2.ndn, n_words=c2.n_words,
                     tau=2e-3, w_abs_target=800.0, has_singles=True,
                     spawn_granularity=2.0, min_wt=0.5, r_initiator=0.5,
                     f32_state=True)
    outs = []
    for pipe in (False, True):
        out = run_walk(c2, trial, cfg, nstep=10, nblk=3, nblk_eq=2,
                       w_abs_begin=600.0, e_trial_initial=trial.e_trial,
                       verbose=False, mode="scan", seed=3,
                       pipeline_blocks=pipe)
        outs.append(out)
    assert np.array_equal(outs[0].e_blocks, outs[1].e_blocks)
    assert np.array_equal(outs[0].w_abs_trace, outs[1].w_abs_trace)
