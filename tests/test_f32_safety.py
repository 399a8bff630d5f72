"""Regression test for the round-3 TPU f64-demotion bug.

The axon TPU backend silently stores "float64" arrays as f32 (dtype
still reports float64; integer widths are unaffected).  Any device-side
float constant outside f32 range becomes inf, and the rounds-1/2
unknown-diagonal sentinel test `1e51 > 1e50` became `inf > inf == False`:
the walk's diagonal-cache repair never fired on TPU and every stochastic
walker outside the deterministic space died one step after being spawned
(occupied dets saturated at ~28k instead of the reference's
~w_abs/min_wt; ref MWALK sizing do_walk.f90:652-674).

These tests pin the fix: every device-side float constant in the walk
survives an f32 storage round-trip with its comparison semantics intact.
"""

import numpy as np

from sqmc_tpu.algo.walk import DIAG_UNKNOWN, DIAG_UNKNOWN_THRESHOLD, TINY


def _f32(x):
    """What the TPU actually stores for a nominal f64 value."""
    return float(np.float32(x))


def test_sentinels_f32_safe():
    # finite and ordered after f32 truncation
    assert np.isfinite(_f32(DIAG_UNKNOWN))
    assert np.isfinite(_f32(DIAG_UNKNOWN_THRESHOLD))
    assert _f32(DIAG_UNKNOWN) > _f32(DIAG_UNKNOWN_THRESHOLD)
    # tiny guard must stay a nonzero positive number in f32 (1e-300 -> 0.0
    # would turn max(x, TINY) guards into divisions by zero)
    assert _f32(TINY) > 0.0


def test_unknown_detection_under_f32_storage():
    # the repair condition fires for a sentinel that went through f32
    # storage, AND for inf (what pre-fix checkpoints hold on TPU)
    for stored in (_f32(DIAG_UNKNOWN), np.inf):
        assert stored > DIAG_UNKNOWN_THRESHOLD, stored
    # ... and does NOT fire for any physical diagonal element
    for ok in (-75.7, 0.0, 1e6, -1e6):
        assert not (ok > DIAG_UNKNOWN_THRESHOLD), ok


def test_no_f32_unsafe_literals_in_walk_device_code():
    """Source-level guard: the walk module must not reintroduce float
    literals outside f32 range in jnp expressions (1e51-style sentinels,
    1e-300-style guards).  Host-side numpy use is exempt by listing."""
    import inspect
    import re
    import sqmc_tpu.algo.walk as walk_mod

    src = inspect.getsource(walk_mod)
    bad = []
    for m in re.finditer(r"1e-?(\d+)", src):
        exp = int(m.group(0).split("e")[1])
        if not (-38 <= exp <= 38):
            line = src[: m.start()].count("\n") + 1
            text = src.splitlines()[line - 1].strip()
            # host-side contexts that never reach the device
            if "np." in text or text.startswith("#") or '"' in text \
                    or "max(abs(blk_den)" in text or "np.where" in text:
                continue
            bad.append((line, text))
    assert not bad, f"f32-unsafe literals in device code: {bad}"


def test_f32_state_walk_accuracy():
    """cfg.f32_state stores wt/diag and the projection/C(T) tables in f32
    (the TPU's native float).  On an exactly-solvable HEG the
    deterministic limit must hold to the f32 rounding floor and a
    stochastic run must reproduce the f64-mode energy within statistical
    resolution (same seed, same configuration)."""
    from sqmc_tpu.systems.heg.system import make_heg_system
    from sqmc_tpu.algo.hci import run_hci
    from sqmc_tpu.algo.semistoch import build_trial_wavefunction
    from sqmc_tpu.algo.walk import WalkConfig, run_walk

    sys_ = make_heg_system(3, 1.0, 4, 2, 1.6)
    res = run_hci(sys_, eps_var=1e-9, eps_var_sched=[1e-9] * 30,
                  max_iters=60, verbose=False)
    trial = build_trial_wavefunction(sys_, eps_var=1e-9,
                                     n_psi_t=len(res.up),
                                     n_imp=len(res.up), verbose=False)
    # deterministic limit through BOTH projection forms: the dense MXU
    # matvec (f32-state default, n_imp <= dense_proj_max) and the
    # block-ELL gather (dense_proj_max=0); they differ only in summation
    # order so both must sit on the f32 rounding floor
    e_by_form = {}
    for dense_max in (16384, 0):
        cfg = WalkConfig(mwalk=2048, cap_spawn=4096, norb=sys_.norb, nup=2,
                         ndn=2, n_words=1, tau=5e-3, w_abs_target=500.0,
                         has_singles=False, f32_state=True,
                         dense_proj_max=dense_max)
        out = run_walk(sys_, trial, cfg, nstep=30, nblk=2, nblk_eq=1,
                       w_abs_begin=500.0, e_trial_initial=res.energies[0],
                       verbose=False)
        assert abs(out.e_mixed - res.energies[0]) < 5e-6
        e_by_form[dense_max] = out.e_mixed
    assert abs(e_by_form[16384] - e_by_form[0]) < 1e-5

    trial2 = build_trial_wavefunction(sys_, eps_var=1e-3, n_psi_t=30,
                                      n_imp=10, verbose=False)
    es = {}
    for f32 in (False, True):
        cfg = WalkConfig(mwalk=4096, cap_spawn=16384, norb=sys_.norb,
                         nup=2, ndn=2, n_words=1, tau=5e-3,
                         w_abs_target=2000.0, has_singles=False,
                         r_initiator=0.0, f32_state=f32)
        out = run_walk(sys_, trial2, cfg, nstep=100, nblk=6, nblk_eq=3,
                       w_abs_begin=1000.0,
                       e_trial_initial=res.energies[0], verbose=False)
        es[f32] = (out.e_mixed, out.e_err)
    assert abs(es[True][0] - es[False][0]) < \
        6 * max(es[True][1], es[False][1]) + 2e-5
