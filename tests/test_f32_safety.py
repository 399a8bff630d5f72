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
