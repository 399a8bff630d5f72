"""Unit test for the order-dependent sequential initiator combine
(walk.sequential_initiator_scan) against a direct Python transcription of
the reference's pairwise rule (merge_original_with_spawned2
do_walk.f90:5897-5950): same-sign pair -> max initiator; opposite-sign
pair -> the initiator of the sign-winning walker (exact cancellation ->
0), with a permanent initiator (code 3) never demoted.

The production merge uses the order-independent group-max rule; the
sequential mode exists to MEASURE the bias difference between the two
semantics (tools/ab_initiator_rule.py, VERDICT r3 item 6).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sqmc_tpu.algo.walk import sequential_initiator_scan


def _reference_rule(starts, wts, inits):
    """Pairwise sequential combine, one group at a time (do_walk.f90:5897)."""
    out = np.zeros(len(wts), np.int32)
    acc_w, acc_i = 0.0, 0
    for i in range(len(wts)):
        if starts[i]:
            acc_w, acc_i = float(wts[i]), int(inits[i])
        else:
            w, ini = float(wts[i]), int(inits[i])
            if acc_w * w > 0:                       # same sign
                acc_i = max(acc_i, ini)
            else:                                   # different sign (or zero)
                if acc_i != 3:                      # permanent never demoted
                    if abs(acc_w) < abs(w):
                        acc_i = ini
                    elif abs(acc_w) == abs(w):
                        acc_i = 0
            acc_w += w
        out[i] = acc_i
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_reference_pairwise_rule(seed):
    rng = np.random.default_rng(seed)
    n = 512
    starts = rng.random(n) < 0.3
    starts[0] = True
    # weights with sign mixes, exact ties (+-1) and zeros inside groups
    wts = rng.choice([-2.0, -1.0, 1.0, 2.0, 3.0, 0.0], n).astype(np.float32)
    inits = rng.integers(0, 4, n).astype(np.int32)

    ref = _reference_rule(starts, wts, inits)
    got = np.asarray(sequential_initiator_scan(
        jnp.asarray(starts), jnp.asarray(wts), jnp.asarray(inits),
        jnp.float32))
    np.testing.assert_array_equal(got, ref)


def test_permanent_initiator_survives_cancellation():
    # group: permanent initiator +1, then opposite-sign -1 (exact tie) and
    # -2 (sign flip): code 3 must survive where a plain initiator zeroes
    starts = jnp.asarray([True, False, False, True, False])
    wts = jnp.asarray([1.0, -1.0, -2.0, 1.0, -1.0], jnp.float32)
    inits = jnp.asarray([3, 1, 1, 2, 1], jnp.int32)
    got = np.asarray(sequential_initiator_scan(starts, wts, inits,
                                               jnp.float32))
    assert got[2] == 3          # permanent survives tie AND sign flip
    assert got[4] == 0          # non-permanent zeroes on exact cancellation


def test_order_dependence_vs_group_max():
    # the documented pathology (reference's own comment,
    # do_walk.f90:5896): the same multiset combined in a different order
    # yields a different initiator, and one order differs from group-max
    rows = [(1.0, 2), (-2.0, 0), (3.0, 1)]
    starts = jnp.asarray([True, False, False])

    def run(order):
        w = jnp.asarray([rows[i][0] for i in order], jnp.float32)
        ini = jnp.asarray([rows[i][1] for i in order], jnp.int32)
        return int(np.asarray(
            sequential_initiator_scan(starts, w, ini, jnp.float32))[-1])

    a = run([0, 1, 2])          # +1(2), -2(0), +3(1) -> sign flips twice
    b = run([2, 0, 1])          # +3(1), +1(2), -2(0) -> big wt first
    assert a == 1               # each flip hands initiator to the winner
    assert b == 2               # same-sign max sticks, |4|>|2| keeps it
    assert a != b               # order-dependent
    assert max(i for _, i in rows) == 2 == b    # group-max matches b only
