"""Segmented reductions via one fused associative scan.

``jax.ops.segment_{sum,min,max}`` lower to HBM scatters on TPU — a
serialized row-at-a-time DMA path that measured ~7 ms EACH for [768k]
rows on one v5e chip (PERF_NOTES "where the time goes").  For SORTED
segment ids the same reductions are an inclusive *segmented scan*: a
log-depth ``jax.lax.associative_scan`` of fused elementwise selects
with no scatter or gather at all, and every field rides the SAME scan.

This is the primitive behind the walk's annihilation merge
(walk.py ``_full_sort_merge``): after the variadic sort, each group's
weight sum / initiator max / priority min / diag min / C(T) max are all
read at the group's END row from one scan (the reference's per-group
loops in merge_original_with_spawned2, do_walk.f90:5898-5960, collapse
to this single pass).

Semantics: with ``start[i]`` True at each segment's first row
(``start[0]`` must be True), ``seg_scan(fields, ops, start)[k][i]`` is
the reduction of ``fields[k]`` over rows ``seg_start(i) .. i``.  At
rows where :func:`seg_ends` is True this is the complete segment
reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_OPS = {
    "sum": lambda a, b: a + b,
    "min": jnp.minimum,
    "max": jnp.maximum,
}


def seg_scan(fields, ops, start):
    """Inclusive segmented scan of several fields in one pass.

    fields: sequence of [N] arrays; ops: matching "sum" | "min" | "max"
    names; start: [N] bool segment-start flags.  Returns the list of
    inclusive-scanned fields (same dtypes).

    On TPU with all-32-bit fields this dispatches to the single-pass
    Pallas kernel (ops/pscan.py): 1.28 ms vs 6.88 ms for the XLA
    log-depth slice chain at the bench's [720k] x 6 standalone (round-4
    measurement; the earlier microbench_scan 0.04 ms figure measured a
    fully-fused surrogate, not this op in isolation).  Sum fields scan
    in a different association order than the XLA path, so f32 group
    sums may differ in the last ulp.  Off-TPU and for f64 fields the
    XLA associative_scan below runs (Mosaic has no f64).
    """
    from . import pscan
    if pscan.supported(fields):
        return pscan.seg_scan(tuple(fields), tuple(ops), start)
    fns = [_OPS[o] for o in ops]

    def combine(a, b):
        # classic segmented-scan monoid: a segment start in the right
        # operand blocks the left operand's contribution
        out = [a[0] | b[0]]
        for fn, xa, xb in zip(fns, a[1:], b[1:]):
            out.append(jnp.where(b[0], xb, fn(xa, xb)))
        return tuple(out)

    res = jax.lax.associative_scan(combine, (start, *tuple(fields)))
    return list(res[1:])


def seg_ends(start):
    """End-row flags from start-row flags: end[i] = start[i+1]; the last
    row is always an end."""
    return jnp.concatenate([start[1:], jnp.ones(1, bool)])
