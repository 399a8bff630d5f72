"""Pallas TPU segmented / plain prefix scans: one read + one write.

``jax.lax.associative_scan`` lowers a [720k]-row 6-field segmented scan
to a ~20-level slice/pad/select chain that the device profile bills at
~6.4 ms/step (walk merge, segscan.py) — every level re-streams the
operands through HBM.  The information content is one pass: this module
scans in a single Pallas kernel that reads each field once and writes it
once (~35 MB total at the bench's [720k] x 6), with the classic
segmented-monoid combine

    (f1, v1) (+) (f2, v2) = (f1 | f2,  f2 ? v2 : op(v1, v2))

evaluated as an in-VMEM Hillis-Steele sweep: 7 lane-roll steps along the
128-lane axis, a log2(R) sublane sweep over the per-row totals, and a
carry chain across sequential grid blocks held in VMEM (8,128) scratch
tiles (TPU Pallas grid steps execute in order on a core, so scratch
carries state between them; scalar SMEM selects don't lower — Mosaic's
convert helper recurses — hence vector-shaped carries).

Measured standalone at [720k] x 6 fields on v5e: 1.28 ms vs 6.88 ms for
the XLA associative_scan path (segscan.py dispatches here on TPU).

The same kernel family covers plain prefix ops (cumsum / cummax) as the
degenerate all-flags-zero case.

Fallback: non-TPU backends (tests run on CPU) and f64 fields (Mosaic has
no f64) use the XLA associative_scan path in ops/segscan.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_ROWS = 512                      # block = 64k elements


def _identity(op, dtype):
    # numpy scalars OF THE FIELD DTYPE (not jnp arrays, not Python ints):
    # jnp values would be captured constants (Pallas rejects them) and
    # Python ints trace as int64 constants under x64, whose int64->int32
    # convert recurses forever in Mosaic's _convert_helper
    if op == "sum":
        return np.zeros((), dtype)[()]
    if op == "min":
        return np.asarray(
            np.iinfo(dtype).max if jnp.issubdtype(dtype, jnp.integer)
            else np.inf, dtype)[()]
    if op == "max":
        return np.asarray(
            np.iinfo(dtype).min if jnp.issubdtype(dtype, jnp.integer)
            else -np.inf, dtype)[()]
    raise ValueError(op)


_OPS = {"sum": lambda a, b: a + b, "min": jnp.minimum, "max": jnp.maximum}


def _make_kernel(ops, dtypes, rows):
    """Kernel over one (rows, 128) block of the flag plane + len(ops)
    field planes; carries live in VMEM (8,128) scratch tiles (all
    elements equal) — Mosaic cannot lower scalar SMEM selects (its
    convert helper recurses), vector selects are native."""
    fns = [_OPS[o] for o in ops]
    idents = [_identity(o, d) for o, d in zip(ops, dtypes)]

    def kernel(f_ref, *rest):
        vs_refs = rest[:len(fns)]
        out_refs = rest[len(fns):2 * len(fns)]
        cf_ref = rest[2 * len(fns)]            # VMEM (8,128) i32 carry flag
        cv_refs = rest[2 * len(fns) + 1:]      # VMEM (8,128) per-field carry

        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            cf_ref[:] = jnp.zeros((8, _LANES), jnp.int32)
            for cv, ident, d in zip(cv_refs, idents, dtypes):
                cv[:] = jnp.full((8, _LANES), ident, d)

        # all integer literals below are np.int32: Python ints trace as
        # int64 constants under x64 and Mosaic's int64->int32 convert
        # helper recurses forever
        Z = np.int32(0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
        srow = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)

        f = f_ref[:]
        vs = [r[:] for r in vs_refs]

        # ---- lane sweep: after step d every element holds the scan of
        # its trailing 2d-window within its row ----
        d = 1
        while d < _LANES:
            fl = pltpu.roll(f, np.int32(d), axis=1)
            valid = lane >= np.int32(d)
            new_vs = []
            for fn, v in zip(fns, vs):
                vl = pltpu.roll(v, np.int32(d), axis=1)
                new_vs.append(jnp.where(valid & (f == Z), fn(vl, v), v))
            f = jnp.where(valid, fl | f, f)
            vs = new_vs
            d *= 2

        # ---- row sweep over the per-row totals (last lane, kept at
        # full lane width: Mosaic prefers (R,128) tiles over (R,1)) ----
        tf = jnp.broadcast_to(
            jax.lax.slice(f, (0, _LANES - 1), (rows, _LANES)),
            (rows, _LANES))
        tvs = [jnp.broadcast_to(
            jax.lax.slice(v, (0, _LANES - 1), (rows, _LANES)),
            (rows, _LANES)) for v in vs]
        d = 1
        while d < rows:
            tfl = pltpu.roll(tf, np.int32(d), axis=0)
            valid = srow >= np.int32(d)
            new_tvs = []
            for fn, tv in zip(fns, tvs):
                tvl = pltpu.roll(tv, np.int32(d), axis=0)
                new_tvs.append(jnp.where(valid & (tf == Z), fn(tvl, tv), tv))
            tf = jnp.where(valid, tfl | tf, tf)
            tvs = new_tvs
            d *= 2

        # exclusive row carries: row i gets T_{i-1}, row 0 the identity;
        # then fold in the cross-block scalar carry
        one = np.int32(1)
        ef = pltpu.roll(tf, np.int32(1), axis=0)
        ef = jnp.where(srow >= one, ef, Z)
        evs = []
        for tv, ident in zip(tvs, idents):
            ev = pltpu.roll(tv, np.int32(1), axis=0)
            evs.append(jnp.where(srow >= one, ev, ident))

        # carries as (1,128) rows (all lanes equal) broadcast over rows
        cf = cf_ref[0:1, :]
        cvs = [cv[0:1, :] for cv in cv_refs]
        evs = [jnp.where(ef == Z, fn(cv, ev), ev)
               for fn, cv, ev in zip(fns, cvs, evs)]
        ef = ef | cf

        # apply to every element: out = E_row (+) S
        for out, fn, v, ev in zip(out_refs, fns, vs, evs):
            out[:] = jnp.where(f == Z, fn(ev, v), v)

        # update the cross-block carry with this block's total (vector
        # select on the last row's tile; every lane holds the row total)
        bf = jax.lax.slice(tf, (rows - 1, 0), (rows, _LANES))
        cf_ref[0:1, :] = cf | bf
        for cv_r, fn, tv, cv in zip(cv_refs, fns, tvs, cvs):
            tvl = jax.lax.slice(tv, (rows - 1, 0), (rows, _LANES))
            cv_r[0:1, :] = jnp.where(bf != Z, tvl, fn(cv, tvl))

    return kernel


@functools.partial(jax.jit, static_argnames=("ops", "rows", "interpret"))
def _seg_scan_call(start_i32, fields, ops, rows, interpret=False):
    n = start_i32.shape[0]
    blk = rows * _LANES
    nb = -(-n // blk)
    npad = nb * blk - n
    # pad with fresh segments of op identities: carries stop at the pad
    fpad = jnp.pad(start_i32, (0, npad), constant_values=1).reshape(-1, _LANES)
    vpads = [jnp.pad(v, (0, npad),
                     constant_values=_identity(o, v.dtype)).reshape(-1, _LANES)
             for v, o in zip(fields, ops)]
    dtypes = tuple(v.dtype for v in fields)
    kernel = _make_kernel(ops, dtypes, rows)
    # np.int32(0): a Python 0 traces as i64 under x64 and the index map
    # then returns a mixed (i32, i64) tuple Mosaic refuses to legalize
    bs = pl.BlockSpec((rows, _LANES), lambda i: (i, np.int32(0)),
                      memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[bs] * (1 + len(fields)),
        out_specs=tuple([bs] * len(fields)),
        out_shape=tuple(jax.ShapeDtypeStruct(v.shape, v.dtype)
                        for v in vpads),
        scratch_shapes=([pltpu.VMEM((8, _LANES), jnp.int32)] +
                        [pltpu.VMEM((8, _LANES), d) for d in dtypes]),
        interpret=interpret,
    )(fpad, *vpads)
    return [o.reshape(-1)[:n] for o in outs]


_SUPPORTED = (jnp.int32, jnp.float32, jnp.uint32)


def supported(fields) -> bool:
    """True when the Pallas path can run: TPU backend + 32-bit fields."""
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    return all(v.dtype in _SUPPORTED for v in fields)


_SIGN = np.uint32(0x80000000)


def seg_scan(fields, ops, start, rows: int = _ROWS, interpret=False):
    """Drop-in for segscan.seg_scan on TPU (see module docstring).

    u32 fields run in the i32 domain (Mosaic cannot legalize arith.maxui
    on v5e): sums bitcast (two's-complement add is the same mod 2^32);
    min/max ride the order-preserving sign-flip bijection x ^ 0x80000000.

    interpret=True runs the kernel in Pallas interpret mode (any backend;
    tests exercise the kernel logic on CPU this way)."""
    fields, ops = tuple(fields), tuple(ops)
    flip = [v.dtype == jnp.uint32 and o in ("min", "max")
            for v, o in zip(fields, ops)]
    cast = [v.dtype == jnp.uint32 for v in fields]
    fs = tuple(
        jax.lax.bitcast_convert_type(v ^ _SIGN if fl else v, jnp.int32)
        if c else v
        for v, c, fl in zip(fields, cast, flip))
    outs = _seg_scan_call(start.astype(jnp.int32), fs, ops, rows,
                          interpret=interpret)
    return [
        (jax.lax.bitcast_convert_type(o, jnp.uint32) ^ _SIGN if fl
         else jax.lax.bitcast_convert_type(o, jnp.uint32)) if c else o
        for o, c, fl in zip(outs, cast, flip)]


def cumsum(x, rows: int = _ROWS, interpret=False):
    """Plain inclusive prefix sum (i32/f32/u32) as the flags=0 case."""
    zeros = jnp.zeros(x.shape[0], jnp.int32)
    return seg_scan((x,), ("sum",), zeros, rows, interpret=interpret)[0]


def cummax(x, rows: int = _ROWS, interpret=False):
    zeros = jnp.zeros(x.shape[0], jnp.int32)
    return seg_scan((x,), ("max",), zeros, rows, interpret=interpret)[0]
