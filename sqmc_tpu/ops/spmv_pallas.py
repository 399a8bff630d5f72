"""Pallas TPU kernel: ELL sparse matrix-vector product.

The Davidson iteration's y = H v (ref: davidson_sparse_mpi2,
more_tools.f90:2525) and the walk's deterministic projection are sparse
matvecs over determinant-indexed rows.  XLA lowers the COO scatter-add
formulation to serialized HBM scatters; the TPU-native formulation is
ELL (rows padded to a fixed K):

    y[i] = sum_k vals[i, k] * x[cols[i, k]]

with the dense vector x RESIDENT IN VMEM for the whole kernel (one HBM
read instead of one per gather), the (vals, cols) row blocks streamed
block-by-block by the pallas pipeline, and the gather + multiply + row
reduction on the VPU.

Falls back transparently to a jitted XLA gather formulation when the
vector does not fit VMEM or Pallas is unavailable (CPU tests run the
fallback; the kernel itself is validated in interpret mode).

NOTE: the arbitrary-index VMEM gather this kernel wants still does not
lower through Mosaic (re-checked on jax 0.9 / libtpu 2026-01: a 1-D
operand gather reports "Only 2D gather is supported", and the 2-D
reshaped formulation `x2[cols//128, cols%128]` dies in a lowering
recursion), so EllSpmv defaults to the XLA ELL formulation on all
backends (measured faster than the COO scatter-add on TPU).  The Pallas
path is kept behind use_pallas=True / interpret=True for when the
lowering lands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BLOCK_ROWS = 512
VMEM_X_LIMIT = 2 << 20          # max vector length kept in VMEM (f32: 8MB)


def ell_from_coo(n: int, rows, cols, vals, diag=None, k_max: int | None = None):
    """Convert symmetric upper-COO (+diag) to padded ELL arrays.

    Returns (ell_cols [n_pad, K] int32, ell_vals [n_pad, K] f32, K) with
    both orientations and the diagonal materialized; padding entries point
    at column 0 with value 0.  n_pad rounds up to BLOCK_ROWS.
    """
    r_all = np.concatenate([rows, cols])
    c_all = np.concatenate([cols, rows])
    v_all = np.concatenate([vals, vals])
    if diag is not None:
        r_all = np.concatenate([r_all, np.arange(n)])
        c_all = np.concatenate([c_all, np.arange(n)])
        v_all = np.concatenate([v_all, diag])
    order = np.argsort(r_all, kind="stable")
    r_all, c_all, v_all = r_all[order], c_all[order], v_all[order]
    counts = np.bincount(r_all, minlength=n)
    K = int(counts.max()) if len(counts) and counts.max() > 0 else 1
    if k_max is not None:
        K = min(K, k_max)
    n_pad = -(-n // BLOCK_ROWS) * BLOCK_ROWS
    ell_cols = np.zeros((n_pad, K), np.int32)
    ell_vals = np.zeros((n_pad, K), np.float32)
    starts = np.concatenate([[0], np.cumsum(counts)])
    for i in range(n):
        c = min(counts[i], K)
        ell_cols[i, :c] = c_all[starts[i]:starts[i] + c]
        ell_vals[i, :c] = v_all[starts[i]:starts[i] + c]
    return ell_cols, ell_vals, K


def _spmv_kernel(x_ref, cols_ref, vals_ref, out_ref):
    """One row block: gather x at cols, multiply, reduce rows."""
    cols = cols_ref[:]                 # [B, K] int32
    vals = vals_ref[:]                 # [B, K] f32
    x = x_ref[:]                       # [n_pad] f32 (VMEM-resident)
    g = x[cols]                        # VPU gather from VMEM
    out_ref[:] = jnp.sum(vals * g, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _spmv_pallas(x_pad, ell_cols, ell_vals, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad, K = ell_cols.shape
    grid = (n_pad // BLOCK_ROWS,)
    return pl.pallas_call(
        _spmv_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad,), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_pad,), lambda i: (0,),
                         memory_space=pltpu.VMEM),          # x, whole
            pl.BlockSpec((BLOCK_ROWS, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # cols block
            pl.BlockSpec((BLOCK_ROWS, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # vals block
        ],
        out_specs=pl.BlockSpec((BLOCK_ROWS,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_pad, ell_cols, ell_vals)


def _spmv_xla(x_pad, ell_cols, ell_vals):
    return jnp.sum(ell_vals * x_pad[ell_cols], axis=1)


class EllSpmv:
    """y = H x with H in ELL form; Pallas kernel on TPU, XLA fallback
    elsewhere.  Computes in f32 (the Davidson preconditioner refines in
    f64 on host; use_f64_fallback forces the XLA f64 path)."""

    def __init__(self, H, use_pallas: bool | None = None,
                 interpret: bool = False):
        self.n = H.n
        cols, vals, K = ell_from_coo(H.n, H.rows, H.cols, H.vals, H.diag)
        self.K = K
        self.cols = jnp.asarray(cols)
        self.vals = jnp.asarray(vals)
        self.n_pad = cols.shape[0]
        self.interpret = interpret
        if use_pallas is None:
            use_pallas = False      # Mosaic gather limitation; see module doc
        self.use_pallas = use_pallas

    def __call__(self, x):
        x = jnp.asarray(x)
        single = x.ndim == 1
        xs = x[:, None] if single else x
        outs = []
        for j in range(xs.shape[1]):
            xp = jnp.zeros(self.n_pad, jnp.float32).at[:self.n].set(
                xs[:, j].astype(jnp.float32))
            if self.use_pallas or self.interpret:
                y = _spmv_pallas(xp, self.cols, self.vals,
                                 interpret=self.interpret)
            else:
                y = _spmv_xla(xp, self.cols, self.vals)
            outs.append(y[:self.n].astype(x.dtype))
        out = jnp.stack(outs, axis=1)
        return out[:, 0] if single else out


def blockell_from_coo(n, rows, cols, vals, diag=None):
    """Symmetric upper-COO (+diag) -> 128-slot row-block layout: every
    row's entries padded to a multiple of 128, blocks tagged with their
    row id.  Padding is bounded by 127 entries/row (vs rows x (K_max -
    K_row) for classic ELL: the C2 88k-det H has K_max=1347 but mean row
    length ~110, a 12x padding blow-up).  This is the walk's D-space
    projection layout (walk.py build_walk_tables), reused for Davidson.

    Returns (ell_cols [P] i32, ell_vals [P] f32, ell_row [P/128] i32).
    """
    r_all = np.concatenate([rows, cols])
    c_all = np.concatenate([cols, rows])
    v_all = np.concatenate([vals, vals])
    if diag is not None:
        r_all = np.concatenate([r_all, np.arange(n)])
        c_all = np.concatenate([c_all, np.arange(n)])
        v_all = np.concatenate([v_all, diag])
    order = np.argsort(r_all, kind="stable")
    r_all, c_all, v_all = r_all[order], c_all[order], v_all[order]
    counts = np.bincount(r_all, minlength=n)
    nb_r = np.maximum(1, -(-counts // 128))
    block_starts = np.concatenate([[0], np.cumsum(nb_r)])[:-1] * 128
    csr_start = np.concatenate([[0], np.cumsum(counts)])
    P = int(np.sum(nb_r)) * 128
    ell_cols = np.zeros(P, np.int32)
    ell_vals = np.zeros(P, np.float32)
    slot = block_starts[r_all] + (np.arange(len(r_all)) - csr_start[r_all])
    ell_cols[slot] = c_all
    ell_vals[slot] = v_all
    ell_row = np.repeat(np.arange(n, dtype=np.int32), nb_r)
    return ell_cols, ell_vals, ell_row


@functools.partial(jax.jit, static_argnames=("n",))
def _spmv_blockell(x, ell_cols, ell_vals, ell_row, n):
    prod = ell_vals * x[ell_cols]
    blk = jnp.sum(prod.reshape(-1, 128), axis=1)
    return jax.ops.segment_sum(blk, ell_row, num_segments=n,
                               indices_are_sorted=True)


class BlockEllSpmv:
    """y = H x in the 128-slot row-block layout: one flat gather + a
    [P/128, 128] row-sum + a sorted segment-sum.  The TPU-fast sparse
    matvec (walk.py's D-projection trick): measured 43 ms vs 1050 ms
    (classic ELL) vs 8100 ms (COO scatter-add) per matvec on the C2
    88k-det / 9.7M-nnz variational H on one v5e chip.  f32; pair with the
    host-f64 Rayleigh refinement (tools/bench_variational_tpu.py)."""

    def __init__(self, H):
        self.n = H.n
        cols, vals, row = blockell_from_coo(H.n, H.rows, H.cols, H.vals,
                                            H.diag)
        self.cols = jnp.asarray(cols)
        self.vals = jnp.asarray(vals)
        self.row = jnp.asarray(row)

    def __call__(self, x):
        x = jnp.asarray(x)
        single = x.ndim == 1
        xs = x[:, None] if single else x
        outs = [_spmv_blockell(xs[:, j].astype(jnp.float32), self.cols,
                               self.vals, self.row, self.n).astype(x.dtype)
                for j in range(xs.shape[1])]
        out = jnp.stack(outs, axis=1)
        return out[:, 0] if single else out
