"""Pack heterogeneous per-row fields into ONE [n, K] uint32 matrix.

TPU gathers and scatters pay a per-ROW cost that is nearly independent of
row width, and 64-bit element types take emulated slow paths
(tools/microbench_gs.py on v5e, walk-step shapes:

    planar u32 gather  [458k] <- [720k]        3.6 ms
    planar u64 gather  [458k] <- [720k]        6.8 ms
    row gather [458k, 6] u32 (24 B rows)       1.0 ms
    row gather [458k, 82] u32 (328 B rows)     6.5 ms
    planar u32 scatter [720k] -> [458k]        3.5 ms
    WIDE  [720k, 3] u32 scatter                60  ms   (!!)

so K planar gathers of an indexed row cost ~K times ONE K-plane packed row
gather, and a wide scatter must never be used at all).  This module gives
the two patterns the walk engine uses everywhere:

  * RowPack: declare fields ([n] or [n, m]; any 32/64-bit dtype), pack
    them into [n, K] u32, row-gather ONCE, unpack fields bit-exactly.
  * inverse compaction (see algo/walk._full_sort_merge): instead of
    scattering every output field to compacted destinations, scatter the
    row INDEX once (planar i32) and row-gather the packed payload.

Bit-exactness: fields are moved by bitcast, never by value conversion, so
packing changes no numerics anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _to_planes(arr):
    """[n] or [n, m] array of bool / 32- / 64-bit dtype -> [n, p] u32."""
    if arr.dtype == jnp.bool_:
        arr = arr.astype(jnp.uint32)
    squeeze = arr.ndim == 1
    if squeeze:
        arr = arr[:, None]
    if arr.dtype.itemsize == 8:
        pl = jax.lax.bitcast_convert_type(arr, jnp.uint32)   # [n, m, 2]
        return pl.reshape(arr.shape[0], arr.shape[1] * 2)
    if arr.dtype.itemsize == 4:
        return jax.lax.bitcast_convert_type(arr, jnp.uint32)
    raise TypeError(f"rowpack supports 32/64-bit dtypes, got {arr.dtype}")


class RowPack:
    """Declare fields, pack to [n, K] u32, unpack gathered rows."""

    def __init__(self):
        self._layout = {}      # name -> (start, planes, dtype, inner, bool_)
        self._planes = []
        self._k = 0

    def add(self, name, arr):
        if name in self._layout:
            raise ValueError(f"duplicate rowpack field {name!r}")
        is_bool = arr.dtype == jnp.bool_
        pl = _to_planes(arr)
        inner = None if arr.ndim == 1 else arr.shape[1]
        self._layout[name] = (self._k, pl.shape[1],
                              jnp.uint32 if is_bool else arr.dtype,
                              inner, is_bool)
        self._planes.append(pl)
        self._k += pl.shape[1]

    @property
    def width(self):
        return self._k

    def pack(self):
        """The [n, K] u32 payload matrix."""
        return jnp.concatenate(self._planes, axis=1)

    def unpack(self, rows, name):
        """Recover field `name` from gathered rows [s, K] (bit-exact)."""
        start, p, dtype, inner, is_bool = self._layout[name]
        cols = rows[:, start:start + p]
        if dtype.itemsize == 8:
            cols = cols.reshape(cols.shape[0], p // 2, 2)
        out = jax.lax.bitcast_convert_type(cols, dtype)
        if is_bool:
            out = out != 0
        if inner is None:
            out = out[:, 0]
        return out

    def defaults_row(self, values):
        """A [K] u32 template row from per-field scalar defaults (fields
        missing from `values` default to zero bits)."""
        parts = []
        for name, (start, p, dtype, inner, is_bool) in self._layout.items():
            if name in values:
                v = jnp.full((1, inner or 1), values[name], dtype=dtype)
                parts.append(_to_planes(v if inner else v[:, 0]))
            else:
                parts.append(jnp.zeros((1, p), jnp.uint32))
        return jnp.concatenate(parts, axis=1)[0]


def gather_rows(pack_matrix, idx):
    """jnp.take wrapper naming the hot pattern (one packed row gather)."""
    return jnp.take(pack_matrix, idx, axis=0)
