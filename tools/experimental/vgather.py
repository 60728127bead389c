"""EXPERIMENTAL Pallas kernel: batched 1D table gather with VMEM staging.

XLA lowers 1D dynamic gathers on TPU to a slow per-element path (~90 ns
per element measured on v5e - the dominant cost of the candidate back half
at T = 1M).  This kernel tiles the table over the grid, DMAs each tile
into VMEM once, and serves every index inside the tile from on-chip
memory.

STATUS: correct under the Pallas interpreter (tested), but the in-kernel
``table_ref[local_c]`` arbitrary-index gather does NOT lower on current
Mosaic ("Cannot do int indexing on TPU"): Mosaic's ``tpu.dynamic_gather``
only supports same-shape 2D take_along_axis forms, which cannot express an
arbitrary flat-index gather without per-lane index bucketing.  Kept as the
reference implementation for a future Mosaic revision; the production
engine uses XLA gathers with per-row-sorted indices instead.

Semantics: out[b, c] = table[idx[b, c]] for 0 <= idx < T, else ``fill``.
Several tables can be gathered at the same indices in one pass (they share
the tiling and the index block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

INTERPRET = False  # tests flip this on CPU


def _next_pow2(n: int, lo: int = 256) -> int:
    v = lo
    while v < n:
        v *= 2
    return v


def _gather_kernel(idx_ref, *refs, n_tables: int, tile: int, fills):
    table_refs = refs[:n_tables]
    out_refs = refs[n_tables:]
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        for out_ref, fv in zip(out_refs, fills):
            out_ref[...] = jnp.full(
                out_ref.shape, fv, dtype=out_ref.dtype
            )

    idx = idx_ref[...]  # (B, C) int32
    local = idx - t * tile
    in_tile = (local >= 0) & (local < tile)
    local_c = jnp.clip(local, 0, tile - 1)
    for table_ref, out_ref in zip(table_refs, out_refs):
        vals = table_ref[local_c]  # gather served from VMEM
        out_ref[...] = jnp.where(in_tile, vals, out_ref[...])


@functools.partial(
    jax.jit, static_argnames=("fill_values", "tile", "interpret")
)
def _gather_call(idx, tables, fill_values, tile, interpret):
    t_total = int(tables[0].shape[0])
    n_tiles = -(-t_total // tile)
    b, c = idx.shape
    padded = [jnp.pad(tb, (0, n_tiles * tile - t_total)) for tb in tables]

    kernel = functools.partial(
        _gather_kernel, n_tables=len(tables), tile=tile, fills=fill_values
    )
    results = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((b, c), lambda t: (0, 0))]
        + [pl.BlockSpec((tile,), lambda t: (t,)) for _ in tables],
        out_specs=[pl.BlockSpec((b, c), lambda t: (0, 0)) for _ in tables],
        out_shape=[jax.ShapeDtypeStruct((b, c), tb.dtype) for tb in tables],
        interpret=interpret,
    )(idx, *padded)
    valid = (idx >= 0) & (idx < t_total)
    return [
        jnp.where(valid, r, jnp.asarray(fv, dtype=r.dtype))
        for r, fv in zip(results, fill_values)
    ]


def gather_tables(idx, tables, fill_values, tile: int = 1 << 20):
    """Gather several 1D tables at the same (B, C) int32 indices."""
    tables = tuple(tables)
    t_total = int(tables[0].shape[0])
    tile = min(tile, _next_pow2(t_total))
    return _gather_call(
        idx, tables, tuple(fill_values), tile, INTERPRET
    )
