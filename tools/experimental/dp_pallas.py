"""Pallas TPU kernel: batched semi-global edit-distance (DP tier).

Computes the reference's ``stringMatch`` scores (nGramSearch.hpp:182-222)
for B queries x N terms in one kernel: grid (N-tiles, B); each program
holds a (Nt, 128) DP row strip in VMEM and advances it one query character
at a time.  The in-row dependency is removed with the same min-plus prefix
trick as the XLA path (search/editdist.py):

    row2[p] = p + cummin_{k<=p}(a[k] - k),  a[0] := q+1

Mosaic-friendliness: every vector stays a full (Nt, 128) tile - the DP
position axis lives on the 128 lanes (width + 1 <= 128), lane shifts are
``pltpu.roll`` + iota masks (lane-slicing narrow vectors crashes the
vector layout pass on current Mosaic), and the per-program query
characters arrive via scalar prefetch.  Terms are loaded PRE-SHIFTED one
lane right (lane p holds char p-1) so the recurrence needs no extra
shift of the cost vector.

Status: compiles and runs on v5e with exact parity against the XLA path
and the oracle (interpret-mode tests on CPU; hardware-validated).  NOT
wired into the engine: measured on v5e (B=64, N=20k, W=8, Qp=16) the XLA
scan+cummin formulation is ~1.4x faster (152 ms vs 219 ms incl. dispatch)
because the 128-lane layout wastes 14x VPU lanes at short-tier widths
and re-reads the term tile once per query.  Kept as the hardware-proven
Pallas implementation to build on when a lane-packed variant (multiple
terms per 128-lane register row) is worth the complexity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False  # tests flip this on CPU

_BIG = np.int32(1 << 30)
LANES = 128


def _dp_kernel(qtok_ref, qlen_ref, tok_ref, len_ref, out_ref, *, qp: int):
    """One (term-tile, query) program: full DP over <= qp query chars."""
    tokens = tok_ref[...]  # (Nt, 128) int32; lane p holds char p-1, lane 0 = -1
    lengths = len_ref[...]  # (Nt, 128) int32, length broadcast across lanes
    nt = tokens.shape[0]
    qb = pl.program_id(1)
    qlen = qlen_ref[qb]
    lane = jax.lax.broadcasted_iota(jnp.int32, (nt, LANES), 1)

    row = jnp.zeros((nt, LANES), dtype=jnp.int32)
    for q in range(qp):
        qc = qtok_ref[qb * qp + q]
        cost = jnp.where(tokens == qc, 0, 1)  # lane p: cost of char p-1
        prev = pltpu.roll(row, 1, 1)  # lane p: row[p-1] (lane 0 wraps, masked)
        a = jnp.minimum(row + 1, prev + cost)
        d = jnp.where(lane == 0, q + 1, a) - lane
        # prefix cummin along lanes via log-step roll-min
        shift = 1
        while shift < LANES:
            shifted = jnp.where(
                lane >= shift, pltpu.roll(d, shift, 1), _BIG
            )
            d = jnp.minimum(d, shifted)
            shift *= 2
        row2 = lane + d
        row = jnp.where(q < qlen, row2, row)

    mismatch = jnp.min(
        jnp.where(lane <= lengths, row, _BIG), axis=1, keepdims=True
    )
    # out block is (Nt, B); each program owns column qb (consecutive visits:
    # the query axis is the innermost grid dim)
    @pl.when(qb == 0)
    def _init():
        out_ref[...] = jnp.zeros(out_ref.shape, jnp.int32)

    col = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    out_ref[...] = jnp.where(col == qb, qlen - mismatch, out_ref[...])


@functools.partial(jax.jit, static_argnames=("qp", "tile", "interpret"))
def _dp_call(tokens, lengths, qtokens, qlens, qp, tile, interpret):
    n, width = tokens.shape
    b = qtokens.shape[0]
    n_tiles = -(-n // tile)
    n_pad = n_tiles * tile - n
    # lane p holds char p-1; lane 0 a sentinel no query char equals
    tok_sh = jnp.pad(
        tokens.astype(jnp.int32),
        ((0, n_pad), (1, LANES - width - 1)),
        constant_values=-1,
    )
    len_bc = jnp.broadcast_to(
        jnp.pad(lengths, (0, n_pad)).astype(jnp.int32)[:, None],
        (n_tiles * tile, LANES),
    )

    kernel = functools.partial(_dp_kernel, qp=qp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, b),  # query axis innermost: consecutive out visits
        in_specs=[
            pl.BlockSpec((tile, LANES), lambda t, qb, *_: (t, 0)),
            pl.BlockSpec((tile, LANES), lambda t, qb, *_: (t, 0)),
        ],
        out_specs=pl.BlockSpec((tile, b), lambda t, qb, *_: (t, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile, b), jnp.int32),
        interpret=interpret,
    )(qtokens.reshape(-1), qlens, tok_sh, len_bc)
    return out[:n].T


def dp_match_batch(
    tokens: jnp.ndarray,  # (N, W) int32, 0-padded, W <= 127
    lengths: jnp.ndarray,  # (N,) int32
    qtokens: jnp.ndarray,  # (B, Qp) int32
    qlens: jnp.ndarray,  # (B,) int32
    tile: int = 512,
) -> jnp.ndarray:
    """(B, N) int32 match counts: qlen - semi-global edit distance."""
    n, width = tokens.shape
    if width + 1 > LANES:
        raise ValueError(f"term width {width} exceeds {LANES - 1}")
    if n == 0:
        return jnp.zeros((qtokens.shape[0], 0), jnp.int32)
    qp = int(qtokens.shape[1])
    tile = min(tile, max(_next_pow2(n), 8))
    return _dp_call(tokens, lengths, qtokens, qlens, qp, tile, INTERPRET)


def _next_pow2(n: int, lo: int = 8) -> int:
    v = lo
    while v < n:
        v *= 2
    return v
