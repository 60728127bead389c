"""Pallas TPU kernel: hit counts from a bit-packed gram incidence.

The reference's hottest loop accumulates posting hits per term
(searchLong, nGramSearch.hpp:289-298).  The MXU form is
``hits = q_cnt (B, G) @ M (G, Tl)`` over the 0/1 incidence M, but at 10M
keys M is ~27 GB int8 - it cannot be HBM-resident.  Bit-PACKED it is
~3.4 GB, and this kernel streams the packed table through VMEM once per
batch, unpacking each tile on the fly and feeding the systolic array -
8x less HBM traffic than the int8 matmul and ~30x less than an XLA
expand-accumulate over unpacked planes (which must materialize a
(B, Tl) int8 accumulator per query-gram slot).

Plane-tiled bit layout (baked into HostIndex.bitmap_tables): bytes are
grouped into tiles of ``BLKB``; bit ``p`` of byte ``j*BLKB + k`` holds
term ``j*8*BLKB + p*BLKB + k``.  Unpacking a (G, BLKB) byte tile then
yields eight (G, BLKB) 0/1 planes covering ONE contiguous term range
``[j*8*BLKB, (j+1)*8*BLKB)`` - each plane is a static bitwise op + one
MXU dot, the output block is a contiguous lane slice, and no in-kernel
reshape/interleave is needed (Mosaic-friendly: every tensor keeps full
128 lanes).

Exactness: counts are small positive integers (hits <= n_qgrams <= 127),
so bf16 operands with f32 accumulation are exact, and the int8 output
cannot overflow.  Parity with the XLA scan path and the oracle is tested
in tests/test_candidates_bitmap.py (interpret mode on CPU; the engine
only routes here on a real TPU backend).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False  # tests flip this on CPU

# bytes per layout tile; lanes per tile = 8 * BLKB.  512 keeps the whole
# working set (q operand + double-buffered byte tile + unpacked plane +
# output block) near ~10 MB of VMEM at G ~ 2752, B = 256.
BLKB = 512
TILE_LANES = 8 * BLKB

# term-axis padding for the RESIDENT bitmap tables (HostIndex): eight
# layout tiles, so NB = tl_pad/8 is a 1024-multiple and a packed row
# splits into eight (8, NB/8) sublane-aligned sub-rows - Mosaic rejects
# HBM memref slices that are not 8-sublane aligned, which is what the
# row-DMA gather (gather_rows_dma) slices.  Costs <= 28k padded lanes
# of zero bits per row (~11 MB on the 10M-key table).
PAD_LANES = 8 * TILE_LANES

# VMEM ceiling the caller budgets against (bytes); v5e has ~16 MB/core.
# 12 MB, not 14: a 13.9 MB working set compiled but ran 3x SLOWER per
# byte (B=512 at gp=2816: 197 ms vs B=256's 65.6 for half the work -
# the pipeline loses its double buffering near the ceiling).
_VMEM_BUDGET = 12 << 20


def plane_coords(term):
    """term id -> (byte, bit) under the plane-tiled layout (numpy or jnp)."""
    j = term // TILE_LANES
    r = term % TILE_LANES
    return j * BLKB + r % BLKB, r // BLKB


# gram rows per grid block for G-TILED tables; the output block
# accumulates across G steps (counts stay <= 127, so the narrowed int8
# partial sums are exact - the adds themselves widen to int32 because
# Mosaic has no i8 vector add)
GBLK = 2048

# single-block ceiling: tables up to this many gram rows run un-tiled
# (one G block, no revisited-output accumulation).  VMEM check: at
# B = 256 the working set is ~2560 * g + 2.6 MB, so 4096 rows ~ 13 MB -
# inside the 14 MB budget; the engine's fits_vmem caps B further.
SBLK_MAX = 4096


def g_padding(g: int) -> int:
    """Row padding the table must be built with: 128-multiple when one G
    block covers it (<= SBLK_MAX rows), GBLK-multiple otherwise (<= 4%
    overhead at 47k+)."""
    r = -(-max(g, 1) // 128) * 128
    if r <= SBLK_MAX:
        return r
    return -(-g // GBLK) * GBLK


def vmem_bytes(b: int, g_pad: int) -> int:
    """Rough VMEM bytes for a (b, g_pad) batch: q + 2x byte tile +
    unpacked plane + acc + 2x int8 out block, at the G-block size."""
    gb = g_pad if g_pad <= SBLK_MAX else GBLK
    return (
        2 * b * gb  # q block
        + 2 * gb * BLKB  # byte tile, double-buffered
        + 2 * gb * BLKB  # unpacked plane
        + 4 * b * BLKB  # acc
        + 2 * b * TILE_LANES  # int8 out block, double-buffered
    )


def fits_vmem(b: int, g_pad: int) -> bool:
    return vmem_bytes(b, g_pad) <= _VMEM_BUDGET


def _make_kernel(int8_dots, gtiles: int, tile_mult: int = 1,
                 tmaj: bool = False):
    # int8_dots: False = bf16 dots, True = int8, "int4" = s4 x s4 -> s32
    # (v5e runs int4 MACs at 2x the int8 rate; exact while query gram
    # multiplicities stay <= 7, which the engine checks per batch),
    # "pair" = TWO bit planes per int8 operand (bit_p + 32 * bit_{p+4}):
    # one dot yields h_p + 32 * h_{p+4}, exact while the query's total
    # gram windows <= 31 (then h_p < 32 and the fields cannot carry), so
    # 4 MXU dots per byte tile instead of 8 — the MXU roofline doubles.
    if int8_dots == "int4":
        dot_t, acc_t = jnp.int4, jnp.int32
    elif int8_dots:
        dot_t, acc_t = jnp.int8, jnp.int32
    else:
        dot_t, acc_t = jnp.bfloat16, jnp.float32
    paired = int8_dots == "pair"

    def _store(out_ref, acc, sl, gi):
        if gtiles == 1:
            out_ref[:, sl] = acc.astype(jnp.int8)
        else:

            @pl.when(gi == 0)
            def _init():
                out_ref[:, sl] = acc.astype(jnp.int8)

            # Mosaic has no i8 vector add ("only vector<i16>/<i32>"):
            # widen the resident out block to i32, add, narrow back.
            # Exact: totals stay <= n_qgrams <= 127.
            @pl.when(gi > 0)
            def _accum():
                out_ref[:, sl] = (
                    out_ref[:, sl].astype(jnp.int32) + acc.astype(jnp.int32)
                ).astype(jnp.int8)

    def _tile(q, t, out_ref, base, gi):
        # one layout tile: t (Gblk, BLKB) packed bytes -> out lanes
        # [base, base + TILE_LANES)
        if paired:
            # The plane-tiled layout makes a masked byte ITSELF a valid
            # two-plane operand: (t & 0b100001) == bit_0 + 32*bit_5 as an
            # int8 value - ONE vector AND, no compares/extends (the
            # byte-unpack VPU chain, not the MXU, bounds this kernel:
            # 74 ms vs a 273 GB/s pure-stream floor of ~13 ms at 10M).
            # Gap-5 pairs (0,5) (1,6) (2,7) plus bare singles (3) (4):
            # five dots replace eight.  acc = h_p + 32*h_{p+5} is exact
            # while each field <= 31 (total query windows <= 31, the
            # engine's pair gate); the (2,7) pair's bit 7 is the int8
            # SIGN bit, so acc = 4*h_2 - 128*h_7 and the fields decode
            # arithmetically (4*h_2 < 128 bounds the mixed term).
            def sl(p):
                return slice(base + p * BLKB, base + (p + 1) * BLKB)

            for p in (0, 1):  # unsigned gap-5 pairs
                op = t & np.int8((1 << p) | (1 << (p + 5)))
                acc = jnp.dot(q, op, preferred_element_type=jnp.int32)
                _store(out_ref, (acc >> p) & 31, sl(p), gi)
                _store(out_ref, acc >> (p + 5), sl(p + 5), gi)
            # (2, 7): signed pair
            op = t & np.int8(-124)  # 0b10000100 as int8
            acc = jnp.dot(q, op, preferred_element_type=jnp.int32)
            h7 = (np.int32(127) - acc) >> 7
            _store(out_ref, h7, sl(7), gi)
            _store(out_ref, (acc + (h7 << 7)) >> 2, sl(2), gi)
            for p in (3, 4):  # bare singles: acc = (1 << p) * h_p
                op = t & np.int8(1 << p)
                acc = jnp.dot(q, op, preferred_element_type=jnp.int32)
                _store(out_ref, acc >> p, sl(p), gi)
            return
        for p in range(8):
            # sign bit via and+ne: Mosaic lacks signed cmpi on i8
            bit = (t & np.int8(-128 if p == 7 else 1 << p)) != 0
            if dot_t == jnp.int4:
                # i1 -> i4 extension fails to legalize (arith.cmpi);
                # extend through i8 first
                op = bit.astype(jnp.int8).astype(jnp.int4)
            else:
                op = bit.astype(dot_t)
            acc = jnp.dot(q, op, preferred_element_type=acc_t)
            _store(
                out_ref, acc,
                slice(base + p * BLKB, base + (p + 1) * BLKB), gi,
            )

    def kernel(q_ref, bm_ref, out_ref):
        q = q_ref[:]  # (B, Gblk)
        if dot_t == jnp.int4:
            q = q.astype(jnp.int4)
        gi = pl.program_id(1) if gtiles > 1 else 0
        # tile_mult > 1 processes several layout tiles per grid step:
        # small gathered tables (tens of rows) make each step's work tiny
        # and the ~4-5 us fixed grid-step cost dominant (2560 steps ~ 11 ms
        # at 10M terms); fusing 8-32 tiles amortizes it (docs/PERF.md).
        for ti in range(tile_mult):
            if tmaj:
                t = bm_ref[ti]
            else:
                t = bm_ref[:, ti * BLKB:(ti + 1) * BLKB]
            _tile(q, t, out_ref, ti * TILE_LANES, gi)

    return kernel


def _dispatch(qcnt, planes, *, interpret, int8_dots, with_bmax,
              tile_mult=1):
    """Shared pallas_call scaffolding for both kernel variants (grid,
    index maps, specs, cost model differ only in the optional bmax
    output).

    ``planes`` may be row-major (Gp, NB) or TILE-MAJOR
    (ntiles, Gp, BLKB).  Tile-major is the resident-table layout: a
    row-major (Gp, BLKB) grid block is Gp disjoint 512-byte HBM
    segments - far below the efficient DMA transfer size - while a
    tile-major (1, Gp, BLKB) block is one contiguous 1.4 MB chunk.
    Measured on v5e at the 10M headline shape (tools/probe_layout_r5):
    pure stream 432 -> 644 GB/s, full pair kernel 45-62 -> 27.7 ms per
    256 queries.  The OUTPUT layout stays (B, Tl): a tile-major out
    measured no further gain (29.7 ms) and the selection finish indexes
    term-ordered columns."""
    if interpret is None:
        interpret = INTERPRET
    b, gp = qcnt.shape
    tmaj = planes.ndim == 3
    if tmaj:
        nt3, gp2, blkb3 = planes.shape
        nb = nt3 * BLKB
        assert blkb3 == BLKB, planes.shape
    else:
        gp2, nb = planes.shape
    assert gp == gp2 and nb % BLKB == 0, (b, gp, gp2, nb)
    gblk = gp if gp <= SBLK_MAX else GBLK
    # gathered small tables run at 32-row granularity (int8 sublane
    # tile); resident tables keep g_padding's 128-multiples
    assert gp % gblk == 0 and gp % 32 == 0, (gp, gblk)
    gtiles = gp // gblk
    ntiles = nb // BLKB
    assert ntiles % tile_mult == 0, (ntiles, tile_mult)
    nsteps = ntiles // tile_mult
    if int8_dots:
        qcnt = qcnt.astype(jnp.int8)
    grid = (nsteps,) if gtiles == 1 else (nsteps, gtiles)
    ix = (lambda j: (0, 0)) if gtiles == 1 else (lambda j, gi: (0, gi))
    if tmaj:
        bspec = pl.BlockSpec(
            (tile_mult, gblk, BLKB),
            (lambda j: (j, 0, 0)) if gtiles == 1
            else (lambda j, gi: (j, gi, 0)),
        )
    else:
        bspec = pl.BlockSpec(
            (gblk, tile_mult * BLKB),
            (lambda j: (0, j)) if gtiles == 1
            else (lambda j, gi: (gi, j)),
        )
    ox = (lambda j: (0, j)) if gtiles == 1 else (lambda j, gi: (0, j))
    out_specs = pl.BlockSpec((b, tile_mult * TILE_LANES), ox)
    out_shape = jax.ShapeDtypeStruct((b, ntiles * TILE_LANES), jnp.int8)
    extra_bytes = 0
    if with_bmax:
        kernel = _make_kernel_bmax(
            int8_dots, gtiles, b, tile_mult, tmaj=tmaj
        )
        out_specs = [
            out_specs, pl.BlockSpec((b, tile_mult * _BMAX_BLK), ox),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((b, ntiles * _BMAX_BLK), jnp.int8),
        ]
        extra_bytes = b * ntiles * _BMAX_BLK
    else:
        kernel = _make_kernel(int8_dots, gtiles, tile_mult, tmaj=tmaj)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, gblk), ix),
            bspec,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            # the output-tile axis j is independent (each j owns its out
            # block); only the G axis accumulates and must stay ordered.
            # Marking j "parallel" measured +31% on deeply G-tiled
            # tables (47k rows / 23 G-tiles: 148.5 -> 102.6 ms), a wash
            # at 4 tiles, and -6% on single-block tables - so it applies
            # exactly when the table is G-tiled (tools/probe_sem.py).
            dimension_semantics=(
                ("parallel", "arbitrary") if gtiles > 1
                else ("arbitrary",) * len(grid)
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * gp * ntiles * TILE_LANES,
            bytes_accessed=(
                2 * b * gp + gp * nb + b * ntiles * TILE_LANES
                + extra_bytes
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(qcnt, planes)


@functools.partial(
    jax.jit, static_argnames=("interpret", "int8_dots", "tile_mult")
)
def bitmap_hits(qcnt, planes, *, interpret: bool | None = None,
                int8_dots: bool = False, tile_mult: int = 1):
    """qcnt (B, Gp) bf16 gram multiplicities  x  planes (Gp, NB) int8
    packed incidence  ->  hits (B, NB * 8) int8, term-ordered columns.

    Gp must equal g_padding(G) (HostIndex builds it so); tables wider
    than GBLK rows stream in G blocks with int8 accumulation into the
    revisited output block - gram-RICH corpora (50k+ grams) get the MXU
    path instead of the XLA per-slot scan.
    """
    return _dispatch(
        qcnt, planes, interpret=interpret, int8_dots=int8_dots,
        with_bmax=False, tile_mult=tile_mult,
    )


_BMAX_BLK = 128  # selection block width (search.candidates._BLK)
_SUBS = TILE_LANES // _BMAX_BLK  # 128-lane blocks per layout tile (32)


def _make_kernel_bmax(int8_dots: bool, gtiles: int, b: int,
                      tile_mult: int = 1, tmaj: bool = False):
    """Kernel variant with a fused per-128-lane blockmax epilogue.

    The engine's huge-tier finish (search.candidates._blockmax_finish)
    needs per-block maxima of the hits matrix; computing them in a
    separate XLA pass re-reads the whole (B, Tl) hits from HBM (~2.5 GB
    per 256-query batch at 10M keys).  Here the maxima come out of the
    same VMEM-resident tile the kernel just produced.

    Mosaic constraints shape the epilogue: no narrow-lane tensors (a
    (B, 32) result is illegal), no signed i8 compares, and no
    tpu.dynamic_rotate (pltpu.roll failed to compile on v5e libtpu).  So
    the reduce is a full-lane max over the (B*32, 128) view (lowers to
    vector.multi_reduction) broadcast back to all 128 lanes; an iota
    mask then keeps lane l only where l == s and a sublane max compacts
    the tile's 32 block maxima into lanes [0, 32) of a full (B, 128)
    vector (lanes [32, 128) are -1).  The caller slices them back out.
    """
    base = _make_kernel(int8_dots, gtiles, tile_mult, tmaj=tmaj)

    def kernel(q_ref, bm_ref, out_ref, bmax_ref):
        base(q_ref, bm_ref, out_ref)
        gi = pl.program_id(1) if gtiles > 1 else 0

        @pl.when(gi == gtiles - 1)
        def _epilogue():
            for ti in range(tile_mult):
                a = out_ref[
                    :, ti * TILE_LANES:(ti + 1) * TILE_LANES
                ].astype(jnp.bfloat16)  # (b, TILE_LANES)
                a2 = a.reshape(b * _SUBS, _BMAX_BLK)
                a2 = jnp.broadcast_to(
                    jnp.max(a2, axis=1, keepdims=True),
                    (b * _SUBS, _BMAX_BLK),
                )
                # keep lane l of sublane-group s only where l == s, else
                # -1.  Arithmetic indicator instead of an i1 select:
                # comparing two iotas produced a vector<i1> relayout
                # Mosaic rejects ("non-singleton dimension replicated in
                # destination").  _SUBS is a power of two, so
                # row % _SUBS == row & (_SUBS-1).
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (b * _SUBS, _BMAX_BLK), 1
                )
                sub = jax.lax.broadcasted_iota(
                    jnp.int32, (b * _SUBS, _BMAX_BLK), 0
                ) & (_SUBS - 1)
                diff = lane - sub
                ind = jnp.clip(
                    1 - jnp.maximum(diff, -diff), 0, 1
                ).astype(jnp.bfloat16)  # 1 iff lane == sub
                m = a2 * ind + (ind - jnp.bfloat16(1.0))  # a2 >= 0
                red = jnp.max(m.reshape(b, _SUBS, _BMAX_BLK), axis=1)
                bmax_ref[
                    :, ti * _BMAX_BLK:(ti + 1) * _BMAX_BLK
                ] = red.astype(jnp.int8)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("interpret", "int8_dots", "tile_mult")
)
def bitmap_hits_bmax(qcnt, planes, *, interpret: bool | None = None,
                     int8_dots: bool = False, tile_mult: int = 1):
    """bitmap_hits + fused per-128-lane blockmax.

    Returns (hits (B, NB*8) int8, bmax (B, NB*8/128) int8): bmax[:, c] =
    max(hits[:, 128c : 128c+128]), computed in VMEM before the hits tile
    leaves the kernel (no second full-matrix HBM pass).  Padding lanes
    yield bmax -1 (< any count), matching block_hmax's never-selected
    semantics for empty blocks."""
    hits, bmax = _dispatch(
        qcnt, planes, interpret=interpret, int8_dots=int8_dots,
        with_bmax=True, tile_mult=tile_mult,
    )
    # lanes [SUBS, 128) of each tile's bmax block are -1 filler; the real
    # maxima sit in lanes [0, SUBS) in tile order
    b = hits.shape[0]
    ntiles = hits.shape[1] // TILE_LANES
    bm = bmax.reshape(b, ntiles, _BMAX_BLK)[:, :, :_SUBS]
    return hits, bm.reshape(b, ntiles * _SUBS)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows_pallas(table, rows, *, interpret: bool | None = None):
    """Row gather via scalar-prefetched block DMAs: out[i] = table[rows[i]].

    The batch row compaction is a (Gc, T/8) copy of 1.3 MB rows;
    ``jnp.take`` measured ~60 GB/s combined on v5e (62 ms for 1408 rows
    at 10M terms), far under HBM speed.  Here each grid step DMAs one
    whole row chosen by the prefetched index vector - a straight-line
    HBM->VMEM->HBM stream.  Rows must be in [0, G)."""
    if interpret is None:
        interpret = INTERPRET
    g, nb = table.shape
    (gc,) = rows.shape
    # Mosaic requires the last two block dims be 8/128-divisible or equal
    # to the array dims; a (1, nb) block over (G, nb) violates the
    # sublane rule, so view rows as (G, nb/128, 128) and move the row
    # axis out of the tiled pair
    assert nb % 128 == 0, nb
    t3 = table.reshape(g, nb // 128, 128)
    out = pl.pallas_call(
        lambda idx_ref, t_ref, o_ref: o_ref.__setitem__(
            (slice(None), slice(None), slice(None)), t_ref[...]
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gc,),
            in_specs=[
                pl.BlockSpec(
                    (1, nb // 128, 128),
                    lambda i, idx_ref: (idx_ref[i], 0, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, nb // 128, 128), lambda i, idx_ref: (i, 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((gc, nb // 128, 128), table.dtype),
        interpret=interpret,
    )(rows.astype(jnp.int32), t3)
    return out.reshape(gc, nb)


@functools.partial(jax.jit, static_argnames=("interpret", "nsem"))
def gather_rows_dma(table, rows, *, interpret: bool | None = None,
                    nsem: int = 8):
    """Row gather as pipelined HBM->HBM DMAs: out[i] = table[rows[i]].

    gather_rows_pallas pays a ~120 us grid-step overhead PER ROW (175 ms
    for 1408 rows - the same ~11 GB/s as XLA's jnp.take; docs/PERF.md
    round 4), because each row is its own pipelined grid step.  Here ONE
    grid step issues every row copy as an explicit async DMA with
    ``nsem`` in flight, straight HBM->HBM (the refs stay in ANY space,
    no VMEM round trip): a 1.31 MB contiguous row is ~5 us of DMA, so
    the gather runs at copy speed instead of grid-step speed.  Used by
    the small-batch gathered-row front end (search.candidates), where
    the batch's gram-union rows replace the full-table stream."""
    if interpret is None:
        interpret = INTERPRET
    g, nb = table.shape
    (gc,) = rows.shape
    # Mosaic HBM memref slices must be 8-sublane aligned: view each
    # 1 x nb row as an (8, nb/8) sub-block (PAD_LANES term padding makes
    # nb/8 a 128-lane multiple)
    assert nb % 1024 == 0, nb  # table built with PAD_LANES term padding
    t8 = table.reshape(g * 8, nb // 8)

    def kernel(rows_ref, t_ref, o_ref, sem):
        def issue(k):
            return pltpu.make_async_copy(
                t_ref.at[pl.ds(rows_ref[k] * 8, 8)],
                o_ref.at[pl.ds(k * 8, 8)],
                sem.at[k % nsem],
            )

        def body(k, _):
            # wait out the copy nsem behind before reusing its semaphore
            @pl.when(k >= nsem)
            def _drain():
                issue(k - nsem).wait()

            issue(k).start()
            return 0

        jax.lax.fori_loop(0, gc, body, 0, unroll=False)

        def drain(k, _):
            issue(k).wait()
            return 0

        jax.lax.fori_loop(max(gc - nsem, 0), gc, drain, 0, unroll=False)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((nsem,))],
        ),
        out_shape=jax.ShapeDtypeStruct((gc * 8, nb // 8), table.dtype),
        interpret=interpret,
    )(rows.astype(jnp.int32), t8)
    return out.reshape(gc, nb)


def pick_tile_mult(b: int, gp: int, ntiles: int, max_mult: int = 32) -> int:
    """Largest layout-tile fusion factor that divides the tile count and
    keeps the per-step working set inside the VMEM budget.  Small
    GATHERED tables (tens of rows) make each grid step's work tiny, so
    the fixed ~4-5 us step cost dominates (2,560 steps ~ 11 ms at 10M
    terms); fusing 8-32 tiles per step amortizes it."""
    m = max_mult
    while m > 1:
        if ntiles % m == 0:
            work = (
                2 * b * gp  # q block
                + 2 * gp * m * BLKB  # byte tile, double-buffered
                + gp * m * BLKB  # masked operand
                + 4 * b * m * BLKB  # acc
                + 2 * b * m * TILE_LANES  # int8 out block
                + 2 * b * m * _BMAX_BLK  # bmax block
            )
            if work <= _VMEM_BUDGET:
                return m
        m //= 2
    return 1


def to_tile_major(planes):
    """(Gp, NB) row-major packed planes -> (ntiles, Gp, BLKB) tile-major.

    One on-device transpose (~2 HBM passes, one-time per index build);
    see _dispatch for why the resident layout is tile-major."""
    gp, nb = planes.shape
    return planes.reshape(gp, nb // BLKB, BLKB).transpose(1, 0, 2)


def from_tile_major(planes3):
    """(ntiles, Gp, BLKB) tile-major -> row-major (Gp, NB)."""
    nt, gp, blkb = planes3.shape
    return planes3.transpose(1, 0, 2).reshape(gp, nt * blkb)


def bitmap_hits_ref(qcnt, planes):
    """Pure-XLA reference for tests: unpack the whole table and matmul."""
    if planes.ndim == 3:
        planes = from_tile_major(planes)
    gp, nb = planes.shape
    ntiles = nb // BLKB
    t = planes.reshape(gp, ntiles, BLKB)
    bits = [
        (t & np.int8(-128 if p == 7 else 1 << p)) != 0 for p in range(8)
    ]
    m = jnp.stack(bits, axis=2)  # (Gp, ntiles, 8, BLKB)
    m = m.reshape(gp, ntiles * TILE_LANES).astype(jnp.bfloat16)
    return jnp.dot(
        qcnt, m, preferred_element_type=jnp.float32
    ).astype(jnp.int8)
