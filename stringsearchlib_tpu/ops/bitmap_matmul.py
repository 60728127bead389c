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

# VMEM ceiling the caller budgets against (bytes); v5e has ~16 MB/core.
_VMEM_BUDGET = 14 << 20


def plane_coords(term):
    """term id -> (byte, bit) under the plane-tiled layout (numpy or jnp)."""
    j = term // TILE_LANES
    r = term % TILE_LANES
    return j * BLKB + r % BLKB, r // BLKB


def vmem_bytes(b: int, g_pad: int) -> int:
    """Rough VMEM bytes for a (b, g_pad) batch: q + 2x byte tile +
    unpacked bf16 plane + f32 acc + 2x int8 out block."""
    return (
        2 * b * g_pad  # q bf16
        + 2 * g_pad * BLKB  # byte tile, double-buffered
        + 2 * g_pad * BLKB  # bf16 plane
        + 4 * b * BLKB  # f32 acc
        + 2 * b * TILE_LANES  # int8 out block, double-buffered
    )


def fits_vmem(b: int, g_pad: int) -> bool:
    return vmem_bytes(b, g_pad) <= _VMEM_BUDGET


def _kernel(q_ref, bm_ref, out_ref):
    q = q_ref[:]  # (B, Gp) bf16
    t = bm_ref[:]  # (Gp, BLKB) int8 (packed bits)
    for p in range(8):
        # sign bit via and+ne, not `t < 0`: Mosaic lacks signed cmpi on i8
        bit = (t & np.int8(-128 if p == 7 else 1 << p)) != 0
        plane = bit.astype(jnp.bfloat16)
        acc = jnp.dot(q, plane, preferred_element_type=jnp.float32)
        out_ref[:, p * BLKB : (p + 1) * BLKB] = acc.astype(jnp.int8)


def _kernel_i8(q_ref, bm_ref, out_ref):
    """int8-operand variant: v5e MXU does 2x the int8 MACs of bf16.
    Counts <= 127 so si8 x si8 -> si32 accumulation is exact."""
    q = q_ref[:]  # (B, Gp) int8
    t = bm_ref[:]
    for p in range(8):
        bit = (t & np.int8(-128 if p == 7 else 1 << p)) != 0
        plane = bit.astype(jnp.int8)
        acc = jnp.dot(q, plane, preferred_element_type=jnp.int32)
        out_ref[:, p * BLKB : (p + 1) * BLKB] = acc.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("interpret", "int8_dots"))
def bitmap_hits(qcnt, planes, *, interpret: bool | None = None,
                int8_dots: bool = False):
    """qcnt (B, Gp) bf16 gram multiplicities  x  planes (Gp, NB) int8
    packed incidence  ->  hits (B, NB * 8) int8, term-ordered columns.

    Gp must be a multiple of 128 and NB of BLKB (HostIndex pads both).
    """
    if interpret is None:
        interpret = INTERPRET
    b, gp = qcnt.shape
    gp2, nb = planes.shape
    assert gp == gp2 and gp % 128 == 0 and nb % BLKB == 0, (b, gp, gp2, nb)
    ntiles = nb // BLKB
    if int8_dots:
        qcnt = qcnt.astype(jnp.int8)
    return pl.pallas_call(
        _kernel_i8 if int8_dots else _kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((b, gp), lambda j: (0, 0)),
            pl.BlockSpec((gp, BLKB), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((b, TILE_LANES), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((b, ntiles * TILE_LANES), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * gp * ntiles * TILE_LANES,
            bytes_accessed=2 * b * gp + gp * nb + b * ntiles * TILE_LANES,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qcnt, planes)


def bitmap_hits_ref(qcnt, planes):
    """Pure-XLA reference for tests: unpack the whole table and matmul."""
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
