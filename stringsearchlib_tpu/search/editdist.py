"""Batched semi-global edit-distance scorer (short tier).

Reproduces ``stringMatch`` (nGramSearch.hpp:182-222): row1 zero-init gives
free leading gaps in the source, the final min over the last row gives free
trailing gaps, so the result is the best match of the query against ANY
substring of the source; returned value is qlen - min_edit.

TPU-first formulation: instead of the reference's per-string scalar DP, one
``lax.scan`` step per query character updates the DP rows of ALL terms at
once.  The in-row dependency (row2[s+1] depends on row2[s]) is eliminated
with a min-plus prefix scan:

    row2[p] = min(row2[p-1] + 1, a[p]),   a[p] = min(row1[p]+1, row1[p-1]+cost)
  =>  row2[p] = p + cummin_k<=p (a[k] - k),  with a[0] := q+1

so each step is elementwise VPU work plus one ``jax.lax.cummin`` along the
source axis - no wavefront, no scalar loop.

The reference's 1-char containment special case (nGramSearch.hpp:185-191) is
mathematically identical to the general DP at qlen=1 (min edit is 0 iff the
char occurs), so no branch is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_BIG = np.int32(1 << 30)


def dp_match(
    tokens: jnp.ndarray,  # (N, L) int32, 0-padded
    lengths: jnp.ndarray,  # (N,) int32
    qtokens: jnp.ndarray,  # (Qp,) int32, 0-padded
    qlen: jnp.ndarray,  # scalar int32
) -> jnp.ndarray:
    """Match counts (N,) int32: qlen - semi-global edit distance."""
    n, width = tokens.shape
    qp = qtokens.shape[0]
    positions = jnp.arange(width + 1, dtype=jnp.int32)  # p in [0, L]

    def step(row1, q):
        qc = qtokens[q]
        active = q < qlen
        cost = jnp.where(tokens == qc, 0, 1)  # (N, L)
        a = jnp.minimum(row1[:, 1:] + 1, row1[:, :-1] + cost)  # p in [1, L]
        d0 = jnp.full((n, 1), q + 1, dtype=jnp.int32)  # virtual a[0] = q+1
        d = jnp.concatenate([d0, a - positions[1:][None, :]], axis=1)
        row2 = positions[None, :] + jax.lax.cummin(d, axis=1)
        return jnp.where(active, row2, row1), None

    row1 = jnp.zeros((n, width + 1), dtype=jnp.int32)
    row1, _ = jax.lax.scan(step, row1, jnp.arange(qp, dtype=jnp.int32))

    # min over p in [0, len] only (positions beyond the source are not part
    # of the reference's final row, nGramSearch.hpp:217-220).
    in_range = positions[None, :] <= lengths[:, None]
    mismatch = jnp.min(jnp.where(in_range, row1, _BIG), axis=1)
    return qlen.astype(jnp.int32) - mismatch


def dp_match_tiered(
    tokens: jnp.ndarray,  # (N, L) int32, rows sorted by length ascending
    lengths: jnp.ndarray,  # (N,) int32, ascending
    qtokens: jnp.ndarray,
    qlen: jnp.ndarray,
    buckets: tuple,  # static ((end_row, width), ...) covering [0, N)
) -> jnp.ndarray:
    """dp_match over a length-sorted tier in width buckets.

    The tier's token matrix is padded to its LONGEST member; on skewed
    corpora (one 256-char term among millions of ~20-char ones) a single
    dp_match pays that global width for every row.  Build sorts the long
    tier by normalized length (index.build), so contiguous row ranges
    share a small bound and each bucket's DP runs at its own width -
    the length-tier analogue of the reference sizing its DP rows per
    call (nGramSearch.hpp:234-239).  Empty/degenerate ``buckets`` fall
    back to one full-width pass.
    """
    if len(buckets) <= 1:
        return dp_match(tokens, lengths, qtokens, qlen)
    outs = []
    lo = 0
    for end, w in buckets:
        outs.append(
            dp_match(tokens[lo:end, :w], lengths[lo:end], qtokens, qlen)
        )
        lo = end
    return jnp.concatenate(outs)
