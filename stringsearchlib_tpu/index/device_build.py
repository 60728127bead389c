"""On-device gram-posting construction.

The reference shingles every long term into a hash-map posting set on the
CPU (buildGrams, nGramSearch.hpp:41-46).  The round-1 build did the
equivalent host-side in numpy and UPLOADED the CSR - at 10M keys that is
~2.2 GB of int32 through a ~4-8 MB/s remote tunnel, dominating index build.
Here the postings are built ON DEVICE from the already-resident long-token
matrix (which must ship regardless):

  pack g-byte windows -> (gram, term) pairs -> one 2-key sort -> dedup
  (posting-set semantics, nGramSearch.h:296) -> compact -> distinct grams
  + CSR pointers.

Only the distinct gram ids and CSR pointers (O(G), ~200 KB) ever cross the
wire; the posting term array stays in HBM.  Output is bit-identical to the
host build (tests/test_device_build.py).

Narrow gram_size<=3 only: the packed gram fits int32 with headroom for the
padding sentinel.  Wide/g=4 indexes keep the host path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("gram_size",))
def _postings_kernel(long_tokens, long_lengths, *, gram_size: int):
    """Sorted deduped postings + distinct-gram tables, padded to the static
    window count P = Tl * (W - g + 1).

    Returns (gram_terms_padded (P,), gram_vals_padded (P,),
    gram_pos_padded (P,), n_keep (), n_grams ()).
    """
    t = long_tokens.astype(jnp.int32)
    w = t.shape[1] - gram_size + 1
    packed = jnp.zeros(t[:, :w].shape, jnp.int32)
    for k in range(gram_size):
        packed = (packed << 8) | t[:, k : k + w]
    big = np.int32(1 << (8 * gram_size))

    pos = jax.lax.broadcasted_iota(jnp.int32, packed.shape, 1)
    valid = pos < (long_lengths[:, None] - np.int32(gram_size - 1))
    tid = jax.lax.broadcasted_iota(jnp.int32, packed.shape, 0)

    g_flat = jnp.where(valid, packed, big).ravel()
    t_flat = tid.ravel()
    p = g_flat.shape[0]

    sg, st = jax.lax.sort((g_flat, t_flat), num_keys=2)
    dup = jnp.concatenate(
        [jnp.zeros((1,), bool), (sg[1:] == sg[:-1]) & (st[1:] == st[:-1])]
    )
    keep = (sg < big) & ~dup
    n_keep = jnp.sum(keep.astype(jnp.int32))

    # compact kept pairs to the front, preserving (gram, term) order
    cg, ct = jax.lax.sort((jnp.where(keep, sg, big), st), num_keys=2)
    kvalid = cg < big
    first = kvalid & jnp.concatenate(
        [jnp.ones((1,), bool), cg[1:] != cg[:-1]]
    )
    n_grams = jnp.sum(first.astype(jnp.int32))
    idx = jnp.arange(p, dtype=jnp.int32)
    gram_vals = jnp.sort(jnp.where(first, cg, big))
    gram_pos = jnp.sort(jnp.where(first, idx, p))
    return ct, gram_vals, gram_pos, n_keep, n_grams


def build_postings_device(long_tokens_dev, long_lengths_dev, gram_size: int):
    """Device CSR from resident long-term arrays.

    Returns (gram_terms (P,) device int32, gram_ptr (G+1,) np.int32,
    gram_ids (G,) np.int64).  ``gram_terms`` is sliced to the true posting
    count on device; the two small tables are downloaded.
    """
    ct, gram_vals, gram_pos, n_keep, n_grams = _postings_kernel(
        long_tokens_dev, long_lengths_dev, gram_size=gram_size
    )
    n_keep, n_grams = jax.device_get((n_keep, n_grams))
    n_keep, n_grams = int(n_keep), int(n_grams)
    # eager device-side slices with now-concrete sizes; the padded arrays
    # are freed once these materialize
    gram_terms = ct[:n_keep]
    vals, ptr_starts = jax.device_get(
        (gram_vals[:n_grams], gram_pos[:n_grams])
    )
    gram_ptr = np.empty(n_grams + 1, np.int32)
    gram_ptr[:n_grams] = ptr_starts
    gram_ptr[n_grams] = n_keep
    return gram_terms, gram_ptr, vals.astype(np.int64)
