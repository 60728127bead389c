"""Device-resident index arrays.

TPU-first re-design of the reference's hash-map index state
(nGramSearch.h:279-313): strings become padded token matrices, the
``unordered_map<int32_t, unordered_set<size_t>>`` posting index becomes CSR
arrays over dense gram slots, and the term->key maps become a COO edge list
consumed by segment-max score propagation.  Everything is immutable once
built (removing the reference's setValidChar data race, dllmain.cpp:147-150).

Term index space: short-tier terms occupy [0, n_short), long-tier terms
[n_short, n_short + n_long) - mirroring the shortLib/longLib split at
nGramSearch.hpp:82-85.
"""

from __future__ import annotations

from flax import struct
import jax.numpy as jnp


@struct.dataclass
class DeviceIndex:
    """Pytree of device arrays for one index instance."""

    # -- short tier (terms with normalized length < 2*gram_size) ----------
    short_tokens: jnp.ndarray  # (Ts, short_pad) uint8 (narrow) / int32
    # (wide) codepoints, 0-padded
    short_lengths: jnp.ndarray  # (Ts,) int32

    # -- long tier ----------------------------------------------------------
    long_tokens: jnp.ndarray  # (Tl, long_pad) uint8 / int32, 0-padded,
    # rows length-ASCENDING (build sorts the tier for the width-bucketed DP)
    long_lengths: jnp.ndarray  # (Tl,) int32

    # -- gram postings (CSR over dense gram slots; slots sorted by gram id) --
    gram_ptr: jnp.ndarray  # (G + 1,) int32
    gram_terms: jnp.ndarray  # (P,) int32 long-tier local ids, sorted per slot

    # -- term -> key edges (COO sorted by (term, key); term ids in global
    #    term space Ts + Tl).  term_edge_ptr is the CSR over edge_term and
    #    term_wmax the per-term max |weight|-free upper-bound weight, both
    #    used by the candidate-sparse search path. -------------------------
    edge_term: jnp.ndarray  # (E,) int32
    edge_key: jnp.ndarray  # (E,) int32 in [0, K)
    edge_weight: jnp.ndarray  # (E,) float32
    term_edge_ptr: jnp.ndarray  # (T + 1,) int32
    term_wmax: jnp.ndarray  # (T,) float32
    # primary-edge decomposition: every term's FIRST edge as dense arrays
    # (one gather per candidate instead of a CSR expansion; most terms have
    # exactly one key), remaining edges as a small term-keyed CSR.
    term_prim_key: jnp.ndarray  # (T,) int32, -1 = term has no edges
    term_prim_weight: jnp.ndarray  # (T,) float32
    term_extra_ptr: jnp.ndarray  # (T + 1,) int32 over the extra edges
    extra_key: jnp.ndarray  # (E - T',) int32
    extra_weight: jnp.ndarray  # (E - T',) float32
    # key-sorted duplicate of the edges (promotion scoring on the candidate
    # path examines the <= PK promo keys' own edge slices)
    key_edge_ptr: jnp.ndarray  # (K + 1,) int32
    key_edge_term: jnp.ndarray  # (E,) int32
    key_edge_weight: jnp.ndarray  # (E,) float32

    # -- keys ---------------------------------------------------------------
    key_len: jnp.ndarray  # (K,) int32: raw key string length (sort tiebreak)
    # the normalized key token matrix stays HOST-side (HostIndex
    # .host_key_norm_tokens): promotion eligibility is a host hash lookup
    # (promo_key_ids), so the (K, W) compare matrix never occupies HBM

    @property
    def n_short(self) -> int:
        return self.short_tokens.shape[0]

    @property
    def n_long(self) -> int:
        return self.long_tokens.shape[0]

    @property
    def n_terms(self) -> int:
        return self.n_short + self.n_long

    @property
    def n_keys(self) -> int:
        return self.key_len.shape[0]

    @property
    def n_grams(self) -> int:
        return self.gram_ptr.shape[0] - 1
