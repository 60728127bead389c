"""Host-side index construction.

Oracle-faithful re-implementation of the reference's build path
(StringIndex ctor nGramSearch.hpp:120-172, init nGramSearch.hpp:54-108,
buildGrams nGramSearch.hpp:41-46) producing flat numpy/JAX arrays instead of
hash maps:

  row parse -> (term, key, weight) edges -> string pool (first-encounter
  order) -> long/short split at 2*gram_size -> CSR gram->term postings
  (deduped per term, set semantics of nGramSearch.h:296).

The build is host-orchestrated: normalization runs as vectorized numpy LUT
ops (core.text); gram shingling and CSR assembly are numpy sort/unique
passes.  Gram ids (int64) stay host-side; the device only sees dense slots.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_VALID_CHARS, IndexConfig
from ..core import grams as gramlib
from ..core import text as textlib
from .arrays import DeviceIndex


@dataclasses.dataclass
class HostIndex:
    """Host state for one index: strings for result return, gram id table
    for query slot lookup, and the device pytree."""

    config: IndexConfig
    tables: textlib.TextTables
    key_strings: list  # raw (trimmed) master keys, result strings
    gram_ids: np.ndarray  # (G,) int64 sorted distinct gram ids
    device: DeviceIndex
    n_terms: int  # getSize (wordMap.size, nGramSearch.hpp:488-491)
    max_term_len: int  # reference's `longest` over terms
    vocab: Optional[gramlib.WideVocab]
    indexed: bool
    host_posting_lens: np.ndarray  # (G,) int64, host copy for query caps

    @property
    def n_grams(self) -> int:  # getLibSize (nGramSearch.hpp:496-499)
        return int(self.gram_ids.shape[0])

    def lookup_gram_slots(self, ids: np.ndarray) -> np.ndarray:
        """int64 gram ids -> dense slots in [0, G), or -1 when absent."""
        idx = np.searchsorted(self.gram_ids, ids)
        idx_c = np.minimum(idx, max(self.n_grams - 1, 0))
        if self.n_grams:
            hit = self.gram_ids[idx_c] == ids
        else:
            hit = np.zeros(ids.shape, dtype=bool)
        return np.where(hit, idx_c, -1).astype(np.int32)

    def set_valid_char(self, chars: bytes) -> None:
        """Replace the valid-char set (dllmain.cpp:142-151).  Affects query
        normalization and the exact-match key comparison; the gram index is
        immutable (same as the reference, which never re-shingles)."""
        self.tables = textlib.TextTables(chars, wide=self.config.wide)
        key_tokens, key_lengths = textlib.encode_batch(
            self.key_strings, self.config.wide
        )
        norm, norm_len = textlib.normalize_matrix(
            key_tokens, key_lengths, self.tables, upper=False
        )
        self.device = self.device.replace(
            key_norm_tokens=jnp.asarray(_pad_width(norm, 1).astype(np.int32)),
            key_norm_lengths=jnp.asarray(norm_len),
        )


def _pad_width(mat: np.ndarray, min_width: int, multiple: int = 8) -> np.ndarray:
    """Pad the trailing dim to a multiple (TPU lane friendliness)."""
    width = max(mat.shape[1], min_width)
    width = -(-width // multiple) * multiple
    if width > mat.shape[1]:
        mat = np.pad(mat, ((0, 0), (0, width - mat.shape[1])))
    return mat


def build_index(
    words: Sequence,
    row_size: int,
    weights: Optional[Sequence[float]] = None,
    config: IndexConfig = IndexConfig(),
    valid_chars: bytes = DEFAULT_VALID_CHARS,
) -> HostIndex:
    """Build an index from the reference's flattened row model
    (indexN, dllmain.cpp:37-49): every row's first word is the master key,
    remaining row words map to it; zero weight drops the pair
    (nGramSearch.hpp:141-148)."""
    tables = textlib.TextTables(valid_chars, wide=config.wide)
    empty = words is None or len(words) < 2  # size<2 guard, nGramSearch.hpp:122
    if empty:
        words = []

    size = len(words)
    weights_arr = None
    if weights is not None:
        weights_arr = np.asarray(weights, dtype=np.float32)

    # -- row parse: normalized term / raw key / weight triples -------------
    present = [i for i, w in enumerate(words) if w is not None]
    if present:
        tokens, lengths = textlib.encode_batch([words[i] for i in present], config.wide)
        norm_tokens, norm_lengths = textlib.normalize_matrix(tokens, lengths, tables)
        trim_tokens, trim_lengths = textlib.trim_only_matrix(tokens, lengths, tables)
        norm_str = {
            i: textlib.decode_row(norm_tokens[k], int(norm_lengths[k]), config.wide)
            for k, i in enumerate(present)
        }
        trim_str = {
            i: textlib.decode_row(trim_tokens[k], int(trim_lengths[k]), config.wide)
            for k, i in enumerate(present)
        }
    else:
        norm_str, trim_str = {}, {}

    # term string -> {key string: weight}; insertion ordered (oracle parity).
    word_map: dict = {}

    def _weight(j: int) -> float:
        if weights_arr is None or j >= weights_arr.shape[0]:
            return 1.0
        return float(weights_arr[j])

    for i in range(0, size, row_size):
        if words[i] is None:
            continue
        str_key = trim_str[i]
        if not str_key:
            continue
        w = _weight(i)
        if w != 0.0:
            word_map.setdefault(norm_str[i], {})[str_key] = w
        for j in range(i + 1, min(i + row_size, size)):
            if words[j] is None:
                continue
            term = norm_str[j]
            if not term:
                continue
            w = _weight(j)
            if w != 0.0:
                word_map.setdefault(term, {})[str_key] = w

    # -- string pool / id assignment (first-encounter order) ---------------
    term_strings = list(word_map.keys())
    key_ids: dict = {}
    key_strings: list = []
    for keys in word_map.values():
        for k in keys:
            if k not in key_ids:
                key_ids[k] = len(key_strings)
                key_strings.append(k)

    # -- long/short split (len >= 2*gram_size -> long, nGramSearch.hpp:82) --
    cutoff = config.long_cutoff
    short_terms = [t for t in term_strings if len(t) < cutoff]
    long_terms = [t for t in term_strings if len(t) >= cutoff]
    term_local: dict = {}
    for idx, t in enumerate(short_terms):
        term_local[t] = idx
    for idx, t in enumerate(long_terms):
        term_local[t] = len(short_terms) + idx

    # -- edges ---------------------------------------------------------------
    edge_term, edge_key, edge_weight = [], [], []
    for t, keys in word_map.items():
        for k, w in keys.items():
            edge_term.append(term_local[t])
            edge_key.append(key_ids[k])
            edge_weight.append(np.float32(w))

    # -- token matrices -------------------------------------------------------
    wide = config.wide
    if short_terms:
        st, sl = textlib.encode_batch(short_terms, wide)
    else:
        st, sl = np.zeros((0, 1), np.uint32 if wide else np.uint8), np.zeros(0, np.int32)
    st = _pad_width(st, config.short_pad)

    if long_terms:
        lt, ll = textlib.encode_batch(long_terms, wide)
    else:
        lt, ll = np.zeros((0, 1), np.uint32 if wide else np.uint8), np.zeros(0, np.int32)
    lt = _pad_width(lt, config.gram_size)

    # -- gram postings (deduped per term: posting-set semantics) -------------
    vocab = None
    if wide and config.gram_size == 4:
        vocab = gramlib.WideVocab(lt[lt > 0] if lt.size else np.zeros(0, np.int64))
    if long_terms:
        gids, gvalid = gramlib.gram_ids(lt, ll, config.gram_size, wide, vocab)
        flat_g = gids[gvalid]
        flat_t = np.broadcast_to(
            np.arange(gids.shape[0], dtype=np.int64)[:, None], gids.shape
        )[gvalid]
        pairs = np.unique(np.stack([flat_g, flat_t], axis=1), axis=0)
        distinct_grams, gram_start_counts = np.unique(pairs[:, 0], return_counts=True)
        gram_ptr = np.zeros(distinct_grams.shape[0] + 1, dtype=np.int32)
        np.cumsum(gram_start_counts, out=gram_ptr[1:])
        gram_terms = pairs[:, 1].astype(np.int32)
    else:
        distinct_grams = np.zeros(0, dtype=np.int64)
        gram_ptr = np.zeros(1, dtype=np.int32)
        gram_terms = np.zeros(0, dtype=np.int32)

    # -- keys -----------------------------------------------------------------
    if key_strings:
        kt, kl = textlib.encode_batch(key_strings, wide)
        knorm, knorm_len = textlib.normalize_matrix(kt, kl, tables, upper=False)
    else:
        knorm = np.zeros((0, 1), np.uint32 if wide else np.uint8)
        kl = np.zeros(0, np.int32)
        knorm_len = np.zeros(0, np.int32)
    knorm = _pad_width(knorm, 1)

    device = DeviceIndex(
        short_tokens=jnp.asarray(st.astype(np.int32)),
        short_lengths=jnp.asarray(sl),
        long_tokens=jnp.asarray(lt.astype(np.int32)),
        long_lengths=jnp.asarray(ll),
        gram_ptr=jnp.asarray(gram_ptr),
        gram_terms=jnp.asarray(gram_terms),
        edge_term=jnp.asarray(np.asarray(edge_term, dtype=np.int32)),
        edge_key=jnp.asarray(np.asarray(edge_key, dtype=np.int32)),
        edge_weight=jnp.asarray(np.asarray(edge_weight, dtype=np.float32)),
        key_len=jnp.asarray(
            np.asarray([len(k) for k in key_strings], dtype=np.int32)
        ),
        key_norm_tokens=jnp.asarray(knorm.astype(np.int32)),
        key_norm_lengths=jnp.asarray(knorm_len),
    )

    posting_lens = np.diff(gram_ptr).astype(np.int64)
    max_len = max((len(t) for t in term_strings), default=0)
    return HostIndex(
        config=config,
        tables=tables,
        key_strings=key_strings,
        gram_ids=distinct_grams,
        device=device,
        n_terms=len(term_strings),
        max_term_len=max_len,
        vocab=vocab,
        indexed=not empty,
        host_posting_lens=posting_lens,
    )
