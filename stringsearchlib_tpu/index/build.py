"""Host-side index construction (fully vectorized).

Oracle-faithful re-implementation of the reference's build path
(StringIndex ctor nGramSearch.hpp:120-172, init nGramSearch.hpp:54-108,
buildGrams nGramSearch.hpp:41-46) producing flat numpy/JAX arrays instead of
hash maps.  The whole build is numpy array passes - no per-row Python loop:

  bulk encode -> vectorized normalize (core.text) -> element role masks
  (master/tail, null/empty/zero-weight skips) -> interleaved string dedup
  (void-view unique) -> term/key id spaces -> (term, key, weight) edge dedup
  (last weight wins) -> long/short split at 2*gram_size -> CSR gram->term
  postings (set semantics of nGramSearch.h:296).

Deterministic id rule shared with the oracle: a string's id is its first
*recorded* occurrence in element order, counting each recorded element as
(term, then key).  The reference's ids are unordered_set-arbitrary
(nGramSearch.hpp:58-65), so only determinism and oracle agreement matter.

Result strings decode lazily: only the top-k keys a query returns are ever
converted back to Python strings.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_VALID_CHARS, IndexConfig
from ..core import grams as gramlib
from ..core import text as textlib
from . import native as nativelib
from .arrays import DeviceIndex


class KeyStrings:
    """Lazy decoder over the raw (trimmed) master-key token matrix."""

    def __init__(self, tokens: np.ndarray, lengths: np.ndarray, wide: bool):
        self.tokens = tokens
        self.lengths = lengths
        self.wide = wide
        self._cache: dict[int, str] = {}

    def __len__(self) -> int:
        return self.tokens.shape[0]

    def __getitem__(self, i: int) -> str:
        i = int(i)
        s = self._cache.get(i)
        if s is None:
            s = textlib.decode_row(self.tokens[i], int(self.lengths[i]), self.wide)
            self._cache[i] = s
        return s

    def take(self, ids) -> list:
        """Decode many rows at once: one gather + one bytes conversion
        instead of per-id calls (result emit measured 0.35 ms per 100
        per-call decodes; this is ~10x cheaper and skips the cache)."""
        ids = np.asarray(ids, dtype=np.int64)
        toks = self.tokens[ids]
        lens = self.lengths[ids]
        w = self.tokens.shape[1]
        if self.wide:
            buf = toks.astype(np.uint32).tobytes()
            return [
                buf[i * 4 * w : i * 4 * w + 4 * int(lens[i])].decode(
                    "utf-32-le"
                )
                for i in range(ids.shape[0])
            ]
        buf = toks.astype(np.uint8).tobytes()
        return [
            buf[i * w : i * w + int(lens[i])].decode("latin-1")
            for i in range(ids.shape[0])
        ]

    def tolist(self) -> list:
        return [self[i] for i in range(len(self))]


@dataclasses.dataclass
class HostIndex:
    """Host state for one index: lazy key strings for result return, gram id
    table for query slot lookup, and the device pytree."""

    config: IndexConfig
    tables: textlib.TextTables
    key_strings: KeyStrings
    gram_ids: np.ndarray  # (G,) int64 sorted distinct gram ids
    device: DeviceIndex
    n_terms: int  # getSize (wordMap.size, nGramSearch.hpp:488-491)
    max_term_len: int  # reference's `longest` over terms
    vocab: Optional[gramlib.WideVocab]
    indexed: bool
    host_posting_lens: np.ndarray  # (G,) int64, host copy for query caps
    host_key_norm_tokens: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 1), np.uint8)
    )
    host_key_norm_lengths: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.int32)
    )
    host_key_edge_counts: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.int32)
    )
    # host copy of the (length-ascending) long-tier lengths; None = fetch
    # lazily from device when the width buckets are first needed
    host_long_lengths: Optional[np.ndarray] = None
    # host copies of the key->edge CSR: the engine expands promotion keys'
    # edge lists host-side (they are typically 1-2 entries; the on-device
    # CSR expansion cost 2 x PK x 128 random gathers per query).  None =
    # fetch lazily from device (serialize keeps them in the npz).
    host_key_edge_ptr: Optional[np.ndarray] = None
    host_key_edge_term: Optional[np.ndarray] = None
    host_key_edge_weight: Optional[np.ndarray] = None
    # every term->key edge weight == 1.0 (the default-weight case,
    # nGramSearch.hpp:141-148): per-term score upper bounds then equal the
    # score itself, enabling the integer hit-threshold (h*) selection
    # (search.candidates._hstar_finish)
    uniform_weights: bool = False
    _key_hash_cache: Optional[tuple] = None
    _dp_bucket_cache: Optional[tuple] = None
    _gram_matrix_cache: object = dataclasses.field(default=None, repr=False)

    @property
    def n_grams(self) -> int:  # getLibSize (nGramSearch.hpp:496-499)
        return int(self.gram_ids.shape[0])

    # -- exact-match promotion lookup (host side) -----------------------

    def _key_hash_table(self):
        """Sorted FNV-1a hashes of key_norm rows (escapeBlank+trim of raw
        keys) for O(log K) promotion-candidate lookup per query."""
        if self._key_hash_cache is None:
            h = _fnv_rows(self.host_key_norm_tokens, self.host_key_norm_lengths)
            order = np.argsort(h, kind="stable")
            self._key_hash_cache = (h[order], order.astype(np.int32))
        return self._key_hash_cache

    def promo_key_ids(self, qtokens: np.ndarray, qlen: int) -> np.ndarray:
        """Key ids whose normalized form equals the normalized query - the
        only keys the 0.999 -> 100 promotion (nGramSearch.hpp:328-336) can
        ever apply to.  Hash prefilter + exact row verify."""
        kt, kl = self.host_key_norm_tokens, self.host_key_norm_lengths
        if kt.shape[0] == 0 or qlen > kt.shape[1]:
            return np.zeros(0, np.int32)
        row = np.zeros((1, kt.shape[1]), dtype=kt.dtype)
        row[0, :qlen] = qtokens[:qlen]
        qh = _fnv_rows(row, np.array([qlen], np.int32))[0]
        hs, order = self._key_hash_table()
        lo = np.searchsorted(hs, qh, side="left")
        hi = np.searchsorted(hs, qh, side="right")
        cand = order[lo:hi]
        if cand.size == 0:
            return cand.astype(np.int32)
        ok = (kl[cand] == qlen) & (kt[cand] == row[0]).all(axis=1)
        return cand[ok].astype(np.int32)

    def promo_key_ids_batch(self, qtokens: np.ndarray, qlens: np.ndarray):
        """Batched promo_key_ids: ONE vectorized hash pass over a (B, W)
        normalized-query matrix (the per-call numpy overhead of the
        single-query probe measured ~0.26 ms x B, dominating batch host
        prep); the exact row verify runs only for hash hits."""
        kt, kl = self.host_key_norm_tokens, self.host_key_norm_lengths
        bsz = qtokens.shape[0]
        empty = np.zeros(0, np.int32)
        if kt.shape[0] == 0 or bsz == 0:
            return [empty] * bsz
        w = kt.shape[1]
        rows = np.zeros((bsz, w), dtype=kt.dtype)
        cw = min(w, qtokens.shape[1])
        rows[:, :cw] = qtokens[:, :cw]
        qlens = np.asarray(qlens, np.int32)
        qh = _fnv_rows(rows, qlens)
        hs, order = self._key_hash_table()
        lo = np.searchsorted(hs, qh, side="left")
        hi = np.searchsorted(hs, qh, side="right")
        counts = np.where(qlens <= w, hi - lo, 0)
        out = [empty] * bsz
        hit_q = np.nonzero(counts > 0)[0]
        if hit_q.size == 0:
            return out
        # flatten every hit query's candidate range, verify in ONE pass
        qidx = np.repeat(hit_q, counts[hit_q])
        within = np.arange(qidx.size) - np.repeat(
            np.cumsum(counts[hit_q]) - counts[hit_q], counts[hit_q]
        )
        cand = order[lo[qidx] + within]
        ok = (kl[cand] == qlens[qidx]) & (kt[cand] == rows[qidx]).all(axis=1)
        for i in hit_q:
            out[i] = cand[(qidx == i) & ok].astype(np.int32)
        return out

    def _incidence_slabs(
        self, n_rows: int, n_cols: int, kind: str,
        max_flat: int = 2**31 - 1,
    ):
        """Build a (n_rows, n_cols) int8 incidence-derived table ON DEVICE
        from the resident CSR, as row slabs of 1-D flat-index scatters.

        Why not one 2D scatter: XLA pads a (P, 2) scatter-index tensor to
        128 lanes - a 64x transient blowup (105 GB at 206M postings).  Why
        slabs: the 1-D flat index row*n_cols + col must stay inside int32.
        Each slab covers a contiguous gram-row range; its posting span is
        found host-side from gram_ptr, sliced with a traced start (clamped
        host-side so the static-size dynamic_slice never shifts), and rows
        outside the slab fall out of the scatter via mode='drop'.

        kind 'ones': col = term, value 1 (dense 0/1 incidence).
        kind 'bits': plane-tiled packed bytes (ops.bitmap_matmul layout).
        kind 'bits3': same bytes scattered DIRECTLY into the tile-major
        (ntiles, n_rows, BLKB) residency - building row-major and
        transposing doubled peak HBM (a 5.9 GB gram-rich table OOM'd the
        16 GB chip during its own transpose).
        """
        import jax

        from ..ops.bitmap_matmul import BLKB, plane_coords

        gp_host = np.asarray(jax.device_get(self.device.gram_ptr), np.int64)
        g = self.n_grams
        total_p = int(gp_host[-1]) if gp_host.size else 0
        slab = max(1, min(n_rows, max_flat // max(n_cols, 1)))
        bounds = list(range(0, n_rows, slab)) + [n_rows]
        spans = []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            p0 = int(gp_host[min(lo, g)])
            p1 = int(gp_host[min(hi, g)])
            spans.append((lo, hi, p0, p1))
        def _np2(n, lo_b):
            v = lo_b
            while v < n:
                v *= 2
            return v

        p_pad = _np2(max(max((p1 - p0 for _, _, p0, p1 in spans),
                             default=1), 1), 1024)
        p_pad = min(p_pad, _np2(max(total_p, 1), 1024))

        @functools.partial(jax.jit, static_argnums=(4, 5, 6))
        def _slab(gram_ptr, gram_terms, start, lo, rows_here, n_cols, kind):
            pos = jnp.arange(p_pad, dtype=jnp.int32)
            seg = jax.lax.dynamic_slice(gram_terms, (start,), (p_pad,))
            gpos = start + pos
            rows = (
                jnp.searchsorted(
                    gram_ptr, gpos.astype(gram_ptr.dtype), side="right"
                ).astype(jnp.int32)
                - 1
                - lo
            )
            if kind in ("bits", "bits3"):
                col, bit = plane_coords(seg)
                val = jnp.uint8(1) << bit.astype(jnp.uint8)
            else:
                col, val = seg, jnp.uint8(1)
            if kind == "bits3":
                # tile-major flat index: (tile * rows + row) * BLKB + k.
                # Same rows_here * n_cols int32 bound as row-major.
                flat = (
                    (col // BLKB) * np.int32(rows_here)
                    + rows
                ) * np.int32(BLKB) + col % BLKB
            else:
                flat = rows * np.int32(n_cols) + col
            oob = np.int32(min(rows_here * n_cols, 2**31 - 1))
            ok = (rows >= 0) & (rows < rows_here) & (gpos < gram_ptr[-1])
            flat = jnp.where(ok, flat, oob)
            packed = (
                jnp.zeros((rows_here * n_cols,), jnp.uint8)
                .at[flat]
                .add(val, mode="drop")
            )
            shape = (
                (n_cols // BLKB, rows_here, BLKB)
                if kind == "bits3" else (rows_here, n_cols)
            )
            return jax.lax.bitcast_convert_type(
                packed.reshape(shape), jnp.int8
            )

        gt = self.device.gram_terms
        if int(gt.shape[0]) < p_pad:  # tiny index: pad once so the
            gt = jnp.pad(gt, (0, p_pad - int(gt.shape[0])))  # slice fits
        pieces = []
        for lo, hi, p0, p1 in spans:
            start = max(0, min(p0, int(gt.shape[0]) - p_pad))
            pieces.append(
                _slab(
                    self.device.gram_ptr, gt, np.int32(start), np.int32(lo),
                    hi - lo, n_cols, kind,
                )
            )
        cat_axis = 1 if kind == "bits3" else 0  # gram axis position
        return (
            pieces[0] if len(pieces) == 1
            else jnp.concatenate(pieces, cat_axis)
        )

    def gram_matrix(self, budget_bytes: int = 1536 << 20):
        """Dense 0/1 gram->long-term incidence matrix as device bf16, or
        None when G * Tl would exceed ``budget_bytes``.

        The MXU hits path (search.candidates.candidates_matmul) computes
        every query's hit counts as one q_cnt @ M matmul - the idiomatic
        TPU mapping of the reference's posting-accumulation loop
        (nGramSearch.hpp:289-298) for gram-dense corpora whose posting
        lists are long.  Built lazily, cached per index."""
        if self._gram_matrix_cache is not None:
            gm = self._gram_matrix_cache
            return None if gm is False else gm
        g = self.n_grams
        tl = int(self.device.long_lengths.shape[0])
        if g == 0 or tl == 0 or g * tl > budget_bytes:
            self._gram_matrix_cache = False
            return None
        # Built ON DEVICE from the CSR already resident in HBM - no
        # host->device shipment of the (G, Tl) matrix, just slabbed 1-D
        # scatters (_incidence_slabs).  int8: exact 0/1, half the HBM of
        # bf16, double MXU rate on v5e.  CSR postings are unique per
        # (gram, term), so add == set.
        gm = self._incidence_slabs(g, tl, "ones")
        self._gram_matrix_cache = gm
        return gm

    _bitmap_cache: object = dataclasses.field(default=None, repr=False)

    def bitmap_tables(self, budget_bytes: int = 6 << 30):
        """Bit-packed gram->long-term incidence (G, ceil(Tl_pad/8)) uint8,
        or None over ``budget_bytes``.

        The EXACT middle regime between the dense int8 matmul (G * Tl
        bytes) and the lossy bucket sketch: 8 terms per byte puts a
        10M-key gram-dense corpus (G ~ 3k) at ~3.4 GB - resident where the
        matmul operand cannot be.  The search front end
        (search.candidates.candidates_bitmap) gathers each query gram's
        row and accumulates bit-expanded hit counts - the reference's
        posting-accumulation loop (nGramSearch.hpp:289-298) as a
        bandwidth-bound VPU pass with no count inflation, so the
        candidate exactness guard behaves identically to the matmul path.

        Built ON DEVICE from the resident CSR (one scatter-add; distinct
        terms within a gram own distinct bits, so add == or).  The byte
        layout is the PLANE-TILED order of ops.bitmap_matmul (bit p of
        byte j*BLKB+k holds term j*8*BLKB + p*BLKB + k), so the Pallas
        unpack-matmul kernel can stream it tile-by-tile with no in-kernel
        interleave; rows are padded to a 128 multiple for the MXU operand.
        Returns (bm int8 (G_pad, Tl_pad/8), tl_pad); cached per index."""
        if self._bitmap_cache is not None:
            bm = self._bitmap_cache
            return None if bm is False else bm
        from ..ops.bitmap_matmul import PAD_LANES, g_padding

        g = self.n_grams
        tl = int(self.device.long_lengths.shape[0])
        tl_pad = -(-max(tl, 1) // PAD_LANES) * PAD_LANES
        g_pad = g_padding(g)
        if g == 0 or tl == 0 or g_pad * (tl_pad // 8) > budget_bytes:
            self._bitmap_cache = False
            return None
        # resident layout is TILE-MAJOR (ntiles, G_pad, BLKB): a kernel
        # grid block is then one contiguous ~1.4 MB HBM chunk instead of
        # G_pad disjoint 512-byte segments - the pair kernel measured
        # 45-62 -> 27.7 ms per 256 queries at 10M terms from this alone
        # (tools/probe_layout_r5.py).  Scattered directly in that order
        # ('bits3'): a row-major build + transpose doubled peak HBM and
        # OOM'd the 5.9 GB gram-rich table.
        bm = self._incidence_slabs(g_pad, tl_pad // 8, "bits3")
        self._bitmap_cache = (bm, tl_pad)
        return self._bitmap_cache

    def bitmap_layout(self):
        """(nb, tl_pad) of the packed-plane layout WITHOUT building the
        table - the virtual per-batch compact build needs the shape even
        when the full table exceeds every budget."""
        from ..ops.bitmap_matmul import PAD_LANES

        tl = int(self.device.long_lengths.shape[0])
        tl_pad = -(-max(tl, 1) // PAD_LANES) * PAD_LANES
        return tl_pad // 8, tl_pad

    def bitmap_rows_table(self, rows: np.ndarray, s_cap: int):
        """VIRTUAL compact bitmap: (gp_c, nb) int8 packed planes for the
        given global gram slots, scattered ON DEVICE from the resident
        CSR per batch.  The full-table residency is gp * nb bytes (11.8 GB
        at the 2M-term x 47k-gram 2D config - over every HBM budget), but
        one batch's queries touch only their gram union, so this builds
        just those rows (~2 GB) and throws them away after the batch.
        One scatter-add; (gram, term) postings are unique so add == or.
        ``s_cap``: pow2 bound on the selected rows' total postings."""
        import jax

        nb, _ = self.bitmap_layout()
        gp_c = int(rows.shape[0])
        assert gp_c * nb < 2**31, (gp_c, nb)  # flat index must fit int32

        @functools.partial(jax.jit, static_argnums=(3, 4))
        def _build(gram_ptr, gram_terms, rows_d, gp_c, s_cap):
            from ..ops.bitmap_matmul import plane_coords

            g = gram_ptr.shape[0] - 1
            p_total = max(gram_terms.shape[0], 1)
            rc = jnp.clip(rows_d, 0, max(g - 1, 0))
            # -1 pad rows expand no postings
            lens = jnp.where(
                rows_d >= 0, gram_ptr[rc + 1] - gram_ptr[rc], 0
            )
            ends = jnp.cumsum(lens)
            pos = jnp.arange(s_cap, dtype=jnp.int32)
            rank = jnp.clip(
                jnp.searchsorted(ends, pos, side="right"), 0, gp_c - 1
            ).astype(jnp.int32)
            starts = ends - lens
            src = gram_ptr[rc[rank]] + (pos - starts[rank])
            valid = pos < ends[-1]
            term = gram_terms[jnp.clip(src, 0, p_total - 1)]
            col, bit = plane_coords(term)
            flat = rank * np.int32(nb) + col
            flat = jnp.where(valid, flat, np.int32(gp_c * nb))
            val = (jnp.uint8(1) << bit.astype(jnp.uint8)).astype(jnp.uint8)
            return (
                jnp.zeros((gp_c * nb,), jnp.uint8)
                .at[flat]
                .add(val, mode="drop")
                .view(jnp.int8)
                .reshape(gp_c, nb)
            )

        return _build(
            self.device.gram_ptr, self.device.gram_terms,
            jnp.asarray(rows, dtype=jnp.int32), gp_c, int(s_cap),
        )

    _sketch_cache: object = dataclasses.field(default=None, repr=False)

    def sketch_tables(
        self, budget_bytes: int = 6 << 30, max_tgw: int = 128,
        packed: bool = False,
    ):
        """Sketch-path tables (search.sketch): hashed-bucket incidence
        ``inc``, term->gram table ``tg`` (Tl_pad, TGW) int32, padded
        per-term weight bound (Tl_pad,) f32, and d_log2 - or None when
        the long tier is too small/wide for the path.

        ``packed=False``: inc is (D, Tl_pad) int8 (XLA dot operand),
        D <= 1024.  ``packed=True``: inc is plane-tiled (D, Tl_pad/8)
        int8 for the Pallas unpack-matmul kernel - 8x the bucket reach
        per HBM byte (D <= 16384), which is the collision/retry knob on
        gram-rich corpora.

        Built ON DEVICE from the resident token matrix for narrow g<=3
        (host->device upload dominates index build through remote
        backends); numpy + upload otherwise.  Cached per index and mode."""
        if not isinstance(self._sketch_cache, dict):
            self._sketch_cache = {}
        mode = bool(packed)
        if mode in self._sketch_cache:
            sk = self._sketch_cache[mode]
            return None if sk is False else sk
        from ..search import sketch as sketchlib

        d = self.device
        tl = int(d.long_lengths.shape[0])
        g = self.config.gram_size
        tgw = int(d.long_tokens.shape[1]) - g + 1
        if tl == 0 or self.n_grams == 0 or tgw < 1 or tgw > max_tgw:
            self._sketch_cache[mode] = False
            return None
        tile = sketchlib._TILE
        tl_pad = -(-tl // tile) * tile
        bytes_per_d = tl_pad // 8 if packed else tl_pad
        # packed cap 13 (8192 buckets): the one-time pack holds the mask
        # (tl_pad * D/8) plus ~1-2 GB of slab transients on device; 2^14
        # at 2M terms peaked over HBM during the build
        d_log2 = 13 if packed else 10
        while d_log2 > 7 and (1 << d_log2) * bytes_per_d > budget_bytes:
            d_log2 -= 1
        if (1 << d_log2) * bytes_per_d > budget_bytes:
            self._sketch_cache[mode] = False
            return None

        if not self.config.wide and g <= 3:
            builder = (
                sketchlib.build_sketch_device_packed
                if packed else sketchlib.build_sketch_device
            )
            inc, tg = builder(
                d.long_tokens,
                d.long_lengths,
                jnp.asarray(self.gram_ids.astype(np.int32)),
                gram_size=g,
                d_log2=d_log2,
                tl_pad=tl_pad,
                tgw=tgw,
            )
        else:
            inc, tg = sketchlib.build_sketch_host(
                np.asarray(d.long_tokens),
                np.asarray(d.long_lengths),
                self.lookup_gram_slots,
                g,
                self.config.wide,
                self.vocab,
                d_log2,
                tl_pad,
                tgw,
            )
            if packed:
                inc = jnp.asarray(sketchlib.pack_inc_np(np.asarray(inc)))
        if packed:
            # same tile-major residency as bitmap_tables (contiguous
            # kernel block DMAs; see ops.bitmap_matmul._dispatch)
            import jax

            from ..ops.bitmap_matmul import to_tile_major

            inc = jax.jit(to_tile_major)(inc)
        ts = int(d.short_lengths.shape[0])
        wmax_pad = jnp.pad(d.term_wmax[ts:], (0, tl_pad - tl))
        self._sketch_cache[mode] = (inc, tg, wmax_pad, d_log2)
        return self._sketch_cache[mode]

    _prim_table_cache: object = None

    def prim_tables(self):
        """(T, 4) / (X, 4) int32 edge record tables for the candidate path:
        [key, bitcast(weight), key_len, 0] per primary / extra edge.

        One 4-wide row gather replaces three separate 1D gathers per
        candidate (random 1D gathers cost ~90 ns/element on v5e and
        dominated the back half at T = 1M); key lengths ride along and are
        carried through the ranking sorts instead of re-gathered."""
        if self._prim_table_cache is not None:
            return self._prim_table_cache
        import jax
        from jax import lax

        d = self.device
        k_total = max(int(d.key_len.shape[0]), 1)

        @jax.jit
        def _build(pk, pw, key_len, xk, xw):
            def rec(keys, weights):
                kc = jnp.clip(keys, 0, k_total - 1)
                return jnp.stack(
                    [
                        keys,
                        lax.bitcast_convert_type(weights, jnp.int32),
                        key_len[kc],
                        jnp.zeros_like(keys),
                    ],
                    axis=1,
                )

            return rec(pk, pw), rec(xk, xw)

        self._prim_table_cache = _build(
            d.term_prim_key, d.term_prim_weight, d.key_len,
            d.extra_key, d.extra_weight,
        )
        return self._prim_table_cache

    def key_edge_host(self):
        """(ptr, term, weight) host copies of the key->edge CSR."""
        if self.host_key_edge_ptr is None:
            import jax

            d = self.device
            self.host_key_edge_ptr = np.asarray(
                jax.device_get(d.key_edge_ptr)
            )
            self.host_key_edge_term = np.asarray(
                jax.device_get(d.key_edge_term)
            )
            self.host_key_edge_weight = np.asarray(
                jax.device_get(d.key_edge_weight)
            )
        return (
            self.host_key_edge_ptr,
            self.host_key_edge_term,
            self.host_key_edge_weight,
        )

    # at most this many DP width buckets (each adds one scan to the jitted
    # program); buckets holding under 1/16 of the tier (or under
    # DP_MIN_BUCKET_ROWS) merge into a wider neighbor
    DP_MAX_BUCKETS = 5
    DP_MIN_BUCKET_ROWS = 512

    def long_dp_buckets(self) -> tuple:
        """Static ((end_row, width), ...) width buckets over the
        length-ascending long tier for dp_match_tiered.  () or a single
        full-width bucket when the tier is uniform (the common case -
        then the tiered DP degenerates to one plain dp_match)."""
        if self._dp_bucket_cache is not None:
            return self._dp_bucket_cache
        ll = self.host_long_lengths
        if ll is None:
            import jax

            ll = np.asarray(jax.device_get(self.device.long_lengths))
            self.host_long_lengths = ll
        n = int(ll.shape[0])
        full_w = int(self.device.long_tokens.shape[1])
        if n == 0 or ll[0] >= ll[-1] or not np.all(ll[:-1] <= ll[1:]):
            # empty, uniform, or (legacy load) unsorted tier: one bucket
            self._dp_bucket_cache = ()
            return ()
        min_rows = max(n // 16, self.DP_MIN_BUCKET_ROWS)
        raw = []
        lo, w = 0, 8
        while lo < n:
            end = int(np.searchsorted(ll, w, side="right")) if w < full_w else n
            if end > lo:
                raw.append((end, min(w, full_w)))
                lo = end
            w *= 2
        # fold buckets smaller than min_rows FORWARD into the next (wider)
        # bucket: the few deferred rows pay the wider width, which is
        # cheap; merging backward would widen a big narrow bucket instead.
        folded: list = []
        start = 0
        for end, w in raw:
            if (end - start) >= min_rows:
                folded.append((end, w))
                start = end
        if start < n:
            # trailing leftover (no wider neighbor): standalone is cheap -
            # few rows at the tier's max width
            folded.append(raw[-1])
        while len(folded) > self.DP_MAX_BUCKETS:
            # merge the cheapest adjacent pair (least extra row-width work)
            costs = []
            b0 = 0
            for i in range(len(folded) - 1):
                lo0 = b0
                end0, w0 = folded[i]
                end1, w1 = folded[i + 1]
                costs.append(((end0 - lo0) * (w1 - w0), i))
                b0 = end0
            _, i = min(costs)
            folded[i : i + 2] = [folded[i + 1]]
        out = tuple(folded) if len(folded) > 1 else ()
        self._dp_bucket_cache = out
        return out

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
        self.tables = textlib.TextTables(
            chars, wide=self.config.wide,
            wide_upper=self.config.wide_upper,
        )
        norm, norm_len = textlib.normalize_matrix(
            self.key_strings.tokens,
            self.key_strings.lengths,
            self.tables,
            upper=False,
        )
        norm = _pad_width(norm, 1)
        self.host_key_norm_tokens = norm
        self.host_key_norm_lengths = norm_len.astype(np.int32)
        self._key_hash_cache = None


_FNV_OFFSET = np.uint64(1469598103934665603)
_FNV_PRIME = np.uint64(1099511628211)


def _fnv_rows(tokens: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a over (length, row tokens); rows are 0-padded so the
    full-width hash is injective up to hash collisions (verified exactly by
    the caller)."""
    with np.errstate(over="ignore"):
        h = np.full(tokens.shape[0], _FNV_OFFSET, dtype=np.uint64)
        h = (h ^ lengths.astype(np.uint64)) * _FNV_PRIME
        for c in range(tokens.shape[1]):
            h = (h ^ tokens[:, c].astype(np.uint64)) * _FNV_PRIME
    return h


def _edge_csr(edge_term: np.ndarray, edge_weight: np.ndarray, n_terms: int):
    """(term_edge_ptr, term_wmax) from term-sorted edges."""
    counts = np.bincount(edge_term, minlength=n_terms).astype(np.int32)
    ptr = np.zeros(n_terms + 1, dtype=np.int32)
    np.cumsum(counts, out=ptr[1:])
    wmax = np.zeros(n_terms, dtype=np.float32)
    nz = counts > 0
    if edge_weight.shape[0]:
        wmax[nz] = np.maximum.reduceat(edge_weight, ptr[:-1][nz])
    return ptr, wmax


def _edge_primary(
    edge_term: np.ndarray,
    edge_key: np.ndarray,
    edge_weight: np.ndarray,
    n_terms: int,
):
    """Primary-edge decomposition from term-sorted edges.

    Returns (prim_key, prim_weight, extra_ptr, extra_key, extra_weight):
    each term's first edge densely, the rest as a term-keyed CSR.  The
    candidate search reads primaries with one gather per candidate; the
    extras CSR is usually tiny (terms mapping to several master keys)."""
    counts = np.bincount(edge_term, minlength=n_terms).astype(np.int64)
    ptr = np.zeros(n_terms + 1, dtype=np.int64)
    np.cumsum(counts, out=ptr[1:])
    prim_key = np.full(n_terms, -1, dtype=np.int32)
    prim_weight = np.zeros(n_terms, dtype=np.float32)
    nz = counts > 0
    if edge_key.shape[0]:
        prim_key[nz] = edge_key[ptr[:-1][nz]]
        prim_weight[nz] = edge_weight[ptr[:-1][nz]]
    # extras: everything after each term's first edge
    is_extra = np.ones(edge_term.shape[0], dtype=bool)
    if edge_key.shape[0]:
        is_extra[ptr[:-1][nz]] = False
    extra_counts = np.maximum(counts - 1, 0).astype(np.int32)
    extra_ptr = np.zeros(n_terms + 1, dtype=np.int32)
    np.cumsum(extra_counts, out=extra_ptr[1:])
    return (
        prim_key,
        prim_weight,
        extra_ptr,
        edge_key[is_extra],
        edge_weight[is_extra],
    )


def _key_edge_csr(
    edge_term: np.ndarray,
    edge_key: np.ndarray,
    edge_weight: np.ndarray,
    n_keys: int,
):
    """Key-sorted edge duplicate: (key_edge_ptr, key_edge_term,
    key_edge_weight, host key edge counts)."""
    order = np.argsort(edge_key, kind="stable")
    counts = np.bincount(edge_key, minlength=n_keys).astype(np.int32)
    ptr = np.zeros(n_keys + 1, dtype=np.int32)
    np.cumsum(counts, out=ptr[1:])
    return ptr, edge_term[order], edge_weight[order], counts


def _upload_tokens(mat: np.ndarray) -> jnp.ndarray:
    """Device token matrix from host uint8/uint32 rows.

    Byte strings stay uint8 ON DEVICE too: every consumer either compares
    elementwise (the DP's token == qc fuses the widening into the compare)
    or casts at use (gram packing), so the resident matrix and every DP
    pass read 4x fewer HBM bytes - at 10M keys the int32 long-token matrix
    alone was 1.3 GB of a 16 GB chip.  Wide (uint32) tokens widen to int32
    (codepoints exceed a byte; int32 keeps compares signed-safe)."""
    mat = np.asarray(mat)
    if mat.dtype == np.uint8:
        return jnp.asarray(mat)
    return jnp.asarray(mat).astype(jnp.int32)


def _upload_array(a) -> jnp.ndarray:
    """Device array with transfer-avoiding fast paths.

    Host->device bandwidth dominates index build on remote backends, and
    several DeviceIndex leaves are trivially structured at scale (with
    row_size=1 and default weights the edge arrays are identities and the
    CSR pointers aranges): detect arange / constant 1-D arrays and emit
    them as on-device iota/fill (zero transfer), and ship wide integer
    arrays at the narrowest lossless dtype, widening on device."""
    a = np.asarray(a)
    if a.ndim == 1 and a.size >= (1 << 14):
        if a.dtype.kind in "iu":
            if np.array_equal(a, np.arange(a.size, dtype=a.dtype)):
                return jnp.arange(a.size, dtype=a.dtype)
            amin, amax = int(a.min()), int(a.max())
            if amin == amax:
                return jnp.full(a.shape, amin, dtype=a.dtype)
            if 0 <= amin and amax <= 255 and a.dtype.itemsize > 1:
                return jnp.asarray(a.astype(np.uint8)).astype(a.dtype)
            if 0 <= amin and amax <= 65535 and a.dtype.itemsize > 2:
                return jnp.asarray(a.astype(np.uint16)).astype(a.dtype)
        elif a.dtype.kind == "f" and np.all(a == a.flat[0]):
            return jnp.full(a.shape, a.flat[0], dtype=a.dtype)
    return jnp.asarray(a)


def _converters(to_device: bool):
    """(array converter, token-matrix converter) for DeviceIndex leaves.

    ``to_device=False`` keeps every leaf as host numpy - used by the
    sharded/multi-host path, which slices the arrays per shard and uploads
    only shard-local pieces (never the unsharded index)."""
    if to_device:
        return _upload_array, _upload_tokens

    def _host_tokens(m):
        m = np.asarray(m)
        return m if m.dtype == np.uint8 else m.astype(np.int32)

    return (lambda a: np.asarray(a), _host_tokens)


def _pad_width(mat: np.ndarray, min_width: int, multiple: int = 8) -> np.ndarray:
    """Pad the trailing dim to a multiple (TPU lane friendliness)."""
    width = max(mat.shape[1], min_width)
    width = -(-width // multiple) * multiple
    if width > mat.shape[1]:
        mat = np.pad(mat, ((0, 0), (0, width - mat.shape[1])))
    return mat


def _dedup_rows(rows: np.ndarray, lengths: np.ndarray):
    """Dedup matrix rows (length-aware).  Returns (first_occurrence_rank ids
    per row, unique-row indices ordered by first occurrence)."""
    n = rows.shape[0]
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    keyed = np.concatenate(
        [lengths.astype(rows.dtype).reshape(-1, 1), rows], axis=1
    )
    keyed = np.ascontiguousarray(keyed)
    view = keyed.view([("", np.void, keyed.dtype.itemsize * keyed.shape[1])])
    _, first_idx, inverse = np.unique(view, return_index=True, return_inverse=True)
    order = np.argsort(first_idx, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(order.size)
    return rank[inverse.ravel()].astype(np.int64), first_idx[order]


def _host_postings(lt, ll, gram_size, wide, vocab):
    """Vectorized numpy gram->term CSR from the long token matrix
    (posting-set semantics: grams dedup per term, nGramSearch.h:296).
    Returns (gram_terms int32, gram_ptr int32, distinct_gram_ids int64).

    Narrow grams fit 8 * g <= 32 bits, so (gram, term) packs into ONE
    uint64 key: a single sort replaces the lexsort, and distinct grams +
    CSR pointers fall out of the sorted runs (np.unique would sort a
    second time).  The wide path keeps the general lexsort."""
    gids, gvalid = gramlib.gram_ids(lt, ll, gram_size, wide, vocab)
    tt, ww = np.nonzero(gvalid)  # row-major: already term-sorted
    flat_g = gids[tt, ww]
    if not wide and gram_size <= 4:
        keys = (flat_g.astype(np.uint64) << np.uint64(32)) | tt.astype(
            np.uint64
        )
        keys.sort()
        m = keys.shape[0]
        keep = np.ones(m, bool)
        keep[1:] = keys[1:] != keys[:-1]
        keys = keys[keep]
        sg = (keys >> np.uint64(32)).astype(np.int64)
        stt = (keys & np.uint64(0xFFFFFFFF)).astype(np.int64)
    else:
        order = np.lexsort((tt, flat_g))
        sg, stt = flat_g[order], tt[order]
        keep = np.ones(sg.shape[0], bool)
        keep[1:] = (sg[1:] != sg[:-1]) | (stt[1:] != stt[:-1])
        sg, stt = sg[keep], stt[keep]
    m = sg.shape[0]
    if m == 0:
        return (
            np.zeros(0, np.int32), np.zeros(1, np.int32),
            np.zeros(0, np.int64),
        )
    first = np.ones(m, bool)
    first[1:] = sg[1:] != sg[:-1]
    starts = np.nonzero(first)[0]
    distinct = sg[starts]
    ptr = np.empty(distinct.shape[0] + 1, dtype=np.int32)
    ptr[:-1] = starts
    ptr[-1] = m
    return stt.astype(np.int32), ptr, distinct


# below this many long terms the host postings build is cheaper than a
# device round trip + per-shape compile
DEVICE_POSTINGS_MIN = 50_000

# wall-clock breakdown of the most recent build_index call (seconds per
# stage) - BASELINE tracks index build MB/s and the round-3 10M build
# regressed unexplained (175.9 s vs round 2's 136.6); the bench records
# this dict so where the time goes is always in the artifact
LAST_BUILD_BREAKDOWN: dict = {}


def _want_device_postings(config, n_long, device_postings):
    if device_postings is not None:
        return device_postings and not config.wide and config.gram_size <= 3
    return (
        not config.wide
        and config.gram_size <= 3
        and n_long >= DEVICE_POSTINGS_MIN
    )


def build_index(
    words: Sequence,
    row_size: int,
    weights: Optional[Sequence[float]] = None,
    config: IndexConfig = IndexConfig(),
    valid_chars: bytes = DEFAULT_VALID_CHARS,
    use_native: Optional[bool] = None,
    device_postings: Optional[bool] = None,
    to_device: bool = True,
) -> HostIndex:
    """Build an index from the reference's flattened row model
    (indexN, dllmain.cpp:37-49): every row's first word is the master key,
    remaining row words map to it; zero weight drops the pair
    (nGramSearch.hpp:141-148).

    ``use_native``: None = auto (C++ builder for narrow strings when it
    compiles), True = require it, False = numpy path.
    ``device_postings``: None = auto (shingle+sort the gram CSR on device
    for narrow g<=3 long tiers above DEVICE_POSTINGS_MIN - saves the
    dominant posting upload), True/False = force.
    """
    if use_native is None:
        use_native = not config.wide
    if use_native and not config.wide and words is not None and len(words) >= 2:
        nat = nativelib.get_native()
        if nat is not None:
            return _build_from_native(
                nat, list(words), row_size, weights, config, valid_chars,
                device_postings, to_device,
            )
    return _build_numpy(
        words, row_size, weights, config, valid_chars, device_postings,
        to_device,
    )


def _long_length_sort_native(d: dict) -> None:
    """Reorder the native builder's long tier by (length, id) in place.

    Remaps every long-term id consumer in the array dict: the token
    matrix/lengths, edge_term (global ids: short tier first), and the
    gram postings (values remapped, then re-sorted within each gram
    segment so the arrays stay bit-identical to the numpy builder's)."""
    ll = d["long_lengths"]
    n_long = ll.shape[0]
    if n_long == 0:
        return
    perm = np.argsort(ll, kind="stable")
    if np.array_equal(perm, np.arange(n_long)):
        return
    rank = np.empty(n_long, dtype=np.int64)
    rank[perm] = np.arange(n_long)
    d["long_tokens"] = d["long_tokens"][perm]
    d["long_lengths"] = ll[perm]
    ns = d["short_lengths"].shape[0]
    et = d["edge_term"]
    is_long = et >= ns
    et = et.copy()
    et[is_long] = (ns + rank[et[is_long] - ns]).astype(et.dtype)
    d["edge_term"] = et
    gt = rank[d["gram_terms"]].astype(d["gram_terms"].dtype)
    ptr = d["gram_ptr"].astype(np.int64)
    if gt.shape[0]:
        row = np.repeat(
            np.arange(ptr.shape[0] - 1, dtype=np.int64), np.diff(ptr)
        )
        gt = gt[np.lexsort((gt, row))]
    d["gram_terms"] = gt


def _build_from_native(
    nat, words, row_size, weights, config, valid_chars, device_postings=None,
    to_device=True,
):
    """HostIndex from the C++ builder's array dict (semantics identical to
    the numpy path; see native/builder.cpp)."""
    w_arg = None
    if weights is not None:
        w_arg = [float(x) for x in weights]
    bd = LAST_BUILD_BREAKDOWN
    bd.clear()
    t_total = time.perf_counter()
    t0 = time.perf_counter()
    try:
        # the C++ postings pass (shingle + sort of tens of millions of
        # pairs at scale) is skipped: postings rebuild on device or via
        # the vectorized numpy shingle below
        d = nat.build_narrow(
            words, int(row_size), w_arg, int(config.gram_size),
            bytes(valid_chars), 1,
        )
        native_postings = False
    except TypeError:  # stale .so without the skip flag
        d = nat.build_narrow(
            words, int(row_size), w_arg, int(config.gram_size),
            bytes(valid_chars),
        )
        native_postings = True
    bd["native_cpp"] = round(time.perf_counter() - t0, 2)
    tables = textlib.TextTables(valid_chars, wide=False)
    dev, up = _converters(to_device)

    t0 = time.perf_counter()
    # length-sort the long tier (same stable permutation as _build_numpy:
    # the native builder assigns first-occurrence ids, so sorting its
    # length vector stably lands on the identical order).  Enables the
    # width-bucketed brute DP (search.editdist.dp_match_tiered).
    _long_length_sort_native(d)
    bd["long_length_sort"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()

    # canonical edge order: sorted by (term, key) for the term->edge CSR
    et, ek, ew = d["edge_term"], d["edge_key"], d["edge_weight"]
    order = np.lexsort((ek, et))
    et, ek, ew = et[order], ek[order], ew[order]
    n_terms_total = d["short_lengths"].shape[0] + d["long_lengths"].shape[0]
    te_ptr, t_wmax = _edge_csr(et, ew, n_terms_total)
    pk, pw, xptr, xkey, xw = _edge_primary(et, ek, ew, n_terms_total)
    ke_ptr, ke_term, ke_w, ke_counts = _key_edge_csr(
        et, ek, ew, d["key_lengths"].shape[0]
    )
    bd["edge_csr"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()

    st = _pad_width(d["short_tokens"], config.short_pad)
    lt = _pad_width(d["long_tokens"], config.gram_size)
    lt_dev = up(lt)
    ll_dev = dev(d["long_lengths"])
    n_long_d = int(d["long_lengths"].shape[0])
    if (to_device and n_long_d
            and _want_device_postings(config, n_long_d, device_postings)):
        import jax as _jax

        from .device_build import build_postings_device

        _jax.block_until_ready(lt_dev)
        bd["token_upload"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        gram_terms_dev, gram_ptr_h, gram_ids_h = build_postings_device(
            lt_dev, ll_dev, config.gram_size
        )
        _jax.block_until_ready(gram_terms_dev)
        bd["device_postings"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        gram_ptr_dev = dev(gram_ptr_h)
    else:
        if not native_postings:
            gt_h, gram_ptr_h, gram_ids_h = _host_postings(
                lt, d["long_lengths"], config.gram_size, False, None
            )
        else:
            gt_h = d["gram_terms"]
            gram_ptr_h = d["gram_ptr"]
            gram_ids_h = d["gram_ids"]
        gram_terms_dev = dev(gt_h)
        gram_ptr_dev = dev(gram_ptr_h)
        bd["host_postings"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
    key_tokens, key_lens = d["key_tokens"], d["key_lengths"]
    if key_tokens.shape[0]:
        knorm, knorm_len = textlib.normalize_matrix(
            key_tokens, key_lens, tables, upper=False
        )
    else:
        knorm = np.zeros((0, 1), np.uint8)
        knorm_len = np.zeros(0, np.int32)
    knorm = _pad_width(knorm, 1)

    device = DeviceIndex(
        short_tokens=up(st),
        short_lengths=dev(d["short_lengths"]),
        long_tokens=lt_dev,
        long_lengths=ll_dev,
        gram_ptr=gram_ptr_dev,
        gram_terms=gram_terms_dev,
        edge_term=dev(et),
        edge_key=dev(ek),
        edge_weight=dev(ew),
        term_edge_ptr=dev(te_ptr),
        term_wmax=dev(t_wmax),
        term_prim_key=dev(pk),
        term_prim_weight=dev(pw),
        term_extra_ptr=dev(xptr),
        extra_key=dev(xkey),
        extra_weight=dev(xw),
        key_edge_ptr=dev(ke_ptr),
        key_edge_term=dev(ke_term),
        key_edge_weight=dev(ke_w),
        key_len=dev(key_lens.astype(np.int32)),
    )
    if to_device:
        import jax as _jax

        _jax.block_until_ready(
            (device.edge_term, device.gram_terms, device.short_tokens)
        )
    bd["norm_and_uploads"] = round(time.perf_counter() - t0, 2)
    bd["total"] = round(time.perf_counter() - t_total, 2)
    return HostIndex(
        config=config,
        tables=tables,
        key_strings=KeyStrings(key_tokens, key_lens, False),
        gram_ids=gram_ids_h,
        device=device,
        n_terms=int(d["n_terms"]),
        max_term_len=int(d["max_term_len"]),
        vocab=None,
        indexed=True,
        host_posting_lens=np.diff(gram_ptr_h).astype(np.int64),
        host_key_norm_tokens=knorm,
        host_key_norm_lengths=np.asarray(knorm_len, np.int32),
        host_key_edge_counts=ke_counts,
        host_long_lengths=np.asarray(d["long_lengths"], np.int32),
        host_key_edge_ptr=ke_ptr,
        host_key_edge_term=ke_term,
        host_key_edge_weight=ke_w,
        uniform_weights=bool(ew.size == 0 or np.all(ew == 1.0)),
    )


def _build_numpy(
    words: Sequence,
    row_size: int,
    weights: Optional[Sequence[float]] = None,
    config: IndexConfig = IndexConfig(),
    valid_chars: bytes = DEFAULT_VALID_CHARS,
    device_postings: Optional[bool] = None,
    to_device: bool = True,
) -> HostIndex:
    """Vectorized numpy build (reference implementation and wide-string
    path; the native builder must match it exactly)."""
    tables = textlib.TextTables(
        valid_chars, wide=config.wide, wide_upper=config.wide_upper,
    )
    dev, up = _converters(to_device)
    empty = words is None or len(words) < 2  # size<2 guard, nGramSearch.hpp:122
    words = [] if empty else list(words)
    size = len(words)
    wide = config.wide
    tok_dtype = np.uint32 if wide else np.uint8

    tokens, lengths = textlib.encode_batch(words, wide)
    null_mask = np.fromiter((w is None for w in words), bool, size) if size else (
        np.zeros(0, bool)
    )
    norm_t, norm_l = textlib.normalize_matrix(tokens, lengths, tables)
    trim_t, trim_l = textlib.trim_only_matrix(tokens, lengths, tables)

    if weights is None:
        w = np.ones(size, dtype=np.float32)
    else:
        w = np.ones(size, dtype=np.float32)
        given = np.asarray(list(weights), dtype=np.float32)[:size]
        w[: given.shape[0]] = given

    idx = np.arange(size)
    row_start = (idx // max(row_size, 1)) * max(row_size, 1)
    is_master = idx == row_start
    # a row is skipped entirely when its master is null or trims empty
    # (nGramSearch.hpp:129-135); zero weight skips only that element's pair.
    master_ok = (~null_mask) & (trim_l > 0)
    row_ok = master_ok[row_start]
    recorded = (
        row_ok
        & (~null_mask)
        & (w != 0.0)
        & np.where(is_master, True, norm_l > 0)
    )
    rec = np.where(recorded)[0]

    # -- interleaved string dedup: element e -> (term at 2e, key at 2e+1) ---
    r = rec.shape[0]
    t_rows, t_lens = norm_t[rec], norm_l[rec]
    k_src = row_start[rec]
    k_rows, k_lens = trim_t[k_src], trim_l[k_src]
    width = max(t_rows.shape[1] if r else 1, k_rows.shape[1] if r else 1)

    inter = np.zeros((2 * r, width), dtype=tok_dtype)
    inter_len = np.zeros(2 * r, dtype=np.int32)
    if r:
        inter[0::2, : t_rows.shape[1]] = t_rows
        inter[1::2, : k_rows.shape[1]] = k_rows
        inter_len[0::2] = t_lens
        inter_len[1::2] = k_lens
    sid, uniq_first = _dedup_rows(inter, inter_len)
    u = uniq_first.shape[0]
    term_sid, key_sid = sid[0::2], sid[1::2]
    ustr_tokens = inter[uniq_first] if u else np.zeros((0, width), tok_dtype)
    ustr_lens = inter_len[uniq_first] if u else np.zeros(0, np.int32)

    is_term = np.zeros(u, bool)
    is_key = np.zeros(u, bool)
    if r:
        is_term[term_sid] = True
        is_key[key_sid] = True

    # -- term table: short tier first, then long.  Short terms keep
    # string-rank order; long terms sort by (length, string rank) so the
    # tier's rows are length-ascending - the brute/long DP then runs in
    # per-width buckets (search.editdist.dp_match_tiered) instead of
    # padding every row to the global max.  Term ids are internal, so the
    # permutation is invisible to results; the native builder applies the
    # identical stable sort (_build_from_native).
    cutoff = config.long_cutoff
    term_ids = np.where(is_term)[0]
    term_lens_u = ustr_lens[term_ids]
    short_ids = term_ids[term_lens_u < cutoff]
    long_ids = term_ids[term_lens_u >= cutoff]
    long_ids = long_ids[np.argsort(ustr_lens[long_ids], kind="stable")]
    n_short, n_long = short_ids.shape[0], long_ids.shape[0]
    term_local = np.full(u, -1, np.int64)
    term_local[short_ids] = np.arange(n_short)
    term_local[long_ids] = n_short + np.arange(n_long)

    key_ids = np.where(is_key)[0]
    n_keys = key_ids.shape[0]
    key_local = np.full(u, -1, np.int64)
    key_local[key_ids] = np.arange(n_keys)

    # -- edges: dedup (term, key), LAST weight wins (map overwrite,
    #    nGramSearch.hpp:147,165) --------------------------------------------
    if r:
        et_g = term_local[term_sid]
        ek_g = key_local[key_sid]
        order = np.lexsort((np.arange(r), ek_g, et_g))
        et_s, ek_s = et_g[order], ek_g[order]
        last = np.ones(r, bool)
        last[:-1] = (et_s[1:] != et_s[:-1]) | (ek_s[1:] != ek_s[:-1])
        edge_term = et_s[last].astype(np.int32)
        edge_key = ek_s[last].astype(np.int32)
        edge_weight = w[rec][order][last].astype(np.float32)
    else:
        edge_term = np.zeros(0, np.int32)
        edge_key = np.zeros(0, np.int32)
        edge_weight = np.zeros(0, np.float32)

    # -- token matrices --------------------------------------------------------
    st = _pad_width(ustr_tokens[short_ids], config.short_pad)
    sl = ustr_lens[short_ids]
    lt = _pad_width(ustr_tokens[long_ids], config.gram_size)
    ll = ustr_lens[long_ids]

    # -- gram postings (deduped per term: posting-set semantics) ---------------
    vocab = None
    if wide and config.gram_size == 4:
        vocab = gramlib.WideVocab(lt[lt > 0] if lt.size else np.zeros(0, np.int64))
    lt_dev = up(lt)
    ll_dev = dev(ll.astype(np.int32))
    gram_terms_dev = None
    if (to_device and n_long
            and _want_device_postings(config, n_long, device_postings)):
        from .device_build import build_postings_device

        gram_terms_dev, gram_ptr, distinct_grams = build_postings_device(
            lt_dev, ll_dev, config.gram_size
        )
    elif n_long:
        gram_terms, gram_ptr, distinct_grams = _host_postings(
            lt, ll, config.gram_size, wide, vocab
        )
    else:
        distinct_grams = np.zeros(0, dtype=np.int64)
        gram_ptr = np.zeros(1, dtype=np.int32)
        gram_terms = np.zeros(0, dtype=np.int32)

    # -- keys -------------------------------------------------------------------
    key_tokens_raw = ustr_tokens[key_ids]
    key_lens_raw = ustr_lens[key_ids]
    if n_keys:
        knorm, knorm_len = textlib.normalize_matrix(
            key_tokens_raw, key_lens_raw, tables, upper=False
        )
    else:
        knorm = np.zeros((0, 1), tok_dtype)
        knorm_len = np.zeros(0, np.int32)
    knorm = _pad_width(knorm, 1)

    te_ptr, t_wmax = _edge_csr(edge_term, edge_weight, n_short + n_long)
    pk, pw, xptr, xkey, xw = _edge_primary(
        edge_term, edge_key, edge_weight, n_short + n_long
    )
    ke_ptr, ke_term, ke_w, ke_counts = _key_edge_csr(
        edge_term, edge_key, edge_weight, n_keys
    )
    if gram_terms_dev is None:
        gram_terms_dev = dev(gram_terms)
    device = DeviceIndex(
        short_tokens=up(st),
        short_lengths=dev(sl.astype(np.int32)),
        long_tokens=lt_dev,
        long_lengths=ll_dev,
        gram_ptr=dev(gram_ptr),
        gram_terms=gram_terms_dev,
        edge_term=dev(edge_term),
        edge_key=dev(edge_key),
        edge_weight=dev(edge_weight),
        term_edge_ptr=dev(te_ptr),
        term_wmax=dev(t_wmax),
        term_prim_key=dev(pk),
        term_prim_weight=dev(pw),
        term_extra_ptr=dev(xptr),
        extra_key=dev(xkey),
        extra_weight=dev(xw),
        key_edge_ptr=dev(ke_ptr),
        key_edge_term=dev(ke_term),
        key_edge_weight=dev(ke_w),
        key_len=dev(key_lens_raw.astype(np.int32)),
    )

    return HostIndex(
        config=config,
        tables=tables,
        key_strings=KeyStrings(key_tokens_raw, key_lens_raw, wide),
        gram_ids=distinct_grams,
        device=device,
        n_terms=int(term_ids.shape[0]),
        max_term_len=int(term_lens_u.max()) if term_ids.size else 0,
        vocab=vocab,
        indexed=not empty,
        host_posting_lens=np.diff(gram_ptr).astype(np.int64),
        host_key_norm_tokens=knorm,
        host_key_norm_lengths=np.asarray(knorm_len, np.int32),
        host_key_edge_counts=ke_counts,
        host_long_lengths=ll.astype(np.int32),
        host_key_edge_ptr=ke_ptr,
        host_key_edge_term=ke_term,
        host_key_edge_weight=ke_w,
        uniform_weights=bool(
            edge_weight.size == 0 or np.all(edge_weight == 1.0)
        ),
    )
