"""Sketch-matmul candidate search for huge long tiers.

The MXU matmul front end (search.candidates.candidates_matmul) needs the
dense (G, Tl) gram->term incidence resident in HBM; at 10M keys with a
gram-rich corpus that is G * Tl ~ 500 GB - two orders of magnitude over
HBM - and the sorted-runs path collapses under posting skew (one stop-gram
query blows the per-query lane cap into the millions).  This front end keeps
the MXU shape of the hot loop (the reference's posting accumulation,
nGramSearch.hpp:289-298) but shrinks the contraction axis from G grams to
D = 2^k hashed *buckets*:

  inc[d, t] = 1  iff term t has >= 1 distinct gram hashing to bucket d
  hits_h    = qcnt_h (B, D) @ inc (D, Tl)        one int8 MXU pass

``hits_h`` OVER-counts: every true hit lands in a counted bucket, and
collisions only add.  So ``u = wmax * hits_h / nqg`` is a sound upper bound
on every term's true weighted score, which is exactly what candidate
selection and the exactness guard consume (search.candidates).  Selected
candidates are then re-scored EXACTLY from the term->gram table ``tg``
((Tl, TGW) dense gram slots per term, deduped - posting-set semantics of
nGramSearch.h:296): true hits = sum over the query's gram slots (with
multiplicity, nGramSearch.hpp:289-297) of membership in the term's slot row,
one fused VPU compare-reduce, no gathers into the CSR.  False sketch
passes re-score below threshold and drop out; results are bit-identical to
the dense path whenever the guard passes, and the host falls back otherwise
(escalating widths -> runs/dense, same ladder as the other front ends).

Selection is hierarchical (128-lane block maxima -> 128-block superblock
maxima -> top-k down the levels): a flat top_k over 10M lanes is the
dominant cost at this scale, while each level's k-th kept maximum is a
sound bound on everything it discards, so the guard survives pruning.

HBM cost: inc is D * Tl_pad int8 (5 GB at D=512, Tl=10M) and tg is
TGW * Tl_pad int32 - both built ON DEVICE from the already-resident token
matrix (host->device upload is the index-build bottleneck through remote
backends).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .candidates import _finish_selected, _short_tier, topk_chunked

_NEG_INF = np.float32(-np.inf)

# Knuth multiplicative hash constant (2^32 / phi); buckets are the top k
# bits of the 32-bit product so neighbouring slots scatter.
_HASH_MULT = np.uint32(2654435761)

_BLK = 128  # selection block width (one vector register row)
_SUPER = 128  # blocks per superblock
_TILE = _BLK * _SUPER  # term padding quantum (16384)


def bucket_of(slots: jnp.ndarray, d_log2: int) -> jnp.ndarray:
    """Gram slot -> bucket in [0, 2^d_log2); negative slots -> -1."""
    h = (slots.astype(jnp.uint32) * _HASH_MULT) >> np.uint32(32 - d_log2)
    return jnp.where(slots >= 0, h.astype(jnp.int32), -1)


def bucket_of_np(slots: np.ndarray, d_log2: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = (slots.astype(np.uint32) * _HASH_MULT) >> np.uint32(32 - d_log2)
    return np.where(slots >= 0, h.astype(np.int32), -1)


# ---------------------------------------------------------------------------
# sketch table construction
# ---------------------------------------------------------------------------


def _pack_windows(tokens32: jnp.ndarray, gram_size: int) -> jnp.ndarray:
    """(Tl, W) int32 codepoints -> (Tl, W-g+1) int32 packed gram ids
    (byte fields, first char highest - gramHash order, nGramSearch.h:147).
    Narrow-only: g<=3 keeps the pack inside 24 bits."""
    w = tokens32.shape[1] - gram_size + 1
    out = jnp.zeros(tokens32[:, :w].shape, jnp.int32)
    for k in range(gram_size):
        out = (out << 8) | tokens32[:, k : k + w]
    return out


def _tg_and_mask(
    long_tokens, long_lengths, gram_ids32, *, gram_size, d_log2, tl_pad, tgw
):
    """Shared front of the device builders: per-term distinct gram slots
    ``tg`` and the per-term bucket bitmask ``mask`` (Tl_pad, D/32) uint32."""
    tl = long_tokens.shape[0]
    g_total = gram_ids32.shape[0]
    d = 1 << d_log2

    packed = _pack_windows(long_tokens.astype(jnp.int32), gram_size)
    pos = jax.lax.broadcasted_iota(jnp.int32, packed.shape, 1)
    valid = pos < (long_lengths[:, None] - np.int32(gram_size - 1))
    # gram id -> dense slot (every valid window of an indexed term is in the
    # distinct-gram table by construction; the check only guards padding)
    idx = jnp.searchsorted(gram_ids32, packed).astype(jnp.int32)
    idx_c = jnp.minimum(idx, max(g_total - 1, 0))
    hit = valid & (gram_ids32[idx_c] == packed) if g_total else jnp.zeros_like(valid)
    big = np.int32(2**30)
    slot = jnp.where(hit, idx_c, big)

    # per-row dedup: sort ascending, invalidate equal neighbours
    slot_s = jnp.sort(slot, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((tl, 1), bool), slot_s[:, 1:] == slot_s[:, :-1]], axis=1
    )
    tg = jnp.where(dup | (slot_s >= big), -1, slot_s)
    if tg.shape[1] < tgw:
        tg = jnp.pad(tg, ((0, 0), (0, tgw - tg.shape[1])), constant_values=-1)
    tg = jnp.pad(tg[:, :tgw], ((0, tl_pad - tl), (0, 0)), constant_values=-1)

    # bucket bitmask (Tl_pad, D/32) uint32
    buckets = bucket_of(tg, d_log2)  # (tl_pad, tgw), -1 invalid
    n_words = max(d // 32, 1)
    word_ids = jnp.arange(n_words, dtype=jnp.int32)
    mask = jnp.zeros((tl_pad, n_words), jnp.uint32)
    for j in range(buckets.shape[1]):
        b = buckets[:, j]
        w = b >> 5
        bit = (jnp.uint32(1) << (b & 31).astype(jnp.uint32))
        contrib = jnp.where(
            (b[:, None] >= 0) & (w[:, None] == word_ids[None, :]),
            bit[:, None],
            jnp.uint32(0),
        )
        mask = mask | contrib
    return tg, mask


@functools.partial(
    jax.jit, static_argnames=("gram_size", "d_log2", "tl_pad", "tgw")
)
def build_sketch_device(
    long_tokens,  # (Tl, W) integer tokens (any int dtype)
    long_lengths,  # (Tl,) int32
    gram_ids32,  # (G,) int32 sorted distinct packed gram ids
    *,
    gram_size: int,
    d_log2: int,
    tl_pad: int,
    tgw: int,
):
    """On-device sketch tables for the narrow g<=3 case.

    Returns (inc (D, tl_pad) int8, tg (tl_pad, tgw) int32).  ``tg`` rows are
    each term's DISTINCT gram slots sorted ascending, -1 padded (set
    semantics; duplicates within a term collapse, nGramSearch.hpp:19).
    Padded terms are all -1 / zero incidence and can never pass.
    """
    tg, mask = _tg_and_mask(
        long_tokens, long_lengths, gram_ids32, gram_size=gram_size,
        d_log2=d_log2, tl_pad=tl_pad, tgw=tgw,
    )
    d = 1 << d_log2
    words_t = mask.T  # (n_words, tl_pad)
    d_idx = jnp.arange(d, dtype=jnp.int32)
    inc = (
        (words_t[d_idx >> 5, :] >> (d_idx & 31).astype(jnp.uint32)[:, None])
        & jnp.uint32(1)
    ).astype(jnp.int8)
    return inc, tg


@functools.partial(
    jax.jit, static_argnames=("gram_size", "d_log2", "tl_pad", "tgw")
)
def build_sketch_device_packed(
    long_tokens, long_lengths, gram_ids32, *,
    gram_size: int, d_log2: int, tl_pad: int, tgw: int,
):
    """Packed-plane sketch incidence: (D, tl_pad/8) int8 in the
    ops.bitmap_matmul layout, so the hashed-bucket hit bound runs through
    the SAME Pallas unpack-matmul kernel as the exact bitmap path.

    Packing is the point: D is the collision knob (sound upper bounds
    get tight as D grows) and an unpacked (D, Tl) int8 incidence caps D
    at ~1024 under a 6 GB budget at 2M terms, i.e. ~46 grams/bucket on a
    47k-gram corpus - hopeless inflation.  Packed, the same budget holds
    D = 16384 (~3 grams/bucket).  Expansion+packing runs in D-slabs of
    512 rows inside one jit so the (slab, Tl) transient stays ~1 GB.
    """
    from ..ops.bitmap_matmul import BLKB, TILE_LANES

    tg, mask = _tg_and_mask(
        long_tokens, long_lengths, gram_ids32, gram_size=gram_size,
        d_log2=d_log2, tl_pad=tl_pad, tgw=tgw,
    )
    d = 1 << d_log2
    nb = tl_pad // 8
    nt = tl_pad // TILE_LANES
    slab = min(512, d)  # D rows per step; 16 mask words
    nw = slab // 32
    shifts = (
        jnp.uint16(1) << jnp.arange(8, dtype=jnp.uint16)
    ).reshape(1, 1, 8, 1)
    bitsel = jnp.arange(32, dtype=jnp.uint32)[None, None, :]

    def body(i, out):
        # (tl_pad, nw) u32 word slice -> (slab, tl_pad) u8 bits -> pack.
        # Narrow dtypes keep the slab transients ~1-2 GB at 2M terms
        # (a u32 formulation peaked >12 GB and OOM'd the chip).
        sub = jax.lax.dynamic_slice(
            mask, (0, i * nw), (tl_pad, nw)
        )  # (tl_pad, nw) u32
        bits = ((sub[:, :, None] >> bitsel) & jnp.uint32(1)).astype(
            jnp.uint8
        ).reshape(tl_pad, slab)
        v = bits.T.reshape(slab, nt, 8, BLKB)
        byte = jnp.sum(
            v.astype(jnp.uint16) * shifts, axis=2, dtype=jnp.uint16
        ).astype(jnp.uint8)
        return jax.lax.dynamic_update_slice(
            out, jax.lax.bitcast_convert_type(byte.reshape(slab, nb),
                                              jnp.int8),
            (i * slab, 0),
        )

    out = jnp.zeros((d, nb), jnp.int8)
    out = jax.lax.fori_loop(0, d // slab, body, out)
    return out, tg


def pack_inc_np(inc: np.ndarray) -> np.ndarray:
    """Numpy packer for the host-built (wide / g=4) sketch incidence:
    (D, tl_pad) 0/1 -> plane-tiled (D, tl_pad/8) int8."""
    from ..ops.bitmap_matmul import BLKB, TILE_LANES

    d, tlp = inc.shape
    nt = tlp // TILE_LANES
    v = inc.reshape(d, nt, 8, BLKB).astype(np.uint16)
    byte = (v << np.arange(8, dtype=np.uint16)[None, None, :, None]).sum(
        axis=2
    )
    return byte.astype(np.uint8).view(np.int8).reshape(d, nt * BLKB)


def build_sketch_host(
    long_tokens: np.ndarray,
    long_lengths: np.ndarray,
    lookup_gram_slots,
    gram_size: int,
    wide: bool,
    vocab,
    d_log2: int,
    tl_pad: int,
    tgw: int,
):
    """Numpy sketch build (wide strings / g=4, where the device pack does
    not apply).  Same outputs as build_sketch_device."""
    from ..core import grams as gramlib

    tl = long_tokens.shape[0]
    d = 1 << d_log2
    gids, gvalid = gramlib.gram_ids(
        long_tokens, long_lengths, gram_size, wide, vocab
    )
    slots = lookup_gram_slots(gids.ravel()).reshape(gids.shape)
    slots = np.where(gvalid & (slots >= 0), slots, 2**30)
    slots_s = np.sort(slots, axis=1)
    dup = np.zeros(slots_s.shape, bool)
    dup[:, 1:] = slots_s[:, 1:] == slots_s[:, :-1]
    tg = np.where(dup | (slots_s >= 2**30), -1, slots_s).astype(np.int32)
    if tg.shape[1] < tgw:
        tg = np.pad(tg, ((0, 0), (0, tgw - tg.shape[1])), constant_values=-1)
    tg = np.pad(tg[:, :tgw], ((0, tl_pad - tl), (0, 0)), constant_values=-1)

    buckets = bucket_of_np(tg, d_log2)
    inc = np.zeros((d, tl_pad), np.int8)
    t_ids = np.broadcast_to(np.arange(tl_pad)[:, None], buckets.shape)
    sel = buckets >= 0
    inc[buckets[sel], t_ids[sel]] = 1
    return jnp.asarray(inc), jnp.asarray(tg)


# ---------------------------------------------------------------------------
# search front end
# ---------------------------------------------------------------------------


def _rescore_rows(tg_rows, qslots, nqg_f, threshold, row_valid):
    """Exact long-tier scores for gathered tg rows.

    tg_rows (N, TGW) int32 distinct gram slots (-1 pad); qslots (Qmax,)
    int32 query gram slots with multiplicity (-1 absent).  True hits =
    number of query windows whose slot appears in the term's row - the
    reference's searchLong accumulation (nGramSearch.hpp:289-298) with the
    posting-set dedup already folded into ``tg``.
    """
    eq = (tg_rows[:, :, None] == qslots[None, None, :]) & (
        tg_rows[:, :, None] >= 0
    )
    hits = jnp.sum(eq.astype(jnp.int32), axis=(1, 2))
    s = hits.astype(jnp.float32) / nqg_f
    p = row_valid & (hits > 0) & (s >= threshold)
    return s, p


def _sel_bound(vec, vmin, k):
    """Sound, tie-TIGHT bound on the values a top-k selection dropped.

    ``vmin`` is the k-th selected value.  When every value >= vmin was
    selected (count fits k), the dropped maximum is the largest value
    STRICTLY below vmin - one masked max - which cannot tie a kept
    cutoff score, where the naive ``vmin`` bound lands inside the tie
    class and fails the exactness guard (the round-3 2D config retried
    38/1024 rows on exactly this).  When ties straddle the cutoff the
    bound honestly stays vmin."""
    n_ge = jnp.sum((vec >= vmin).astype(jnp.int32))
    nxt = jnp.max(jnp.where(vec < vmin, vec, _NEG_INF))
    return jnp.where(n_ge <= k, nxt, vmin)


def candidates_sketch_impl(
    di,
    inc,  # (D, Tlp) int8 bucket incidence
    tg,  # (Tlp, TGW) int32 distinct gram slots per term
    wmax_pad,  # (Tlp,) f32 per-long-term max edge weight (0 padded)
    pt,  # (T, 4) int32 primary-edge records
    xt,  # (X, 4) int32 extra-edge records
    qtokens,  # (B, Qp) int32
    qlens,  # (B,) int32
    qslots,  # (B, Qmax) int32 gram slots, -1 absent, multiplicity kept
    n_qgrams,  # (B,) int32
    use_short,  # (B,) bool
    promo_ids,  # (B, PK) int32, -1 padded
    promo_terms,  # (B, PK, PE) int32 promo edge term ids, -1 padded
    promo_weights,  # (B, PK, PE) f32 promo edge weights
    limits,  # (B,) int32
    threshold,  # () f32
    *,
    d_log2: int,
    compute_short: bool,
    n_cand: int,
    n_short_cand: int,
    ksb: int,
    kb: int,
    n_edge: int,
    top_k: int,
    packed: bool = False,
    interpret: bool = False,
):
    ts, tl = di.n_short, di.n_long
    compute_short = compute_short and ts > 0
    tlp = tg.shape[0]
    nb = tlp // _BLK
    sb = nb // _SUPER
    d = 1 << d_log2

    # query bucket multiplicities, built on device from the slot matrix
    qb = bucket_of(qslots, d_log2)
    if packed:
        # plane-tiled packed incidence through the Pallas unpack-matmul
        # kernel (ops.bitmap_matmul) - 8x the D reach per HBM byte, which
        # is what keeps the bound tight on gram-rich corpora
        from ..ops.bitmap_matmul import bitmap_hits

        qcnt = jax.vmap(
            lambda row: jnp.zeros((d,), jnp.bfloat16)
            .at[jnp.where(row >= 0, row, d)]
            .add(1, mode="drop")
        )(qb)
        hits8 = bitmap_hits(qcnt, inc, int8_dots=True, interpret=interpret)
    else:
        cnt_dtype = jnp.int8 if qslots.shape[1] <= 127 else jnp.int32
        qcnt = jax.vmap(
            lambda row: jnp.zeros((d,), cnt_dtype)
            .at[jnp.where(row >= 0, row, d)]
            .add(1, mode="drop")
        )(qb)

        # one MXU pass: upper-bound hit counts for every long term
        hits8 = jax.lax.dot_general(
            qcnt, inc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(cnt_dtype)

    nqg_f = jnp.maximum(n_qgrams.astype(jnp.float32), 1.0)
    s_h = hits8.astype(jnp.float32) / nqg_f[:, None]
    pass_h = (hits8 > 0) & (n_qgrams[:, None] > 0) & (s_h >= threshold)
    u_h = jnp.where(pass_h, wmax_pad[None, :] * s_h, _NEG_INF)
    blockmax = u_h.reshape(-1, nb, _BLK).max(axis=2)  # (B, NB)

    def one(args):
        (qtok, qlen, slots, nqg, us, promo, p_t_pk, p_w_pk, limit,
         h_row, bm_row) = args
        qlen_f = jnp.maximum(qlen.astype(jnp.float32), 1.0)
        nq_f = jnp.maximum(nqg.astype(jnp.float32), 1.0)

        # -- hierarchical block selection over the long tier ---------------
        sbmax = bm_row.reshape(sb, _SUPER).max(axis=1)
        sbv, sbi = topk_chunked(sbmax, ksb)
        sb_n = jnp.sum((sbmax > _NEG_INF).astype(jnp.int32))
        sb_cov = sb_n <= ksb
        u_sb = jnp.where(sb_cov, _NEG_INF, _sel_bound(sbmax, sbv[-1], ksb))

        bm_g = bm_row.reshape(sb, _SUPER)[sbi].reshape(-1)  # (ksb*SUPER,)
        bv, bloc = topk_chunked(bm_g, kb)
        blk = sbi[bloc // _SUPER] * _SUPER + (bloc % _SUPER)  # global blocks
        blk_n = jnp.sum((bm_g > _NEG_INF).astype(jnp.int32))
        blk_cov = blk_n <= kb
        u_blk = jnp.where(
            blk_cov, _NEG_INF, _sel_bound(bm_g, bv[-1], kb)
        )

        h_blk = h_row.reshape(nb, _BLK)[blk]  # (kb, BLK)
        w_blk = wmax_pad.reshape(nb, _BLK)[blk]
        s_blk = h_blk.astype(jnp.float32) / nq_f
        p_blk = (h_blk > 0) & (nqg > 0) & (s_blk >= threshold)
        # blocks below the selection never contribute; mask by block validity
        p_blk = p_blk & (bv > _NEG_INF)[:, None]
        u2 = jnp.where(p_blk, w_blk * s_blk, _NEG_INF).reshape(-1)
        # (A 32-lane fine level before this top-k - the restructure that
        # cut the h* finish - measured 12x SLOWER here: the vmapped
        # per-query sub-block gather/top-k chain lowered pathologically,
        # 1,335 -> 112 q/s at the 2D config.  Negative result, round 5;
        # the batched h* formulation does not transplant into the
        # per-query vmap body.)
        uv, li = topk_chunked(u2, n_cand)
        lane = blk[li // _BLK] * _BLK + (li % _BLK)  # long-term local ids
        lane_n = jnp.sum((u2 > _NEG_INF).astype(jnp.int32))
        lane_cov = lane_n <= n_cand
        u_lane = jnp.where(
            lane_cov, _NEG_INF, _sel_bound(u2, uv[-1], n_cand)
        )

        sel_sketch = uv > _NEG_INF
        u_c_long = jnp.maximum(jnp.maximum(u_sb, u_blk), u_lane)
        long_cov = sb_cov & blk_cov & lane_cov

        # -- exact rescoring of the selected lanes --------------------------
        lane_c = jnp.clip(lane, 0, tlp - 1)
        tg_rows = tg[lane_c]
        s_long, p_long = _rescore_rows(
            tg_rows, slots, nq_f, threshold, sel_sketch
        )
        t_long = ts + jnp.clip(lane, 0, max(tl - 1, 0))

        def long_score(p_t):
            flat = p_t.reshape(-1)
            rows = tg[jnp.clip(flat - ts, 0, tlp - 1)]
            s, p = _rescore_rows(
                rows, slots, nq_f, threshold, flat >= ts
            )
            return s.reshape(p_t.shape), p.reshape(p_t.shape)

        # -- short tier: exact dense DP + its own top-k ---------------------
        if compute_short:
            s_short, pass_short, u_short = _short_tier(
                di, qtok, qlen, us, threshold, qlen_f
            )
            usv, usel = topk_chunked(u_short, n_short_cand)
            s_n = jnp.sum((u_short > _NEG_INF).astype(jnp.int32))
            s_cov = s_n <= n_short_cand
            u_c_short = jnp.where(
                s_cov, _NEG_INF,
                _sel_bound(u_short, usv[-1], n_short_cand),
            )
            t_sel = jnp.concatenate([usel, t_long])
            s_sel = jnp.concatenate([s_short[usel], s_long])
            sel_valid = jnp.concatenate([usv > _NEG_INF, p_long])
            u_c = jnp.maximum(u_c_long, u_c_short)
            covered = long_cov & s_cov

            def term_score(p_t):
                p_sh = p_t < ts
                p_ss = s_short[jnp.clip(p_t, 0, max(ts - 1, 0))]
                p_ps = pass_short[jnp.clip(p_t, 0, max(ts - 1, 0))]
                p_sl, p_pl = long_score(p_t)
                return (
                    jnp.where(p_sh, p_ss, p_sl),
                    jnp.where(p_sh, p_ps, p_pl),
                )
        else:
            t_sel, s_sel, sel_valid = t_long, s_long, p_long
            u_c, covered = u_c_long, long_cov
            term_score = long_score

        return _finish_selected(
            di, pt, xt, t_sel, s_sel, sel_valid, u_c, covered, term_score,
            (promo, p_t_pk, p_w_pk), limit, threshold, n_edge=n_edge,
            top_k=top_k,
        )

    return jax.vmap(one)(
        (qtokens, qlens, qslots, n_qgrams, use_short, promo_ids,
         promo_terms, promo_weights, limits, hits8, blockmax)
    )


candidates_sketch = functools.partial(
    jax.jit,
    static_argnames=(
        "d_log2", "compute_short", "n_cand", "n_short_cand", "ksb", "kb",
        "n_edge", "top_k", "packed", "interpret",
    ),
)(candidates_sketch_impl)
