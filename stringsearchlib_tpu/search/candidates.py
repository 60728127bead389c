"""Candidate-sparse batched search.

The dense engine does O(T + E + K log K) work per query - fatal at millions
of keys (full key sort per query).  This module computes exact top-limit
results in candidate space instead.  Interchangeable front halves produce
per-term long-tier scores; a shared back half (selection -> edge
expansion -> promotion -> ranking -> exactness guard) finishes the query:

* ``candidates_matmul`` - MXU front end for gram-DENSE corpora (few
  distinct grams, long posting lists).  Hit counts for the whole batch are
  one int8 matmul: q_cnt (B, G) @ M (G, Tl), where M is the 0/1 gram->term
  incidence matrix.  Counts are small integers, so the products are EXACT.
  This is the reference's hottest loop (searchLong,
  nGramSearch.hpp:289-298) mapped onto the systolic array.

* ``candidates_bitmap_mxu`` / ``candidates_bitmap`` - bit-PACKED incidence
  (1/8 the HBM) for tiers where the dense M cannot be resident: the Pallas
  unpack-matmul kernel (ops.bitmap_matmul) on hardware, an XLA per-slot
  scan otherwise.  At huge tiers the blockmax finish selects candidate
  blocks by bound before any full-width f32 math.

* ``candidates_runs`` - sorted-postings front end for gram-SPARSE corpora
  or tiny batches (posting lists short; a full-table stream would be the
  wrong cost model).  The query's posting ranges are CSR-expanded into
  (s_cap,) lanes and sorted; run lengths ARE the hit counts.
  O(P_q log P_q) where P_q = total postings touched - the
  information-theoretic minimum for exhaustive counting - with no scatters
  (20-40x slower than sorts on v5e) and no O(T) dense vectors.

(The hashed bucket-sketch front end for very large gram-rich tiers lives
in search.sketch.)  The engine picks per index and batch size
(SearchEngine._run_candidate_chunks): dense matmul when G * Tl fits the
HBM budget, bitmap when the packed table fits, sketch when even that is
too big, runs for gram-sparse corpora and tiny batches.

Exactness guarantee (host falls back to the dense path when it fails):
  * if n_pass <= C and no edge overflow, every passing term was expanded ->
    scores, order and count are all exact;
  * else let u_C = the C-th selection bound.  Unexpanded terms contribute
    at most u_C to any key; if the limit-th ranked score strictly exceeds
    u_C and at least `limit` keys were reached, the returned top-limit list
    is exact and count = limit.

Keys in positions past `limit` may be mis-scored; the host never returns
them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PERFECT_SCORE_CUTOFF, PROMOTED_SCORE
from .editdist import dp_match

_NEG_INF = np.float32(-np.inf)


# ---------------------------------------------------------------------------
# shared back half: selection -> edges -> promotion -> ranking -> exactness
# ---------------------------------------------------------------------------


_BLK = 128  # selection block width (one vector register row)

# lax.top_k cost grows superlinearly past ~32k lanes on v5e (measured
# 42 ms for (256, 131k)->1024 vs 2.5 ms for (256, 31k)->1024); chunked
# selection keeps every top_k call at or under this width
_TOPK_CHUNK = 1 << 15


def topk_chunked(u, k, chunk: int = _TOPK_CHUNK):
    """EXACT top-k over the last axis via per-chunk top-k + merge.

    The union of per-chunk top-k sets provably contains the global top-k
    (any global winner is within the top-k of its own chunk), so a
    second top-k over the nc*k merged candidates is exact.  Tie handling
    differs from monolithic lax.top_k only in WHICH equal-valued lanes
    are selected - the exactness guard already treats cutoff ties as
    guard failures, so results are unaffected.  Indices may point at
    -inf padding when fewer than k lanes exist; callers already treat
    non-finite selections as invalid."""
    n = u.shape[-1]
    if n <= chunk or k >= chunk:
        return jax.lax.top_k(u, k)
    nc = -(-n // chunk)
    pad = [(0, 0)] * (u.ndim - 1) + [(0, nc * chunk - n)]
    if jnp.issubdtype(u.dtype, jnp.floating):
        neg = _NEG_INF
    else:
        neg = np.iinfo(np.dtype(u.dtype)).min
    up = jnp.pad(u, pad, constant_values=neg)
    uc = up.reshape(*u.shape[:-1], nc, chunk)
    vals, idx = jax.lax.top_k(uc, k)
    gidx = idx + (jnp.arange(nc, dtype=idx.dtype) * chunk)[:, None]
    flat_v = vals.reshape(*u.shape[:-1], nc * k)
    flat_i = gidx.reshape(*u.shape[:-1], nc * k)
    v2, sel = jax.lax.top_k(flat_v, k)
    return v2, jnp.take_along_axis(flat_i, sel, axis=-1)


def topk_guarded(u, k, *, approx: bool):
    """Top-k over the last axis with a sound per-row miss indicator.

    ``approx=False``: exact chunked top-k, ``miss`` all-False.

    ``approx=True``: ``jax.lax.approx_max_k`` (TPU PartialReduce path,
    measured 1.5-2.4x faster than exact top-k at selection shapes) plus a
    soundness check: let m = the k-th returned value.  If the number of
    lanes STRICTLY above m equals the number of returned values strictly
    above m, then every lane > m was selected, so m is a sound upper
    bound on every unselected lane (ties at m may be unselected but never
    exceed m).  Otherwise ``miss`` is True and the caller must treat the
    unselected bound as +inf (guard failure -> exact retry).

    Measured round 3 on the 10M product corpus: approx misses are spread
    UNIFORMLY over the top-k (not confined to tie classes at m), so the
    check fired on 479/512 real rows and every one escalated - the
    engine therefore defaults APPROX_SEL off.  Kept for corpora whose
    bound surfaces are flat enough that misses stay inside tie classes.
    """
    if not approx:
        v, i = topk_chunked(u, k)
        return v, i, jnp.zeros(u.shape[:-1], bool)
    v, i = jax.lax.approx_max_k(u, k, recall_target=0.95)
    m = v[..., -1:]
    n_gt = jnp.sum((u > m).astype(jnp.int32), axis=-1)
    s_gt = jnp.sum((v > m).astype(jnp.int32), axis=-1)
    return v, i, n_gt != s_gt


def _select_candidates(u_all, n_pass, *, n_cand, block_sel, approx=False):
    """Top-``n_cand`` lanes of ``u_all`` by upper bound.

    Returns ``(ub, sel, u_c, covered)``: selected bounds and lane indices,
    ``u_c`` = a sound upper bound on every UNselected lane (-inf when none
    passes outside the selection), ``covered`` = every passing lane was
    selected (scores, order and count are then all exact).

    ``block_sel`` prunes with a two-phase exact scheme: per-128-lane block
    maxima -> top-``n_cand`` blocks -> dense top-k over the surviving
    ``n_cand * 128`` lanes.  A full top-k over T lanes is the dominant cost
    at millions of terms (measured 236 ms per 128-query chunk at T = 1M on
    v5e vs ~45 ms for the MXU hit-count matmul); block maxima are one
    bandwidth-bound pass and shrink the sorted set ~8x.  Exactness: a
    nonempty block holds >= 1 passing lane, so n_pass <= n_cand implies
    every passing block is kept (coverage is never weaker than plain
    top-k), and unkept blocks are bounded by the n_cand-th block max,
    which joins the guard bound.  Selection depth deliberately stays at
    n_cand blocks: a shallower first level (superblock cascade, kb =
    n_cand/4) was measured 2x SLOWER end-to-end at 4M keys because its
    higher bound trips the strict-inequality guard on tie-quantized
    scores (s = hits/n_qgrams takes ~20 discrete values) and every chunk
    pays the escalation retry.
    """
    inf = np.float32(np.inf)
    if not block_sel:
        ub, sel, miss = topk_guarded(u_all, n_cand, approx=approx)
        u_c = jnp.where(
            miss, inf, jnp.where(n_pass > n_cand, ub[-1], _NEG_INF)
        )
        return ub, sel, u_c, (n_pass <= n_cand) & ~miss

    n = u_all.shape[0]
    nb = -(-n // _BLK)
    up = jnp.pad(
        u_all, (0, nb * _BLK - n), constant_values=_NEG_INF
    ).reshape(nb, _BLK)
    bmax = up.max(axis=1)
    kb = min(n_cand, nb)
    bvals, bsel, bmiss = topk_guarded(bmax, kb, approx=approx)
    u2 = up[jnp.clip(bsel, 0, nb - 1)].reshape(-1)
    # a kept entry with value -inf can be a CLAMPED pad index (chunked
    # top_k pads its lane space) whose gather read a real block's lanes;
    # mask those lanes so a term is never selected under a foreign id
    u2 = jnp.where(jnp.repeat(bvals > _NEG_INF, _BLK), u2, _NEG_INF)
    ub, ls, lmiss = topk_guarded(
        u2, min(n_cand, u2.shape[0]), approx=approx
    )
    sel = bsel[jnp.clip(ls // _BLK, 0, kb - 1)] * _BLK + (ls % _BLK)

    nb_nonempty = jnp.sum((bmax > _NEG_INF).astype(jnp.int32))
    blocks_cov = (nb_nonempty <= kb) & ~bmiss
    n_in = jnp.sum((u2 > _NEG_INF).astype(jnp.int32))
    sel_cov = (n_in <= n_cand) & ~lmiss
    u_b = jnp.where(
        blocks_cov, _NEG_INF, jnp.where(bmiss, inf, bvals[-1])
    )
    u_c = jnp.maximum(
        jnp.where(sel_cov, _NEG_INF, jnp.where(lmiss, inf, ub[-1])), u_b
    )
    return ub, sel, u_c, blocks_cov & sel_cov


def _finish_candidates(
    di, pt, xt, u_all, s_all, gid_all, n_pass, term_score, promo_pack,
    limit, threshold, *, n_cand, n_edge, top_k, block_sel=False,
    with_bound=False, approx=False,
):
    """From per-lane upper bounds/scores to the final ranked slice.

    ``u_all``/``s_all``/``gid_all``: parallel lane vectors (passing lanes
    carry u = wmax * s, others -inf).  ``term_score(p_t) -> (p_s, p_pass)``
    evaluates arbitrary global term ids for the promotion keys' edges.
    """
    ub, sel, u_c, covered = _select_candidates(
        u_all, n_pass, n_cand=n_cand, block_sel=block_sel, approx=approx
    )
    sel_valid = ub > _NEG_INF
    sel_c = jnp.clip(sel, 0, gid_all.shape[0] - 1)
    t_sel = gid_all[sel_c]
    s_sel = s_all[sel_c]
    return _finish_selected(
        di, pt, xt, t_sel, s_sel, sel_valid, u_c, covered, term_score,
        promo_pack, limit, threshold, n_edge=n_edge,
        top_k=top_k, with_bound=with_bound,
    )


def _finish_selected(
    di, pt, xt, t_sel, s_sel, sel_valid, u_c, covered, term_score,
    promo_pack, limit, threshold, *, n_edge, top_k, with_bound=False,
):
    """Back half shared by every candidate front end: from selected
    (term id, exact score, validity) triples plus selection bounds to the
    final ranked slice.

    ``u_c`` is a sound upper bound on the weighted score of every
    UNselected term (-inf when selection covered all passers); ``covered``
    asserts that coverage.  ``term_score(p_t) -> (p_s, p_pass)`` evaluates
    arbitrary global term ids for the promotion keys' edges.

    ``promo_pack = (promo, p_t, p_w)``: promotion key ids (PK,) plus their
    pre-expanded edge term ids/weights (PK, PE) (-1-padded terms mark
    absent edges).  Every caller expands these HOST-side from its
    key->edge CSR copy (SearchEngine._promo_tables; the sharded engine's
    _promo_tables_sharded ships shard-local ids) - the lists are
    typically 1-2 entries, and the on-device CSR expansion cost
    2 x PK x 128 random gathers per query (~45 ms per 256-query chunk
    at 10M keys).

    Edge handling uses the primary-edge decomposition: each candidate's
    first edge is ONE 4-wide record gather from ``pt`` ([key, weight bits,
    key_len, 0] per term; HostIndex.prim_tables) - random 1D gathers cost
    ~90 ns/element on v5e and dominated this kernel, so key id, weight and
    key length travel in one row and the length is carried through the
    ranking sorts instead of re-gathered.  Terms with several master keys
    expand their remaining edges from ``xt`` over ``n_edge`` extra lanes.
    """
    promo, p_t, p_w = promo_pack
    ts, tl = di.n_short, di.n_long
    t_total = ts + tl
    n_cand = t_sel.shape[0]
    k_total = di.key_len.shape[0]
    x_total = max(di.extra_key.shape[0], 1)
    cutoff = np.float32(PERFECT_SCORE_CUTOFF)

    # sort candidates by term id before the table gathers: sorted indices
    # make the DMA access pattern near-sequential (downstream order is
    # irrelevant - everything re-sorts by key)
    t_sel, s_sel = jax.lax.sort(
        (jnp.where(sel_valid, t_sel, t_total), s_sel), num_keys=1
    )
    sel_valid = t_sel < t_total

    # -- primary edges: one 4-wide record gather per candidate ------------
    tg = jnp.clip(t_sel, 0, t_total - 1)
    prec = pt[tg]  # (C, 4): key, bitcast(weight), key_len, 0
    pk_e = jnp.where(sel_valid, prec[:, 0], -1)
    pw_e = jax.lax.bitcast_convert_type(prec[:, 1], jnp.float32)
    pl_e = prec[:, 2]

    # -- extra edges (terms with >1 master key): CSR expansion ------------
    if di.extra_key.shape[0] > 0:
        xp = di.term_extra_ptr
        xlens = jnp.where(sel_valid, xp[tg + 1] - xp[tg], 0)
        ends_x = jnp.cumsum(xlens)
        tot_x = ends_x[-1]
        overflow = tot_x > n_edge
        pos_x = jnp.arange(n_edge, dtype=jnp.int32)
        rank_x = jnp.clip(
            jnp.searchsorted(ends_x, pos_x, side="right"), 0, n_cand - 1
        ).astype(jnp.int32)
        starts_x = ends_x - xlens
        x_idx = jnp.clip(
            xp[tg[rank_x]] + (pos_x - starts_x[rank_x]), 0, x_total - 1
        )
        xvalid = pos_x < jnp.minimum(tot_x, n_edge)
        xrec = xt[x_idx]
        xk_e = jnp.where(xvalid, xrec[:, 0], -1)
        xw_e = jax.lax.bitcast_convert_type(xrec[:, 1], jnp.float32)
        xl_e = xrec[:, 2]
        xs_e = s_sel[rank_x]
        k_e = jnp.concatenate([pk_e, xk_e])
        w_e = jnp.concatenate([pw_e, xw_e])
        s_e = jnp.concatenate([s_sel, xs_e])
        l_e = jnp.concatenate([pl_e, xl_e])
    else:  # no term maps to more than one key: primaries are everything
        overflow = np.bool_(False)
        k_e, w_e, s_e, l_e = pk_e, pw_e, s_sel, pl_e
    evalid = k_e >= 0
    # promo keys are scored exactly below; exclude them here
    is_promo = (k_e[:, None] == promo[None, :]).any(axis=1)
    evalid = evalid & ~is_promo
    val_e = jnp.where(evalid, w_e * s_e, _NEG_INF)

    # per-key max via (key, -value) sort; key lengths ride along
    k_sorted, _, v_sorted, l_sorted = jax.lax.sort(
        (jnp.where(evalid, k_e, k_total), -val_e, val_e, l_e), num_keys=2
    )
    kfirst = jnp.concatenate(
        [jnp.ones((1,), bool), k_sorted[1:] != k_sorted[:-1]]
    )
    cand_valid = kfirst & (k_sorted < k_total)
    cand_score = jnp.maximum(v_sorted, 0.0)  # entryScore 0 floor
    reached_cand = jnp.sum(cand_valid.astype(jnp.int32))

    # -- promotion keys: exact scoring from their pre-expanded edges ------
    p_c = jnp.clip(promo, 0, k_total - 1)
    p_in = (p_t >= 0) & (promo >= 0)[:, None]
    p_s, p_pass_t = term_score(jnp.maximum(p_t, 0))
    p_pass = p_in & p_pass_t
    p_val = jnp.max(jnp.where(p_pass, p_w * p_s, _NEG_INF), axis=1)
    p_reached = p_pass.any(axis=1)
    p_promoted = (p_pass & (p_s > cutoff)).any(axis=1)
    p_score = jnp.where(p_reached, jnp.maximum(p_val, 0.0), 0.0)
    p_score = jnp.where(
        p_promoted & p_reached, jnp.maximum(p_score, PROMOTED_SCORE), p_score
    )
    reached_total = reached_cand + jnp.sum(p_reached.astype(jnp.int32))

    # -- final ranking (promo lens are a small gather; candidate lens were
    # carried through the keysort) ----------------------------------------
    f_key = jnp.concatenate([k_sorted, p_c])
    f_score = jnp.concatenate([cand_score, p_score])
    f_valid = jnp.concatenate([cand_valid, p_reached])
    f_len = jnp.concatenate([l_sorted, di.key_len[p_c]])
    neg = jnp.where(f_valid, -f_score, np.float32(np.inf))
    neg_sorted, out_len, out_key, out_score = jax.lax.sort(
        (neg, jnp.where(f_valid, f_len, np.int32(2**30)), f_key, f_score),
        num_keys=3,
    )

    if with_bound:
        # Cross-shard merge mode (parallel.dist): instead of a local exact
        # flag, export a sound upper bound on the local contribution of any
        # key NOT present in the returned top_k slice:
        #   * unselected terms contribute at most max(u_c, 0) (entryScore
        #     floors at 0, nGramSearch.hpp:326) unless selection covered
        #     all passers;
        #   * keys truncated by the top_k slice scored at most the last
        #     returned (already-floored) score;
        #   * extra-edge overflow voids the bound entirely (+inf -> the
        #     merged guard fails and the host retries densely).
        # The merged guard (sharded_candidates_step) is exact whenever the
        # merged limit-th score strictly exceeds the max shard bound.
        tau = jnp.where(
            reached_total > top_k, out_score[top_k - 1], _NEG_INF
        )
        miss = jnp.where(covered, _NEG_INF, jnp.maximum(u_c, 0.0))
        bound = jnp.where(
            overflow, np.float32(np.inf), jnp.maximum(miss, tau)
        )
        return (
            reached_total, out_key[:top_k], out_score[:top_k],
            out_len[:top_k], bound,
        )

    # -- exactness ---------------------------------------------------------
    lim_idx = jnp.clip(limit - 1, 0, neg.shape[0] - 1)
    sigma_l = -neg_sorted[lim_idx]  # limit-th best valid score
    # clamp the guard bound to the entryScore floor: a missed key whose only
    # edge has negative weight still lands at score 0 (nGramSearch.hpp:326),
    # so it can enter the top-limit via the length tie-break whenever
    # sigma_l == 0 even though u_c < 0
    exact = (~overflow) & (
        covered
        | ((reached_total >= limit) & (sigma_l > jnp.maximum(u_c, 0.0)))
    )
    count = jnp.where(
        covered, reached_total, jnp.minimum(reached_total, limit)
    )
    return count, out_key[:top_k], out_score[:top_k], out_len[:top_k], exact


def _short_tier(di, qtok, qlen, us, threshold, qlen_f):
    """Dense DP scores over the (small) short tier for one query."""
    m_short = dp_match(di.short_tokens, di.short_lengths, qtok, qlen)
    s_short = m_short.astype(jnp.float32) / qlen_f
    pass_short = us & (s_short >= threshold)
    u_short = jnp.where(
        pass_short, di.term_wmax[: di.n_short] * s_short, _NEG_INF
    )
    return s_short, pass_short, u_short


# ---------------------------------------------------------------------------
# front end A: MXU matmul hits (gram-dense corpora)
# ---------------------------------------------------------------------------


def candidates_matmul_impl(
    di,
    gram_matrix,  # (G, Tl) int8 0/1 incidence
    pt,  # (T, 4) int32 primary-edge records (HostIndex.prim_tables)
    xt,  # (X, 4) int32 extra-edge records
    qtokens,  # (B, Qp) int32
    qlens,  # (B,) int32
    qslots,  # (B, Qmax) int32 gram slots, -1 = absent (multiplicity kept)
    n_qgrams,  # (B,) int32
    use_short,  # (B,) bool
    promo_ids,  # (B, PK) int32, -1 padded
    promo_terms,  # (B, PK, PE) int32 promo edge term ids, -1 padded
    promo_weights,  # (B, PK, PE) f32 promo edge weights
    limits,  # (B,) int32
    threshold,  # () f32
    *,
    compute_short: bool,
    n_cand: int,
    n_edge: int,
    top_k: int,
    block_sel: bool = False,
    with_bound: bool = False,
    approx: bool = False,
    hstar: bool = False,
    kb1: int = 512,
    kb2: int = 512,
    hs_fill: int = 2,
):
    ts, tl = di.n_short, di.n_long
    compute_short = compute_short and ts > 0
    g = gram_matrix.shape[0]
    # query gram multiplicities built on device from the (tiny) slot matrix
    # (host->device bytes matter: B x G floats would dwarf the batch).
    # int8 accumulation is exact only while a gram's multiplicity fits 127,
    # i.e. qmax <= 127 slots; wider query buckets accumulate in int32 (the
    # matmul stays integer-exact, just off the double-rate int8 path).
    cnt_dtype = jnp.int8 if qslots.shape[1] <= 127 else jnp.int32
    qcnt = jax.vmap(
        lambda row: jnp.zeros((g,), cnt_dtype)
        .at[jnp.where(row >= 0, row, g)]
        .add(1, mode="drop")
    )(qslots)
    # one MXU pass for the whole batch; int8 x int8 -> int32 is exact and
    # runs at double rate on v5e.  (Narrowing hits to int8 was measured
    # SLOWER at 1M keys - 1300 -> 1050 qps - the f32 re-expansion in each
    # consumer costs more than the saved HBM traffic.)
    hits = jnp.dot(qcnt, gram_matrix, preferred_element_type=jnp.int32)
    if hstar and qslots.shape[1] <= 127:
        h8 = hits.astype(jnp.int8)  # exact: counts <= qmax <= 127
        tlp = h8.shape[1]
        pad = (-tlp) % (_BLK * 8)
        if pad:
            h8 = jnp.pad(h8, ((0, 0), (0, pad)))
        nblk = h8.shape[1] // _BLK
        hmax = block_hmax(h8, nblk, _BLK)
        return _hstar_finish(
            di, pt, xt, h8, hmax, qtokens, qlens, n_qgrams, use_short,
            promo_ids, promo_terms, promo_weights, limits, threshold,
            compute_short=compute_short, kb1=kb1, kb2=kb2, n_cand=n_cand,
            n_edge=n_edge, top_k=top_k, with_bound=with_bound,
            vmax=int(qslots.shape[1]), blk=_BLK, fill=hs_fill,
        )
    return _dense_hits_finish(
        di, pt, xt, hits.astype(jnp.float32), qtokens, qlens, n_qgrams,
        use_short, promo_ids,
        promo_terms, promo_weights, limits, threshold,
        compute_short=compute_short, n_cand=n_cand,
        n_edge=n_edge, top_k=top_k,
        block_sel=block_sel, with_bound=with_bound, approx=approx,
    )


def _dense_hits_finish(
    di, pt, xt, hits, qtokens, qlens, n_qgrams, use_short, promo_ids,
    promo_terms, promo_weights, limits, threshold, *, compute_short,
    n_cand, n_edge, top_k, block_sel, with_bound, approx=False,
):
    """Shared back half for front ends that produce a dense (B, Tl[_pad])
    EXACT hit-count matrix (MXU matmul / bit-packed bitmap): per-term
    scores, selection, edge expansion, promotion, ranking, guard.  ``hits``
    may be any integer/float dtype; columns beyond di.n_long are padding
    (wmax 0, primary key -1) and can never reach a key."""
    ts, tl = di.n_short, di.n_long
    tlp = hits.shape[1]

    def one(args):
        qtok, qlen, hrow, nqg, us, promo, p_t, p_w, limit = args
        hrow = hrow.astype(jnp.float32)
        qlen_f = jnp.maximum(qlen.astype(jnp.float32), 1.0)
        nqg_f = jnp.maximum(nqg.astype(jnp.float32), 1.0)

        s_long = hrow / nqg_f
        pass_long = (hrow > 0) & (nqg > 0) & (s_long >= threshold)
        n_pass = jnp.sum(pass_long.astype(jnp.int32))
        wmax_long = di.term_wmax[ts:]
        if tlp > tl:
            wmax_long = jnp.pad(wmax_long, (0, tlp - tl))
        u_long = jnp.where(pass_long, wmax_long * s_long, _NEG_INF)
        gid_long = ts + jnp.minimum(
            jnp.arange(tlp, dtype=jnp.int32), max(tl - 1, 0)
        )

        if compute_short:
            s_short, pass_short, u_short = _short_tier(
                di, qtok, qlen, us, threshold, qlen_f
            )
            n_pass = n_pass + jnp.sum(pass_short.astype(jnp.int32))
            u_all = jnp.concatenate([u_short, u_long])
            s_all = jnp.concatenate([s_short, s_long])
            gid_all = jnp.concatenate(
                [jnp.arange(ts, dtype=jnp.int32), gid_long]
            )

            def term_score(p_t):
                p_sh = p_t < ts
                p_ss = s_short[jnp.clip(p_t, 0, max(ts - 1, 0))]
                p_sl = s_long[jnp.clip(p_t - ts, 0, tlp - 1)]
                p_s = jnp.where(p_sh, p_ss, p_sl)
                p_pass = jnp.where(
                    p_sh,
                    pass_short[jnp.clip(p_t, 0, max(ts - 1, 0))],
                    pass_long[jnp.clip(p_t - ts, 0, tlp - 1)],
                )
                return p_s, p_pass
        else:
            u_all, s_all, gid_all = u_long, s_long, gid_long

            def term_score(p_t):
                idx = jnp.clip(p_t - ts, 0, tlp - 1)
                return s_long[idx], (p_t >= ts) & pass_long[idx]

        return _finish_candidates(
            di, pt, xt, u_all, s_all, gid_all, n_pass, term_score,
            (promo, p_t, p_w), limit, threshold, n_cand=n_cand,
            n_edge=n_edge, top_k=top_k, block_sel=block_sel,
            with_bound=with_bound, approx=approx,
        )

    return jax.vmap(one)(
        (qtokens, qlens, hits, n_qgrams, use_short, promo_ids,
         promo_terms, promo_weights, limits)
    )


candidates_matmul = functools.partial(
    jax.jit,
    static_argnames=(
        "compute_short", "n_cand", "n_edge", "top_k",
        "block_sel", "with_bound", "approx", "hstar", "kb1", "kb2",
        "hs_fill",
    ),
)(candidates_matmul_impl)


def _unpack_planes(rows):
    """Packed int8 bytes (plane-tiled layout, ops.bitmap_matmul) -> 0/1
    bools with the last dim expanded 8x into term order."""
    from ..ops.bitmap_matmul import BLKB

    lead = rows.shape[:-1]
    nb = rows.shape[-1]
    r3 = rows.reshape(*lead, nb // BLKB, 1, BLKB)
    planes = [
        (r3 < 0) if p == 7 else ((r3 & np.int8(1 << p)) != 0)
        for p in range(8)
    ]
    return jnp.concatenate(planes, axis=-2).reshape(*lead, nb * 8)


def _tight_bound(vals2d, vmin, k):
    """Sound, tie-TIGHT bound on what a per-row value top-k dropped.

    ``vmin`` (b,) is each row's k-th selected value.  Where every value
    >= vmin was selected (count fits k), the dropped maximum is the
    largest value STRICTLY below vmin - one masked max - which cannot
    tie a kept cutoff score.  Where ties straddle the cutoff the bound
    honestly stays vmin (the guard escalates those rows)."""
    n_ge = jnp.sum((vals2d >= vmin[:, None]).astype(jnp.int32), axis=1)
    nxt = jnp.max(
        jnp.where(vals2d < vmin[:, None], vals2d, _NEG_INF), axis=1
    )
    return jnp.where(n_ge <= k, nxt, vmin)


def _hstar_finish(
    di, pt, xt, hits, hmax, qtokens, qlens, n_qgrams, use_short, promo_ids,
    promo_terms, promo_weights, limits, threshold, *, compute_short,
    kb1, kb2, n_cand, n_edge, top_k, with_bound, vmax, blk=_BLK, fill=2,
):
    """Integer hit-threshold (h*) selection for HUGE dense hit matrices.

    Requires EVERY term->key weight == 1 (HostIndex.uniform_weights; the
    engine gates on it): a term's best key contribution is then exactly
    ``hits/n_qgrams``, so selection and exactness-guard bounds live in
    INTEGER hit space — tie-proof where the float block-bound cascade was
    not (docs/PERF.md round 2: a shallower bound landing inside a score
    tie class escalated every chunk).

    Scheme (replaces block top-k by bound + deep rescore):
      1. per-query exact counts cnt[v] = #128-lane blocks with block max
         >= v, one fused compare-reduce pass over ``hmax`` (the kernel's
         fused epilogue output) — hits are small ints (<= Qmax <= vmax);
      2. h* = the smallest v >= max(ceil(threshold * nqg), 1) whose block
         count fits the selection budgets.  ALL blocks with max >= h* are
         then kept (counts are exact), so every unkept term has hits
         <= h* - 1: the guard bound is (h* - 1)/nqg, strictly below any
         kept tie class — integer scores cannot straddle it;
      3. coarse-to-fine extraction bounded by those counts: top-kb1 of
         the 1024-lane maxima -> their 8 sub-block maxima -> top-kb2
         128-lane blocks -> one (kb2 * 128)-lane gather of exact hits.
         The probe (tools/probe_structure_r4.py, 1M keys): terms at the
         100-th-ranked score level number ~170-700 per query, spread one
         per block, so kb1 = kb2 = 512 covers with ~10x less gathered and
         top-k'd lane space than the bound cascade's 131k-524k.

    ``hits`` columns beyond di.n_long are zero padding; h* >= 1 never
    selects them.  Exact-match promotion keys are rescored from the full
    hits row exactly as in _blockmax_finish.
    """
    ts, tl = di.n_short, di.n_long
    b, tlp = hits.shape
    nblk = tlp // blk
    c1 = 8  # coarse factor: 8 x 128 = 1024-lane level
    n1 = -(-nblk // c1)
    hm = hmax
    if n1 * c1 != nblk:
        hm = jnp.pad(hmax, ((0, 0), (0, n1 * c1 - nblk)),
                     constant_values=np.int8(-1))
    nqg_f = jnp.maximum(n_qgrams.astype(jnp.float32), 1.0)
    floor_h = jnp.clip(
        jnp.ceil(threshold * nqg_f - 1e-6).astype(jnp.int32), 1, vmax
    )  # smallest hit count that can reach the threshold
    vals = np.arange(1, vmax + 1, dtype=np.int8)  # hits <= Qmax <= vmax
    hm3 = hm.reshape(b, n1, c1)
    bm1 = jnp.max(hm3, axis=2)  # (b, n1) int8

    # -- exact block counts and h* (integer, per query) --------------------
    cnt128 = jnp.sum(
        (hm[:, :, None] >= vals[None, None, :]).astype(jnp.int32), axis=1
    )  # (b, vmax)
    cnt1 = jnp.sum(
        (bm1[:, :, None] >= vals[None, None, :]).astype(jnp.int32), axis=1
    )
    fits = (cnt128 <= kb2) & (cnt1 <= kb1)  # monotone in v
    first_fit = jnp.argmax(fits, axis=1).astype(jnp.int32) + 1
    any_fit = jnp.any(fits, axis=1)
    # every >= threshold block fits the budgets: keep them ALL (full
    # coverage -> exact counts, the best case)
    fits_floor = jnp.take_along_axis(
        fits, jnp.clip(floor_h - 1, 0, vmax - 1)[:, None], axis=1
    )[:, 0]
    # otherwise: among the levels that fit, take the DEEPEST one that
    # still holds >= fill * limit blocks - ranking only needs the top
    # `limit` keys, so levels below that depth cost gather/top-k width
    # without adding reachable results (counts are exact, so this cannot
    # under-keep relative to first_fit; cnt is monotone, so the fill
    # level always fits whenever first_fit does).  The guard still
    # verifies sigma_limit >= h*/nqg and escalates on failure.
    if fill > 0:
        want = (
            jnp.maximum(limits, 1).astype(jnp.int32)[:, None]
            * np.int32(fill)
        )
        h_fill = jnp.sum((cnt128 >= want).astype(jnp.int32), axis=1)
    else:  # escalation retries maximize coverage instead
        h_fill = jnp.zeros_like(floor_h)
    # no fitting level within vmax: h* = vmax + 1 selects nothing and the
    # guard fails -> the host escalates (cannot happen once kb2 >= nblk)
    hstar = jnp.where(
        fits_floor & (floor_h >= first_fit),
        floor_h,
        jnp.where(
            any_fit,
            jnp.maximum(
                floor_h, jnp.maximum(first_fit, h_fill)
            ),
            np.int32(vmax + 1),
        ),
    )  # (b,)
    covered_blocks = fits_floor & (hstar <= floor_h)

    # -- coarse -> fine extraction ------------------------------------------
    h8 = hstar.astype(jnp.int8)[:, None]
    bv, bsel = jax.lax.top_k(bm1, min(kb1, n1))  # (b, kb1)
    bvalid = bv >= h8
    sub = jnp.take_along_axis(hm3, bsel[:, :, None], axis=1)  # (b, kb1, c1)
    sub = jnp.where(bvalid[:, :, None], sub, np.int8(-1))
    subid = bsel[:, :, None] * c1 + jnp.arange(c1, dtype=jnp.int32)
    kb1_eff = sub.shape[1]
    fv, fs = jax.lax.top_k(sub.reshape(b, kb1_eff * c1), min(kb2, kb1_eff * c1))
    fvalid = fv >= h8
    fid = jnp.take_along_axis(subid.reshape(b, kb1_eff * c1), fs, axis=1)
    fid = jnp.clip(fid, 0, nblk - 1)  # (b, kb2) 128-lane block ids

    h3 = hits.reshape(b, nblk, blk)
    hb = jnp.take_along_axis(h3, fid[:, :, None], axis=1)  # (b, kb2, blk)
    hb = jnp.where(fvalid[:, :, None], hb, np.int8(0))
    kb2_eff = hb.shape[1]

    # -- 32-lane fine level (sub-block compaction) --------------------------
    # The lane ops below (pass mask, lane histogram, top-n_cand) cost
    # ~40 ms per 256-query chunk at kb2*128 = 131k lanes, almost all of
    # it the value top-k (tools/probe_sel_r5.py).  The candidate
    # structure is ~1 relevant term per 128-block (docs/PERF.md round 4),
    # so rank the kept blocks' 32-lane SUB-blocks by their maxima -
    # another exact integer level, same construction as h* - and run the
    # lane stage on kb3*32 lanes instead.  All sub-blocks with max >=
    # the level are kept (counts exact), so lanes in dropped sub-blocks
    # are bounded by (h32-1)/nqg: integer-tie-proof, joins the guard.
    # n_pass counts BEFORE compaction (the short-path coverage test
    # compares it against the selection width).
    sub_w = 32
    nsub = blk // sub_w
    kb3 = min(kb2, kb2_eff * nsub)
    pass_full = (hb > 0) & (n_qgrams[:, None, None] > 0) & (
        hb.astype(jnp.float32) / nqg_f[:, None, None] >= threshold
    )
    n_pass_in = jnp.sum(pass_full.astype(jnp.int32), axis=(1, 2))
    u_sub = jnp.full((b,), _NEG_INF)
    if kb3 < kb2_eff * nsub:
        hb4 = hb.reshape(b, kb2_eff * nsub, sub_w)
        sm = jnp.max(hb4, axis=2)  # (b, kb2_eff*nsub) int8
        cnt32 = jnp.sum(
            (sm[:, :, None] >= vals[None, None, :]).astype(jnp.int32),
            axis=1,
        )
        fit32 = cnt32 <= kb3  # monotone in v
        first32 = jnp.argmax(fit32, axis=1).astype(jnp.int32) + 1
        first32 = jnp.where(
            jnp.any(fit32, axis=1), first32, np.int32(vmax + 1)
        )
        # sub-blocks whose max < floor_h hold no passing lane, so the
        # level clamps to floor_h; cov32 marks full relevant coverage
        h32 = jnp.maximum(first32, floor_h)
        cov32 = jnp.take_along_axis(
            fit32, jnp.clip(floor_h - 1, 0, vmax - 1)[:, None], axis=1
        )[:, 0]
        sv, ss = jax.lax.top_k(sm, kb3)  # all sub-blocks >= h32 selected
        svalid = sv >= h32.astype(jnp.int8)[:, None]
        hb = jnp.where(
            svalid[:, :, None],
            jnp.take_along_axis(hb4, ss[:, :, None], axis=1),
            np.int8(0),
        )  # (b, kb3, sub_w)
        fid_g = jnp.take_along_axis(fid, ss // nsub, axis=1)
        col2 = (
            (fid_g * blk + (ss % nsub) * sub_w)[:, :, None]
            + jnp.arange(sub_w, dtype=jnp.int32)[None, None, :]
        ).reshape(b, kb3 * sub_w)
        u_sub = jnp.where(
            cov32, _NEG_INF, (h32.astype(jnp.float32) - 1.0) / nqg_f
        )
        lane_w = sub_w
        kb_lanes_eff = kb3
    else:
        col2 = (
            fid[:, :, None] * blk
            + jnp.arange(blk, dtype=jnp.int32)[None, None, :]
        ).reshape(b, kb2_eff * blk)
        cov32 = jnp.ones((b,), bool)
        lane_w = blk
        kb_lanes_eff = kb2_eff
    s2 = hb.astype(jnp.float32) / nqg_f[:, None, None]
    pass2 = (hb > 0) & (n_qgrams[:, None, None] > 0) & (
        s2 >= threshold
    )
    # passing hits, zero elsewhere: the integer lane-selection operand
    hbp = jnp.where(pass2, hb, np.int8(0)).reshape(b, kb_lanes_eff * lane_w)
    s2f = s2.reshape(b, kb_lanes_eff * lane_w)
    # lane-level integer threshold, same construction as h*: exact counts
    # of passing lanes per hit level pick h_l = the smallest level whose
    # lanes fit n_cand; a top-k by hit value then provably selects EVERY
    # lane >= h_l, so unselected lanes are STRICTLY below - the bound
    # (h_l - 1)/nqg cannot tie the limit-th score (the float top-k bound
    # here measured 101/512 guard retries at 10M: its n_cand-th value
    # lands inside a score tie class)
    cnt_l = jnp.sum(
        (hbp[:, :, None] >= vals[None, None, :]).astype(jnp.int32), axis=1
    )  # (b, vmax)
    lane_fit = cnt_l <= n_cand
    h_lane = jnp.argmax(lane_fit, axis=1).astype(jnp.int32) + 1
    h_lane = jnp.where(jnp.any(lane_fit, axis=1), h_lane, np.int32(vmax + 1))
    lanes_cov = cnt_l[:, 0] <= n_cand  # every passing lane selected
    # sound bound on every term OUTSIDE the kept blocks (weights == 1)
    u_blk = jnp.where(
        covered_blocks, _NEG_INF,
        (hstar.astype(jnp.float32) - 1.0) / nqg_f,
    )
    u_lane = jnp.where(
        lanes_cov, _NEG_INF,
        (h_lane.astype(jnp.float32) - 1.0) / nqg_f,
    )

    def one(args):
        (qtok, qlen, hrow, hbr, s2r, col2r, u_br, u_lr, u_sr, bcov, lcov,
         scov, npi, promo, p_t, p_w, limit, nqg, us) = args
        qlen_f = jnp.maximum(qlen.astype(jnp.float32), 1.0)
        nqg_f1 = jnp.maximum(nqg.astype(jnp.float32), 1.0)

        def s_at(col):  # exact long-tier score at arbitrary columns
            h = hrow[jnp.clip(col, 0, tlp - 1)].astype(jnp.float32)
            s = h / nqg_f1
            return s, (h > 0) & (nqg > 0) & (s >= threshold)

        if compute_short:
            # short-tier DP scores are fractional: fall back to the float
            # selection over the concatenated lane space
            s_short, pass_short, u_short = _short_tier(
                di, qtok, qlen, us, threshold, qlen_f
            )
            u2r = jnp.where(
                hbr > 0, hbr.astype(jnp.float32) / nqg_f1, _NEG_INF
            )
            u_cat = jnp.concatenate([u_short, u2r])
            s_cat = jnp.concatenate([s_short, s2r])
            gid_cat = jnp.concatenate(
                [jnp.arange(ts, dtype=jnp.int32), ts + col2r]
            )
            npi = npi + jnp.sum(pass_short.astype(jnp.int32))

            def term_score(p_t):
                p_sh = p_t < ts
                p_ss = s_short[jnp.clip(p_t, 0, max(ts - 1, 0))]
                p_sl, p_okl = s_at(p_t - ts)
                p_ps = pass_short[jnp.clip(p_t, 0, max(ts - 1, 0))]
                return (
                    jnp.where(p_sh, p_ss, p_sl),
                    jnp.where(p_sh, p_ps, p_okl),
                )

            ub, ls = topk_chunked(u_cat, min(n_cand, u_cat.shape[0]))
            sel_valid = ub > _NEG_INF
            lsc = jnp.clip(ls, 0, gid_cat.shape[0] - 1)
            t_sel = gid_cat[lsc]
            s_sel = s_cat[lsc]
            sel_cov = npi <= ub.shape[0]
            u_c = jnp.maximum(
                jnp.maximum(
                    jnp.where(sel_cov, _NEG_INF, ub[-1]), u_br
                ),
                u_sr,
            )
            covered = bcov & sel_cov & scov
        else:
            def term_score(p_t):
                s, ok = s_at(p_t - ts)
                return s, (p_t >= ts) & ok

            hv, ls = topk_chunked(hbr, min(n_cand, hbr.shape[0]))
            sel_valid = hv > 0
            lsc = jnp.clip(ls, 0, col2r.shape[0] - 1)
            t_sel = ts + col2r[lsc]
            s_sel = hv.astype(jnp.float32) / nqg_f1
            u_c = jnp.maximum(jnp.maximum(u_lr, u_br), u_sr)
            covered = bcov & lcov & scov
        return _finish_selected(
            di, pt, xt, t_sel, s_sel, sel_valid, u_c, covered, term_score,
            (promo, p_t, p_w), limit, threshold, n_edge=n_edge,
            top_k=top_k, with_bound=with_bound,
        )

    return jax.vmap(one)(
        (qtokens, qlens, hits, hbp, s2f, col2, u_blk, u_lane, u_sub,
         covered_blocks, lanes_cov, cov32, n_pass_in, promo_ids,
         promo_terms, promo_weights, limits, n_qgrams, use_short)
    )


# blockmax formulation over the (B, Tl) hits matrix: "reduce_window"
# maps onto XLA:TPU's maxpool path, "reshape" is the naive lane reduce.
# Switched by measurement on hardware (tools/probe_blockmax.py).
BLOCKMAX_IMPL = "reduce_window"


def block_hmax(hits, nblk, blk):
    """(B, nblk*blk) int hits -> (B, nblk) per-contiguous-blk-lane max."""
    b = hits.shape[0]
    # the maxpool path allocates its window on scoped VMEM; at blk=512
    # over a 10M-lane hits matrix XLA requests 37 MB of stack and aborts
    # ("should not be possible to run out of scoped vmem"), so wide
    # blocks take the reshape reduce
    if BLOCKMAX_IMPL == "reduce_window" and blk <= 128:
        if jnp.issubdtype(hits.dtype, jnp.floating):
            neg = np.asarray(-np.inf, hits.dtype)
        else:
            neg = np.asarray(np.iinfo(np.dtype(hits.dtype)).min, hits.dtype)
        return jax.lax.reduce_window(
            hits, neg, jax.lax.max, (1, blk), (1, blk), "VALID",
        )
    return jnp.max(hits.reshape(b, nblk, blk), axis=2)


def _blockmax_finish(
    di, pt, xt, hits, qtokens, qlens, n_qgrams, use_short, promo_ids,
    promo_terms, promo_weights, limits, threshold, *, compute_short,
    n_cand, n_edge, top_k, with_bound, hmax=None, blk=_BLK, approx=False,
    kb_lanes=0,
):
    """Back half for HUGE dense hit matrices: never materializes a
    (B, Tl) f32 bound vector (at 10M terms that alone is ~40 B/query/term
    of HBM traffic).  The first pass touches no f32 per lane: an int8
    block-max of the hits plus a per-block weight maximum give an upper
    BOUND on each block's best u = wmax * hits/n_qgrams (negative-weight
    blocks are bounded by wblk * threshold, since u is then maximized at
    the smallest passing s).  Blocks are selected by that bound, their
    lanes re-gathered (contiguous 128-lane rows) and rescored exactly,
    and only that n_cand * _BLK lane space pays f32 math + the dense
    top-k.  Guard semantics match _select_candidates(block_sel=True):
    unkept blocks are bounded by the kept-block bound, uncovered
    selections by the n_cand-th bound.  A block's bound is finite iff
    some lane in it passes (its max-hits lane does), so coverage
    counting is unchanged by the bound formulation; results stay exact
    because selection-by-bound only affects WHICH blocks get exact
    rescoring, never the scores or the guard's soundness."""
    ts, tl = di.n_short, di.n_long
    b, tlp = hits.shape
    nblk = tlp // blk
    nqg3 = jnp.maximum(n_qgrams.astype(jnp.float32), 1.0)[:, None, None]
    wmax_long = di.term_wmax[ts:]
    wpad = jnp.pad(wmax_long, (0, tlp - tl)) if tlp > tl else wmax_long
    h3 = hits.reshape(b, nblk, blk)
    if hmax is None:  # not already fused into the hits kernel's epilogue
        hmax = block_hmax(hits, nblk, blk)  # (b, nblk) int8
    smax = hmax.astype(jnp.float32) / nqg3[:, :, 0]
    wblk = jnp.max(wpad.reshape(nblk, blk), axis=1)  # (nblk,)
    nonempty = (hmax > 0) & (n_qgrams[:, None] > 0) & (smax >= threshold)
    ub_blk = jnp.where(
        wblk[None, :] >= 0, wblk[None, :] * smax, wblk[None, :] * threshold
    )
    bmax = jnp.where(nonempty, ub_blk, _NEG_INF)  # (b, nblk) upper bound
    # kept-block budget: legacy depth is n_cand BLOCKS (n_cand * blk kept
    # lanes); kb_lanes > 0 fixes the kept-LANE budget instead, so the
    # rescore/lane-topk width no longer scales with the block width.
    # Shallower budgets trade lane-topk cost against guard-failure
    # escalations (see _select_candidates on why bounds must stay tight).
    kb = min(max(kb_lanes // blk, 16) if kb_lanes else n_cand, nblk)
    nb_nonempty = jnp.sum((bmax > _NEG_INF).astype(jnp.int32), axis=1)
    bvals, bsel, bmiss = topk_guarded(bmax, kb, approx=approx)
    blocks_cov = (nb_nonempty <= kb) & ~bmiss
    # tie-TIGHT dropped-block bound (exact selection only: approx_max_k
    # can miss values above the cutoff, so the all-kept count check
    # behind _tight_bound would be unsound there)
    blk_bound = (
        bvals[:, -1] if approx else _tight_bound(bmax, bvals[:, -1], kb)
    )
    u_b = jnp.where(
        blocks_cov, _NEG_INF,
        jnp.where(bmiss, np.float32(np.inf), blk_bound),
    )
    bsel_c = jnp.clip(bsel, 0, nblk - 1)
    hb = jnp.take_along_axis(h3, bsel_c[:, :, None], axis=1)  # (b,kb,blk)
    wb = wpad.reshape(nblk, blk)[bsel_c]
    s2 = hb.astype(jnp.float32) / nqg3
    pass2 = (hb > 0) & (n_qgrams[:, None, None] > 0) & (s2 >= threshold)
    # mask lanes of invalid kept blocks (clamped pad indices read a real
    # block's lanes; selecting them would score a term under a wrong id)
    pass2 = pass2 & (bvals > _NEG_INF)[:, :, None]
    u2 = jnp.where(pass2, wb * s2, _NEG_INF).reshape(b, kb * blk)
    s2f = s2.reshape(b, kb * blk)
    col2 = (
        bsel_c[:, :, None] * blk
        + jnp.arange(blk, dtype=jnp.int32)[None, None, :]
    ).reshape(b, kb * blk)

    def one(args):
        (qtok, qlen, hrow, u2r, s2r, col2r, u_br, bcov, promo, p_t, p_w,
         limit, nqg, us) = args
        qlen_f = jnp.maximum(qlen.astype(jnp.float32), 1.0)
        nqg_f = jnp.maximum(nqg.astype(jnp.float32), 1.0)

        def s_at(col):  # exact long-tier score at arbitrary columns
            h = hrow[jnp.clip(col, 0, tlp - 1)].astype(jnp.float32)
            s = h / nqg_f
            return s, (h > 0) & (nqg > 0) & (s >= threshold)

        if compute_short:
            s_short, pass_short, u_short = _short_tier(
                di, qtok, qlen, us, threshold, qlen_f
            )
            u_cat = jnp.concatenate([u_short, u2r])
            s_cat = jnp.concatenate([s_short, s2r])
            gid_cat = jnp.concatenate(
                [jnp.arange(ts, dtype=jnp.int32), ts + col2r]
            )

            def term_score(p_t):
                p_sh = p_t < ts
                p_ss = s_short[jnp.clip(p_t, 0, max(ts - 1, 0))]
                p_sl, p_okl = s_at(p_t - ts)
                p_ps = pass_short[jnp.clip(p_t, 0, max(ts - 1, 0))]
                return (
                    jnp.where(p_sh, p_ss, p_sl),
                    jnp.where(p_sh, p_ps, p_okl),
                )
        else:
            u_cat, s_cat = u2r, s2r
            gid_cat = ts + col2r

            def term_score(p_t):
                s, ok = s_at(p_t - ts)
                return s, (p_t >= ts) & ok

        ub, ls, lmiss = topk_guarded(
            u_cat, min(n_cand, u_cat.shape[0]), approx=approx
        )
        sel_valid = ub > _NEG_INF
        lsc = jnp.clip(ls, 0, gid_cat.shape[0] - 1)
        t_sel = gid_cat[lsc]
        s_sel = s_cat[lsc]
        n_in = jnp.sum((u_cat > _NEG_INF).astype(jnp.int32))
        sel_cov = (n_in <= ub.shape[0]) & ~lmiss
        if approx:
            lane_bound = ub[-1]
        else:  # tie-tight (see _tight_bound); per-row form
            lane_bound = _tight_bound(
                u_cat[None, :], ub[-1][None], ub.shape[0]
            )[0]
        u_c = jnp.maximum(
            jnp.where(
                sel_cov, _NEG_INF,
                jnp.where(lmiss, np.float32(np.inf), lane_bound),
            ),
            u_br,
        )
        covered = bcov & sel_cov
        return _finish_selected(
            di, pt, xt, t_sel, s_sel, sel_valid, u_c, covered, term_score,
            (promo, p_t, p_w), limit, threshold, n_edge=n_edge,
            top_k=top_k, with_bound=with_bound,
        )

    return jax.vmap(one)(
        (qtokens, qlens, hits, u2, s2f, col2, u_b, blocks_cov,
         promo_ids, promo_terms, promo_weights, limits, n_qgrams,
         use_short)
    )


# ---------------------------------------------------------------------------
# front end A2: bit-packed bitmap hits (gram-dense corpora too big for A)
# ---------------------------------------------------------------------------


def candidates_bitmap_impl(
    di,
    bitmap,  # (G, Tl_pad/8) uint8 packed incidence (HostIndex.bitmap_tables)
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
    compute_short: bool,
    n_cand: int,
    n_edge: int,
    top_k: int,
    block_sel: bool = False,
    with_bound: bool = False,
    approx: bool = False,
):
    """EXACT hit counts from the bit-packed incidence: for each query gram
    slot, gather its (Tl_pad/8,) row, expand bits, accumulate int8 counts
    (duplicate query grams accumulate multiply - nGramSearch.hpp:289-297).
    One bandwidth-bound VPU pass per slot; 8x the HBM reach of the int8
    matmul operand, no MXU, no sketch inflation.  hits <= n_qgrams <= 127
    so int8 accumulation is exact.

    The engine routes here only off-TPU; on hardware candidates_bitmap_mxu
    streams the same table through the Pallas unpack-matmul kernel, which
    avoids materializing a (B, Tl) accumulator per slot."""
    if bitmap.ndim == 3:  # resident tables are tile-major (see _dispatch)
        from ..ops.bitmap_matmul import from_tile_major

        bitmap = from_tile_major(bitmap)
    ts = di.n_short
    compute_short = compute_short and ts > 0
    g_total = bitmap.shape[0]
    b = qslots.shape[0]
    tl_pad = bitmap.shape[1] * 8

    # int8 accumulation is exact only while hits <= 127, i.e. at most 127
    # gram windows per query; wider query buckets accumulate in int32
    # (mirrors candidates_matmul's cnt_dtype - a repeated-character query
    # can hit one term >127 times and wrap int8 silently otherwise)
    acc_t = jnp.int8 if qslots.shape[1] <= 127 else jnp.int32

    def step(acc, slot_col):
        rows = bitmap[jnp.clip(slot_col, 0, max(g_total - 1, 0))]
        exp = _unpack_planes(rows).astype(acc_t)  # (B, tl_pad)
        acc = acc + jnp.where((slot_col >= 0)[:, None], exp, acc_t(0))
        return acc, None

    acc0 = jnp.zeros((b, tl_pad), acc_t)
    hits, _ = jax.lax.scan(step, acc0, qslots.T)
    return _dense_hits_finish(
        di, pt, xt, hits, qtokens, qlens, n_qgrams, use_short, promo_ids,
        promo_terms, promo_weights, limits, threshold,
        compute_short=compute_short, n_cand=n_cand,
        n_edge=n_edge, top_k=top_k,
        block_sel=block_sel, with_bound=with_bound, approx=approx,
    )


candidates_bitmap = functools.partial(
    jax.jit,
    static_argnames=(
        "compute_short", "n_cand", "n_edge", "top_k",
        "block_sel", "with_bound", "approx",
    ),
)(candidates_bitmap_impl)


def candidates_bitmap_mxu_impl(
    di,
    bitmap,  # (G_pad, Tl_pad/8) int8 plane-tiled packed incidence
    pt,
    xt,
    qtokens,
    qlens,
    qslots,
    n_qgrams,
    use_short,
    promo_ids,
    promo_terms,
    promo_weights,
    limits,
    threshold,
    *,
    compute_short: bool,
    n_cand: int,
    n_edge: int,
    top_k: int,
    block_sel: bool = False,
    with_bound: bool = False,
    interpret: bool = False,
    fused_bmax: bool = False,
    bmax_blk: int = _BLK,
    approx: bool = False,
    kb_lanes: int = 0,
    hstar: bool = False,
    kb1: int = 512,
    kb2: int = 512,
    hs_fill: int = 2,
    pair_dots: bool = False,
    keep_hits: bool = False,
):
    """EXACT hit counts via the Pallas unpack-matmul kernel
    (ops.bitmap_matmul): the packed incidence streams through VMEM once
    per batch while the MXU accumulates every query's counts against each
    unpacked tile - the reference's posting loop (nGramSearch.hpp:289-298)
    at 1/8 the HBM bytes of the int8 incidence.  si8 x si8 -> si32 dots
    are exact for counts <= 127, so the engine keeps Qmax <= 127 slots on
    this path.  Finishes with _hstar_finish (``hstar``, uniform-weight
    indexes), _blockmax_finish at huge tiers (block_sel), or the shared
    dense finish otherwise."""
    from ..ops.bitmap_matmul import bitmap_hits

    ts = di.n_short
    compute_short = compute_short and ts > 0
    gp = bitmap.shape[1] if bitmap.ndim == 3 else bitmap.shape[0]
    qcnt = jax.vmap(
        lambda row: jnp.zeros((gp,), jnp.bfloat16)
        .at[jnp.where(row >= 0, row, gp)]
        .add(1, mode="drop")
    )(qslots)
    # int8 MXU dots: v5e does 2x the int8 MACs of bf16 (measured 93 vs
    # 29 GB/s of packed table at B=256); si8 x si8 -> si32 is exact
    dots = "pair" if pair_dots else True
    if hstar:
        from ..ops.bitmap_matmul import bitmap_hits_bmax

        hits, hmax = bitmap_hits_bmax(
            qcnt, bitmap, interpret=interpret, int8_dots=dots
        )
        res = _hstar_finish(
            di, pt, xt, hits, hmax, qtokens, qlens, n_qgrams, use_short,
            promo_ids, promo_terms, promo_weights, limits, threshold,
            compute_short=compute_short, kb1=kb1, kb2=kb2, n_cand=n_cand,
            n_edge=n_edge, top_k=top_k, with_bound=with_bound,
            vmax=int(qslots.shape[1]), blk=_BLK, fill=hs_fill,
        )
        if keep_hits:
            # hand the device-resident hits/hmax back to the caller so a
            # guard-failed row can re-select at wider budgets WITHOUT
            # re-streaming the packed table (the kernel re-run was 60+ of
            # the 84 ms escalation pass at 10M keys for ~3/512 rows)
            return res + (hits, hmax)
        return res
    if block_sel:
        if fused_bmax:
            # blockmax computed in the kernel's VMEM epilogue: skips the
            # separate full (B, Tl) HBM re-read block_hmax would pay.
            # The epilogue reduces fixed 128-lane blocks (bmax_blk ignored).
            from ..ops.bitmap_matmul import bitmap_hits_bmax

            hits, hmax = bitmap_hits_bmax(
                qcnt, bitmap, interpret=interpret, int8_dots=dots
            )
            blk = _BLK
        else:
            hits = bitmap_hits(
                qcnt, bitmap, interpret=interpret, int8_dots=dots
            )
            hmax = None
            blk = bmax_blk
        return _blockmax_finish(
            di, pt, xt, hits, qtokens, qlens, n_qgrams, use_short,
            promo_ids, promo_terms, promo_weights, limits, threshold,
            compute_short=compute_short,
            n_cand=n_cand, n_edge=n_edge,
            top_k=top_k, with_bound=with_bound, hmax=hmax, blk=blk,
            approx=approx, kb_lanes=kb_lanes,
        )
    hits = bitmap_hits(qcnt, bitmap, interpret=interpret, int8_dots=dots)
    return _dense_hits_finish(
        di, pt, xt, hits, qtokens, qlens, n_qgrams, use_short, promo_ids,
        promo_terms, promo_weights, limits, threshold,
        compute_short=compute_short, n_cand=n_cand,
        n_edge=n_edge, top_k=top_k,
        block_sel=False, with_bound=with_bound, approx=approx,
    )


candidates_bitmap_mxu = functools.partial(
    jax.jit,
    static_argnames=(
        "compute_short", "n_cand", "n_edge", "top_k",
        "block_sel", "with_bound", "interpret", "fused_bmax", "bmax_blk",
        "approx", "kb_lanes", "hstar", "kb1", "kb2", "hs_fill", "pair_dots",
        "keep_hits",
    ),
)(candidates_bitmap_mxu_impl)


def hstar_retry_impl(
    di,
    hits,  # (Br, Tl_pad) int8 rows taken from a retained kernel output
    hmax,  # (Br, Tl_pad/128) int8 fused blockmax rows for the same queries
    pt,
    xt,
    qtokens,
    qlens,
    n_qgrams,
    use_short,
    promo_ids,
    promo_terms,
    promo_weights,
    limits,
    threshold,
    *,
    compute_short: bool,
    kb1: int,
    kb2: int,
    n_cand: int,
    top_k: int,
    n_edge: int,
    vmax: int,
):
    """Selection-only escalation for guard-failed h* rows.

    The escalation pass used to re-run the WHOLE front end (full packed-
    table stream, 60+ ms at 10M keys) for the ~0.6% of rows whose
    limit-th score ties the h*-1 bound; the hit counts it recomputed are
    bit-identical to the first pass's.  This entry re-runs only
    _hstar_finish at the escalated budgets (kb = 4096: the level that
    measurably clears fat-tie rows, docs/PERF.md round 4) on hits rows
    gathered from the retained first-pass output."""
    compute_short = compute_short and di.n_short > 0
    return _hstar_finish(
        di, pt, xt, hits, hmax, qtokens, qlens, n_qgrams, use_short,
        promo_ids, promo_terms, promo_weights, limits, threshold,
        compute_short=compute_short, kb1=kb1, kb2=kb2, n_cand=n_cand,
        n_edge=n_edge, top_k=top_k, with_bound=False, vmax=vmax,
        blk=_BLK, fill=0,
    )


hstar_retry = functools.partial(
    jax.jit,
    static_argnames=(
        "compute_short", "kb1", "kb2", "n_cand", "top_k", "n_edge", "vmax",
    ),
)(hstar_retry_impl)


# row-gather primitive for the gathered front end, switched by hardware
# measurement (tools/probe_gather_r4.py): "dma" = one-step pipelined
# HBM->HBM copies, "take" = XLA gather (correct everywhere, ~11 GB/s).
# "take" until the DMA variant passes Mosaic on hardware: single-row HBM
# slices must be 8-sublane aligned ("Slice shape along dimension 0 must
# be aligned to tiling (8), but is 1"), which needs the term padding at
# 8 * TILE_LANES so each row splits into eight aligned sub-rows.
GATHER_IMPL = "take"


def candidates_bitmap_gather_impl(
    di,
    bitmap,  # (G_pad, Tl_pad/8) int8 plane-tiled packed incidence (FULL)
    rows,  # (Gc,) int32 batch gram-union table rows (dup-padded)
    pt,
    xt,
    qtokens,
    qlens,
    qslots,  # (B, Qmax) int32 slots REMAPPED into [0, Gc), -1 absent
    n_qgrams,
    use_short,
    promo_ids,
    promo_terms,
    promo_weights,
    limits,
    threshold,
    *,
    compute_short: bool,
    n_cand: int,
    n_edge: int,
    top_k: int,
    block_sel: bool = False,
    with_bound: bool = False,
    interpret: bool = False,
    hstar: bool = False,
    kb1: int = 512,
    kb2: int = 512,
    hs_fill: int = 2,
    pair_dots: bool = True,
    gather_impl: str | None = None,
):
    """Small-batch bitmap front end: hits from the batch's OWN gram rows.

    The full-table kernel streams the whole packed incidence per dispatch
    (~62 ms at 10M keys) regardless of batch size; an interactive query's
    gram union is ~20-40 rows (26-52 MB of table).  This front end
    gathers just the union rows (one pipelined HBM->HBM DMA pass), then
    takes 8 per-bit-plane int8 MXU dots against the compact
    (B, Gc) count operand - work proportional to the union, not the
    table.  Output column order matches the kernel's (plane-tiled term
    order), so the h*/blockmax/dense finishes are shared unchanged.

    Exact for any window count: plane p's masked dot returns h_p * 2^p
    in int32 with no cross-plane carries (the engine still keeps
    Qmax <= 127 here so the assembled hits fit the int8 selection ops).
    Reference semantics: the same posting loop as the full kernel
    (nGramSearch.hpp:289-298)."""
    from ..ops.bitmap_matmul import (
        BLKB, bitmap_hits_bmax, gather_rows_dma, pick_tile_mult,
    )

    ts = di.n_short
    compute_short = compute_short and ts > 0
    gc = rows.shape[0]
    b = qslots.shape[0]
    tmaj = bitmap.ndim == 3
    nb = bitmap.shape[0] * BLKB if tmaj else bitmap.shape[1]
    nt = nb // BLKB
    # gather_impl is a STATIC arg (not module state read at trace time):
    # flipping GATHER_IMPL after the first call must invalidate the
    # cached trace (advisor r4).  None = resolve from the module default.
    if gather_impl is None:
        gather_impl = GATHER_IMPL
    if tmaj:
        # tile-major resident table: the gram axis is axis 1, and the
        # gathered compact table stays tile-major for the kernel branch
        rm = jnp.take(bitmap, rows, axis=1)
    elif (gather_impl == "dma" and not interpret
            and jax.default_backend() != "cpu"):
        rm = gather_rows_dma(bitmap, rows)
    else:  # XLA gather: correct everywhere (CPU tests, fallback)
        rm = jnp.take(bitmap, rows, axis=0)
    hmax = None
    if (interpret or jax.default_backend() != "cpu") and gc % 32 == 0:
        # Pallas unpack-matmul on the GATHERED rows with wide per-step
        # tiles (pick_tile_mult) + the fused blockmax epilogue: the 8-dot
        # XLA front pays ~8x operand unpack traffic and the default
        # 1-tile kernel pays ~11 ms of grid-step overhead at 10M terms
        # (docs/PERF.md round 4); this is both in one pass.
        qcnt = jax.vmap(
            lambda row: jnp.zeros((gc,), jnp.bfloat16)
            .at[jnp.where(row >= 0, row, gc)]
            .add(1, mode="drop")
        )(qslots)
        # pair_dots threads the engine's hardware off-switch decision
        # (SearchEngine.BITMAP_PAIR_DOTS via .hw_switches.json) instead of
        # deciding locally (advisor r4 medium): if paired dots are disabled
        # as a fault workaround, this route must honor it too.
        dots = "pair" if (pair_dots and qslots.shape[1] <= 31) else True
        hits, hmax = bitmap_hits_bmax(
            qcnt, rm, interpret=interpret, int8_dots=dots,
            tile_mult=pick_tile_mult(b, gc, nt),
        )
    else:
        if tmaj:
            from ..ops.bitmap_matmul import from_tile_major

            rm = from_tile_major(rm)
        qcnt = jax.vmap(
            lambda row: jnp.zeros((gc,), jnp.int8)
            .at[jnp.where(row >= 0, row, gc)]
            .add(1, mode="drop")
        )(qslots)
        u = rm.astype(jnp.uint8)  # bit-preserving; logical shifts
        accs = []
        for p in range(8):
            op = ((u >> p) & jnp.uint8(1)).astype(jnp.int8)
            acc = jnp.dot(qcnt, op, preferred_element_type=jnp.int32)
            accs.append(acc.reshape(b, nt, BLKB))
        hits = jnp.stack(accs, axis=2).reshape(b, nt * 8 * BLKB)
        # engine gates Qmax <= 127 on this path
        hits = hits.astype(jnp.int8)
    if hstar:
        tlp = nt * 8 * BLKB
        if hmax is None:
            hmax = block_hmax(hits, tlp // _BLK, _BLK)
        return _hstar_finish(
            di, pt, xt, hits, hmax, qtokens, qlens, n_qgrams, use_short,
            promo_ids, promo_terms, promo_weights, limits, threshold,
            compute_short=compute_short, kb1=kb1, kb2=kb2, n_cand=n_cand,
            n_edge=n_edge, top_k=top_k, with_bound=with_bound,
            vmax=int(qslots.shape[1]), blk=_BLK, fill=hs_fill,
        )
    if block_sel:
        return _blockmax_finish(
            di, pt, xt, hits, qtokens, qlens, n_qgrams, use_short,
            promo_ids, promo_terms, promo_weights, limits, threshold,
            compute_short=compute_short, n_cand=n_cand, n_edge=n_edge,
            top_k=top_k, with_bound=with_bound, hmax=hmax, blk=_BLK,
        )
    return _dense_hits_finish(
        di, pt, xt, hits, qtokens, qlens, n_qgrams, use_short, promo_ids,
        promo_terms, promo_weights, limits, threshold,
        compute_short=compute_short, n_cand=n_cand, n_edge=n_edge,
        top_k=top_k, block_sel=False, with_bound=with_bound,
    )


candidates_bitmap_gather = functools.partial(
    jax.jit,
    static_argnames=(
        "compute_short", "n_cand", "n_edge", "top_k", "block_sel",
        "with_bound", "interpret", "hstar", "kb1", "kb2", "hs_fill",
        "pair_dots", "gather_impl",
    ),
)(candidates_bitmap_gather_impl)


# ---------------------------------------------------------------------------
# front end B: sorted postings runs (gram-sparse corpora)
# ---------------------------------------------------------------------------


def candidates_runs_impl(
    di,
    pt,  # (T, 4) int32 primary-edge records (HostIndex.prim_tables)
    xt,  # (X, 4) int32 extra-edge records
    qtokens,  # (B, Qp) int32
    qlens,  # (B,) int32
    qslots,  # (B, Qmax) int32
    n_qgrams,  # (B,) int32
    use_short,  # (B,) bool
    promo_ids,  # (B, PK) int32, -1 padded
    promo_terms,  # (B, PK, PE) int32 promo edge term ids, -1 padded
    promo_weights,  # (B, PK, PE) f32 promo edge weights
    limits,  # (B,) int32
    threshold,  # () f32
    *,
    compute_short: bool,
    s_cap: int,
    n_cand: int,
    n_edge: int,
    top_k: int,
    block_sel: bool = False,
    with_bound: bool = False,
    approx: bool = False,
):
    ts, tl = di.n_short, di.n_long
    compute_short = compute_short and ts > 0
    t_total = ts + tl
    p_total = max(di.gram_terms.shape[0], 1)

    def one(args):
        qtok, qlen, slots, nqg, us, promo, p_t, p_w, limit = args
        qmax = slots.shape[0]
        qlen_f = jnp.maximum(qlen.astype(jnp.float32), 1.0)
        nqg_f = jnp.maximum(nqg.astype(jnp.float32), 1.0)

        # -- postings expansion -> sorted run lanes ------------------------
        present = slots >= 0
        slots_c = jnp.maximum(slots, 0)
        plens = jnp.where(
            present, di.gram_ptr[slots_c + 1] - di.gram_ptr[slots_c], 0
        )
        ends = jnp.cumsum(plens)
        total = ends[-1]
        pos = jnp.arange(s_cap, dtype=jnp.int32)
        rank = jnp.clip(
            jnp.searchsorted(ends, pos, side="right"), 0, qmax - 1
        ).astype(jnp.int32)
        starts = ends - plens
        src = di.gram_ptr[slots_c[rank]] + (pos - starts[rank])
        pvalid = pos < total
        tid = jnp.where(
            pvalid, di.gram_terms[jnp.clip(src, 0, p_total - 1)], tl
        )
        tid_sorted = jax.lax.sort(tid)  # sentinels (tl) sink to the end
        lane_valid = tid_sorted < tl

        # -- run starts / lengths (hit counts) -----------------------------
        first = jnp.concatenate(
            [
                lane_valid[:1],
                lane_valid[1:] & (tid_sorted[1:] != tid_sorted[:-1]),
            ]
        )
        n_valid = jnp.sum(lane_valid.astype(jnp.int32))
        starts_sorted = jax.lax.sort(jnp.where(first, pos, s_cap))
        next_start = jnp.concatenate(
            [starts_sorted[1:], jnp.full((1,), s_cap, jnp.int32)]
        )
        run_len = jnp.where(
            starts_sorted < s_cap,
            jnp.minimum(next_start, n_valid) - starts_sorted,
            0,
        )
        run_id = jnp.cumsum(first.astype(jnp.int32)) - 1
        hits_lane = run_len[jnp.clip(run_id, 0, s_cap - 1)]
        s_long_lane = hits_lane.astype(jnp.float32) / nqg_f
        long_pass = first & (nqg > 0) & (s_long_lane >= threshold)
        n_pass = jnp.sum(long_pass.astype(jnp.int32))
        gid_lane = jnp.clip(ts + tid_sorted, 0, t_total - 1)
        u_long = jnp.where(
            long_pass, di.term_wmax[gid_lane] * s_long_lane, _NEG_INF
        )

        def long_score(p_t):
            # hits for arbitrary long ids: binary search into the run lanes
            p_local = jnp.clip(p_t - ts, 0, tl)
            pl = jnp.searchsorted(tid_sorted, p_local.ravel()).reshape(
                p_t.shape
            )
            pl_c = jnp.clip(pl, 0, s_cap - 1)
            found = (
                (tid_sorted[pl_c] == p_local) & (pl < s_cap) & (p_t >= ts)
            )
            p_s = hits_lane[pl_c].astype(jnp.float32) / nqg_f
            return p_s, found & (nqg > 0) & (p_s >= threshold)

        if compute_short:
            s_short, pass_short, u_short = _short_tier(
                di, qtok, qlen, us, threshold, qlen_f
            )
            n_pass = n_pass + jnp.sum(pass_short.astype(jnp.int32))
            u_all = jnp.concatenate([u_short, u_long])
            s_all = jnp.concatenate([s_short, s_long_lane])
            gid_all = jnp.concatenate(
                [jnp.arange(ts, dtype=jnp.int32), gid_lane]
            )

            def term_score(p_t):
                p_sl, p_pl = long_score(p_t)
                p_sh = p_t < ts
                p_ss = s_short[jnp.clip(p_t, 0, max(ts - 1, 0))]
                p_ps = p_sh & us & (p_ss >= threshold)
                return (
                    jnp.where(p_sh, p_ss, p_sl),
                    jnp.where(p_sh, p_ps, p_pl),
                )
        else:
            u_all, s_all, gid_all = u_long, s_long_lane, gid_lane
            term_score = long_score

        return _finish_candidates(
            di, pt, xt, u_all, s_all, gid_all, n_pass, term_score,
            (promo, p_t, p_w), limit, threshold, n_cand=n_cand,
            n_edge=n_edge, top_k=top_k, block_sel=block_sel,
            with_bound=with_bound, approx=approx,
        )

    # vmap, not lax.map: a serial device loop pays per-op latency per query
    # (~14 ms/query measured on v5e); batched sorts amortize it.  Memory is
    # O(B * (s_cap + n_edge [+ Ts])), so the host sizes B from s_cap
    # (SearchEngine._run_candidate_chunks).
    return jax.vmap(one)(
        (qtokens, qlens, qslots, n_qgrams, use_short, promo_ids,
         promo_terms, promo_weights, limits)
    )


candidates_runs = functools.partial(
    jax.jit,
    static_argnames=(
        "compute_short", "s_cap", "n_cand", "n_edge", "top_k",
        "block_sel", "with_bound", "approx",
    ),
)(candidates_runs_impl)

# backwards-compatible alias (pre-matmul name)
candidates_device = candidates_runs
