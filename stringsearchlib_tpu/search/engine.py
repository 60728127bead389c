"""Jitted search orchestrator.

The reference forks two threads per query (std::async at
nGramSearch.hpp:379-389) and merges hash maps; here the whole of ``_search``
(nGramSearch.hpp:350-404) compiles to one XLA program per (shape-bucket,
tier-flag) combination:

  short DP tier + long gram tier -> per-term scores
  -> threshold gate + weight + segment-max over term->key edges (calcScore,
     nGramSearch.hpp:310-341, incl. the 0.999 -> 100 exact-match promotion)
  -> stable multi-key sort (score desc, key length asc; ScoreComparer,
     nGramSearch.h:262-269) -> static top-k slice + reached count.

Host-side work per query is limited to normalization, gram-slot lookup and
shape bucketing; everything else runs on device.
"""

from __future__ import annotations

import functools
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import INT32_MAX, PERFECT_SCORE_CUTOFF, PROMOTED_SCORE
from ..core import grams as gramlib
from ..core import text as textlib
from ..index.build import HostIndex
from .editdist import dp_match, dp_match_tiered
from .overlap import gather_hits

_NEG_INF = np.float32(-np.inf)


@jax.jit
def _gather_rows(planes, rows):
    """Compact-table gather for gram-union row compaction (one per
    batch; all of the batch's chunks reuse the result).  Tile-major
    (ntiles, G, BLKB) tables gather along the gram axis and stay
    tile-major."""
    return jnp.take(planes, rows, axis=1 if planes.ndim == 3 else 0)


def _bm_gp_rows(table) -> int:
    """Gram-row count of a packed table in either layout (row-major
    (G, NB) or tile-major (ntiles, G, BLKB); see bitmap_matmul._dispatch)."""
    return int(table.shape[1] if table.ndim == 3 else table.shape[0])


def _next_pow2(n: int, lo: int) -> int:
    v = lo
    while v < n:
        v *= 2
    return v


# ---------------------------------------------------------------------------
# device-side scoring
# ---------------------------------------------------------------------------


def _promo_mask(n_keys: int, promo_ids):
    """(n_keys,) bool promotion-eligibility mask from host-precomputed key
    ids (HostIndex.promo_key_ids: keys whose escapeBlank+trim(raw) text
    equals the normalized query, nGramSearch.hpp:328-336).  The host hash
    lookup replaces an on-device (K, W) token compare so the normalized
    key token matrix never has to live in HBM (320 MB upload + 1.3 GB
    resident at 10M keys)."""
    idx = jnp.where(promo_ids >= 0, promo_ids, n_keys)
    return jnp.zeros((n_keys,), bool).at[idx].set(True, mode="drop")


def _term_scores(
    di, qtokens, qlen, qslots, n_qgrams, *,
    use_short, brute_long, s_cap, long_buckets=(),
):
    """Per-term scores for both tiers over the global term space [0, T).

    Returns (sA, maskA, sB, maskB): tier A is the DP map (scoreShort),
    tier B the gram map (scoreLong) - kept separate because the reference
    thresholds each map independently (two calcScore calls,
    nGramSearch.hpp:393-394).
    """
    ts, tl = di.n_short, di.n_long
    t = ts + tl
    qlen_f = jnp.maximum(qlen.astype(jnp.float32), 1.0)

    if use_short:
        m_short = dp_match(di.short_tokens, di.short_lengths, qtokens, qlen)
        s_short = m_short.astype(jnp.float32) / qlen_f
        if brute_long:
            m_long = dp_match_tiered(
                di.long_tokens, di.long_lengths, qtokens, qlen, long_buckets
            )
            s_a = jnp.concatenate([s_short, m_long.astype(jnp.float32) / qlen_f])
            mask_a = jnp.ones((t,), dtype=bool)
        else:
            s_a = jnp.concatenate([s_short, jnp.zeros((tl,), jnp.float32)])
            mask_a = jnp.concatenate(
                [jnp.ones((ts,), bool), jnp.zeros((tl,), bool)]
            )
    else:
        s_a = jnp.zeros((t,), jnp.float32)
        mask_a = jnp.zeros((t,), bool)

    hits = gather_hits(di.gram_ptr, di.gram_terms, qslots, tl, s_cap)
    s_b_long = hits.astype(jnp.float32) / jnp.maximum(
        n_qgrams.astype(jnp.float32), 1.0
    )
    mask_b_long = (hits > 0) & (n_qgrams > 0)
    s_b = jnp.concatenate([jnp.zeros((ts,), jnp.float32), s_b_long])
    mask_b = jnp.concatenate([jnp.zeros((ts,), bool), mask_b_long])
    return s_a, mask_a, s_b, mask_b


def _propagate_raw(di, s_a, mask_a, s_b, mask_b, eq_key, threshold):
    """calcScore over the edge list: threshold gate, weight multiply,
    segment-max into keys, exact-match promotion flags.

    Returns (key_val (K,) f32 with -inf for unreached, promo (K,) int32).
    Both combine across term-shards with a plain max, which is what the
    distributed path does (pmax over the mesh axis) before flooring."""
    k = di.n_keys
    et, ek, ew = di.edge_term, di.edge_key, di.edge_weight

    ta, tb = s_a[et], s_b[et]
    pa = mask_a[et] & (ta >= threshold)
    pb = mask_b[et] & (tb >= threshold)
    va = jnp.where(pa, ew * ta, _NEG_INF)
    vb = jnp.where(pb, ew * tb, _NEG_INF)
    val = jnp.maximum(va, vb)

    key_val = jax.ops.segment_max(val, ek, num_segments=k)

    cutoff = np.float32(PERFECT_SCORE_CUTOFF)
    promo_edge = ((pa & (ta > cutoff)) | (pb & (tb > cutoff))) & eq_key[ek]
    promo = jax.ops.segment_max(promo_edge.astype(jnp.int32), ek, num_segments=k)
    return key_val, promo


def _floor_and_promote(key_val, promo):
    """Final key scores from merged raw maxima: entryScore's operator[]
    default-inserts 0 before the max (nGramSearch.hpp:326), and promoted
    keys rise to at least 100 (nGramSearch.hpp:328-336)."""
    reached = key_val > _NEG_INF
    score = jnp.where(reached, jnp.maximum(key_val, 0.0), 0.0)
    score = jnp.where(
        (promo > 0) & reached, jnp.maximum(score, PROMOTED_SCORE), score
    )
    return score, reached


def _propagate(di, s_a, mask_a, s_b, mask_b, eq_key, threshold):
    key_val, promo = _propagate_raw(di, s_a, mask_a, s_b, mask_b, eq_key, threshold)
    return _floor_and_promote(key_val, promo)


def _finalize(di, score, reached, top_k: int):
    """Stable (score desc, key len asc) sort; ties fall back to key id via
    stability.  Unreached keys sink to the end."""
    neg = jnp.where(reached, -score, np.float32(np.inf))
    ids = jnp.arange(di.n_keys, dtype=jnp.int32)
    _, _, out_ids, out_scores = jax.lax.sort(
        (neg, di.key_len, ids, score), num_keys=2, is_stable=True
    )
    count = jnp.sum(reached.astype(jnp.int32))
    return count, out_ids[:top_k], out_scores[:top_k]


def search_device_impl(
    di, qtokens, qlen, qslots, n_qgrams, promo_ids, threshold, *,
    use_short, brute_long, s_cap, top_k, long_buckets=()
):
    """Unjitted single-device search step (jit-traceable; statics closed
    over by the caller).  Exposed for __graft_entry__ and the sharded path."""
    s_a, mask_a, s_b, mask_b = _term_scores(
        di, qtokens, qlen, qslots, n_qgrams,
        use_short=use_short, brute_long=brute_long, s_cap=s_cap,
        long_buckets=long_buckets,
    )
    eq_key = _promo_mask(di.n_keys, promo_ids)
    score, reached = _propagate(di, s_a, mask_a, s_b, mask_b, eq_key, threshold)
    return _finalize(di, score, reached, top_k)


_search_device = functools.partial(
    jax.jit,
    static_argnames=(
        "use_short", "brute_long", "s_cap", "top_k", "long_buckets"
    ),
)(search_device_impl)


def search_batch_device_impl(
    di, qtokens, qlens, qslots, n_qgrams, use_short, promo_ids, threshold,
    *, compute_short, s_cap, top_k,
):
    """Batched search: one device dispatch scores B queries.

    The reference has no batch path (one thread-forked _search per call,
    nGramSearch.hpp:350); batching exists because a TPU dispatch is far more
    expensive than a query.  Tier flags become per-query data: ``use_short``
    is a (B,) mask (applied to the DP tier), while brute-force short queries
    (qlen <= gram_size) take the single-query path host-side.

    Queries run vmapped - batched sorts/scatters amortize per-op latency
    that a serial lax.map pays per query (~14 ms measured on v5e); memory is
    O(B x (terms + keys)), so the host caps B from the index size.
    """

    def one(args):
        qtok, qlen, slots, nqg, us, promo = args
        ts, tl = di.n_short, di.n_long
        qlen_f = jnp.maximum(qlen.astype(jnp.float32), 1.0)
        if compute_short:
            m_short = dp_match(di.short_tokens, di.short_lengths, qtok, qlen)
            s_short = m_short.astype(jnp.float32) / qlen_f
        else:
            s_short = jnp.zeros((ts,), jnp.float32)
        s_a = jnp.concatenate([s_short, jnp.zeros((tl,), jnp.float32)])
        mask_a = jnp.concatenate(
            [jnp.broadcast_to(us, (ts,)), jnp.zeros((tl,), bool)]
        )

        hits = gather_hits(di.gram_ptr, di.gram_terms, slots, tl, s_cap)
        s_b_long = hits.astype(jnp.float32) / jnp.maximum(
            nqg.astype(jnp.float32), 1.0
        )
        s_b = jnp.concatenate([jnp.zeros((ts,), jnp.float32), s_b_long])
        mask_b = jnp.concatenate(
            [jnp.zeros((ts,), bool), (hits > 0) & (nqg > 0)]
        )

        eq_key = _promo_mask(di.n_keys, promo)
        score, reached = _propagate(di, s_a, mask_a, s_b, mask_b, eq_key, threshold)
        return _finalize(di, score, reached, top_k)

    return jax.vmap(one)(
        (qtokens, qlens, qslots, n_qgrams, use_short, promo_ids)
    )


_search_batch_device = functools.partial(
    jax.jit, static_argnames=("compute_short", "s_cap", "top_k")
)(search_batch_device_impl)


def search_brute_batch_device_impl(
    di, qtokens, qlens, qslots, n_qgrams, promo_ids, threshold, *,
    s_cap, top_k, long_buckets=()
):
    """Batched brute-force tier for qlen <= gram_size queries.

    The reference brute-forces the ENTIRE long tier with the DP scorer for
    such queries (getMatchScore long-lib fallback, nGramSearch.hpp:247-253);
    round 1 dispatched each one separately.  One vmapped dispatch now scores
    a whole chunk - the host caps the chunk size because the DP rows are
    O(B x T x W).
    """

    def one(args):
        qtok, qlen, slots, nqg, promo = args
        ts, tl = di.n_short, di.n_long
        qlen_f = jnp.maximum(qlen.astype(jnp.float32), 1.0)
        m_short = dp_match(di.short_tokens, di.short_lengths, qtok, qlen)
        m_long = dp_match_tiered(
            di.long_tokens, di.long_lengths, qtok, qlen, long_buckets
        )
        s_a = jnp.concatenate([m_short, m_long]).astype(jnp.float32) / qlen_f
        mask_a = jnp.ones((ts + tl,), bool)

        hits = gather_hits(di.gram_ptr, di.gram_terms, slots, tl, s_cap)
        s_b_long = hits.astype(jnp.float32) / jnp.maximum(
            nqg.astype(jnp.float32), 1.0
        )
        s_b = jnp.concatenate([jnp.zeros((ts,), jnp.float32), s_b_long])
        mask_b = jnp.concatenate(
            [jnp.zeros((ts,), bool), (hits > 0) & (nqg > 0)]
        )
        eq_key = _promo_mask(di.n_keys, promo)
        score, reached = _propagate(
            di, s_a, mask_a, s_b, mask_b, eq_key, threshold
        )
        return _finalize(di, score, reached, top_k)

    return jax.vmap(one)((qtokens, qlens, qslots, n_qgrams, promo_ids))


_search_brute_batch_device = functools.partial(
    jax.jit, static_argnames=("s_cap", "top_k", "long_buckets")
)(search_brute_batch_device_impl)


@functools.partial(jax.jit, static_argnames=("top_k",))
def _wildcard_device(di, *, top_k):
    """Wildcard '' / '*' (nGramSearch.hpp:356-369): every key at its weight
    (max across edges; the reference's last-writer-wins is unordered)."""
    k = di.n_keys
    score = jax.ops.segment_max(di.edge_weight, di.edge_key, num_segments=k)
    reached = score > _NEG_INF
    score = jnp.where(reached, score, 0.0)
    return _finalize(di, score, reached, top_k)


# ---------------------------------------------------------------------------
# host-side per-query front end
# ---------------------------------------------------------------------------


class SearchEngine:
    """Query front end for one HostIndex: normalization, gram-slot lookup,
    shape bucketing, jit dispatch, and result materialization."""

    def __init__(self, host: HostIndex):
        self.host = host
        self.cfg = host.config
        # optional observability (utils.metrics.QueryMetrics); None = off
        self.metrics = None
        # wildcard results are query-independent (every key at its max
        # edge weight) and the index is immutable: cache per top_k
        self._wildcard_cache: dict = {}
        # resolved routing of the most recent candidate pass: the bench
        # artifact records this per config so a silent fallback (kernel
        # vs scan, tiny-runs, sketch) is visible in BENCH_r*.json
        self.last_routing: dict = {}

    # -- query prep -----------------------------------------------------

    def _normalize_query(self, query) -> tuple[np.ndarray, int]:
        tokens, lengths = textlib.encode_batch([query], self.cfg.wide)
        out, out_len = textlib.normalize_matrix(tokens, lengths, self.host.tables)
        return out[0], int(out_len[0])

    def _query_buffers(self, qnorm: np.ndarray, qlen: int):
        g = self.cfg.gram_size
        qp = _next_pow2(qlen, max(16, self.cfg.query_pad // 4))
        qtok = np.zeros(qp, dtype=np.int32)
        qtok[:qlen] = qnorm[:qlen]
        qmax = qp - g + 1
        slots = np.full(qmax, -1, dtype=np.int32)
        n_qgrams = 0
        if qlen >= g:
            n_qgrams = qlen - g + 1
            ids, valid = gramlib.gram_ids(
                qnorm[None, :max(qlen, g)], np.array([qlen]), g,
                self.cfg.wide, self.host.vocab,
            )
            slots[:n_qgrams] = self.host.lookup_gram_slots(ids[0][valid[0]])
        # exact total postings for this query, bucketed to bound recompiles
        lens = self.host.host_posting_lens
        present = slots[slots >= 0]
        s_total = int(lens[present].sum()) if present.size else 0
        s_cap = _next_pow2(max(s_total, 1), 128)
        return qtok, qmax, slots, n_qgrams, s_cap

    def _top_k(self, limit: int) -> int:
        k = self.host.device.n_keys
        if limit <= 0 or limit >= k:
            return max(k, 1)
        return min(_next_pow2(limit, 16), max(k, 1))

    # -- public search ----------------------------------------------------

    def search(self, query, threshold: float = 0.0, limit: int = 0):
        """Returns (result key strings, scores); limit 0 = unbounded
        (nGramSearch.hpp:454-455)."""
        if self.metrics is not None:
            t0 = time.perf_counter()
            try:
                return self._search_impl(query, threshold, limit)
            finally:
                self.metrics.record(time.perf_counter() - t0)
        return self._search_impl(query, threshold, limit)

    def _search_impl(self, query, threshold: float = 0.0, limit: int = 0):
        if not self.host.indexed:
            return [], []
        if limit == 0:
            limit = INT32_MAX
        raw = query if isinstance(query, str) else str(query)
        di = self.host.device
        top_k = self._top_k(limit)

        if len(raw) == 0 or raw == "*":
            if di.edge_key.shape[0] == 0:
                return [], []
            cached = self._wildcard_cache.get(top_k)
            if cached is None:
                cached = jax.device_get(_wildcard_device(di, top_k=top_k))
                self._wildcard_cache[top_k] = cached
            count, ids_np, scores_np = cached
            n = min(int(count), limit, int(ids_np.shape[0]))
            return (
                [self.host.key_strings[i] for i in ids_np[:n]],
                [float(s) for s in scores_np[:n]],
            )
        else:
            qnorm, qlen = self._normalize_query(raw)
            if qlen == 0:
                return [], []
            # On large indexes an eligible single query routes through the
            # candidate batch path: the dense path's full K-key sort is the
            # wrong cost model at millions of keys.
            if (
                limit <= self.CAND_MAX_LIMIT
                and self.host.n_terms >= self.CAND_MIN_TERMS
                and self.cfg.brute_force_cutoff < qlen <= 32
            ):
                return self._search_batch_impl(
                    [raw], threshold, limit, 256, 32, "auto"
                )[0]
            qtok, qmax, slots, n_qgrams, s_cap = self._query_buffers(qnorm, qlen)
            use_short = qlen < self.cfg.short_search_cutoff
            brute_long = qlen <= self.cfg.brute_force_cutoff
            # dense paths carry EVERY promo id (pow2-bucketed width) - a
            # fixed PROMO_KEYS slice would silently drop the 0.999 -> 100
            # promotion for the 9th+ key normalizing to the query text
            pids = self.host.promo_key_ids(qnorm, qlen)
            promo = np.full(
                _next_pow2(max(pids.size, 1), self.PROMO_KEYS), -1, np.int32
            )
            promo[: pids.size] = pids
            count, ids, scores = _search_device(
                di,
                jnp.asarray(qtok),
                np.int32(qlen),
                jnp.asarray(slots),
                np.int32(n_qgrams),
                jnp.asarray(promo),
                np.float32(threshold),
                use_short=use_short,
                brute_long=brute_long,
                s_cap=s_cap,
                top_k=top_k,
                long_buckets=(
                    self.host.long_dp_buckets() if brute_long else ()
                ),
            )

        # one fetch for all three results: each np.asarray is a separate
        # device->host round trip (~40 ms each through a remote backend)
        count, ids_np, scores_np = jax.device_get((count, ids, scores))
        n = min(int(count), limit, int(ids_np.shape[0]))
        return (
            [self.host.key_strings[i] for i in ids_np[:n]],
            [float(s) for s in scores_np[:n]],
        )

    # -- batched search ----------------------------------------------------

    # candidate-path shape defaults (statics)
    CAND_TERMS = 4096
    CAND_TERMS_FAST = 1024  # first-pass selection width (escalates on guard failure)
    CAND_EDGES = 16384
    PROMO_KEYS = 8
    PROMO_EDGES = 128
    CAND_MIN_TERMS = 20000  # below this the dense batch is already cheap
    CAND_MAX_LIMIT = 512

    def search_batch(
        self, queries, threshold: float = 0.0, limit: int = 100,
        batch_bucket: int = 256, qp_bucket: int = 32, mode: str = "auto",
    ):
        """Batched search: one device dispatch for the whole batch.

        Returns a list of (strings, scores) aligned with ``queries``.
        Wildcards take the dedicated edge-weight path; brute-force-short
        queries (qlen <= gram_size) batch through the whole-tier DP; and
        queries longer than ``qp_bucket`` batch in their own pow2-width
        groups.

        ``mode``: "auto" picks the candidate-sparse path for bounded limits
        on large indexes (exact results; rows whose exactness guard fails
        are transparently recomputed densely), "dense" forces the dense
        batch, "candidates" forces the sparse path where eligible.
        """
        if self.metrics is not None:
            t0 = time.perf_counter()
            try:
                return self._search_batch_impl(
                    queries, threshold, limit, batch_bucket, qp_bucket, mode
                )
            finally:
                self.metrics.record(time.perf_counter() - t0, len(queries))
        return self._search_batch_impl(
            queries, threshold, limit, batch_bucket, qp_bucket, mode
        )

    def _search_batch_impl(
        self, queries, threshold, limit, batch_bucket, qp_bucket, mode
    ):
        if limit == 0:
            limit = INT32_MAX
        out: list = [None] * len(queries)
        if not self.host.indexed:
            return [([], [])] * len(queries)

        items = []  # (position, qnorm, qlen, promo_row or None)
        brute_items = []  # (position, qnorm, qlen): qlen <= gram_size
        want_cand = mode != "dense" and (
            mode == "candidates"
            or (
                limit <= self.CAND_MAX_LIMIT
                and self.host.n_terms >= self.CAND_MIN_TERMS
            )
        )
        ke_counts = self.host.host_key_edge_counts
        # one encode + one normalize matrix pass for the whole batch, and
        # one vectorized promo hash pass: the per-query versions measured
        # 68 ms + 132 ms per 512 queries of pure host overhead
        raws = [q if isinstance(q, str) else str(q) for q in queries]
        nz = [i for i, r in enumerate(raws) if len(r) > 0 and r != "*"]
        if nz:
            tokens, lengths = textlib.encode_batch(
                [raws[i] for i in nz], self.cfg.wide
            )
            norm_tok, norm_len = textlib.normalize_matrix(
                tokens, lengths, self.host.tables
            )
            promo_rows = (
                self.host.promo_key_ids_batch(norm_tok, norm_len)
                if want_cand else [None] * len(nz)
            )
        for i, raw in enumerate(raws):
            if len(raw) == 0 or raw == "*":
                out[i] = self._search_impl(raw, threshold, limit)
        for j, i in enumerate(nz):
            qnorm, qlen = norm_tok[j], int(norm_len[j])
            if qlen == 0:
                out[i] = ([], [])
            elif qlen <= self.cfg.brute_force_cutoff:
                brute_items.append((i, qnorm, qlen))
            else:
                promo = None
                if want_cand:
                    pids = promo_rows[j]
                    if pids.size <= self.PROMO_KEYS and (
                        pids.size == 0
                        or int(ke_counts[pids].max()) <= self.PROMO_EDGES
                    ):
                        promo = pids
                items.append((i, qnorm, qlen, promo))

        if not items and not brute_items:
            return out

        # queries longer than qp_bucket batch in their own pow2-width
        # groups (round 1 dispatched each one singly - a batch of 64-char
        # queries paid one full dispatch apiece)
        groups: dict = {}
        for it in items:
            qp_i = qp_bucket if it[2] <= qp_bucket else _next_pow2(
                it[2], qp_bucket
            )
            groups.setdefault(qp_i, []).append(it)
        for qp_i in sorted(groups):
            grp = groups[qp_i]
            cand_items = [it for it in grp if want_cand and it[3] is not None]
            dense_items = [
                it for it in grp if not (want_cand and it[3] is not None)
            ]
            if cand_items:
                retry = self._run_candidate_chunks(
                    cand_items, threshold, limit, batch_bucket, qp_i, out
                )
                dense_items.extend(retry)
            if dense_items:
                self._run_dense_chunks(
                    dense_items, threshold, limit, batch_bucket, qp_i, out
                )
        if brute_items:
            self._run_brute_chunks(brute_items, threshold, limit, out)
        return out

    def _run_brute_chunks(self, items, threshold, limit, out):
        """Batched brute tier (qlen <= gram_size): one vmapped DP dispatch
        per chunk instead of one per query.  Chunks are small because the
        whole-tier DP is O(B x T x W) memory."""
        di = self.host.device
        top_k = self._top_k(limit)
        g = self.cfg.gram_size
        qp = max(_next_pow2(self.cfg.brute_force_cutoff + 1, 8), g + 1)
        w = max(int(di.short_tokens.shape[1]), int(di.long_tokens.shape[1]))
        per_q = 12 * max(self.host.n_terms, 1) * (w + 2) + (1 << 18)
        cap = max(int(self.BATCH_HBM_BUDGET // per_q), 1)
        step = 1
        while step * 2 <= min(cap, 64):
            step *= 2

        pending = []
        for lo in range(0, len(items), step):
            chunk = items[lo : lo + step]
            b, qtok, qlens, slots, nqg, _, s_cap = self._prep_rows(
                chunk, qp, min_b=min(step, 16)
            )
            res = _search_brute_batch_device(
                di,
                jnp.asarray(qtok),
                jnp.asarray(qlens),
                jnp.asarray(slots),
                jnp.asarray(nqg),
                jnp.asarray(self._promo_array(chunk, b)),
                np.float32(threshold),
                s_cap=s_cap,
                top_k=top_k,
                long_buckets=self.host.long_dp_buckets(),
            )
            pending.append((chunk, res))
        fetched = jax.device_get([res for _, res in pending])
        for (chunk, _), got in zip(pending, fetched):
            counts, ids_b, scores_b = got
            for r, item in enumerate(chunk):
                self._emit_row(
                    out, item[0], counts[r], ids_b[r], scores_b[r], limit
                )

    # HBM budget for per-batch intermediates; vmapped kernels allocate
    # O(B x terms) so B must shrink as the index grows.  7 GB admits the
    # 512-query chunk at 10M keys (hits 5.4 GB + table 3.4 GB + index
    # ~1.5 GB inside the 16 GB chip): the packed table streams ONCE per
    # chunk, so per-query kernel cost drops ~1.6x over 256-chunks.
    BATCH_HBM_BUDGET = 7 << 30

    def _batch_cap(self, batch_bucket: int) -> int:
        per_query = 48 * max(self.host.n_terms, 1) + (1 << 20)
        cap = max(int(self.BATCH_HBM_BUDGET // per_query), 8)
        pow2 = 8
        while pow2 * 2 <= cap:
            pow2 *= 2
        return min(batch_bucket, pow2)

    def _prep_rows(self, chunk, qp, min_b: int = 16):
        """Shared device buffers for a chunk of (pos, qnorm, qlen, ...).

        One batched gram extraction + slot lookup + posting-mass reduce
        for the whole chunk (the per-query version cost ~24 ms of host
        overhead per 512 queries)."""
        g = self.cfg.gram_size
        qmax = qp - g + 1
        b = _next_pow2(len(chunk), min_b)
        qtok = np.zeros((b, qp), dtype=np.int32)
        qlens = np.zeros(b, dtype=np.int32)
        slots = np.full((b, qmax), -1, dtype=np.int32)
        for r, item in enumerate(chunk):
            qlen = item[2]
            qtok[r, :qlen] = item[1][:qlen]
            qlens[r] = qlen
        use_short = (qlens > 0) & (qlens < self.cfg.short_search_cutoff)
        nqg = np.maximum(qlens - (g - 1), 0).astype(np.int32)
        nn = len(chunk)
        s_total = 0
        if nn and qmax > 0:
            ids, valid = gramlib.gram_ids(
                qtok[:nn], qlens[:nn], g, self.cfg.wide, self.host.vocab
            )
            rowslots = np.full(ids.shape, -1, np.int32)
            fv = valid.ravel()
            if fv.any():
                rowslots.ravel()[fv] = self.host.lookup_gram_slots(
                    ids.ravel()[fv]
                )
            m = min(qmax, rowslots.shape[1])
            slots[:nn, :m] = rowslots[:, :m]
            s_total = self._slot_mass(rowslots)
        s_cap = _next_pow2(max(s_total, 1), 1024)
        return b, qtok, qlens, slots, nqg, use_short, s_cap

    def _slot_mass(self, rowslots: np.ndarray) -> int:
        """Max postings any one query's gram slots expand to - the static
        lane bound for the runs/overlap paths.  The sharded engine
        overrides this with a per-shard maximum (each shard expands only
        its local postings)."""
        lens_tbl = self.host.host_posting_lens
        if not lens_tbl.size or not rowslots.size:
            return 0
        stot = np.where(
            rowslots >= 0, lens_tbl[np.clip(rowslots, 0, None)], 0
        ).sum(axis=1)
        return int(stot.max())

    def _compact_gram_rows(self, slots: np.ndarray, gp_rows: int):
        """Gram-union row compaction plan for one batch.

        Returns (rows (gp_c,) int32 table-row gather list, remapped slot
        matrix, gp_c) or None when the batch's gram union is too large a
        fraction of the table for the gather to pay (the compact pass
        costs ~3 reads/writes of gp_c rows vs 1 stream of gp_rows).
        gp_c buckets to a power of two or 1.5x one (>= 512) so kernel
        variants stay few (a 513-row union must not pad to 1024 and lose
        the 3x rule at gp = 2816 - the 10M headline's exact shape); all
        buckets are 128-multiples, and >= 8192 they are GBLK multiples,
        satisfying g_padding."""
        used = np.unique(slots[slots >= 0])
        if used.size == 0:
            return None
        gp_c = _next_pow2(int(used.size), 512)
        if used.size <= (gp_c // 4) * 3 and gp_c >= 1024:
            gp_c = (gp_c // 4) * 3
        if 3 * gp_c >= gp_rows:
            return None
        rows = np.zeros(gp_c, np.int32)
        rows[: used.size] = used
        out = np.full(slots.shape, -1, np.int32)
        mask = slots >= 0
        out[mask] = np.searchsorted(used, slots[mask]).astype(np.int32)
        return rows, out, gp_c

    def _gather_rows_plan(self, slots: np.ndarray):
        """Gathered-row plan for a SMALL batch: (rows (gc,) int32 table
        rows to gather, remapped slot matrix, gc) or None when the gram
        union exceeds GATHER_ROWS_MAX (fall back to the full-table
        stream).  Padding rows duplicate row 0; remapped slots never
        reference them."""
        used = np.unique(slots[slots >= 0])
        if used.size == 0 or used.size > self.GATHER_ROWS_MAX:
            return None
        gc = _next_pow2(int(used.size), 32)
        rows = np.zeros(gc, np.int32)
        rows[: used.size] = used
        out = np.full(slots.shape, -1, np.int32)
        mask = slots >= 0
        out[mask] = np.searchsorted(used, slots[mask]).astype(np.int32)
        return rows, out, gc

    def _virtual_bitmap_plan(self, slots: np.ndarray):
        """Per-batch virtual-bitmap plan: (rows (gp_c,), remapped slots,
        gp_c, build posting cap) or None when the union is too large for
        VBITMAP_BUDGET / the int32 flat-scatter bound."""
        used = np.unique(slots[slots >= 0])
        if used.size == 0:
            return None
        nb, _ = self.host.bitmap_layout()
        gp_c = _next_pow2(int(used.size), 512)
        if gp_c * nb >= min(self.VBITMAP_BUDGET, 2**31 - 1):
            return None
        lens = self.host.host_posting_lens
        s_build = _next_pow2(max(int(lens[used].sum()), 1), 1 << 16)
        rows = np.full(gp_c, -1, np.int32)  # -1 pads expand no postings
        rows[: used.size] = used
        out = np.full(slots.shape, -1, np.int32)
        mask = slots >= 0
        out[mask] = np.searchsorted(used, slots[mask]).astype(np.int32)
        return rows, out, gp_c, s_build

    def _promo_tables(self, promo_all: np.ndarray):
        """(b, PK, PE) promo edge term ids (-1 padded) and weights from the
        HOST key->edge CSR.

        The candidate back half scores promotion keys from their exact
        edge lists; expanding those lists on device cost 2 x PK x 128
        random gathers per query (~45 ms per 256-query chunk at 10M keys)
        for lists that are typically 1-2 entries.  PE buckets to the
        batch's actual maximum (a power of 2, capped by the PROMO_EDGES
        eligibility gate)."""
        kep, ket, kew = self.host.key_edge_host()
        b, pk = promo_all.shape
        valid = promo_all >= 0
        p_c = np.clip(promo_all, 0, max(kep.shape[0] - 2, 0))
        cnt = np.where(valid, kep[p_c + 1] - kep[p_c], 0)
        pe = _next_pow2(max(int(cnt.max()) if cnt.size else 0, 1), 1)
        terms = np.full((b, pk, pe), -1, np.int32)
        weights = np.zeros((b, pk, pe), np.float32)
        bi, ki = np.nonzero(cnt > 0)
        if bi.size:
            c = cnt[bi, ki].astype(np.int64)
            rep_b = np.repeat(bi, c)
            rep_k = np.repeat(ki, c)
            within = np.arange(c.sum()) - np.repeat(np.cumsum(c) - c, c)
            src = np.repeat(kep[p_c[bi, ki]], c) + within
            terms[rep_b, rep_k, within] = ket[src]
            weights[rep_b, rep_k, within] = kew[src]
        return terms, weights

    def _promo_array(self, chunk, b: int) -> np.ndarray:
        """(b, PK) int32 promotion key ids (-1 padded) from prepared items
        (pos, qnorm, qlen, promo_ids).  PK buckets to the chunk's actual
        maximum (pow2, floor PROMO_KEYS): dense paths must carry EVERY
        promo id - truncating would drop promotions when more than
        PROMO_KEYS keys normalize to the same query text."""
        rows = [
            item[3] if len(item) > 3 and item[3] is not None else (
                self.host.promo_key_ids(item[1], item[2])
            )
            for item in chunk
        ]
        width = _next_pow2(
            max((r.size for r in rows), default=1) or 1, self.PROMO_KEYS
        )
        promo = np.full((b, width), -1, np.int32)
        for r, pids in enumerate(rows):
            promo[r, : pids.size] = pids
        return promo

    def _emit_row(self, out, pos, count, ids_row, scores_row, limit):
        n = min(int(count), limit, ids_row.shape[0])
        out[pos] = (
            self.host.key_strings.take(ids_row[:n]),
            # float64 tolist yields Python floats at C speed: the
            # [float(s) for s in row] loop measured 47 ms per 512x100
            # result emit
            scores_row[:n].astype(np.float64).tolist(),
        )

    def _run_dense_chunks(self, items, threshold, limit, batch_bucket, qp, out):
        top_k = self._top_k(limit)
        batch_bucket = self._batch_cap(batch_bucket)
        pending = []
        for lo in range(0, len(items), batch_bucket):
            chunk = items[lo : lo + batch_bucket]
            b, qtok, qlens, slots, nqg, use_short, s_cap = self._prep_rows(chunk, qp)
            res = _search_batch_device(
                self.host.device,
                jnp.asarray(qtok),
                jnp.asarray(qlens),
                jnp.asarray(slots),
                jnp.asarray(nqg),
                jnp.asarray(use_short),
                jnp.asarray(self._promo_array(chunk, b)),
                np.float32(threshold),
                compute_short=bool(use_short.any()),
                s_cap=s_cap,
                top_k=top_k,
            )
            pending.append((chunk, res))
        fetched = jax.device_get([res for _, res in pending])
        for (chunk, _), got in zip(pending, fetched):
            counts, ids_b, scores_b = got
            for r, item in enumerate(chunk):
                self._emit_row(out, item[0], counts[r], ids_b[r], scores_b[r], limit)

    # HBM budget for the dense gram->term incidence matrix (MXU hits path;
    # int8, so bytes == G * Tl)
    GM_BUDGET = 4 << 30
    # HBM budget for the bit-packed incidence (G * Tl/8 bytes): the EXACT
    # middle regime - 8x the matmul's reach, no sketch inflation
    BITMAP_BUDGET = 6 << 30
    # HBM budget for the bucket-sketch incidence (search.sketch); D shrinks
    # to fit, floor 128 buckets
    SKETCH_BUDGET = 6 << 30
    SKETCH_MIN_TERMS = 200_000  # below this the runs path is already fast
    SKETCH_PACKED = True  # packed sketch through the bitmap kernel
    # tiny-batch override: batches this small on gm-less (huge) indexes
    # skip the fixed full-table bitmap/sketch stream and take the runs
    # path when each query's bucketed posting mass fits RUNS_TINY_LANES.
    # The lane gate is deliberately tight: runs cost follows posting
    # mass, and on stop-gram-heavy corpora a query's mass reaches ~1.3x
    # the TERM count (12.7M at 10M keys, docs/PERF.md round 4).  At
    # 1 << 22 the 2.5M-key guard-retry rows (mass ~3.2M) routed here and
    # one 8-row retry cost 4.3 s/batch - 20x the kernel it was avoiding
    # (tools/scaling_real.py round-4 run).  1 << 20 lanes x 8 rows still
    # sorts in ~30 ms, under one full-table kernel pass.
    RUNS_TINY_BATCH = 8
    RUNS_TINY_LANES = 1 << 20
    # batches at or under this size skip the Pallas kernel for the XLA
    # per-slot scan (see _cand_pass): the kernel pays a fixed ~65 ms of
    # full-table unpack+dot at 10M keys regardless of B.  Measured on
    # v5e at 10M: scan B=1 28.4 ms net vs the kernel's fixed cost, but
    # scan B=8 is 368 ms (per-step gather+unpack lowers badly), so only
    # singletons route here.
    TINY_SCAN_BATCH = 1
    # batches at or under GATHER_BATCH items route the gathered-row
    # front end (candidates_bitmap_gather): gather the batch's gram-union
    # rows (<= GATHER_ROWS_MAX, pipelined HBM->HBM DMAs) and take 8
    # per-plane dots - work proportional to the union instead of the
    # fixed full-table stream.  The interactive single-query path at
    # huge indexes.
    GATHER_BATCH = 8
    GATHER_ROWS_MAX = 512
    # force the gathered-row route on tile-major tables (tests; the
    # tile-major full-table kernel beats the gather at every tiny batch)
    BITMAP_GATHER_TMAJ = False
    # Hardware-validated switches (round 3, v5e).  The class defaults ARE
    # the proven configuration - a gitignored state file must never again
    # be the only thing standing between the driver's bench and a slow
    # fallback (round 2 shipped 35 q/s that way).  .hw_switches.json
    # remains as an emergency override only.
    #   fused_bmax: bitmap kernel's fused VMEM blockmax epilogue
    #               (hardware-parity OK round 3; wins only when the
    #               separate XLA blockmax pass re-reads a huge hits
    #               matrix, so the engine sizes it by tier below)
    #   gtile_ok:   G-TILED kernel variant (tables over SBLK_MAX rows;
    #               hardware-validated round 3: int32 widened accumulate)
    #   bmax_blk:   blockmax width for the XLA (non-fused) finish
    BITMAP_FUSED_BMAX = False
    BITMAP_BMAX_BLK = 128
    BITMAP_GTILE_OK = True
    # kept-lane budget for the huge-tier blockmax finish (0 = legacy
    # n_cand blocks x blk lanes); the rescore + lane-topk width.
    # WARNING: 65536 (kb=512 blocks) reproducibly crashed the v5e TPU
    # worker process ("kernel fault") on the round-3 libtpu - keep 0
    # until a libtpu update is re-validated (docs/PERF.md round 3).
    BITMAP_KB_LANES = 0
    # gram-union row compaction: a batch's queries touch at most
    # B x Qmax of the table's gram rows, so on gram-RICH tables (47k+
    # rows) gathering just the union rows into a compact table cuts the
    # kernel's MXU work AND its HBM stream by gp/gp_c.  The gather costs
    # ~2 extra passes over the COMPACT table (read rows + write copy),
    # so it pays only when 3 * gp_c < gp.  Exactness unchanged: grams
    # outside the union have zero query multiplicity everywhere.
    BITMAP_COMPACT_ROWS = True
    # virtual per-batch compact bitmap (full table over budget): cap on
    # the per-batch compact table bytes.  Default OFF: measured on the
    # 2M-term x 47k-gram 2D config the per-batch CSR->bits scatter costs
    # ~14 s (XLA scatter-add, ~8M postings into a 2 GB target) and e2e
    # lands at 31 q/s vs the sketch's 62 - exact (0/32 mismatches) but
    # not worth it until the build is a sort, not a scatter.
    BITMAP_VIRTUAL = False
    VBITMAP_BUDGET = 3 << 30
    # the fused epilogue replaces a separate XLA blockmax that re-reads
    # the whole (B, Tl) hits from HBM; measured round 3 on v5e it wins
    # once the long tier is in the millions (10M: 92.7 ms fused vs
    # 71.6 + 41 ms split) and loses below (400k: wash).  BITMAP_FUSED_BMAX
    # force-enables it everywhere.
    BITMAP_FUSED_MIN_TLP = 4 << 20
    # integer hit-threshold (h*) selection on the bitmap-kernel path
    # (candidates._hstar_finish): selection and guard bounds live in
    # integer hit space (tie-proof), and the gathered/top-k'd lane space
    # shrinks from n_cand x 128 bound-selected lanes to the blocks that
    # provably can hold a result (probe: ~300-700 blocks per query at the
    # 100th-ranked score level).  Sound only for uniform-weight indexes
    # (HostIndex.uniform_weights gates it).
    # Budgets from the 10M probe: terms at the 100th-ranked score level
    # number 120-760 per query (p50 306), one per 128-block.  With the
    # fill rule (keep the deepest level holding >= 2x limit blocks) the
    # kept set tracks the result size, so the static budgets bound the
    # gather width at 512 blocks; rows whose guard still fails retry at
    # 4x budgets with fill off.
    # Budget 1024, not 512: ~20% of 10M queries sit on a "gap level" -
    # e.g. 749 blocks at hit level 10 but only ~50 at 11 - where any h*
    # above the fat level leaves < limit keys to certify the guard, so
    # the whole fat level must fit (measured: kb 512 -> 101/512 retries,
    # the fill rule cannot help because the needed level IS the fat one).
    HSTAR_SEL = True
    HSTAR_KB1 = 1024  # 1024-lane coarse block budget
    HSTAR_KB2 = 1024  # 128-lane block budget (gather width = KB2 * 128)
    # kept-block fill target (x limit); 0 = keep every block the budget
    # fits (h* = first_fit).  The gather/top-k shapes are STATIC at the
    # kb budgets, so a nonzero fill saves almost nothing device-side yet
    # adds guard failures whenever sigma_limit falls between h_fill and
    # first_fit - and each retried query pays a full fixed-cost kernel
    # pass.  Keep 0 unless budgets shrink dynamically some day.
    HSTAR_FILL = 0
    # paired bit planes in the bitmap kernel (ops.bitmap_matmul "pair"):
    # halves the MXU dots per byte tile; exact while total query windows
    # <= 31 (gated per batch on the slot-matrix width)
    BITMAP_PAIR_DOTS = True
    # first candidate pass MAY select with jax.lax.approx_max_k + a sound
    # miss check (candidates.topk_guarded): the raw call is 1.5-2.4x
    # faster than exact chunked top-k on v5e, but measured on the real
    # 10M corpus its misses hit needed candidates on 479/512 rows (they
    # are uniform over the top-k, not confined to tie classes), so every
    # row escalated and e2e LOST 2x.  Default stays False; the machinery
    # remains for corpora with flatter bound surfaces.
    APPROX_SEL = False

    @classmethod
    def _load_hw_switches(cls) -> None:
        import json
        import os

        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "..", "..", ".hw_switches.json",
        )
        try:
            with open(path) as f:
                hw = json.load(f)
        except (OSError, ValueError):
            return
        cls.BITMAP_FUSED_BMAX = bool(
            hw.get("fused_bmax", cls.BITMAP_FUSED_BMAX)
        )
        cls.BITMAP_GTILE_OK = bool(hw.get("gtile_ok", cls.BITMAP_GTILE_OK))
        cls.BITMAP_BMAX_BLK = int(hw.get("bmax_blk", cls.BITMAP_BMAX_BLK))
    # sketch-path first-pass budgets: kb=1024 clears the fat-tie guard
    # failures the 512-budget hit (34 -> 3 of 512 at the 2D config) and
    # ksb=512 adds +7% e2e; the 32-lane fine level in the sketch finish
    # keeps the lane top-k at kb3*32 lanes regardless (tools/probe_2d_r5)
    SK_KSB = 512  # superblocks kept per query (first pass)
    SK_KB = 1024  # blocks kept per query (first pass)

    def _run_candidate_chunks(self, items, threshold, limit, batch_bucket, qp, out):
        """Candidate-sparse batches; returns rows needing a dense retry.

        Escalating selection widths: most rows are exact at a narrow
        top-C (C = CAND_TERMS_FAST), which keeps the dominant selection
        top-k cheap; rows whose exactness guard fails re-select at
        CAND_TERMS-scale budgets - from the RETAINED first-pass hit
        matrix when the h* kernel path ran (selection only, no second
        full-table stream), via a full second front-end pass otherwise -
        and only then fall back to the dense path."""
        retry, n_used, n_avail, sel_ctx = self._cand_pass(
            items, threshold, limit, batch_bucket, qp, out,
            self.CAND_TERMS_FAST,
        )
        n_retry_fast = len(retry)
        n_sel = None
        sel_at_full = False
        if retry and sel_ctx is not None:
            retry = self._hstar_sel_retry(sel_ctx, threshold, limit, out)
            n_sel = len(retry)  # survivors of the selection-only retry
            # the sel retry re-selected at the full-pass budgets (kb and
            # n_cand scaled to CAND_TERMS) on bit-identical hits, so a
            # full second front-end pass at the same budgets is
            # guaranteed to fail the guard again - send survivors
            # straight to the dense retry instead of re-paying the
            # full-table stream (advisor r4)
            sel_at_full = True
        if retry and not sel_at_full and n_used < min(
                self.CAND_TERMS, n_avail):
            retry, _, _, _ = self._cand_pass(
                retry, threshold, limit, batch_bucket, qp, out,
                self.CAND_TERMS,
            )
            self.last_routing["retry_full"] = len(retry)
        if n_sel is not None:  # after the full pass: it resets last_routing
            self.last_routing["retry_sel"] = n_sel
        self.last_routing["retry_fast"] = n_retry_fast
        self.last_routing["n_items"] = len(items)
        return retry

    def _hstar_sel_retry(self, sel_ctx, threshold, limit, out):
        """Re-select guard-failed rows from the retained first-pass hits.

        The hit counts a full escalation pass would recompute are
        bit-identical (same slots, same table), so failing rows only need
        _hstar_finish again at the 4x budgets (kb=4096 clears the fat-tie
        rows, docs/PERF.md round 4).  Gathers the failing rows out of each
        chunk's device-resident hits/hmax (a few contiguous 10.5 MB rows)
        and runs one selection-only dispatch - no packed-table re-stream.
        Returns the rows whose guard STILL fails (exact-parity fallback:
        they take the old escalation chain)."""
        from .candidates import hstar_retry

        fails = sel_ctx["fails"]  # [(item, chunk_idx, row_in_chunk, grow)]
        di = self.host.device
        b_r = _next_pow2(len(fails), 8)
        pad = b_r - len(fails)
        # concat order: group by chunk so each chunk contributes one take;
        # pad rows replicate the last entry (their outputs are ignored)
        order = sorted(range(len(fails)), key=lambda fi: fails[fi][1])
        slots_rows = order + [order[-1]] * pad
        hit_parts, hmax_parts = [], []
        lo = 0
        while lo < len(slots_rows):
            ci = fails[slots_rows[lo]][1]
            hi = lo
            while hi < len(slots_rows) and fails[slots_rows[hi]][1] == ci:
                hi += 1
            idx = jnp.asarray(
                np.asarray(
                    [fails[fi][2] for fi in slots_rows[lo:hi]], np.int32
                )
            )
            hits_ref, hmax_ref = sel_ctx["chunks"][ci]
            hit_parts.append(jnp.take(hits_ref, idx, axis=0))
            hmax_parts.append(jnp.take(hmax_ref, idx, axis=0))
            lo = hi
        hits_r = (
            hit_parts[0] if len(hit_parts) == 1
            else jnp.concatenate(hit_parts, axis=0)
        )
        hmax_r = (
            hmax_parts[0] if len(hmax_parts) == 1
            else jnp.concatenate(hmax_parts, axis=0)
        )
        grows = np.asarray(
            [fails[fi][3] for fi in slots_rows], np.int64
        )
        lim_arr = np.full((b_r,), min(limit, 2**30), dtype=np.int32)
        scale = max(self.CAND_TERMS // self.CAND_TERMS_FAST, 1)
        n_lanes = sel_ctx["n_lanes"]
        n_cand = min(
            self.CAND_TERMS, max(_next_pow2(n_lanes, 16), 16), n_lanes
        )
        res = hstar_retry(
            di,
            hits_r,
            hmax_r,
            sel_ctx["pt"],
            sel_ctx["xt"],
            jnp.asarray(sel_ctx["qtok"][grows]),
            jnp.asarray(sel_ctx["qlens"][grows]),
            jnp.asarray(sel_ctx["nqg"][grows]),
            jnp.asarray(sel_ctx["use_short"][grows]),
            jnp.asarray(sel_ctx["promo_all"][grows]),
            jnp.asarray(sel_ctx["promo_t"][grows]),
            jnp.asarray(sel_ctx["promo_w"][grows]),
            lim_arr,
            np.float32(threshold),
            compute_short=sel_ctx["compute_short"],
            kb1=self.HSTAR_KB1 * scale,
            kb2=self.HSTAR_KB2 * scale,
            n_cand=n_cand,
            top_k=sel_ctx["top_k"],
            n_edge=sel_ctx["n_edge"],
            vmax=sel_ctx["vmax"],
        )
        counts, ids_b, scores_b, exact = jax.device_get(
            (res[0], res[1], res[2], res[4])
        )
        still = []
        for pos, fi in enumerate(order):
            item = fails[fi][0]
            if exact[pos]:
                self._emit_row(
                    out, item[0], counts[pos], ids_b[pos], scores_b[pos],
                    limit,
                )
            else:
                still.append(item)
        return still

    def _cand_pass(self, items, threshold, limit, batch_bucket, qp, out, cand_cap):
        """One candidate-path sweep at selection width ``cand_cap``.

        All rows are prepped once (one shared static s_cap = max posting
        total, one compile); the device batch size is then set so per-batch
        buffers stay inside BATCH_HBM_BUDGET.  Three device front ends:
        MXU matmul hits when the dense gram matrix fits GM_BUDGET
        (search.candidates), the bucket-sketch matmul + exact rescore when
        the long tier is huge (search.sketch), sorted-postings runs
        otherwise.  Returns (guard-failed rows, n_cand used, selectable
        lanes)."""
        from .candidates import (
            _BLK, candidates_bitmap, candidates_bitmap_gather,
            candidates_bitmap_mxu, candidates_matmul, candidates_runs,
        )
        from .sketch import candidates_sketch

        di = self.host.device
        ts, tl = di.n_short, di.n_long
        # n_edge caps the EXTRA-edge lanes (terms with >1 master key); the
        # primary edge of every candidate is handled densely.  Cover all
        # extras when the index has few; otherwise cap and rely on the
        # overflow -> dense retry.
        x_total = int(di.extra_key.shape[0])
        n_edge = min(
            max(_next_pow2(max(x_total, 1), 16), 16), self.CAND_EDGES
        )
        top_k = _next_pow2(limit, 16)

        b_all, qtok, qlens, slots, nqg, use_short, s_cap = self._prep_rows(
            items, qp
        )
        compute_short = bool(use_short.any())
        promo_all = np.full((b_all, self.PROMO_KEYS), -1, dtype=np.int32)
        for r, item in enumerate(items):
            pids = item[3]
            promo_all[r, : pids.size] = pids
        promo_t, promo_w = self._promo_tables(promo_all)

        gm = self.host.gram_matrix(self.GM_BUDGET)
        # Tiny batches on HUGE indexes: the bitmap/sketch front ends pay a
        # fixed full-table streaming cost per dispatch (3.4 GB at 10M keys
        # ~ 40 ms) regardless of batch size, while the sorted-runs cost
        # scales with the QUERIES' posting mass.  Route interactive
        # single/small batches through runs when their lane space is small
        # (measured: 10M-key single-query p50 116 ms via bitmap kernel).
        # NOTE: gate on len(items), not b_all - _prep_rows pads b_all to
        # a pow2 >= 16, which silently disabled this route entirely
        tiny_runs = (
            gm is None
            and self.host.n_terms >= self.SKETCH_MIN_TERMS
            and len(items) <= self.RUNS_TINY_BATCH
            and s_cap <= self.RUNS_TINY_LANES
        )
        bm = None
        if gm is None and not tiny_runs:
            bm = self.host.bitmap_tables(self.BITMAP_BUDGET)
        # VIRTUAL bitmap: the full packed table exceeds every HBM budget
        # (index2d: 11.8 GB) but one batch touches only its gram union,
        # so build JUST those rows from the resident CSR, use the normal
        # kernel path, and drop the table after the batch.  One device
        # scatter per pass (~0.5-1 s at 10M postings), amortized over
        # the whole batch.
        bm_virtual = False
        if (gm is None and bm is None and not tiny_runs
                and self.BITMAP_VIRTUAL
                and jax.default_backend() != "cpu"):
            plan = self._virtual_bitmap_plan(slots)
            if plan is not None:
                v_rows, v_slots, v_gp, v_scap = plan
                table = self.host.bitmap_rows_table(v_rows, v_scap)
                # same tile-major residency as the cached table: the
                # kernel's contiguous-block DMA gain (2x) dwarfs the one
                # extra transpose pass over this transient table
                from ..ops.bitmap_matmul import to_tile_major

                table = jax.jit(to_tile_major)(table)
                bm = (table, self.host.bitmap_layout()[1])
                bm_virtual = True
                slots = v_slots
        sk = None
        sk_packed = False
        if (gm is None and bm is None and not tiny_runs
                and self.host.n_terms >= self.SKETCH_MIN_TERMS):
            # packed sketch: 8x the bucket count per HBM byte through the
            # bitmap kernel; needs a TPU backend and <= 127 query windows
            # (int8 dot exactness), same gates as the bitmap kernel
            sk_packed = (
                self.SKETCH_PACKED
                and jax.default_backend() != "cpu"
                and slots.shape[1] <= 127
            )
            sk = self.host.sketch_tables(
                self.SKETCH_BUDGET, packed=sk_packed
            )
            if sk is None and sk_packed:
                sk_packed = False
                sk = self.host.sketch_tables(self.SKETCH_BUDGET)
        pt, xt = self.host.prim_tables()
        # escalation retries widen the h* block budgets with the
        # selection width (shared by the gm and bm front ends)
        hs_scale = max(cand_cap // self.CAND_TERMS_FAST, 1)
        hs_kb1 = self.HSTAR_KB1 * hs_scale
        hs_kb2 = self.HSTAR_KB2 * hs_scale
        hs_fill = (
            self.HSTAR_FILL if cand_cap == self.CAND_TERMS_FAST else 0
        )
        if gm is not None:
            gm_hstar = (
                self.HSTAR_SEL
                and self.host.uniform_weights
                and slots.shape[1] <= 127
            )
            n_lanes = (ts if compute_short else 0) + tl
            per_q = 48 * (ts + tl) + 24 * n_edge + (1 << 16)
        elif bm is not None:
            from ..ops.bitmap_matmul import fits_vmem

            tlp = int(bm[1])
            n_lanes = (ts if compute_short else 0) + tlp
            # the Pallas unpack-matmul kernel needs the q operand + one
            # byte tile + unpacked plane resident in VMEM, and its bf16
            # counts are exact only to 127 multiplicity; otherwise the
            # XLA scan fallback (which pays a (B, Tl) accumulator pass
            # per query-gram slot).  Tables wider than SBLK_MAX rows run
            # the G-TILED kernel variant (revisited-output int32
            # accumulation), hardware-validated round 3; BITMAP_GTILE_OK
            # exists as an emergency off-switch via .hw_switches.json.
            from ..ops.bitmap_matmul import SBLK_MAX

            gp_rows = _bm_gp_rows(bm[0])
            bm_kernel = (
                jax.default_backend() != "cpu"
                and slots.shape[1] <= 127
                and fits_vmem(16, gp_rows)
                and (gp_rows <= SBLK_MAX or self.BITMAP_GTILE_OK)
            )
            # SMALL batches on ROW-MAJOR tables skip the full-table
            # stream: that kernel paid ~62 ms of fixed unpack+dot at 10M
            # keys per dispatch, while a few queries' gram union is tens
            # of rows (candidates_bitmap_gather).  TILE-MAJOR tables
            # invert the trade: the contiguous-block kernel at b=8 runs
            # the whole table in 3.8 ms (stream-bound) while the axis-1
            # row gather costs 24.5 ms (tools/probe_single_r5.py), so
            # tiny batches just take the normal kernel route.
            # BITMAP_GATHER_TMAJ forces the gathered route for tests.
            bm_gather = False
            gplan = None
            if (
                bm_kernel
                and not bm_virtual
                and len(items) <= self.GATHER_BATCH
                and (bm[0].ndim != 3 or self.BITMAP_GATHER_TMAJ)
            ):
                gplan = self._gather_rows_plan(slots)
                bm_gather = gplan is not None
            # singleton batches, row-major tables: the XLA per-slot scan
            # costs ~28 ms at 10M (proportional to B) vs that kernel's
            # fixed ~65 ms of full-table unpack+dot
            # (tools/probe_b512_tiny.py; at B >= 8 the scan loses badly,
            # 368 ms).  Only reached when the gathered route declined
            # (huge gram union); never on tile-major (kernel wins flat).
            if (
                bm_kernel and not bm_gather
                and len(items) <= self.TINY_SCAN_BATCH
                and bm[0].ndim != 3
            ):
                bm_kernel = False
            bm_fused = bm_kernel and (
                self.BITMAP_FUSED_BMAX or tlp >= self.BITMAP_FUSED_MIN_TLP
            )
            # integer h*-threshold selection (candidates._hstar_finish):
            # sound only when every edge weight == 1; needs the fused
            # blockmax output
            bm_hstar = (
                bm_kernel
                and self.HSTAR_SEL
                and self.host.uniform_weights
            )
            if bm_hstar:
                bm_fused = True
            bm_rows = None
            bm_slots = slots
            gp_eff = gp_rows
            if bm_gather:
                g_rows, bm_slots, g_gc = gplan
            elif (bm_kernel and self.BITMAP_COMPACT_ROWS
                    and bm[0].ndim != 3):
                # row compaction is a ROW-MAJOR trade: on tile-major
                # tables the axis-1 gather runs at ~1.6 GB/s (512-byte
                # strided chunks; tools/probe_single_r5.py) while the
                # contiguous-block kernel it would shrink is already
                # stream-bound - the gather costs more than the saved
                # dots at every measured shape
                comp = self._compact_gram_rows(slots, gp_rows)
                if comp is not None:
                    bm_rows, bm_slots, gp_eff = comp
            if bm_kernel:
                # fused epilogue skips the separate (B, Tl) blockmax temp;
                # the rescore buffers hold kb x blk lanes (~16 B/lane)
                blk_eff = _BLK if bm_fused else self.BITMAP_BMAX_BLK
                kept = hs_kb2 if bm_hstar else cand_cap
                per_q = (
                    (tlp if bm_fused else 2 * tlp)
                    + 16 * kept * blk_eff
                    + 24 * n_edge
                    + (48 * ts if compute_short else 0)
                    + (1 << 16)
                )
            else:
                per_q = (
                    8 * tlp
                    + 24 * n_edge
                    + (48 * ts if compute_short else 0)
                    + (1 << 16)
                )
        elif sk is not None:
            tlp = int(sk[1].shape[0])
            n_lanes = (ts if compute_short else 0) + tl
            per_q = (
                3 * tlp
                + 24 * n_edge
                + (48 * ts if compute_short else 0)
                + (1 << 16)
            )
        else:
            n_lanes = (ts if compute_short else 0) + s_cap
            per_q = (
                48 * s_cap
                + 24 * n_edge
                + (48 * ts if compute_short else 0)
                + (1 << 16)
            )
        n_cand = min(cand_cap, max(_next_pow2(n_lanes, 16), 16), n_lanes)
        # approximate selection only on the FIRST pass: escalation retries
        # must be exact so approx misses terminate in one extra pass
        approx_sel = bool(self.APPROX_SEL) and cand_cap == self.CAND_TERMS_FAST
        # two-phase block-pruned selection only pays off when the lane
        # space dwarfs the kept blocks (n_cand blocks x 128 lanes)
        block_sel = n_lanes >= 4 * n_cand * _BLK
        cap = max(int(self.BATCH_HBM_BUDGET // per_q), 8)
        step = 8
        while step * 2 <= min(cap, batch_bucket):
            step *= 2
        if bm is not None and bm_kernel and not bm_gather:
            from ..ops.bitmap_matmul import fits_vmem

            # halve in pow2 space: halving the raw cap then re-bucketing
            # skipped sizes that fit (cap 593 -> 148 -> step 128 even
            # though 256 fits the VMEM model)
            while step > 8 and not fits_vmem(step, gp_eff):
                step //= 2

        # resolved routing, recorded for the bench artifact: round 2 lost
        # 20x to a silent kernel->scan fallback that no artifact showed
        if gm is not None:
            variant = "matmul"
            gm_hstar = gm_hstar and n_lanes >= 4 * hs_kb2 * _BLK
        elif tiny_runs:
            variant = "tiny_runs"
        elif bm is not None:
            if bm_gather:
                variant = "bitmap_gather"
            else:
                variant = "bitmap_kernel" if bm_kernel else "bitmap_scan"
        elif sk is not None:
            variant = "sketch_packed" if sk_packed else "sketch"
        else:
            variant = "runs"
        self.last_routing = {
            "variant": variant,
            "step": step,
            "n_cand": n_cand,
            "block_sel": bool(block_sel),
            "approx_sel": approx_sel,
        }
        if variant == "matmul":
            self.last_routing["hstar"] = bool(gm_hstar)
        if variant.startswith("bitmap"):
            from ..ops.bitmap_matmul import SBLK_MAX as _SB

            # h* selection pays off only when the lane space dwarfs its
            # kept blocks (same scale rule as block_sel)
            bm_hstar = (
                bm_kernel and bm_hstar
                and n_lanes >= 4 * hs_kb2 * _BLK
            )
            self.last_routing.update(
                gp_rows=_bm_gp_rows(bm[0]),
                gtile=not bm_gather and gp_eff > _SB,
                fused_bmax=bool(
                    bm_kernel and not bm_gather and bm_fused
                ),
                bmax_blk=int(self.BITMAP_BMAX_BLK),
                compact_rows=(gp_eff if bm_rows is not None else 0),
                virtual=bm_virtual,
                hstar=bool(bm_hstar),
                pair_dots=bool(
                    bm_kernel and not bm_gather and self.BITMAP_PAIR_DOTS
                    and bm_slots.shape[1] <= 31
                ),
            )
            if bm_gather:
                self.last_routing["gather_rows"] = int(g_gc)
            if bm_hstar:
                self.last_routing.update(kb1=hs_kb1, kb2=hs_kb2)

        # selection-only escalation: retain each chunk's device hits/hmax
        # on the FIRST h* pass so guard-failed rows re-select at 4x
        # budgets without a second full-table stream (_hstar_sel_retry).
        # Peak HBM is unchanged: the budget already charges one hits
        # matrix per in-flight chunk (per_q includes tlp) and every chunk
        # is dispatched before any fetch.
        keep_sel = (
            variant == "bitmap_kernel"
            and bool(bm_hstar)
            and cand_cap == self.CAND_TERMS_FAST
        )

        bm_table = None
        if bm is not None:
            bm_table = bm[0]
            if bm_kernel and bm_rows is not None:
                bm_table = _gather_rows(bm[0], jnp.asarray(bm_rows))

        # dispatch every chunk before fetching any result: jax dispatch is
        # async, so later chunks' compute overlaps earlier chunks' transfers.
        # Batch arrays upload ONCE; chunks slice them ON DEVICE (each
        # per-chunk jnp.asarray was its own host->device transfer through
        # the tunnel).
        qtok_d = jnp.asarray(qtok)
        qlens_d = jnp.asarray(qlens)
        slots_d = jnp.asarray(slots)
        bm_slots_d = (
            slots_d if bm is None or bm_slots is slots
            else jnp.asarray(bm_slots)
        )
        nqg_d = jnp.asarray(nqg)
        ushort_d = jnp.asarray(use_short)
        promo_d = jnp.asarray(promo_all)
        promo_t_d = jnp.asarray(promo_t)
        promo_w_d = jnp.asarray(promo_w)
        pending = []
        rows_d = None
        if bm is not None and bm_gather:
            rows_d = jnp.asarray(g_rows)
        for lo in range(0, len(items), step):
            hi = min(lo + step, len(items))
            min_b = 8 if (bm is not None and bm_gather) else 16
            b = _next_pow2(hi - lo, 1 if tiny_runs else min(step, min_b))
            sl = slice(lo, lo + b)
            lim_arr = np.full((b,), min(limit, 2**30), dtype=np.int32)
            if gm is not None:
                gkw = {}
                if gm_hstar:
                    gkw = dict(
                        hstar=True, kb1=hs_kb1, kb2=hs_kb2, hs_fill=hs_fill
                    )
                res = candidates_matmul(
                    di,
                    gm,
                    pt,
                    xt,
                    qtok_d[sl],
                    qlens_d[sl],
                    slots_d[sl],
                    nqg_d[sl],
                    ushort_d[sl],
                    promo_d[sl],
                    promo_t_d[sl],
                    promo_w_d[sl],
                    lim_arr,
                    np.float32(threshold),
                    compute_short=compute_short,
                    n_cand=n_cand,
                    n_edge=n_edge,
                    top_k=top_k,
                    block_sel=block_sel,
                    approx=approx_sel,
                    **gkw,
                )
            elif bm is not None and bm_gather:
                from .candidates import GATHER_IMPL

                gkw = {}
                if bm_hstar:
                    gkw = dict(
                        hstar=True, kb1=hs_kb1, kb2=hs_kb2, hs_fill=hs_fill
                    )
                gkw["pair_dots"] = self.BITMAP_PAIR_DOTS
                gkw["gather_impl"] = GATHER_IMPL
                res = candidates_bitmap_gather(
                    di,
                    bm_table,
                    rows_d,
                    pt,
                    xt,
                    qtok_d[sl],
                    qlens_d[sl],
                    bm_slots_d[sl],
                    nqg_d[sl],
                    ushort_d[sl],
                    promo_d[sl],
                    promo_t_d[sl],
                    promo_w_d[sl],
                    lim_arr,
                    np.float32(threshold),
                    compute_short=compute_short,
                    n_cand=n_cand,
                    n_edge=n_edge,
                    top_k=top_k,
                    block_sel=block_sel,
                    **gkw,
                )
            elif bm is not None:
                fe = candidates_bitmap_mxu if bm_kernel else candidates_bitmap
                kw = {}
                if bm_kernel:
                    kw["fused_bmax"] = bm_fused
                    kw["bmax_blk"] = self.BITMAP_BMAX_BLK
                    kw["kb_lanes"] = self.BITMAP_KB_LANES
                    # two bit planes per int8 operand (2x MXU rate): exact
                    # while a query's total gram windows <= 31, which the
                    # slot-matrix width bounds statically
                    kw["pair_dots"] = (
                        self.BITMAP_PAIR_DOTS and bm_slots.shape[1] <= 31
                    )
                    if bm_hstar:
                        kw["hstar"] = True
                        kw["kb1"] = hs_kb1
                        kw["kb2"] = hs_kb2
                        kw["hs_fill"] = hs_fill
                        kw["keep_hits"] = keep_sel
                res = fe(
                    di,
                    bm_table,
                    pt,
                    xt,
                    qtok_d[sl],
                    qlens_d[sl],
                    bm_slots_d[sl],
                    nqg_d[sl],
                    ushort_d[sl],
                    promo_d[sl],
                    promo_t_d[sl],
                    promo_w_d[sl],
                    lim_arr,
                    np.float32(threshold),
                    compute_short=compute_short,
                    n_cand=n_cand,
                    n_edge=n_edge,
                    top_k=top_k,
                    block_sel=block_sel,
                    approx=approx_sel,
                    **kw,
                )
            elif sk is not None:
                inc, tg, wmax_pad, d_log2 = sk
                # superblock count from the TERM width (tg rows): the
                # packed inc's shape[1] is BYTES (tl_pad/8), and sizing
                # ksb from it kept 15 of 123 superblocks -> the coverage
                # guard failed on every row and e2e collapsed to dense
                # retries (measured 7 q/s at the 2D config)
                sb = max(int(tg.shape[0]) // (128 * 128), 1)
                scale = max(cand_cap // self.CAND_TERMS_FAST, 1)
                ksb = min(self.SK_KSB * scale, sb)
                kb = min(self.SK_KB * scale, ksb * 128)
                res = candidates_sketch(
                    di,
                    inc,
                    tg,
                    wmax_pad,
                    pt,
                    xt,
                    qtok_d[sl],
                    qlens_d[sl],
                    slots_d[sl],
                    nqg_d[sl],
                    ushort_d[sl],
                    promo_d[sl],
                    promo_t_d[sl],
                    promo_w_d[sl],
                    lim_arr,
                    np.float32(threshold),
                    d_log2=d_log2,
                    packed=sk_packed,
                    compute_short=compute_short,
                    n_cand=min(n_cand, kb * 128),
                    n_short_cand=min(max(_next_pow2(min(ts, 512), 16), 16),
                                     max(ts, 1)),
                    ksb=ksb,
                    kb=kb,
                    n_edge=n_edge,
                    top_k=top_k,
                )
            else:
                res = candidates_runs(
                    di,
                    pt,
                    xt,
                    qtok_d[sl],
                    qlens_d[sl],
                    slots_d[sl],
                    nqg_d[sl],
                    ushort_d[sl],
                    promo_d[sl],
                    promo_t_d[sl],
                    promo_w_d[sl],
                    lim_arr,
                    np.float32(threshold),
                    compute_short=compute_short,
                    s_cap=s_cap,
                    n_cand=n_cand,
                    n_edge=n_edge,
                    top_k=top_k,
                    block_sel=block_sel,
                    approx=approx_sel,
                )
            pending.append((lo, hi, res))

        retry = []
        fails = []
        # ONE fused fetch for every chunk: per-chunk device_get serializes
        # a ~24 ms tunnel round trip apiece.  The key-length vector (res[3])
        # is a ranking intermediate the host never reads - skipping it cuts
        # the fetched payload ~25% (the tunnel moves results at ~20 MB/s)
        fetched = jax.device_get(
            [(res[0], res[1], res[2], res[4]) for _, _, res in pending]
        )
        for k, ((lo, hi, _), got) in enumerate(zip(pending, fetched)):
            counts, ids_b, scores_b, exact = got
            for r, item in enumerate(items[lo:hi]):
                if exact[r]:
                    self._emit_row(
                        out, item[0], counts[r], ids_b[r], scores_b[r], limit
                    )
                else:
                    retry.append(item)
                    if keep_sel:
                        fails.append((item, k, r, lo + r))
        sel_ctx = None
        if keep_sel and fails:
            sel_ctx = {
                "fails": fails,
                "chunks": [(res[5], res[6]) for _, _, res in pending],
                "pt": pt,
                "xt": xt,
                "qtok": qtok,
                "qlens": qlens,
                "nqg": nqg,
                "use_short": use_short,
                "promo_all": promo_all,
                "promo_t": promo_t,
                "promo_w": promo_w,
                "compute_short": compute_short,
                "top_k": top_k,
                "n_edge": n_edge,
                "vmax": int(bm_slots.shape[1]),
                "n_lanes": n_lanes,
            }
        return retry, n_cand, n_lanes, sel_ctx


SearchEngine._load_hw_switches()
