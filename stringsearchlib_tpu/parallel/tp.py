"""Tensor parallelism over the GRAM dimension (SURVEY section 2 inventory).

Complements the term-sharded data parallelism in ``parallel.dist``: here
every chip holds ALL terms/edges (replicated) but only a contiguous slice
of the gram->term postings CSR.  A query's hit counts are the sum over its
gram slots of posting contributions, and grams partition cleanly, so each
chip counts hits for its local gram slice and one ``psum`` over the mesh
axis reconstructs exact global counts - the classic contraction-dimension
split (the reference's per-gram accumulation loop, nGramSearch.hpp:289-298,
with the gram axis spread over chips).

When to use which: DP (dist.shard_index) scales THROUGHPUT - terms, edges
and selection all shrink per chip.  TP (this module) scales posting
CAPACITY - it fits an index whose posting lists exceed one chip's HBM
while keeping the term space replicated, at the cost of one (B, Tl) psum
per batch riding ICI.  The two compose in principle (mesh axes
('terms','grams')); this module implements the 1-D gram axis.

After the psum the hits matrix is bit-identical to the single-chip one,
so the whole exact candidate back half (search.candidates selection ->
edges -> promotion -> ranking -> guard) runs unchanged, replicated, on
every chip; guard-failed rows retry on a dense step with the same psum
front.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import INT32_MAX
from ..index.build import HostIndex
from ..search.candidates import _dense_hits_finish
from ..search.engine import (
    SearchEngine,
    _finalize,
    _floor_and_promote,
    _next_pow2,
    _promo_mask,
    _propagate_raw,
)
from ..search.overlap import gather_hits

AXIS = "grams"

_NEG_INF = np.float32(-np.inf)

# leaves partitioned over the gram axis; the rest replicate
_G_STACKED = ("gram_ptr", "gram_terms")


@dataclasses.dataclass
class GramShardedIndex:
    """Host handle for a gram-sharded index (leaves host numpy)."""

    host: HostIndex
    n_shards: int
    g_c: int  # gram slots per shard
    leaves: dict
    host_shard_posting_lens: np.ndarray  # (S, G) local posting lengths


def shard_index_by_grams(host: HostIndex, n_shards: int) -> GramShardedIndex:
    """Partition the postings CSR into n_shards contiguous gram-slot
    slices.  Term/edge/key arrays replicate (term ids stay global), so no
    id remapping is needed anywhere."""
    di = host.device
    s = n_shards
    npa = np.asarray
    ptr = npa(di.gram_ptr).astype(np.int64)
    terms = npa(di.gram_terms).astype(np.int32)
    g = ptr.shape[0] - 1
    g_c = -(-max(g, 1) // s)

    lens = np.diff(ptr)
    lens2d = np.zeros((s, g), np.int64)
    gram_ptr_s = np.zeros((s, g_c + 1), np.int32)
    pmax = 1
    spans = []
    for i in range(s):
        lo, hi = min(i * g_c, g), min((i + 1) * g_c, g)
        p0, p1 = int(ptr[lo]), int(ptr[hi])
        spans.append((lo, hi, p0, p1))
        pmax = max(pmax, p1 - p0)
        local = (ptr[lo : hi + 1] - p0).astype(np.int32)
        gram_ptr_s[i, : local.shape[0]] = local
        gram_ptr_s[i, local.shape[0] :] = local[-1] if local.size else 0
        lens2d[i, lo:hi] = lens[lo:hi]
    gram_terms_s = np.zeros((s, pmax), np.int32)
    for i, (lo, hi, p0, p1) in enumerate(spans):
        gram_terms_s[i, : p1 - p0] = terms[p0:p1]

    pt, xt = host.prim_tables()
    leaves = {
        "gram_ptr": gram_ptr_s,
        "gram_terms": gram_terms_s,
        "short_tokens": npa(di.short_tokens),
        "short_lengths": npa(di.short_lengths),
        "long_tokens": npa(di.long_tokens),
        "long_lengths": npa(di.long_lengths),
        "term_wmax": npa(di.term_wmax),
        "term_extra_ptr": npa(di.term_extra_ptr),
        "extra_key": npa(di.extra_key),
        "edge_term": npa(di.edge_term),
        "edge_key": npa(di.edge_key),
        "edge_weight": npa(di.edge_weight),
        "key_len": npa(di.key_len),
        "pt": npa(pt),
        "xt": npa(xt),
    }
    return GramShardedIndex(
        host=host, n_shards=s, g_c=g_c, leaves=leaves,
        host_shard_posting_lens=lens2d,
    )


class _RepView:
    """DeviceIndex-shaped view over the replicated leaves (global term and
    key id spaces - no remapping)."""

    def __init__(self, lv: dict):
        for name, arr in lv.items():
            if name in ("pt", "xt"):
                continue
            setattr(self, name, arr)

    @property
    def n_short(self):
        return self.short_tokens.shape[0]

    @property
    def n_long(self):
        return self.long_tokens.shape[0]

    @property
    def n_keys(self):
        return self.key_len.shape[0]


def _local_hits(lv, qslots, g_c: int, n_long: int, s_cap: int):
    """Per-shard partial hit counts: remap global gram slots into this
    shard's local slice (others -1), expand the local CSR, count."""
    sid = jax.lax.axis_index(AXIS)
    lo = sid.astype(jnp.int32) * np.int32(g_c)
    local = qslots - lo
    local = jnp.where((qslots >= 0) & (local >= 0) & (local < g_c), local, -1)
    return jax.vmap(
        lambda row: gather_hits(
            lv["gram_ptr"][0], lv["gram_terms"][0], row, n_long, s_cap
        )
    )(local)


def tp_candidates_step(
    leaves: dict,
    qtokens, qlens, qslots, n_qgrams, use_short, promo_ids, promo_terms,
    promo_weights, limits, threshold,
    *,
    mesh: Mesh,
    compute_short: bool,
    s_cap: int,
    n_cand: int,
    n_edge: int,
    top_k: int,
    block_sel: bool,
):
    """Candidate-sparse batched search over the gram-sharded index: psum
    partial hits (the only collective), then the unchanged exact candidate
    back half replicated on every chip."""
    in_specs = (
        {n: (P(AXIS) if n in _G_STACKED else P()) for n in leaves},
        P(), P(), P(), P(), P(), P(), P(), P(), P(), P(),
    )
    g_c = leaves["gram_ptr"].shape[1] - 1

    def shard_fn(lv, qt, ql, qs, ng, us, pr, p_t, p_w, lim, thr):
        di = _RepView(lv)
        hits = jax.lax.psum(
            _local_hits(lv, qs, g_c, di.n_long, s_cap), AXIS
        )
        return _dense_hits_finish(
            di, lv["pt"], lv["xt"], hits, qt, ql, ng, us, pr, p_t, p_w,
            lim, thr, compute_short=compute_short, n_cand=n_cand,
            n_edge=n_edge, top_k=top_k, block_sel=block_sel,
            with_bound=False,
        )

    return jax.shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs,
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )(leaves, qtokens, qlens, qslots, n_qgrams, use_short, promo_ids,
      promo_terms, promo_weights, limits, threshold)


def tp_dense_step(
    leaves: dict,
    qtokens, qlens, qslots, n_qgrams, use_short, promo_ids, threshold,
    *,
    mesh: Mesh,
    compute_short: bool,
    brute: bool,
    s_cap: int,
    top_k: int,
    long_buckets: tuple = (),
):
    """Dense batched search (brute-short queries and candidate-guard
    retries): psum partial hits, then the single-chip dense scoring
    (both tiers -> calcScore propagate -> full ranking) replicated.
    ``long_buckets``: width buckets for the brute whole-tier DP (the
    replicated long tier is length-sorted, same as single-chip)."""
    from ..search.editdist import dp_match, dp_match_tiered

    in_specs = (
        {n: (P(AXIS) if n in _G_STACKED else P()) for n in leaves},
        P(), P(), P(), P(), P(), P(), P(),
    )
    g_c = leaves["gram_ptr"].shape[1] - 1

    def shard_fn(lv, qtok, qls, qsl, nqg, us, qpr, thr):
        di = _RepView(lv)
        ts, tl = di.n_short, di.n_long
        hits_b = jax.lax.psum(
            _local_hits(lv, qsl, g_c, tl, s_cap), AXIS
        )

        def one(args):
            qt, ql, hits, ng, u, pr = args
            qlen_f = jnp.maximum(ql.astype(jnp.float32), 1.0)
            if compute_short or brute:
                m_short = dp_match(di.short_tokens, di.short_lengths, qt, ql)
                s_short = m_short.astype(jnp.float32) / qlen_f
                mask_s = jnp.broadcast_to(u | brute, (ts,))
            else:
                s_short = jnp.zeros((ts,), jnp.float32)
                mask_s = jnp.zeros((ts,), bool)
            if brute:
                m_long = dp_match_tiered(
                    di.long_tokens, di.long_lengths, qt, ql, long_buckets
                )
                s_a = jnp.concatenate(
                    [s_short, m_long.astype(jnp.float32) / qlen_f]
                )
                mask_a = jnp.ones((ts + tl,), bool)
            else:
                s_a = jnp.concatenate([s_short, jnp.zeros((tl,), jnp.float32)])
                mask_a = jnp.concatenate([mask_s, jnp.zeros((tl,), bool)])
            s_b_long = hits.astype(jnp.float32) / jnp.maximum(
                ng.astype(jnp.float32), 1.0
            )
            s_b = jnp.concatenate([jnp.zeros((ts,), jnp.float32), s_b_long])
            mask_b = jnp.concatenate(
                [jnp.zeros((ts,), bool), (hits > 0) & (ng > 0)]
            )
            eq_key = _promo_mask(di.n_keys, pr)
            key_val, promo = _propagate_raw(
                di, s_a, mask_a, s_b, mask_b, eq_key, thr
            )
            score, reached = _floor_and_promote(key_val, promo)
            return _finalize(di, score, reached, top_k)

        return jax.vmap(one)((qtok, qls, hits_b, nqg, us, qpr))

    return jax.shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs,
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(leaves, qtokens, qlens, qslots, n_qgrams, use_short, promo_ids,
      threshold)


def tp_wildcard_step(leaves: dict, *, mesh: Mesh, top_k: int):
    """Wildcard over replicated edges (no postings touched): every key at
    its max edge weight (nGramSearch.hpp:356-369)."""

    def fn(lv):
        di = _RepView(lv)
        score = jax.ops.segment_max(
            lv["edge_weight"], lv["edge_key"], num_segments=di.n_keys
        )
        reached = score > _NEG_INF
        score = jnp.where(reached, score, 0.0)
        return _finalize(di, score, reached, top_k)

    in_specs = ({n: (P(AXIS) if n in _G_STACKED else P()) for n in leaves},)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=(P(), P(), P()),
        check_vma=False,
    )(leaves)


class GramShardedEngine(SearchEngine):
    """Query front end over a GramShardedIndex.

    Shares the HOST-side helpers with SearchEngine (normalization, slot
    lookup, chunking, promo tables); every device dispatch is a psum step
    above.  Build the host index with ``to_device=False`` - nothing here
    uploads the unsharded postings CSR (the thing TP exists to split)."""

    def __init__(self, gx: GramShardedIndex, mesh: Mesh):
        super().__init__(gx.host)
        self.gx = gx
        self.mesh = mesh
        self._dev: Optional[dict] = None
        self._wild_cache: dict = {}

    def _leaves(self) -> dict:
        if self._dev is None:
            dev = {}
            for name, arr in self.gx.leaves.items():
                spec = P(AXIS) if name in _G_STACKED else P()
                if arr.dtype == np.uint32:
                    arr = arr.astype(np.int32)
                dev[name] = jax.device_put(
                    arr, NamedSharding(self.mesh, spec)
                )
            self._dev = dev
        return self._dev

    def search(self, query, threshold: float = 0.0, limit: int = 0):
        return self.search_batch([query], threshold, limit)[0]

    def _search_impl(self, query, threshold=0.0, limit=0):
        return self._search_batch_impl(
            [query], threshold, limit, 256, 32, "auto"
        )[0]

    def _wildcard(self, limit: int):
        if limit == 0:
            limit = INT32_MAX
        top_k = self._top_k(limit)
        cached = self._wild_cache.get(top_k)
        if cached is None:
            res = jax.jit(
                functools.partial(
                    tp_wildcard_step, mesh=self.mesh, top_k=top_k
                ),
                out_shardings=NamedSharding(self.mesh, P()),
            )(self._leaves())
            cached = jax.device_get(res)
            self._wild_cache[top_k] = cached
        count, ids_np, scores_np = cached
        n = min(int(count), limit, int(ids_np.shape[0]))
        return (
            [self.host.key_strings[i] for i in ids_np[:n]],
            [float(s) for s in scores_np[:n]],
        )

    def _s_cap(self, slots, nn) -> int:
        """Static lane bound = max over shards of any query's LOCAL posting
        mass (each shard expands only its own slice)."""
        lens2d = self.gx.host_shard_posting_lens
        if nn == 0 or not lens2d.size:
            return 1024
        per = np.where(
            slots[None, :nn, :] >= 0,
            lens2d[:, np.clip(slots[:nn], 0, None)], 0,
        ).sum(axis=2)
        return _next_pow2(max(int(per.max()) if per.size else 0, 1), 1024)

    def _search_batch_impl(
        self, queries, threshold, limit, batch_bucket, qp_bucket, mode
    ):
        if limit == 0:
            limit = INT32_MAX
        out: list = [None] * len(queries)
        if not self.host.indexed:
            return [([], [])] * len(queries)

        want_cand = mode != "dense" and (
            mode == "candidates"
            or (
                limit <= self.CAND_MAX_LIMIT
                and self.host.n_terms >= self.CAND_MIN_TERMS
            )
        )
        ke_counts = self.host.host_key_edge_counts
        items, brute_items = [], []
        for i, q in enumerate(queries):
            raw = q if isinstance(q, str) else str(q)
            if len(raw) == 0 or raw == "*":
                if self.gx.leaves["edge_key"].size == 0:
                    out[i] = ([], [])
                else:
                    out[i] = self._wildcard(limit)
                continue
            qnorm, qlen = self._normalize_query(raw)
            if qlen == 0:
                out[i] = ([], [])
            elif qlen <= self.cfg.brute_force_cutoff:
                brute_items.append((i, qnorm, qlen))
            else:
                promo = None
                if want_cand:
                    pids = self.host.promo_key_ids(qnorm, qlen)
                    if pids.size <= self.PROMO_KEYS and (
                        pids.size == 0
                        or int(ke_counts[pids].max()) <= self.PROMO_EDGES
                    ):
                        promo = pids
                items.append((i, qnorm, qlen, promo))

        cand = [it for it in items if want_cand and it[3] is not None]
        dense = [it for it in items if not (want_cand and it[3] is not None)]
        if cand:
            dense.extend(
                self._run_tp_cand(cand, threshold, limit, batch_bucket, out)
            )
        if dense:
            self._run_tp_dense(
                dense, threshold, limit, batch_bucket, out, brute=False
            )
        if brute_items:
            self._run_tp_dense(
                brute_items, threshold, limit, 32, out, brute=True
            )
        return out

    def _chunk_qp(self, items) -> int:
        qmax = max((it[2] for it in items), default=1)
        return max(
            _next_pow2(qmax, max(16, self.cfg.query_pad // 4)),
            self.cfg.gram_size + 1,
        )

    def _run_tp_cand(self, items, threshold, limit, batch_bucket, out):
        """Exact candidate path on psum'd hits; returns guard-failed rows
        for the dense retry."""
        qp = self._chunk_qp(items)
        b_all, qtok, qlens, slots, nqg, use_short, _ = self._prep_rows(
            items, qp
        )
        s_cap = self._s_cap(slots, len(items))
        compute_short = bool(use_short.any())
        promo_all = np.full((b_all, self.PROMO_KEYS), -1, np.int32)
        for r, it in enumerate(items):
            promo_all[r, : it[3].size] = it[3]
        promo_t, promo_w = self._promo_tables(promo_all)
        tl = int(self.gx.leaves["long_lengths"].shape[0])
        ts = int(self.gx.leaves["short_lengths"].shape[0])
        n_lanes = (ts if compute_short else 0) + tl
        n_cand = min(
            self.CAND_TERMS_FAST, max(_next_pow2(n_lanes, 16), 16), n_lanes
        )
        x_total = int(self.gx.leaves["extra_key"].shape[0])
        n_edge = min(
            max(_next_pow2(max(x_total, 1), 16), 16), self.CAND_EDGES
        )
        top_k = _next_pow2(limit, 16)
        block_sel = n_lanes >= 4 * n_cand * 128
        lv = self._leaves()
        step = functools.partial(
            jax.jit(
                functools.partial(
                    tp_candidates_step, mesh=self.mesh,
                    compute_short=compute_short, s_cap=s_cap,
                    n_cand=n_cand, n_edge=n_edge, top_k=top_k,
                    block_sel=block_sel,
                ),
                out_shardings=NamedSharding(self.mesh, P()),
            ),
            lv,
        )
        bsz = min(self._batch_cap(batch_bucket), b_all)
        retry = []
        pending = []
        for lo in range(0, len(items), bsz):
            hi = min(lo + bsz, len(items))
            b = _next_pow2(hi - lo, min(bsz, 16))
            sl = slice(lo, lo + b)
            lim_arr = np.full((b,), min(limit, 2**30), np.int32)
            res = step(
                jnp.asarray(qtok[sl]), jnp.asarray(qlens[sl]),
                jnp.asarray(slots[sl]), jnp.asarray(nqg[sl]),
                jnp.asarray(use_short[sl]), jnp.asarray(promo_all[sl]),
                jnp.asarray(promo_t[sl]), jnp.asarray(promo_w[sl]),
                jnp.asarray(lim_arr), np.float32(threshold),
            )
            pending.append((lo, hi, res))
        for lo, hi, res in pending:
            counts, ids_b, scores_b, _, exact = jax.device_get(res)
            for r, item in enumerate(items[lo:hi]):
                if exact[r]:
                    self._emit_row(
                        out, item[0], counts[r], ids_b[r], scores_b[r], limit
                    )
                else:
                    retry.append(item)
        return retry

    def _run_tp_dense(self, items, threshold, limit, batch_bucket, out,
                      *, brute):
        qp = self._chunk_qp(items)
        top_k = self._top_k(limit)
        b_all, qtok, qlens, slots, nqg, use_short, _ = self._prep_rows(
            items, qp
        )
        s_cap = self._s_cap(slots, len(items))
        compute_short = bool(use_short.any()) or brute
        lv = self._leaves()
        step = functools.partial(
            jax.jit(
                functools.partial(
                    tp_dense_step, mesh=self.mesh,
                    compute_short=compute_short, brute=brute,
                    s_cap=s_cap, top_k=top_k,
                    long_buckets=(
                        self.host.long_dp_buckets() if brute else ()
                    ),
                ),
                out_shardings=NamedSharding(self.mesh, P()),
            ),
            lv,
        )
        if brute:
            # the whole-tier DP holds O(B x T x (w+2)) scan state per
            # batch (same model as SearchEngine._run_brute_chunks); the
            # generic 48 B/term cap under-budgets by ~w/12x
            lt = self.gx.leaves["long_tokens"]
            st = self.gx.leaves["short_tokens"]
            w = max(
                int(lt.shape[1]) if lt.ndim > 1 else 0,
                int(st.shape[1]) if st.ndim > 1 else 0,
            )
            per_q = 12 * max(self.host.n_terms, 1) * (w + 2) + (1 << 18)
            cap = max(int(self.BATCH_HBM_BUDGET // per_q), 1)
            bsz = 1
            while bsz * 2 <= min(cap, batch_bucket, b_all):
                bsz *= 2
        else:
            bsz = min(self._batch_cap(batch_bucket), b_all)
        pending = []
        for lo in range(0, len(items), bsz):
            hi = min(lo + bsz, len(items))
            b = _next_pow2(hi - lo, min(bsz, 16))
            sl = slice(lo, lo + b)
            res = step(
                jnp.asarray(qtok[sl]), jnp.asarray(qlens[sl]),
                jnp.asarray(slots[sl]), jnp.asarray(nqg[sl]),
                jnp.asarray(use_short[sl]),
                jnp.asarray(self._promo_array(items[lo:hi], b)),
                np.float32(threshold),
            )
            pending.append((lo, hi, res))
        for lo, hi, res in pending:
            counts, ids_b, scores_b = jax.device_get(res)
            for r, item in enumerate(items[lo:hi]):
                self._emit_row(
                    out, item[0], counts[r], ids_b[r], scores_b[r], limit
                )
