"""Multi-chip sharded search over a jax.sharding.Mesh.

The reference's only parallelism is two std::async threads per query
(nGramSearch.hpp:379-389).  The TPU-native scale-out story (SURVEY section 2
parallelism inventory, BASELINE.json north star) is data parallelism over
the *term* dimension:

  * terms (both tiers), their postings, their term->key edges and their
    key->edge CSR are partitioned into contiguous per-shard chunks;
  * queries are replicated to every shard;
  * each shard runs the candidate-sparse search (search.candidates) on its
    local chunk, producing a local top-k of (key, score, key_len) triples
    in GLOBAL key space plus a sound upper bound on every key contribution
    it did NOT return;
  * the S local top-k lists all_gather (S * top_k triples per query - ICI
    traffic independent of K, unlike a dense (K,) merge) and merge
    replicated: dedup by key with a max (the calcScore combine rule, so
    cross-shard contributions merge exactly), re-rank by (score desc,
    key length asc, key id), slice top-k;
  * the merged exactness guard accepts when every shard closed its bound
    (-inf: fully covered, untruncated, no overflow) or when the merged
    limit-th score strictly exceeds every shard's bound; rows that fail
    retry on the dense sharded path (per-key pmax merge).

Wildcard, brute-force-short (qlen <= gram_size) and dense-retry queries use
per-key merges: each shard scores its local chunk into a replicated-id-space
(K+1,) vector (ghost key K absorbs padding) and merges with ``lax.pmax``.

No unsharded DeviceIndex is ever allocated: ``shard_index`` consumes a
host-resident index (``build_index(..., to_device=False)`` keeps every leaf
as numpy) and ``ShardedEngine`` uploads only per-shard slices, placed with
``NamedSharding`` so each device holds exactly its chunk.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.build import HostIndex
from ..search.candidates import candidates_matmul_impl, candidates_runs_impl
from ..search.engine import (
    SearchEngine,
    _finalize,
    _floor_and_promote,
    _next_pow2,
    _promo_mask,
    _propagate_raw,
    _term_scores,
)

AXIS = "shards"

_NEG_INF = np.float32(-np.inf)

# leaves partitioned over the mesh axis (leading dim = shard); everything
# else in the leaf dict is replicated
_STACKED = (
    "short_tokens", "short_lengths", "long_tokens", "long_lengths",
    "gram_ptr", "gram_terms", "term_wmax", "term_extra_ptr", "pt", "xt",
    "extra_key", "edge_term", "edge_key", "edge_weight",
    "key_edge_ptr", "key_edge_term", "key_edge_weight", "gm",
)


def make_mesh(n_devices: Optional[int] = None, axis_name: str = AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"mesh needs {n_devices} devices, only {len(devices)} present "
                "(for CPU testing set "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N and pin "
                "jax.config.update('jax_platforms', 'cpu'))"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def _pad_rows(arr: np.ndarray, rows: int) -> np.ndarray:
    if arr.shape[0] >= rows:
        return arr[:rows]
    pad = [(0, rows - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad)


@dataclasses.dataclass
class ShardedIndex:
    """Host handle for a term-sharded index (all leaves host numpy; the
    engine uploads per-shard slices with NamedSharding placement)."""

    host: HostIndex
    n_shards: int
    ts_c: int  # short terms per shard
    tl_c: int  # long terms per shard
    leaves: dict  # name -> np.ndarray; _STACKED names lead with the shard dim
    host_shard_posting_lens: np.ndarray  # (S, G) for query s_cap sizing

    @property
    def n_keys(self) -> int:
        return int(self.leaves["key_len"].shape[0])


def _shard_ranges(sorted_shard: np.ndarray, s: int) -> np.ndarray:
    """(S+1,) boundaries of contiguous shard runs in a shard-sorted array."""
    return np.searchsorted(sorted_shard, np.arange(s + 1)).astype(np.int64)


def shard_index(host: HostIndex, n_shards: int) -> ShardedIndex:
    """Partition a built index into n_shards STRIDED term chunks
    (term t -> shard t % S, local id t // S).

    Strided, not contiguous: the long tier is stored length-ASCENDING
    (index.build sorts it for the width-bucketed DP), so contiguous
    chunks would concentrate the longest terms - and their posting mass,
    which grows with length - on the last shard (up to several x skew on
    wide length ranges).  A strided subsequence of a sorted array is
    still sorted, so every shard gets a balanced, length-ascending local
    tier.

    Fully vectorized: one stable shard-sort over the postings and one over
    the edges, O(P log P + E log E) total - no per-shard rescan of the
    full posting array.
    """
    di = host.device
    s = n_shards
    npa = np.asarray
    st_g = npa(di.short_tokens)
    sl_g = npa(di.short_lengths)
    lt_g = npa(di.long_tokens)
    ll_g = npa(di.long_lengths)
    ptr = npa(di.gram_ptr).astype(np.int64)
    terms = npa(di.gram_terms).astype(np.int64)
    et = npa(di.edge_term).astype(np.int64)
    ek = npa(di.edge_key).astype(np.int32)
    ew = npa(di.edge_weight).astype(np.float32)
    key_len = npa(di.key_len).astype(np.int32)

    ts, tl = st_g.shape[0], lt_g.shape[0]
    k = key_len.shape[0]
    g = ptr.shape[0] - 1
    ts_c = -(-max(ts, 1) // s) if ts else 0
    tl_c = -(-max(tl, 1) // s) if tl else 0
    if ts_c + tl_c == 0:
        raise ValueError("cannot shard an empty index")
    tc = ts_c + tl_c

    def _stride_stack(arr, chunk):
        # rows (N, ...) -> (S, chunk, ...); shard i holds rows i::S
        pad = _pad_rows(arr, s * chunk)
        return np.swapaxes(
            pad.reshape(chunk, s, *pad.shape[1:]), 0, 1
        ).copy()

    leaves: dict = {}
    # explicit widths: reshape(-1) is ambiguous on empty tiers
    st_w = st_g.shape[1] if st_g.ndim > 1 else 0
    lt_w = lt_g.shape[1] if lt_g.ndim > 1 else 0
    leaves["short_tokens"] = _stride_stack(
        st_g.reshape(st_g.shape[0], st_w), ts_c
    )
    leaves["short_lengths"] = _stride_stack(sl_g, ts_c)
    leaves["long_tokens"] = _stride_stack(
        lt_g.reshape(lt_g.shape[0], lt_w), tl_c
    )
    leaves["long_lengths"] = _stride_stack(ll_g, tl_c)

    # -- postings: one stable shard-sort, contiguous per-shard slices -------
    p_tot = terms.shape[0]
    if p_tot and tl_c:
        lens_all = np.diff(ptr)
        gram_of = np.repeat(np.arange(g, dtype=np.int64), lens_all)
        shard_of = terms % s
        counts2d = np.bincount(
            shard_of * g + gram_of, minlength=s * g
        ).reshape(s, g)
        order = np.argsort(shard_of, kind="stable")
        sorted_shard = shard_of[order]
        bounds = _shard_ranges(sorted_shard, s)
        pos_in_shard = np.arange(p_tot, dtype=np.int64) - bounds[sorted_shard]
        pmax_len = max(int((bounds[1:] - bounds[:-1]).max()), 1)
        gram_terms_s = np.zeros((s, pmax_len), np.int32)
        gram_terms_s[sorted_shard, pos_in_shard] = (
            terms[order] // s
        ).astype(np.int32)
        gram_ptr_s = np.zeros((s, g + 1), np.int32)
        np.cumsum(counts2d, axis=1, out=gram_ptr_s[:, 1:])
    else:
        counts2d = np.zeros((s, g), np.int64)
        gram_terms_s = np.zeros((s, 1), np.int32)
        gram_ptr_s = np.zeros((s, g + 1), np.int32)
    leaves["gram_ptr"] = gram_ptr_s
    leaves["gram_terms"] = gram_terms_s

    # -- edges: shard by term ownership, local term ids (shorts then longs) -
    e_tot = et.shape[0]
    is_short = et < ts
    shard_e = np.where(is_short, et % s, (et - ts) % s).astype(np.int64)
    local_t = np.where(
        is_short, et // s, ts_c + (et - ts) // s
    ).astype(np.int64)

    # term-sorted within shard (global edges are (term, key)-sorted and a
    # stable shard-sort preserves that; shorts precede longs globally, so
    # the local order is local-term ascending)
    order_e = np.argsort(shard_e, kind="stable")
    se_sorted = shard_e[order_e]
    lt_sorted = local_t[order_e]
    ek_sorted = ek[order_e]
    ew_sorted = ew[order_e]
    ebounds = _shard_ranges(se_sorted, s)
    emax = max(int((ebounds[1:] - ebounds[:-1]).max()) if e_tot else 0, 1)

    def _stack_sorted(vals, fill, dtype):
        out = np.full((s, emax), fill, dtype=dtype)
        pos = np.arange(e_tot, dtype=np.int64) - ebounds[se_sorted]
        out[se_sorted, pos] = vals
        return out

    if e_tot:
        leaves["edge_term"] = _stack_sorted(
            lt_sorted.astype(np.int32), 0, np.int32
        )
        # ghost key K absorbs padded edges in the dense per-key merge
        leaves["edge_key"] = _stack_sorted(ek_sorted, k, np.int32)
        leaves["edge_weight"] = _stack_sorted(ew_sorted, 0.0, np.float32)
    else:
        leaves["edge_term"] = np.zeros((s, emax), np.int32)
        leaves["edge_key"] = np.full((s, emax), k, np.int32)
        leaves["edge_weight"] = np.zeros((s, emax), np.float32)

    # per-(shard, local term) CSR -> wmax, primary edge, extras
    flat_term = se_sorted * tc + lt_sorted
    counts_t = np.bincount(flat_term, minlength=s * tc).astype(np.int64)
    ptr_t = np.zeros(s * tc + 1, np.int64)
    np.cumsum(counts_t, out=ptr_t[1:])
    nz = counts_t > 0
    wmax_flat = np.zeros(s * tc, np.float32)
    prim_key_flat = np.full(s * tc, -1, np.int32)
    prim_w_flat = np.zeros(s * tc, np.float32)
    if e_tot:
        wmax_flat[nz] = np.maximum.reduceat(ew_sorted, ptr_t[:-1][nz])
        firsts = ptr_t[:-1][nz]
        prim_key_flat[nz] = ek_sorted[firsts]
        prim_w_flat[nz] = ew_sorted[firsts]
    leaves["term_wmax"] = wmax_flat.reshape(s, tc)

    is_extra = np.ones(e_tot, dtype=bool)
    if e_tot:
        is_extra[ptr_t[:-1][nz]] = False
    extra_counts = np.maximum(counts_t - 1, 0)
    xptr_flat = np.zeros(s * tc + 1, np.int64)
    np.cumsum(extra_counts, out=xptr_flat[1:])
    # per-shard extra CSR: subtract each shard's base offset
    xbase = xptr_flat[np.arange(s, dtype=np.int64) * tc]
    term_extra_ptr = (
        xptr_flat[: s * tc + 1][
            (np.arange(s)[:, None] * tc + np.arange(tc + 1)[None, :])
        ]
        - xbase[:, None]
    ).astype(np.int32)
    leaves["term_extra_ptr"] = term_extra_ptr
    xk_sorted = ek_sorted[is_extra]
    xw_sorted = ew_sorted[is_extra]
    xs_shard = se_sorted[is_extra]
    xbounds = _shard_ranges(xs_shard, s)
    xmax = max(int((xbounds[1:] - xbounds[:-1]).max()) if xk_sorted.size else 0, 1)
    x_tot = xk_sorted.shape[0]
    extra_key_s = np.full((s, xmax), -1, np.int32)
    extra_w_s = np.zeros((s, xmax), np.float32)
    if x_tot:
        xpos = np.arange(x_tot, dtype=np.int64) - xbounds[xs_shard]
        extra_key_s[xs_shard, xpos] = xk_sorted
        extra_w_s[xs_shard, xpos] = xw_sorted
    leaves["extra_key"] = extra_key_s
    # candidate-path has_extras flag must be a STATIC property of the index:
    # an all-padded (S, 1) extra table with zero extras collapses to width 1
    # and every ptr 0, which the kernels handle (tot_x = 0)

    # 4-wide [key, bitcast(weight), key_len, 0] records (prim_tables layout)
    def _records(keys2d, w2d):
        kc = np.clip(keys2d, 0, max(k - 1, 0))
        lens = key_len[kc] if k else np.zeros_like(keys2d)
        return np.stack(
            [
                keys2d,
                w2d.astype(np.float32).view(np.int32),
                np.where(keys2d >= 0, lens, 0).astype(np.int32),
                np.zeros_like(keys2d),
            ],
            axis=-1,
        ).astype(np.int32)

    leaves["pt"] = _records(
        prim_key_flat.reshape(s, tc), prim_w_flat.reshape(s, tc)
    )
    leaves["xt"] = _records(extra_key_s, extra_w_s)

    # -- per-shard key->local-edge CSR (promotion scoring) ------------------
    order_ke = np.lexsort((ek, shard_e))  # by shard, then key
    ske = shard_e[order_ke]
    kke = ek[order_ke]
    tke = local_t[order_ke].astype(np.int32)
    wke = ew[order_ke]
    ke_counts = np.bincount(
        ske * (k + 1) + kke, minlength=s * (k + 1)
    ).reshape(s, k + 1)[:, :k] if e_tot else np.zeros((s, k), np.int64)
    key_edge_ptr = np.zeros((s, k + 1), np.int32)
    np.cumsum(ke_counts, axis=1, out=key_edge_ptr[:, 1:])
    kebounds = _shard_ranges(ske, s) if e_tot else np.zeros(s + 1, np.int64)
    kemax = max(
        int((kebounds[1:] - kebounds[:-1]).max()) if e_tot else 0, 1
    )
    key_edge_term = np.zeros((s, kemax), np.int32)
    key_edge_weight = np.zeros((s, kemax), np.float32)
    if e_tot:
        kpos = np.arange(e_tot, dtype=np.int64) - kebounds[ske]
        key_edge_term[ske, kpos] = tke
        key_edge_weight[ske, kpos] = wke
    leaves["key_edge_ptr"] = key_edge_ptr
    leaves["key_edge_term"] = key_edge_term
    leaves["key_edge_weight"] = key_edge_weight

    # -- replicated key arrays ---------------------------------------------
    leaves["key_len"] = key_len

    return ShardedIndex(
        host=host,
        n_shards=s,
        ts_c=ts_c,
        tl_c=tl_c,
        leaves=leaves,
        host_shard_posting_lens=counts2d,
    )


class _ShardView:
    """DeviceIndex-shaped view over one shard's leaves (local terms, GLOBAL
    keys).  Padded term slots have length 0, wmax 0, primary key -1 and no
    extra/key edges, so they can never contribute to a key."""

    def __init__(self, lv: dict, strip: bool):
        for name, arr in lv.items():
            if name in ("pt", "xt", "gm"):
                continue
            setattr(self, name, arr[0] if strip and name in _STACKED else arr)

    @property
    def n_short(self):
        return self.short_tokens.shape[0]

    @property
    def n_long(self):
        return self.long_tokens.shape[0]

    @property
    def n_keys(self):
        # +1: the ghost key row that padded/invalid edges map to
        return self.key_len.shape[0] + 1


# ---------------------------------------------------------------------------
# candidate-sparse sharded step (the production path)
# ---------------------------------------------------------------------------


def _merge_shard_topk(cnt_s, keys_s, scores_s, lens_s, bound_s, k_total,
                      limit, top_k):
    """Replicated merge of per-shard local top-k lists.

    ``cnt_s`` (S, B) local reached totals; keys/scores/lens (S, B, top_k)
    in global key space; ``bound_s`` (S, B) per-shard contribution bounds
    for keys absent from that shard's list (-inf = closed).  Dedup by key
    takes the max score (the calcScore combine is a max over edges and each
    edge lives on exactly one shard); ranking reproduces the single-chip
    (score desc, key length asc, key id) order.
    """
    s, b, tk = keys_s.shape
    pos = jnp.arange(tk, dtype=jnp.int32)
    valid = pos[None, None, :] < jnp.minimum(cnt_s, tk)[:, :, None]
    keys_f = jnp.swapaxes(keys_s, 0, 1).reshape(b, s * tk)
    scores_f = jnp.swapaxes(scores_s, 0, 1).reshape(b, s * tk)
    lens_f = jnp.swapaxes(lens_s, 0, 1).reshape(b, s * tk)
    valid_f = jnp.swapaxes(valid, 0, 1).reshape(b, s * tk)
    m_bound = jnp.max(bound_s, axis=0)  # (B,)
    all_closed = jnp.all(bound_s == _NEG_INF, axis=0)

    def one(args):
        kf, sf, lf, vf = args
        kk = jnp.where(vf, kf, k_total)
        kk2, _, sf2, lf2 = jax.lax.sort((kk, -sf, sf, lf), num_keys=2)
        first = jnp.concatenate(
            [jnp.ones((1,), bool), kk2[1:] != kk2[:-1]]
        )
        mvalid = first & (kk2 < k_total)
        unique = jnp.sum(mvalid.astype(jnp.int32))
        neg = jnp.where(mvalid, -sf2, np.float32(np.inf))
        neg_sorted, _, out_key, out_score = jax.lax.sort(
            (neg, jnp.where(mvalid, lf2, np.int32(2**30)), kk2, sf2),
            num_keys=3,
        )
        lim_idx = min(max(limit - 1, 0), s * tk - 1)
        sigma = -neg_sorted[lim_idx]
        return unique, out_key[:tk], out_score[:tk], sigma

    unique, out_keys, out_scores, sigma = jax.vmap(one)(
        (keys_f, scores_f, lens_f, valid_f)
    )
    exact = all_closed | ((unique >= limit) & (sigma > m_bound))
    count = jnp.where(all_closed, unique, jnp.minimum(unique, limit))
    return count, out_keys, out_scores, exact


def sharded_candidates_step(
    leaves: dict,
    qtokens, qlens, qslots, n_qgrams, use_short, promo_ids, promo_terms,
    promo_weights, limits, threshold,
    *,
    mesh: Mesh,
    front: str,  # "matmul" | "runs"
    compute_short: bool,
    s_cap: int,
    n_cand: int,
    n_edge: int,
    top_k: int,
    block_sel: bool,
    limit: int,
):
    """Batched candidate-sparse search over the term-sharded index.

    Each shard runs the exact candidate kernel on its chunk (local top-k +
    soundness bound); results all_gather (S * B * top_k triples) and merge
    replicated.  Rows whose merged guard fails are retried densely by the
    host (ShardedEngine), mirroring the single-chip escalation ladder.

    ``promo_terms``/``promo_weights`` (S, B, PK, PE) are HOST-expanded
    per-shard promotion edge packs in shard-LOCAL term ids (-1-padded;
    ShardedEngine._promo_tables_sharded) - shipping them avoids the
    2 x PK x PE random device gathers per (query, shard) the CSR
    expansion paid."""
    in_specs = (
        {n: (P(AXIS) if n in _STACKED else P()) for n in leaves},
        P(), P(), P(), P(), P(), P(), P(AXIS), P(AXIS), P(), P(),
    )

    def shard_fn(lv, qt, ql, qs, ng, us, pr, p_t, p_w, lim, thr):
        di = _ShardView(lv, strip=True)
        pt, xt = lv["pt"][0], lv["xt"][0]
        p_t, p_w = p_t[0], p_w[0]
        if front == "matmul":
            cnt, keys, scores, lens, bound = candidates_matmul_impl(
                di, lv["gm"][0], pt, xt, qt, ql, qs, ng, us, pr, p_t, p_w,
                lim, thr,
                compute_short=compute_short, n_cand=n_cand, n_edge=n_edge,
                top_k=top_k, block_sel=block_sel,
                with_bound=True,
            )
        else:
            cnt, keys, scores, lens, bound = candidates_runs_impl(
                di, pt, xt, qt, ql, qs, ng, us, pr, p_t, p_w, lim, thr,
                compute_short=compute_short, s_cap=s_cap, n_cand=n_cand,
                n_edge=n_edge, top_k=top_k,
                block_sel=block_sel, with_bound=True,
            )
        return (
            cnt[None], keys[None], scores[None], lens[None], bound[None]
        )

    cnt_s, keys_s, scores_s, lens_s, bound_s = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs,
        out_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        check_vma=False,
    )(leaves, qtokens, qlens, qslots, n_qgrams, use_short, promo_ids,
      promo_terms, promo_weights, limits, threshold)

    k_total = leaves["key_len"].shape[0]
    return _merge_shard_topk(
        cnt_s, keys_s, scores_s, lens_s, bound_s, k_total, limit, top_k
    )


# ---------------------------------------------------------------------------
# dense sharded steps (wildcard / brute / retry): per-key pmax merge
# ---------------------------------------------------------------------------


class _FinalView:
    def __init__(self, key_len):
        self.key_len = key_len
        self.n_keys = key_len.shape[0]


def sharded_dense_batch_step(
    leaves: dict,
    qtokens, qlens, qslots, n_qgrams, use_short, promo_ids, threshold,
    *,
    mesh: Mesh,
    compute_short: bool,
    brute: bool,
    s_cap: int,
    top_k: int,
):
    """Batched dense sharded search: each shard scores every local term,
    propagates to a (K+1,) raw key-max vector, and the vectors merge with
    one pmax pair over the mesh axis.  ``brute`` adds the whole-tier DP the
    reference applies to qlen <= gram_size queries (nGramSearch.hpp:247-253).
    Used for brute-short queries and candidate-guard retries."""
    in_specs = (
        {n: (P(AXIS) if n in _STACKED else P()) for n in leaves},
        P(), P(), P(), P(), P(), P(), P(),
    )

    def shard_fn(lv, qtok, qls, qsl, nqg, us, qpr, thr):
        di = _ShardView(lv, strip=True)

        def one(args):
            qt, ql, sl, ng, u, pr = args
            s_a, mask_a, s_b, mask_b = _term_scores(
                di, qt, ql, sl, ng,
                use_short=compute_short, brute_long=brute, s_cap=s_cap,
            )
            if compute_short and not brute:
                ts = di.n_short
                mask_a = mask_a & jnp.concatenate(
                    [jnp.broadcast_to(u, (ts,)),
                     jnp.zeros((di.n_long,), bool)]
                )
            eq_key = _promo_mask(di.n_keys, pr)
            return _propagate_raw(di, s_a, mask_a, s_b, mask_b, eq_key, thr)

        key_val, promo = jax.vmap(one)((qtok, qls, qsl, nqg, us, qpr))
        return jax.lax.pmax(key_val, AXIS), jax.lax.pmax(promo, AXIS)

    key_val, promo = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()),
        check_vma=False,
    )(leaves, qtokens, qlens, qslots, n_qgrams, use_short, promo_ids,
      threshold)

    fv = _FinalView(leaves["key_len"])

    def rank(args):
        kv, pr = args
        score, reached = _floor_and_promote(kv[:-1], pr[:-1])
        return _finalize(fv, score, reached, top_k)

    return jax.vmap(rank)((key_val, promo))


def sharded_wildcard_step(leaves: dict, *, mesh: Mesh, top_k: int):
    """Wildcard '' / '*': every key at its max edge weight
    (nGramSearch.hpp:356-369; see engine._wildcard_device - scores keep
    their sign, no floor).  Per-shard segment-max + one pmax."""
    in_specs = (
        {n: (P(AXIS) if n in _STACKED else P()) for n in leaves},
    )

    def shard_fn(lv):
        di = _ShardView(lv, strip=True)
        k1 = leaves["key_len"].shape[0] + 1
        val = jax.ops.segment_max(
            di.edge_weight, di.edge_key, num_segments=k1
        )
        return jax.lax.pmax(val, AXIS)

    val = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs, out_specs=P(),
        check_vma=False,
    )(leaves)
    score = val[:-1]
    reached = score > _NEG_INF
    score = jnp.where(reached, score, 0.0)
    return _finalize(_FinalView(leaves["key_len"]), score, reached, top_k)


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------


class ShardedEngine(SearchEngine):
    """Query front end over a ShardedIndex.

    Inherits only the HOST-side helpers from SearchEngine (normalization,
    gram-slot lookup, shape bucketing, result emit); every device dispatch
    is a sharded step above.  The host index must stay host-resident
    (build_index(..., to_device=False)); nothing here uploads an unsharded
    leaf."""

    def __init__(self, sharded: ShardedIndex, mesh: Mesh):
        super().__init__(sharded.host)
        self.sx = sharded
        self.mesh = mesh
        self._jitted = {}
        self._dev: Optional[dict] = None
        self._gm_built = False
        self._wild_cache: dict = {}

    # -- device placement -------------------------------------------------

    def _place(self, arr: np.ndarray, spec) -> jax.Array:
        """Host array -> device array with the given PartitionSpec.  The
        multi-host engine overrides this to assemble global arrays from
        process-local shards."""
        return jax.device_put(arr, NamedSharding(self.mesh, spec))

    def _rep(self, arr) -> jax.Array:
        """Replicated placement for per-batch query buffers."""
        return self._place(np.asarray(arr), P())

    def _out_shardings(self):
        """Forces step outputs replicated so every process can fetch them."""
        return NamedSharding(self.mesh, P())

    # host-only leaves: promotion edges expand host-side
    # (_promo_tables_sharded), so the per-shard key->edge CSR never
    # needs device residency (~(K + E) x 8 B of HBM per shard at scale)
    _HOST_ONLY = ("key_edge_ptr", "key_edge_term", "key_edge_weight")

    def _leaves(self) -> dict:
        if self._dev is None:
            dev = {}
            for name, arr in self.sx.leaves.items():
                if name in self._HOST_ONLY:
                    continue
                spec = P(AXIS) if name in _STACKED else P()
                if arr.dtype == np.uint32:
                    # wide codepoints widen for signed-safe compares;
                    # uint8 byte tokens ship and stay narrow (4x fewer
                    # upload bytes, same as the single-chip rule)
                    arr = arr.astype(np.int32)
                dev[name] = self._place(arr, spec)
            self._dev = dev
        return self._dev

    def _gram_matrix_stacked(self):
        """(S, G, Tl_c) int8 per-shard gram incidence, built on device from
        the sharded CSR, or None over budget.  Cached."""
        if self._gm_built:
            lv = self._dev or {}
            return lv.get("gm")
        self._gm_built = True
        g = self.host.n_grams
        tl_c = self.sx.tl_c
        if g == 0 or tl_c == 0 or g * tl_c > self.GM_BUDGET:
            return None
        lv = self._leaves()

        def build_fn(gram_ptr, gram_terms):
            # 1-D flat scatters in row slabs: a (P, 3) scatter-index
            # tensor is padded to 128 lanes by XLA (64x transient blowup
            # at tens of millions of postings), and the flat index
            # row * tl_c + col must stay inside int32.  Shard-local
            # posting spans are not host-known, so each slab masks the
            # full posting list instead of slicing it.
            p = gram_terms.shape[1]
            rows = (
                jnp.searchsorted(
                    gram_ptr[0],
                    jnp.arange(p, dtype=gram_ptr.dtype), side="right",
                ).astype(jnp.int32)
                - 1
            )
            col = gram_terms[0].astype(jnp.int32)
            slab = max(1, min(g, (2**31 - 1) // max(tl_c, 1)))
            pieces = []
            for lo in range(0, g, slab):
                hi = min(lo + slab, g)
                loc = rows - np.int32(lo)
                ok = (
                    (loc >= 0) & (loc < hi - lo)
                    & (col >= 0) & (col < tl_c)
                )
                flat = jnp.where(
                    ok, loc * np.int32(tl_c) + col,
                    np.int32((hi - lo) * tl_c),
                )
                pieces.append(
                    jnp.zeros(((hi - lo) * tl_c,), jnp.int8)
                    .at[flat]
                    .set(1, mode="drop")
                    .reshape(hi - lo, tl_c)
                )
            out = (
                pieces[0] if len(pieces) == 1
                else jnp.concatenate(pieces, axis=0)
            )
            return out[None]

        gm = jax.jit(
            jax.shard_map(
                build_fn, mesh=self.mesh, in_specs=(P(AXIS), P(AXIS)),
                out_specs=P(AXIS), check_vma=False,
            )
        )(lv["gram_ptr"], lv["gram_terms"])
        lv["gm"] = gm
        return gm

    # -- host-side prep overrides -----------------------------------------

    def _slot_mass(self, rowslots: np.ndarray) -> int:
        """s_cap source for the sharded engine: the MAX over shards of any
        query's LOCAL posting total (each shard expands only its own
        postings; SearchEngine._prep_rows supplies everything else)."""
        lens2d = self.sx.host_shard_posting_lens
        if not lens2d.size or not rowslots.size:
            return 0
        # (S, B, Q) gather is tiny (S shards x chunk x windows)
        per = np.where(
            rowslots[None, :, :] >= 0,
            lens2d[:, np.clip(rowslots, 0, None)], 0,
        ).sum(axis=2)
        return int(per.max())

    def _promo_tables_sharded(self, promo_all: np.ndarray):
        """(S, B, PK, PE) promo edge term/weight packs from the host
        per-shard key->edge CSRs (shard-LOCAL term ids, -1 padded) -
        the sharded analogue of SearchEngine._promo_tables."""
        kep = self.sx.leaves["key_edge_ptr"]  # (S, K+1)
        ket = self.sx.leaves["key_edge_term"]  # (S, kemax)
        kew = self.sx.leaves["key_edge_weight"]
        s = kep.shape[0]
        b, pk = promo_all.shape
        valid = promo_all >= 0
        p_c = np.clip(promo_all, 0, max(kep.shape[1] - 2, 0))
        # (S, B, PK) per-shard edge counts of each promo key
        cnt = np.where(
            valid[None], kep[:, p_c + 1] - kep[:, p_c], 0
        ).astype(np.int64)
        pe = _next_pow2(max(int(cnt.max()) if cnt.size else 0, 1), 1)
        terms = np.full((s, b, pk, pe), -1, np.int32)
        weights = np.zeros((s, b, pk, pe), np.float32)
        si, bi, ki = np.nonzero(cnt > 0)
        if si.size:
            c = cnt[si, bi, ki]
            rep = np.repeat
            within = np.arange(c.sum()) - rep(np.cumsum(c) - c, c)
            src = rep(kep[si, p_c[bi, ki]], c) + within
            rs, rb, rk = rep(si, c), rep(bi, c), rep(ki, c)
            terms[rs, rb, rk, within] = ket[rs, src]
            weights[rs, rb, rk, within] = kew[rs, src]
        return terms, weights

    # -- public API --------------------------------------------------------

    def search(self, query, threshold: float = 0.0, limit: int = 0):
        return self.search_batch([query], threshold, limit)[0]

    def _search_impl(self, query, threshold: float = 0.0, limit: int = 0):
        return self._search_batch_impl([query], threshold, limit, 256, 32,
                                       "auto")[0]

    def _wildcard(self, limit: int):
        from ..config import INT32_MAX

        if limit == 0:
            limit = INT32_MAX
        top_k = self._top_k(limit)
        cached = self._wild_cache.get(top_k)
        if cached is None:
            res = jax.jit(
                functools.partial(
                    sharded_wildcard_step, mesh=self.mesh, top_k=top_k
                ),
                out_shardings=self._out_shardings(),
            )(self._leaves())
            cached = jax.device_get(res)
            self._wild_cache[top_k] = cached
        count, ids_np, scores_np = cached
        n = min(int(count), limit, int(ids_np.shape[0]))
        return (
            [self.host.key_strings[i] for i in ids_np[:n]],
            [float(s) for s in scores_np[:n]],
        )

    def _search_batch_impl(
        self, queries, threshold, limit, batch_bucket, qp_bucket, mode
    ):
        from ..config import INT32_MAX

        if limit == 0:
            limit = INT32_MAX
        out: list = [None] * len(queries)
        if not self.host.indexed:
            return [([], [])] * len(queries)

        want_cand = mode != "dense" and limit <= self.CAND_MAX_LIMIT
        ke_counts = self.host.host_key_edge_counts
        items, brute_items, long_items = [], [], []
        for i, q in enumerate(queries):
            raw = q if isinstance(q, str) else str(q)
            if len(raw) == 0 or raw == "*":
                if self.sx.leaves["edge_key"].size == 0:
                    out[i] = ([], [])
                else:
                    out[i] = self._wildcard(limit)
                continue
            qnorm, qlen = self._normalize_query(raw)
            if qlen == 0:
                out[i] = ([], [])
            elif qlen <= self.cfg.brute_force_cutoff:
                brute_items.append((i, qnorm, qlen))
            elif qlen > qp_bucket:
                long_items.append((i, qnorm, qlen))
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

        cand_items = [it for it in items if want_cand and it[3] is not None]
        dense_items = [
            it for it in items if not (want_cand and it[3] is not None)
        ]

        if cand_items:
            retry = self._run_candidate_chunks(
                cand_items, threshold, limit, batch_bucket, qp_bucket, out
            )
            dense_items.extend(retry)
        if dense_items:
            self._run_dense_chunks(
                dense_items, threshold, limit, batch_bucket, qp_bucket, out
            )
        for lo in range(0, len(long_items), 8):
            chunk = long_items[lo : lo + 8]
            qp = _next_pow2(max(it[2] for it in chunk), qp_bucket)
            self._run_dense_chunks(chunk, threshold, limit, 8, qp, out)
        if brute_items:
            self._run_brute_chunks(brute_items, threshold, limit, out)
        return out

    # -- dispatch helpers --------------------------------------------------

    def _run_candidate_chunks(
        self, items, threshold, limit, batch_bucket, qp, out
    ):
        retry, n_used, n_avail = self._cand_pass(
            items, threshold, limit, batch_bucket, qp, out,
            self.CAND_TERMS_FAST,
        )
        if retry and n_used < min(self.CAND_TERMS, n_avail):
            retry, _, _ = self._cand_pass(
                retry, threshold, limit, batch_bucket, qp, out,
                self.CAND_TERMS,
            )
        return retry

    def _cand_pass(self, items, threshold, limit, batch_bucket, qp, out,
                   cand_cap):
        from ..search.candidates import _BLK

        lv = self._leaves()
        ts_c, tl_c = self.sx.ts_c, self.sx.tl_c
        x_total = int(lv["extra_key"].shape[1])
        n_edge = min(
            max(_next_pow2(max(x_total, 1), 16), 16), self.CAND_EDGES
        )
        top_k = _next_pow2(limit, 16)

        b_all, qtok, qlens, slots, nqg, use_short, s_cap = self._prep_rows(
            items, qp
        )
        compute_short = bool(use_short.any()) and ts_c > 0
        promo_all = np.full((b_all, self.PROMO_KEYS), -1, dtype=np.int32)
        for r, item in enumerate(items):
            pids = item[3]
            promo_all[r, : pids.size] = pids
        promo_t, promo_w = self._promo_tables_sharded(promo_all)

        gm = self._gram_matrix_stacked()
        front = "matmul" if gm is not None else "runs"
        if front == "matmul":
            n_lanes = (ts_c if compute_short else 0) + tl_c
            per_q = 48 * (ts_c + tl_c) + 24 * n_edge + (1 << 16)
        else:
            n_lanes = (ts_c if compute_short else 0) + s_cap
            per_q = (
                48 * s_cap + 24 * n_edge
                + (48 * ts_c if compute_short else 0) + (1 << 16)
            )
        n_cand = min(cand_cap, max(_next_pow2(n_lanes, 16), 16), n_lanes)
        block_sel = n_lanes >= 4 * n_cand * _BLK
        cap = max(int(self.BATCH_HBM_BUDGET // per_q), 8)
        step = 8
        while step * 2 <= min(cap, batch_bucket):
            step *= 2

        static_key = (front, compute_short, s_cap, n_cand, n_edge, top_k,
                      block_sel, limit)
        fn = self._jitted.get(static_key)
        if fn is None:
            fn = jax.jit(
                functools.partial(
                    sharded_candidates_step,
                    mesh=self.mesh,
                    front=front,
                    compute_short=compute_short,
                    s_cap=s_cap,
                    n_cand=n_cand,
                    n_edge=n_edge,
                    top_k=top_k,
                    block_sel=block_sel,
                    limit=min(limit, 2**30),
                ),
                out_shardings=self._out_shardings(),
            )
            self._jitted[static_key] = fn

        pending = []
        for lo in range(0, len(items), step):
            hi = min(lo + step, len(items))
            b = _next_pow2(hi - lo, min(step, 16))
            sl = slice(lo, lo + b)
            lim_arr = np.full((b,), min(limit, 2**30), dtype=np.int32)
            res = fn(
                lv,
                self._rep(qtok[sl]), self._rep(qlens[sl]),
                self._rep(slots[sl]), self._rep(nqg[sl]),
                self._rep(use_short[sl]), self._rep(promo_all[sl]),
                self._place(promo_t[:, sl], P(AXIS)),
                self._place(promo_w[:, sl], P(AXIS)),
                self._rep(lim_arr), np.float32(threshold),
            )
            pending.append((lo, hi, res))

        retry = []
        for lo, hi, res in pending:
            counts, ids_b, scores_b, exact = jax.device_get(res)
            for r, item in enumerate(items[lo:hi]):
                if exact[r]:
                    self._emit_row(
                        out, item[0], counts[r], ids_b[r], scores_b[r], limit
                    )
                else:
                    retry.append(item)
        return retry, n_cand, n_lanes

    def _chunk_promo(self, chunk, b: int) -> np.ndarray:
        """(b, PROMO_KEYS) int32 promotion key ids for a prepared chunk.
        Items carry them at index 3 when the candidate path prepared them;
        dense/brute items are (pos, qnorm, qlen) and look them up here."""
        promo = np.full((b, self.PROMO_KEYS), -1, np.int32)
        for r, item in enumerate(chunk):
            pids = (
                item[3] if len(item) > 3 and item[3] is not None
                else self.host.promo_key_ids(item[1], item[2])
            )[: self.PROMO_KEYS]
            promo[r, : pids.size] = pids
        return promo

    def _run_dense_chunks(self, items, threshold, limit, batch_bucket, qp,
                          out):
        top_k = self._top_k(limit)
        tc = self.sx.ts_c + self.sx.tl_c
        per_query = 48 * max(tc, 1) + 8 * (self.sx.n_keys + 1) + (1 << 20)
        cap = max(int(self.BATCH_HBM_BUDGET // per_query), 8)
        bb = 8
        while bb * 2 <= min(cap, batch_bucket):
            bb *= 2
        lv = self._leaves()
        pending = []
        for lo in range(0, len(items), bb):
            chunk = items[lo : lo + bb]
            b, qtok, qlens, slots, nqg, use_short, s_cap = self._prep_rows(
                chunk, qp
            )
            compute_short = bool(use_short.any()) and self.sx.ts_c > 0
            static_key = ("dense", compute_short, False, s_cap, top_k, qp)
            fn = self._jitted.get(static_key)
            if fn is None:
                fn = jax.jit(
                    functools.partial(
                        sharded_dense_batch_step,
                        mesh=self.mesh,
                        compute_short=compute_short,
                        brute=False,
                        s_cap=s_cap,
                        top_k=top_k,
                    ),
                    out_shardings=self._out_shardings(),
                )
                self._jitted[static_key] = fn
            res = fn(
                lv,
                self._rep(qtok), self._rep(qlens), self._rep(slots),
                self._rep(nqg), self._rep(use_short),
                self._rep(self._chunk_promo(chunk, b)),
                np.float32(threshold),
            )
            pending.append((chunk, res))
        for chunk, res in pending:
            counts, ids_b, scores_b = jax.device_get(res)
            for r, item in enumerate(chunk):
                self._emit_row(
                    out, item[0], counts[r], ids_b[r], scores_b[r], limit
                )

    def _run_brute_chunks(self, items, threshold, limit, out):
        """qlen <= gram_size: whole-tier DP on every shard (the reference's
        long-lib brute fallback, nGramSearch.hpp:247-253), per-key pmax."""
        top_k = self._top_k(limit)
        g = self.cfg.gram_size
        qp = max(_next_pow2(self.cfg.brute_force_cutoff + 1, 8), g + 1)
        lv = self._leaves()
        w = max(
            int(self.sx.leaves["short_tokens"].shape[2] or 1),
            int(self.sx.leaves["long_tokens"].shape[2] or 1),
        )
        tc = self.sx.ts_c + self.sx.tl_c
        per_q = 12 * max(tc, 1) * (w + 2) + 8 * (self.sx.n_keys + 1) + (1 << 18)
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
            static_key = ("brute", s_cap, top_k, b)
            fn = self._jitted.get(static_key)
            if fn is None:
                fn = jax.jit(
                    functools.partial(
                        sharded_dense_batch_step,
                        mesh=self.mesh,
                        compute_short=True,
                        brute=True,
                        s_cap=s_cap,
                        top_k=top_k,
                    ),
                    out_shardings=self._out_shardings(),
                )
                self._jitted[static_key] = fn
            res = fn(
                lv,
                self._rep(qtok), self._rep(qlens), self._rep(slots),
                self._rep(nqg), self._rep(np.ones(b, bool)),
                self._rep(self._chunk_promo(chunk, b)),
                np.float32(threshold),
            )
            pending.append((chunk, res))
        for chunk, res in pending:
            counts, ids_b, scores_b = jax.device_get(res)
            for r, item in enumerate(chunk):
                self._emit_row(
                    out, item[0], counts[r], ids_b[r], scores_b[r], limit
                )
