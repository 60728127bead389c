"""Multi-chip sharded search over a jax.sharding.Mesh.

The reference's only parallelism is two std::async threads per query
(nGramSearch.hpp:379-389).  The TPU-native scale-out story (SURVEY section 2
parallelism inventory, BASELINE.json north star) is data parallelism over
the *term* dimension:

  * terms (both tiers), their postings and their term->key edges are
    partitioned into contiguous per-shard chunks;
  * queries are replicated to every shard;
  * each shard computes raw per-key score maxima over its local edges;
  * raw maxima and promotion flags merge with ``lax.pmax`` over the mesh
    axis (max is the calcScore combine rule, so the merge is exact);
  * flooring, promotion, sorting and top-k run replicated on the merged
    (K,) vectors, reproducing single-chip results bit-for-bit.

Padding invariants: padded term rows have length 0 and no edges; padded
posting slots are never addressed (CSR ptr bounds them out); padded edges
point at a ghost key (index K) with weight 0 and are sliced away before
flooring.

Keys are replicated in this round-1 design; ICI traffic per query batch is
the (K,) pmax pair.  A candidate-sparse merge (local top-C + all_gather)
replaces it for very large K in a later round.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..index.arrays import DeviceIndex
from ..index.build import HostIndex
from ..search.engine import (
    _finalize,
    _floor_and_promote,
    _key_eq_query,
    _propagate_raw,
    _term_scores,
)

AXIS = "shards"


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
    """Host handle for a term-sharded index."""

    host: HostIndex
    n_shards: int
    ts_c: int  # short terms per shard
    tl_c: int  # long terms per shard
    # stacked per-shard leaves (leading dim = shard)
    short_tokens: jnp.ndarray
    short_lengths: jnp.ndarray
    long_tokens: jnp.ndarray
    long_lengths: jnp.ndarray
    gram_ptr: jnp.ndarray  # (S, G+1)
    gram_terms: jnp.ndarray  # (S, Pmax)
    edge_term: jnp.ndarray  # (S, Emax)
    edge_key: jnp.ndarray
    edge_weight: jnp.ndarray
    # replicated
    key_len: jnp.ndarray  # (K,)
    key_norm_tokens: jnp.ndarray  # (K+1, L) incl. ghost row
    key_norm_lengths: jnp.ndarray  # (K+1,)
    host_shard_posting_lens: np.ndarray  # (S, G) for query caps

    @property
    def n_keys(self) -> int:
        return int(self.key_len.shape[0])


def shard_index(host: HostIndex, n_shards: int) -> ShardedIndex:
    """Partition a built index into n_shards contiguous term chunks."""
    di = host.device
    ts, tl = di.n_short, di.n_long
    k = di.n_keys
    ts_c = -(-max(ts, 1) // n_shards) if ts else 0
    tl_c = -(-max(tl, 1) // n_shards) if tl else 0
    if ts_c + tl_c == 0:
        raise ValueError("cannot shard an empty index")

    st = np.asarray(di.short_tokens)
    sl = np.asarray(di.short_lengths)
    lt = np.asarray(di.long_tokens)
    ll = np.asarray(di.long_lengths)
    ptr = np.asarray(di.gram_ptr)
    terms = np.asarray(di.gram_terms)
    et = np.asarray(di.edge_term)
    ek = np.asarray(di.edge_key)
    ew = np.asarray(di.edge_weight)
    g = ptr.shape[0] - 1

    shard_leaves = {name: [] for name in (
        "short_tokens", "short_lengths", "long_tokens", "long_lengths",
        "gram_ptr", "gram_terms", "edge_term", "edge_key", "edge_weight",
    )}
    posting_lens = []
    lens_all = np.diff(ptr)
    # posting term-id ranges per shard: postings are sorted by (gram, term),
    # select by long-term chunk membership.
    for s in range(n_shards):
        s_lo, s_hi = s * ts_c, min((s + 1) * ts_c, ts)
        l_lo, l_hi = s * tl_c, min((s + 1) * tl_c, tl)
        shard_leaves["short_tokens"].append(_pad_rows(st[s_lo:s_hi], ts_c))
        shard_leaves["short_lengths"].append(_pad_rows(sl[s_lo:s_hi], ts_c))
        shard_leaves["long_tokens"].append(_pad_rows(lt[l_lo:l_hi], tl_c))
        shard_leaves["long_lengths"].append(_pad_rows(ll[l_lo:l_hi], tl_c))

        sel = (terms >= l_lo) & (terms < l_hi)
        local_terms = (terms[sel] - l_lo).astype(np.int32)
        # per-gram counts of selected postings -> local CSR
        gram_of = np.repeat(np.arange(g), lens_all)
        counts = np.bincount(gram_of[sel], minlength=g).astype(np.int32)
        lptr = np.zeros(g + 1, dtype=np.int32)
        np.cumsum(counts, out=lptr[1:])
        shard_leaves["gram_ptr"].append(lptr)
        shard_leaves["gram_terms"].append(local_terms)
        posting_lens.append(counts.astype(np.int64))

        # edges whose term lives here, remapped to local term space
        is_short = et < ts
        in_s = is_short & (et >= s_lo) & (et < s_hi)
        in_l = ~is_short & (et - ts >= l_lo) & (et - ts < l_hi)
        sel_e = in_s | in_l
        let = np.where(is_short[sel_e], et[sel_e] - s_lo,
                       ts_c + (et[sel_e] - ts - l_lo)).astype(np.int32)
        shard_leaves["edge_term"].append(let)
        shard_leaves["edge_key"].append(ek[sel_e])
        shard_leaves["edge_weight"].append(ew[sel_e])

    pmax_len = max(max((a.shape[0] for a in shard_leaves["gram_terms"]), default=0), 1)
    emax = max(max((a.shape[0] for a in shard_leaves["edge_term"]), default=0), 1)

    def _stack(name, width, fill=0):
        out = [
            np.pad(a, (0, width - a.shape[0]), constant_values=fill)
            for a in shard_leaves[name]
        ]
        return jnp.asarray(np.stack(out))

    knt = np.asarray(di.key_norm_tokens)
    knl = np.asarray(di.key_norm_lengths)
    ghost_tok = np.zeros((1, knt.shape[1]), knt.dtype)
    ghost_len = np.full((1,), -1, knl.dtype)  # never equals any qlen

    return ShardedIndex(
        host=host,
        n_shards=n_shards,
        ts_c=ts_c,
        tl_c=tl_c,
        short_tokens=jnp.asarray(np.stack(shard_leaves["short_tokens"])),
        short_lengths=jnp.asarray(np.stack(shard_leaves["short_lengths"])),
        long_tokens=jnp.asarray(np.stack(shard_leaves["long_tokens"])),
        long_lengths=jnp.asarray(np.stack(shard_leaves["long_lengths"])),
        gram_ptr=jnp.asarray(np.stack(shard_leaves["gram_ptr"])),
        gram_terms=_stack("gram_terms", pmax_len),
        # padded edges: ghost key K, weight 0, term 0 (always a valid local id)
        edge_term=_stack("edge_term", emax),
        edge_key=_stack("edge_key", emax, fill=k),
        edge_weight=_stack("edge_weight", emax),
        key_len=di.key_len,
        key_norm_tokens=jnp.asarray(np.concatenate([knt, ghost_tok])),
        key_norm_lengths=jnp.asarray(np.concatenate([knl, ghost_len])),
        host_shard_posting_lens=np.stack(posting_lens) if posting_lens else
        np.zeros((n_shards, g), np.int64),
    )


@dataclasses.dataclass
class _GhostKeys:
    """DeviceIndex-shaped view with the ghost key row appended."""

    # only the fields the engine internals touch
    short_tokens: jnp.ndarray
    short_lengths: jnp.ndarray
    long_tokens: jnp.ndarray
    long_lengths: jnp.ndarray
    gram_ptr: jnp.ndarray
    gram_terms: jnp.ndarray
    edge_term: jnp.ndarray
    edge_key: jnp.ndarray
    edge_weight: jnp.ndarray
    key_norm_tokens: jnp.ndarray
    key_norm_lengths: jnp.ndarray

    @property
    def n_short(self):
        return self.short_tokens.shape[0]

    @property
    def n_long(self):
        return self.long_tokens.shape[0]

    @property
    def n_keys(self):
        return self.key_norm_lengths.shape[0]


def sharded_search_step(
    sx_leaves: dict,
    qtokens,
    qlen,
    qslots,
    n_qgrams,
    threshold,
    *,
    mesh: Mesh,
    use_short: bool,
    brute_long: bool,
    s_cap: int,
    top_k: int,
    key_len,
):
    """One replicated-query search over the term-sharded index.

    ``sx_leaves`` is the dict of stacked per-shard arrays plus replicated
    key arrays.  Jit this whole function (shard_map inside).
    """

    stacked_names = (
        "short_tokens", "short_lengths", "long_tokens", "long_lengths",
        "gram_ptr", "gram_terms", "edge_term", "edge_key", "edge_weight",
    )

    in_specs = (
        {n: (P(AXIS) if n in stacked_names else P()) for n in sx_leaves},
        P(), P(), P(), P(), P(),
    )

    def shard_fn(leaves, qtok, ql, qsl, nqg, thr):
        di = _GhostKeys(
            **{n: (leaves[n][0] if n in stacked_names else leaves[n])
               for n in leaves}
        )
        s_a, mask_a, s_b, mask_b = _term_scores(
            di, qtok, ql, qsl, nqg,
            use_short=use_short, brute_long=brute_long, s_cap=s_cap,
        )
        eq_key = _key_eq_query(di, qtok, ql)
        key_val, promo = _propagate_raw(
            di, s_a, mask_a, s_b, mask_b, eq_key, thr
        )
        key_val = jax.lax.pmax(key_val, AXIS)
        promo = jax.lax.pmax(promo, AXIS)
        return key_val, promo

    key_val, promo = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()),
        check_vma=False,
    )(sx_leaves, qtokens, qlen, qslots, n_qgrams, threshold)

    # drop the ghost key, floor, promote, rank
    score, reached = _floor_and_promote(key_val[:-1], promo[:-1])
    k = key_len.shape[0]

    class _FinalView:
        n_keys = k

        def __init__(self, kl):
            self.key_len = kl

    return _finalize(_FinalView(key_len), score, reached, top_k)


def sharded_search_batch_step(
    sx_leaves: dict,
    qtokens,  # (B, Qp)
    qlens,  # (B,)
    qslots,  # (B, Qmax)
    n_qgrams,  # (B,)
    use_short,  # (B,) bool
    threshold,
    *,
    mesh: Mesh,
    compute_short: bool,
    s_cap: int,
    top_k: int,
    key_len,
):
    """Batched replicated-query search over the term-sharded index.

    One dispatch scores B queries: each shard computes vmapped per-key raw
    maxima on its term chunk, the (B, K+1) maxima and promotion flags merge
    with one pmax pair over the mesh axis, and ranking runs replicated.
    ICI cost per batch = 2 * B * (K+1) values - independent of shard count.
    """
    stacked_names = (
        "short_tokens", "short_lengths", "long_tokens", "long_lengths",
        "gram_ptr", "gram_terms", "edge_term", "edge_key", "edge_weight",
    )
    in_specs = (
        {n: (P(AXIS) if n in stacked_names else P()) for n in sx_leaves},
        P(), P(), P(), P(), P(), P(),
    )

    def shard_fn(leaves, qtok, qls, qsl, nqg, us, thr):
        di = _GhostKeys(
            **{n: (leaves[n][0] if n in stacked_names else leaves[n])
               for n in leaves}
        )

        def one(args):
            qt, ql, sl, ng, u = args
            qlen_f = jnp.maximum(ql.astype(jnp.float32), 1.0)
            ts, tl = di.n_short, di.n_long
            if compute_short:
                from ..search.editdist import dp_match

                m_short = dp_match(di.short_tokens, di.short_lengths, qt, ql)
                s_short = m_short.astype(jnp.float32) / qlen_f
            else:
                s_short = jnp.zeros((ts,), jnp.float32)
            s_a = jnp.concatenate([s_short, jnp.zeros((tl,), jnp.float32)])
            mask_a = jnp.concatenate(
                [jnp.broadcast_to(u, (ts,)), jnp.zeros((tl,), bool)]
            )
            from ..search.overlap import gather_hits

            hits = gather_hits(di.gram_ptr, di.gram_terms, sl, tl, s_cap)
            s_b_long = hits.astype(jnp.float32) / jnp.maximum(
                ng.astype(jnp.float32), 1.0
            )
            s_b = jnp.concatenate([jnp.zeros((ts,), jnp.float32), s_b_long])
            mask_b = jnp.concatenate(
                [jnp.zeros((ts,), bool), (hits > 0) & (ng > 0)]
            )
            eq_key = _key_eq_query(di, qt, ql)
            return _propagate_raw(di, s_a, mask_a, s_b, mask_b, eq_key, thr)

        key_val, promo = jax.vmap(one)((qtok, qls, qsl, nqg, us))
        return jax.lax.pmax(key_val, AXIS), jax.lax.pmax(promo, AXIS)

    key_val, promo = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()),
        check_vma=False,
    )(sx_leaves, qtokens, qlens, qslots, n_qgrams, use_short, threshold)

    k = key_len.shape[0]

    class _FinalView:
        n_keys = k

        def __init__(self, kl):
            self.key_len = kl

    fv = _FinalView(key_len)

    def rank(args):
        kv, pr = args
        score, reached = _floor_and_promote(kv[:-1], pr[:-1])
        return _finalize(fv, score, reached, top_k)

    return jax.vmap(rank)((key_val, promo))


class ShardedEngine:
    """Query front end over a ShardedIndex (replicated queries)."""

    def __init__(self, sharded: ShardedIndex, mesh: Mesh):
        self.sx = sharded
        self.mesh = mesh
        self.host = sharded.host
        self.cfg = sharded.host.config
        from ..search.engine import SearchEngine

        self._front = SearchEngine(sharded.host)  # reuse query prep
        self._jitted = {}

    def _leaves(self) -> dict:
        sx = self.sx
        return {
            "short_tokens": sx.short_tokens,
            "short_lengths": sx.short_lengths,
            "long_tokens": sx.long_tokens,
            "long_lengths": sx.long_lengths,
            "gram_ptr": sx.gram_ptr,
            "gram_terms": sx.gram_terms,
            "edge_term": sx.edge_term,
            "edge_key": sx.edge_key,
            "edge_weight": sx.edge_weight,
            "key_norm_tokens": sx.key_norm_tokens,
            "key_norm_lengths": sx.key_norm_lengths,
        }

    def search(self, query, threshold: float = 0.0, limit: int = 0):
        from ..config import INT32_MAX

        if not self.host.indexed:
            return [], []
        if limit == 0:
            limit = INT32_MAX
        raw = query if isinstance(query, str) else str(query)
        top_k = self._front._top_k(limit)
        if len(raw) == 0 or raw == "*":
            # wildcard has no term scores; single-device path is exact
            return self._front.search(raw, threshold, limit)

        qnorm, qlen = self._front._normalize_query(raw)
        if qlen == 0:
            return [], []
        qtok, qmax, slots, n_qgrams, _ = self._front._query_buffers(qnorm, qlen)
        # cap from the max over shards of this query's local postings
        lens = self.sx.host_shard_posting_lens
        present = slots[slots >= 0]
        s_total = int(lens[:, present].sum(axis=1).max()) if present.size else 0
        s_cap = 128
        while s_cap < max(s_total, 1):
            s_cap *= 2

        use_short = qlen < self.cfg.short_search_cutoff
        brute_long = qlen <= self.cfg.brute_force_cutoff
        static_key = (use_short, brute_long, s_cap, top_k)
        if static_key not in self._jitted:
            self._jitted[static_key] = jax.jit(
                functools.partial(
                    sharded_search_step,
                    mesh=self.mesh,
                    use_short=use_short,
                    brute_long=brute_long,
                    s_cap=s_cap,
                    top_k=top_k,
                    key_len=self.sx.key_len,
                )
            )
        count, ids, scores = self._jitted[static_key](
            self._leaves(),
            jnp.asarray(qtok),
            np.int32(qlen),
            jnp.asarray(slots),
            np.int32(n_qgrams),
            np.float32(threshold),
        )
        count, ids_np, scores_np = jax.device_get((count, ids, scores))
        n = min(int(count), limit, int(ids_np.shape[0]))
        return (
            [self.host.key_strings[i] for i in ids_np[:n]],
            [float(s) for s in scores_np[:n]],
        )

    def search_batch(
        self, queries, threshold: float = 0.0, limit: int = 100,
        batch_bucket: int = 256, qp_bucket: int = 32,
    ):
        """Batched sharded search; one dispatch per chunk of queries.

        Wildcards, brute-force-short and over-length queries fall back to
        the per-query path (same rule as the single-chip engine)."""
        from ..config import INT32_MAX

        if limit == 0:
            limit = INT32_MAX
        out: list = [None] * len(queries)
        if not self.host.indexed:
            return [([], [])] * len(queries)

        items = []
        for i, q in enumerate(queries):
            raw = q if isinstance(q, str) else str(q)
            if len(raw) == 0 or raw == "*":
                out[i] = self.search(raw, threshold, limit)
                continue
            qnorm, qlen = self._front._normalize_query(raw)
            if qlen == 0:
                out[i] = ([], [])
            elif qlen <= self.cfg.brute_force_cutoff or qlen > qp_bucket:
                out[i] = self.search(raw, threshold, limit)
            else:
                items.append((i, qnorm, qlen))
        if not items:
            return out

        top_k = self._front._top_k(limit)
        lens = self.sx.host_shard_posting_lens
        g = self.cfg.gram_size
        from ..core import grams as gramlib

        for lo in range(0, len(items), batch_bucket):
            chunk = items[lo : lo + batch_bucket]
            b = 16
            while b < len(chunk):
                b *= 2
            qp = qp_bucket
            qmax = qp - g + 1
            qtok = np.zeros((b, qp), dtype=np.int32)
            qlens = np.zeros(b, dtype=np.int32)
            slots = np.full((b, qmax), -1, dtype=np.int32)
            nqg = np.zeros(b, dtype=np.int32)
            us = np.zeros(b, dtype=bool)
            s_total = 0
            for r, (pos, qnorm, qlen) in enumerate(chunk):
                qtok[r, :qlen] = qnorm[:qlen]
                qlens[r] = qlen
                us[r] = qlen < self.cfg.short_search_cutoff
                if qlen >= g:
                    n = qlen - g + 1
                    nqg[r] = n
                    ids, valid = gramlib.gram_ids(
                        qnorm[None, : max(qlen, g)], np.array([qlen]), g,
                        self.cfg.wide, self.host.vocab,
                    )
                    row = self.host.lookup_gram_slots(ids[0][valid[0]])
                    slots[r, :n] = row
                    present = row[row >= 0]
                    if present.size:
                        s_total = max(
                            s_total,
                            int(lens[:, present].sum(axis=1).max()),
                        )
            s_cap = 128
            while s_cap < max(s_total, 1):
                s_cap *= 2

            static_key = ("batch", bool(us.any()), s_cap, top_k, b)
            if static_key not in self._jitted:
                self._jitted[static_key] = jax.jit(
                    functools.partial(
                        sharded_search_batch_step,
                        mesh=self.mesh,
                        compute_short=bool(us.any()),
                        s_cap=s_cap,
                        top_k=top_k,
                        key_len=self.sx.key_len,
                    )
                )
            counts, ids_b, scores_b = self._jitted[static_key](
                self._leaves(),
                jnp.asarray(qtok),
                jnp.asarray(qlens),
                jnp.asarray(slots),
                jnp.asarray(nqg),
                jnp.asarray(us),
                np.float32(threshold),
            )
            counts, ids_b, scores_b = jax.device_get((counts, ids_b, scores_b))
            for r, (pos, _, _) in enumerate(chunk):
                n = min(int(counts[r]), limit, ids_b.shape[1])
                out[pos] = (
                    [self.host.key_strings[j] for j in ids_b[r, :n]],
                    [float(s) for s in scores_b[r, :n]],
                )
        return out
