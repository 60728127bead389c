"""2-D DP x TP composition: mesh axes ('shards', 'grams').

``parallel.dist`` scales THROUGHPUT by sharding terms (DP); ``parallel.tp``
scales posting CAPACITY by sharding the gram axis (TP).  This module
composes them on one 2-D mesh: device (i, j) holds term shard i's tier
arrays/edges (replicated along the gram axis) plus the j-th gram-slot
slice of term shard i's postings CSR.

Per batch, each device expands ONLY its local (term-chunk x gram-slice)
postings into per-term hit counts; one ``psum`` over the 'grams' axis
reconstructs exact local-term hits (the contraction split of the
reference's accumulation loop, nGramSearch.hpp:289-298); scoring then
proceeds exactly as the 1-D dense sharded step and a ``pmax`` over
'shards' merges per-key maxima.  Outputs are bit-identical to the
single-chip dense path (parity-tested on the 8-device virtual mesh,
tests/test_dp_tp.py).

ICI cost model per batch: the 'grams' psum moves a (B, Tl_c) int32 hits
block per device pair (Tl_c = terms per term-shard), the 'shards' pmax a
(B, K+1) f32 key block - both ride ICI; for B=256, Tl_c=1.25M (10M keys
over 8 term shards) the psum is ~1.3 GB/batch, which is why TP is a
capacity tool, not a throughput tool (SURVEY section 2 inventory).
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
from ..search.engine import (
    _finalize,
    _floor_and_promote,
    _next_pow2,
    _promo_mask,
    _propagate_raw,
)
from ..search.editdist import dp_match, dp_match_tiered
from ..search.overlap import gather_hits
from . import dist

AXIS_T = dist.AXIS  # 'shards' (terms)
AXIS_G = "grams"

_NEG_INF = np.float32(-np.inf)


def make_mesh_2d(st: int, sg: int) -> Mesh:
    devices = jax.devices()
    if len(devices) < st * sg:
        raise ValueError(f"mesh needs {st * sg} devices, have {len(devices)}")
    return Mesh(
        np.array(devices[: st * sg]).reshape(st, sg), (AXIS_T, AXIS_G)
    )


@dataclasses.dataclass
class DpTpIndex:
    """Host handle: 1-D term-sharded leaves plus the per-term-shard
    postings CSR re-split into contiguous gram-slot slices."""

    sx: dist.ShardedIndex
    sg: int
    g_c: int  # gram slots per gram shard
    gram_ptr2: np.ndarray  # (St, Sg, g_c + 1) local-slice CSR offsets
    gram_terms2: np.ndarray  # (St, Sg, p_max) local term ids
    lens3: np.ndarray  # (St, Sg, G) per-device posting lengths (s_cap)


def shard_index_2d(host: HostIndex, st: int, sg: int) -> DpTpIndex:
    """Term-shard with dist.shard_index, then slice each term shard's
    postings CSR over the gram axis.  A contiguous gram-slot range is a
    contiguous CSR span, so the split is pure slicing - no re-sort."""
    sx = dist.shard_index(host, st)
    ptr = sx.leaves["gram_ptr"].astype(np.int64)  # (St, G+1)
    terms = sx.leaves["gram_terms"]  # (St, Pmax)
    g = ptr.shape[1] - 1
    g_c = -(-max(g, 1) // sg)
    bounds = np.minimum(np.arange(sg + 1) * g_c, g)  # gram-slot cuts
    starts = ptr[:, bounds[:-1]]  # (St, Sg)
    ends = ptr[:, bounds[1:]]
    p_max = max(int((ends - starts).max()), 1)
    gram_terms2 = np.zeros((st, sg, p_max), np.int32)
    gram_ptr2 = np.zeros((st, sg, g_c + 1), np.int32)
    lens3 = np.zeros((st, sg, g), np.int64)
    for i in range(st):
        for j in range(sg):
            lo, hi = int(starts[i, j]), int(ends[i, j])
            gram_terms2[i, j, : hi - lo] = terms[i, lo:hi]
            glo, ghi = int(bounds[j]), int(bounds[j + 1])
            gram_ptr2[i, j, : ghi - glo + 1] = ptr[i, glo : ghi + 1] - lo
            gram_ptr2[i, j, ghi - glo + 1 :] = ptr[i, ghi] - lo
            lens3[i, j, glo:ghi] = np.diff(ptr[i, glo : ghi + 1])
    return DpTpIndex(
        sx=sx, sg=sg, g_c=g_c, gram_ptr2=gram_ptr2,
        gram_terms2=gram_terms2, lens3=lens3,
    )


def dp_tp_dense_step(
    leaves: dict, gram_ptr2, gram_terms2,
    qtokens, qlens, qslots, n_qgrams, use_short, promo_ids, threshold,
    *, mesh: Mesh, g_c: int, compute_short: bool, brute: bool,
    s_cap: int, top_k: int,
):
    """Batched dense search over the ('shards', 'grams') mesh.

    Each device: local gram-slice hit expansion -> psum('grams') -> exact
    local-term hits -> tier scores -> per-key raw max -> pmax('shards').
    The short/brute DP tiers replicate along 'grams' (every gram shard
    computes the same DP - redundant flops, zero extra ICI)."""
    in_specs = (
        {n: (P(AXIS_T) if n in dist._STACKED else P()) for n in leaves},
        P(AXIS_T, AXIS_G), P(AXIS_T, AXIS_G),
        P(), P(), P(), P(), P(), P(), P(),
    )

    def shard_fn(lv, gp2, gt2, qtok, qls, qsl, nqg, us, qpr, thr):
        di = dist._ShardView(lv, strip=True)
        gj = jax.lax.axis_index(AXIS_G)
        local_ptr = gp2[0, 0]
        local_terms = gt2[0, 0]
        tl_c = di.n_long
        ts_c = di.n_short

        def one(args):
            qt, ql, sl, ng, u, pr = args
            # global slot -> this gram shard's local slot (or -1)
            loc = sl - gj * g_c
            loc = jnp.where((sl >= 0) & (loc >= 0) & (loc < g_c), loc, -1)
            hits = gather_hits(local_ptr, local_terms, loc, tl_c, s_cap)
            hits = jax.lax.psum(hits, AXIS_G)  # exact local-term counts
            qlen_f = jnp.maximum(ql.astype(jnp.float32), 1.0)
            if compute_short:
                m_short = dp_match(di.short_tokens, di.short_lengths, qt, ql)
                s_short = m_short.astype(jnp.float32) / qlen_f
                if brute:
                    m_long = dp_match_tiered(
                        di.long_tokens, di.long_lengths, qt, ql, ()
                    )
                    s_a = jnp.concatenate(
                        [s_short, m_long.astype(jnp.float32) / qlen_f]
                    )
                    mask_a = jnp.ones((ts_c + tl_c,), bool)
                else:
                    s_a = jnp.concatenate(
                        [s_short, jnp.zeros((tl_c,), jnp.float32)]
                    )
                    mask_a = jnp.concatenate(
                        [jnp.broadcast_to(u, (ts_c,)),
                         jnp.zeros((tl_c,), bool)]
                    )
            else:
                s_a = jnp.zeros((ts_c + tl_c,), jnp.float32)
                mask_a = jnp.zeros((ts_c + tl_c,), bool)
            s_b_long = hits.astype(jnp.float32) / jnp.maximum(
                ng.astype(jnp.float32), 1.0
            )
            s_b = jnp.concatenate([jnp.zeros((ts_c,), jnp.float32), s_b_long])
            mask_b = jnp.concatenate(
                [jnp.zeros((ts_c,), bool), (hits > 0) & (ng > 0)]
            )
            eq_key = _promo_mask(di.n_keys, pr)
            return _propagate_raw(di, s_a, mask_a, s_b, mask_b, eq_key, thr)

        key_val, promo = jax.vmap(one)((qtok, qls, qsl, nqg, us, qpr))
        return jax.lax.pmax(key_val, AXIS_T), jax.lax.pmax(promo, AXIS_T)

    key_val, promo = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()),
        check_vma=False,
    )(leaves, gram_ptr2, gram_terms2, qtokens, qlens, qslots, n_qgrams,
      use_short, promo_ids, threshold)

    fv = dist._FinalView(leaves["key_len"])

    def rank(args):
        kv, pr = args
        score, reached = _floor_and_promote(kv[:-1], pr[:-1])
        return _finalize(fv, score, reached, top_k)

    return jax.vmap(rank)((key_val, promo))


class DpTpEngine(dist.ShardedEngine):
    """Query front end over the 2-D DP x TP mesh.

    Reuses every host-side helper and the wildcard step from
    ShardedEngine (edge leaves replicate along 'grams', so the 1-D
    'shards' pmax stays correct on the 2-D mesh); the batched dense and
    brute paths run the 2-D step above.  The candidate-sparse 1-D path
    is disabled - this engine is the CAPACITY configuration, every query
    takes the exact dense route."""

    def __init__(self, dx: DpTpIndex, mesh: Mesh):
        super().__init__(dx.sx, mesh)
        self.dx = dx
        self._dev2: Optional[tuple] = None

    def _postings2(self):
        if self._dev2 is None:
            sh = NamedSharding(self.mesh, P(AXIS_T, AXIS_G))
            self._dev2 = (
                jax.device_put(self.dx.gram_ptr2, sh),
                jax.device_put(self.dx.gram_terms2, sh),
            )
        return self._dev2

    # every query is dense on this engine
    def _run_candidate_chunks(self, items, threshold, limit, batch_bucket,
                              qp, out):
        return list(items)

    def _slot_mass(self, rowslots: np.ndarray) -> int:
        """s_cap: max over (term shard, gram shard) of any query's LOCAL
        posting mass (each device expands only its own slice)."""
        lens3 = self.dx.lens3  # (St, Sg, G)
        if not lens3.size or not rowslots.size:
            return 0
        st, sg, g = lens3.shape
        flat = lens3.reshape(st * sg, g)
        per = np.where(
            rowslots[None, :, :] >= 0,
            flat[:, np.clip(rowslots, 0, None)], 0,
        ).sum(axis=2)
        return int(per.max())

    def _dense_fn(self, compute_short, brute, s_cap, top_k):
        key = ("2d", compute_short, brute, s_cap, top_k)
        fn = self._jitted.get(key)
        if fn is None:
            fn = jax.jit(
                functools.partial(
                    dp_tp_dense_step,
                    mesh=self.mesh,
                    g_c=self.dx.g_c,
                    compute_short=compute_short,
                    brute=brute,
                    s_cap=s_cap,
                    top_k=top_k,
                ),
                out_shardings=self._out_shardings(),
            )
            self._jitted[key] = fn
        return fn

    def _run_dense_chunks(self, items, threshold, limit, batch_bucket, qp,
                          out):
        self._dispatch_2d(items, threshold, limit, batch_bucket, qp, out,
                          brute=False)

    def _run_brute_chunks(self, items, threshold, limit, out):
        g = self.cfg.gram_size
        qp = max(_next_pow2(self.cfg.brute_force_cutoff + 1, 8), g + 1)
        self._dispatch_2d(items, threshold, limit, 16, qp, out, brute=True)

    def _dispatch_2d(self, items, threshold, limit, batch_bucket, qp, out,
                     *, brute):
        gp2, gt2 = self._postings2()
        lv = self._leaves()
        top_k = self._top_k(limit)
        pending = []
        for lo in range(0, len(items), batch_bucket):
            chunk = items[lo : lo + batch_bucket]
            b, qtok, qlens, slots, nqg, use_short, s_cap = self._prep_rows(
                chunk, qp
            )
            if brute:
                use_short = np.ones(b, bool)
            compute_short = bool(use_short.any()) and self.sx.ts_c > 0
            fn = self._dense_fn(compute_short or brute, brute, s_cap, top_k)
            res = fn(
                lv, gp2, gt2,
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
