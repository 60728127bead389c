"""Candidate-sparse batched search.

The dense engine does O(T + E + K log K) work per query - fatal at millions
of keys (full key sort per query).  This path exploits the threshold: only
terms whose tier score passes it can contribute (calcScore drops the rest,
nGramSearch.hpp:315-316), and per query those are few.  Pipeline per query:

  1. tier scores (gram-overlap hits + short-tier DP) - O(T) streaming;
  2. select top-C passing terms by u(t) = wmax(t) * s(t), the EXACT maximum
     contribution of t to any key (lax.top_k);
  3. expand the selected terms' edges through the term->edge CSR (cap CE);
  4. aggregate per key by a (key, -value) two-key sort over the CE lanes -
     a segment-max without scatters, entirely in candidate space;
  5. exact-match promotion handled separately: the host looks up the <= PK
     keys whose normalized text equals the query (hash table); the device
     scores those keys exactly from their own key->edge CSR slices;
  6. rank candidates + promo entries by (score desc, key len asc, key id
     asc) and emit the top-k slice, the reached count and an EXACTNESS flag.

Exactness guarantee (host falls back to the dense path when it fails):
  * if n_pass <= C and no edge overflow, every passing term was examined ->
    scores, order and count are all exact;
  * else let u_C = the C-th selected bound.  Unselected terms contribute at
    most u_C to any key; if the limit-th ranked score strictly exceeds u_C
    and at least `limit` keys were reached, the returned top-limit list is
    exact (any candidate key with score >= limit-th > u_C has its true
    maximum inside the selected set) and count = limit.

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
from .overlap import gather_hits

_NEG_INF = np.float32(-np.inf)


def candidates_device_impl(
    di,
    qtokens,  # (B, Qp) int32
    qlens,  # (B,) int32
    qslots,  # (B, Qmax) int32
    n_qgrams,  # (B,) int32
    use_short,  # (B,) bool
    promo_ids,  # (B, PK) int32, -1 padded
    limits,  # (B,) int32
    threshold,  # () f32
    *,
    compute_short: bool,
    s_cap: int,
    n_cand: int,
    n_edge: int,
    promo_edges: int,
    top_k: int,
):
    ts, tl = di.n_short, di.n_long
    t_total = ts + tl
    k_total = di.key_len.shape[0]
    e_total = max(di.edge_key.shape[0], 1)
    cutoff = np.float32(PERFECT_SCORE_CUTOFF)

    def one(args):
        qtok, qlen, slots, nqg, us, promo, limit = args
        qlen_f = jnp.maximum(qlen.astype(jnp.float32), 1.0)

        # -- tier scores ------------------------------------------------
        if compute_short:
            m_short = dp_match(di.short_tokens, di.short_lengths, qtok, qlen)
            s_short = m_short.astype(jnp.float32) / qlen_f
        else:
            s_short = jnp.zeros((ts,), jnp.float32)
        pass_short = us & (s_short >= threshold)

        hits = gather_hits(di.gram_ptr, di.gram_terms, slots, tl, s_cap)
        s_long = hits.astype(jnp.float32) / jnp.maximum(
            nqg.astype(jnp.float32), 1.0
        )
        pass_long = (hits > 0) & (nqg > 0) & (s_long >= threshold)

        s_eff = jnp.concatenate([s_short, s_long])
        pass_any = jnp.concatenate([pass_short, pass_long])
        n_pass = jnp.sum(pass_any.astype(jnp.int32))

        # -- candidate terms ---------------------------------------------
        u = di.term_wmax * s_eff
        u_m = jnp.where(pass_any, u, _NEG_INF)
        ub, t_sel = jax.lax.top_k(u_m, n_cand)
        sel_valid = ub > _NEG_INF
        u_c = jnp.where(n_pass > n_cand, ub[-1], _NEG_INF)

        # -- edge expansion (term->edge CSR) ------------------------------
        tep = di.term_edge_ptr
        t_sel_c = jnp.clip(t_sel, 0, t_total - 1)
        elens = jnp.where(sel_valid, tep[t_sel_c + 1] - tep[t_sel_c], 0)
        ends = jnp.cumsum(elens)
        tot = ends[-1]
        overflow = tot > n_edge
        pos = jnp.arange(n_edge, dtype=jnp.int32)
        rank = jnp.clip(
            jnp.searchsorted(ends, pos, side="right"), 0, n_cand - 1
        ).astype(jnp.int32)
        starts = ends - elens
        e_idx = tep[t_sel_c[rank]] + (pos - starts[rank])
        evalid = pos < jnp.minimum(tot, n_edge)
        e_idx_c = jnp.clip(e_idx, 0, e_total - 1)
        k_e = di.edge_key[e_idx_c]
        w_e = di.edge_weight[e_idx_c]
        s_e = s_eff[t_sel_c[rank]]
        # promo keys are scored exactly below; exclude them here
        is_promo = (k_e[:, None] == promo[None, :]).any(axis=1)
        evalid = evalid & ~is_promo
        val_e = jnp.where(evalid, w_e * s_e, _NEG_INF)

        # -- per-key max via (key, -value) sort ----------------------------
        k_sorted, _, v_sorted = jax.lax.sort(
            (jnp.where(evalid, k_e, k_total), -val_e, val_e), num_keys=2
        )
        first = jnp.concatenate(
            [jnp.ones((1,), bool), k_sorted[1:] != k_sorted[:-1]]
        )
        cand_valid = first & (k_sorted < k_total)
        cand_score = jnp.maximum(v_sorted, 0.0)  # entryScore 0 floor
        reached_cand = jnp.sum(cand_valid.astype(jnp.int32))

        # -- promotion keys: exact scoring from their own edge slices ------
        kep = di.key_edge_ptr
        p_c = jnp.clip(promo, 0, k_total - 1)
        p_valid = promo >= 0
        pe_pos = jnp.arange(promo_edges, dtype=jnp.int32)
        p_base = kep[p_c][:, None] + pe_pos[None, :]
        p_in = (pe_pos[None, :] < (kep[p_c + 1] - kep[p_c])[:, None]) & p_valid[
            :, None
        ]
        p_bc = jnp.clip(p_base, 0, e_total - 1)
        p_t = di.key_edge_term[p_bc]
        p_w = di.key_edge_weight[p_bc]
        p_s = s_eff[p_t]
        p_pass = p_in & pass_any[p_t]
        p_val = jnp.max(jnp.where(p_pass, p_w * p_s, _NEG_INF), axis=1)
        p_reached = p_pass.any(axis=1)
        p_promoted = (p_pass & (p_s > cutoff)).any(axis=1)
        p_score = jnp.where(p_reached, jnp.maximum(p_val, 0.0), 0.0)
        p_score = jnp.where(
            p_promoted & p_reached, jnp.maximum(p_score, PROMOTED_SCORE), p_score
        )
        reached_total = reached_cand + jnp.sum(p_reached.astype(jnp.int32))

        # -- final ranking --------------------------------------------------
        f_key = jnp.concatenate([k_sorted, p_c])
        f_score = jnp.concatenate([cand_score, p_score])
        f_valid = jnp.concatenate([cand_valid, p_reached])
        f_len = di.key_len[jnp.clip(f_key, 0, k_total - 1)]
        neg = jnp.where(f_valid, -f_score, np.float32(np.inf))
        _, _, out_key, out_score = jax.lax.sort(
            (neg, jnp.where(f_valid, f_len, np.int32(2**30)), f_key, f_score),
            num_keys=3,
        )

        # -- exactness ---------------------------------------------------
        lim_idx = jnp.clip(limit - 1, 0, n_edge + promo_edges - 1)
        sigma_l = -neg.sort()[lim_idx]  # limit-th best valid score
        exact = (~overflow) & (
            (n_pass <= n_cand)
            | ((reached_total >= limit) & (sigma_l > u_c))
        )
        count = jnp.where(
            n_pass <= n_cand, reached_total, jnp.minimum(reached_total, limit)
        )
        return count, out_key[:top_k], out_score[:top_k], exact

    return jax.lax.map(
        one, (qtokens, qlens, qslots, n_qgrams, use_short, promo_ids, limits)
    )


candidates_device = functools.partial(
    jax.jit,
    static_argnames=(
        "compute_short", "s_cap", "n_cand", "n_edge", "promo_edges", "top_k",
    ),
)(candidates_device_impl)
