"""Block-pruned candidate selection: exactness and parity.

The two-phase selection (per-128-lane block maxima -> top blocks -> dense
top-k over surviving lanes) must return the same results as plain top-k
wherever either marks a row exact, and its coverage must never be weaker
(a nonempty block holds at least one passing lane, so n_pass <= n_cand
still implies full coverage)."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from stringsearchlib_tpu.config import IndexConfig
from stringsearchlib_tpu.index.build import build_index
from stringsearchlib_tpu.search.candidates import candidates_matmul
from stringsearchlib_tpu.search.engine import SearchEngine


def _corpus(n, seed=7):
    rng = np.random.default_rng(seed)
    alpha = list("ABCDEFGHIJ")
    return [
        "".join(rng.choice(alpha, size=rng.integers(6, 18)))
        for _ in range(n)
    ]


@pytest.fixture(scope="module")
def big_engine():
    words = _corpus(9216)
    host = build_index(words, 1, None, IndexConfig())
    return SearchEngine(host), words


def _kernel_inputs(engine, queries, limit):
    host = engine.host
    items = []
    for q in queries:
        qnorm, qlen = engine._normalize_query(q)
        items.append((0, qnorm, qlen, host.promo_key_ids(qnorm, qlen)))
    b, qtok, qlens, slots, nqg, use_short, s_cap = engine._prep_rows(items, 32)
    promo = np.full((b, engine.PROMO_KEYS), -1, dtype=np.int32)
    for r, it in enumerate(items):
        promo[r, : it[3].size] = it[3]
    lim = np.full((b,), limit, dtype=np.int32)
    return (
        jnp.asarray(qtok), jnp.asarray(qlens), jnp.asarray(slots),
        jnp.asarray(nqg), jnp.asarray(use_short), jnp.asarray(promo), lim,
        bool(use_short.any()),
    )


def test_block_selection_matches_plain_topk(big_engine):
    engine, words = big_engine
    host = engine.host
    queries = [w[:8] for w in words[:24]]
    qtok, qlens, slots, nqg, us, promo, lim, cs = _kernel_inputs(
        engine, queries, 10
    )
    gm = host.gram_matrix(engine.GM_BUDGET)
    assert gm is not None
    pt, xt = host.prim_tables()

    promo_t, promo_w = engine._promo_tables(np.asarray(promo))

    def run(block_sel, n_cand):
        return [
            np.asarray(a)
            for a in candidates_matmul(
                host.device, gm, pt, xt, qtok, qlens, slots, nqg, us,
                promo, promo_t, promo_w, lim, np.float32(0.3),
                compute_short=cs,
                n_cand=n_cand, n_edge=16,
                top_k=16, block_sel=block_sel,
            )
        ]

    for n_cand in (16, 64):
        cnt_p, ids_p, sc_p, _, ex_p = run(False, n_cand)
        cnt_b, ids_b, sc_b, _, ex_b = run(True, n_cand)
        # block coverage is never weaker than plain top-k coverage
        assert (ex_b | ~ex_p).all(), (n_cand, ex_p, ex_b)
        both = ex_p & ex_b
        assert both.any()
        np.testing.assert_array_equal(cnt_p[both], cnt_b[both])
        np.testing.assert_array_equal(ids_p[both], ids_b[both])
        np.testing.assert_allclose(sc_p[both], sc_b[both], rtol=0, atol=0)


def test_engine_escalation_parity_with_dense(big_engine):
    """Tiny first-pass width forces guard failures; escalation + dense
    retry must still return exactly the dense path's results."""
    engine, words = big_engine
    rng = np.random.default_rng(11)
    queries = [w[: rng.integers(6, 10)] for w in words[:40]]

    old_fast, old_full = engine.CAND_TERMS_FAST, engine.CAND_TERMS
    try:
        engine.CAND_TERMS_FAST = 16
        engine.CAND_TERMS = 64
        cand = engine.search_batch(queries, 0.2, 10, mode="candidates")
    finally:
        engine.CAND_TERMS_FAST = old_fast
        engine.CAND_TERMS = old_full
    dense = engine.search_batch(queries, 0.2, 10, mode="dense")
    for i, ((ka, sa), (kb, sb)) in enumerate(zip(cand, dense)):
        ga = sorted((round(s, 5), len(k)) for k, s in zip(ka, sa))
        gb = sorted((round(s, 5), len(k)) for k, s in zip(kb, sb))
        assert ga == gb, (i, queries[i], ka, kb)


def test_block_selection_soundness():
    """_select_candidates block mode on a large synthetic lane space:
    every selected value is the real lane value,
    u_c bounds every unselected lane, and coverage implies the selection
    contains every passing lane."""
    import jax.numpy as jnp

    from stringsearchlib_tpu.search.candidates import _select_candidates

    rng = np.random.default_rng(3)
    n, n_cand = 300_000, 64  # 2344 blocks, far more than n_cand
    for case in ("dense", "sparse"):
        u = np.full(n, -np.inf, np.float32)
        if case == "dense":
            m = 50_000
        else:
            m = 40  # fewer passers than n_cand -> covered
        pos = rng.choice(n, m, replace=False)
        u[pos] = rng.random(m).astype(np.float32) * 10
        n_pass = np.int32(m)
        ub, sel, u_c, covered = map(
            np.asarray,
            _select_candidates(
                jnp.asarray(u), jnp.asarray(n_pass), n_cand=n_cand,
                block_sel=True,
            ),
        )
        valid = ub > -np.inf
        np.testing.assert_array_equal(ub[valid], u[sel[valid]])
        unsel = np.setdiff1d(pos, sel[valid])
        if unsel.size:
            # the binding property: u_c upper-bounds every unselected lane
            assert np.isfinite(u_c) and u[unsel].max() <= u_c + 1e-6, (
                case, u[unsel].max(), u_c,
            )
        if case == "sparse":
            assert covered
            assert set(pos) <= set(sel[valid].tolist())


def test_matmul_hstar_matches_plain_topk(big_engine):
    """Integer h* selection on the dense-matmul front end: rows both
    variants mark exact must agree (uniform weights required)."""
    engine, words = big_engine
    host = engine.host
    assert host.uniform_weights
    queries = [w[:8] for w in words[:24]]
    qtok, qlens, slots, nqg, us, promo, lim, cs = _kernel_inputs(
        engine, queries, 10
    )
    gm = host.gram_matrix(engine.GM_BUDGET)
    pt, xt = host.prim_tables()
    promo_t, promo_w = engine._promo_tables(np.asarray(promo))

    def run(**kw):
        return [
            np.asarray(a)
            for a in candidates_matmul(
                host.device, gm, pt, xt, qtok, qlens, slots, nqg, us,
                promo, promo_t, promo_w, lim, np.float32(0.3),
                compute_short=cs, n_edge=16, top_k=16, **kw,
            )
        ]

    cnt_p, ids_p, sc_p, _, ex_p = run(n_cand=4096, block_sel=False)
    cnt_h, ids_h, sc_h, _, ex_h = run(
        n_cand=1024, hstar=True, kb1=32, kb2=64, hs_fill=0
    )
    both = ex_p & ex_h
    assert both.any()
    for r in np.nonzero(both)[0]:
        n = min(int(cnt_p[r]), 10, ids_p.shape[1])
        assert min(int(cnt_h[r]), 10) == min(int(cnt_p[r]), 10)
        gs = sorted(zip(np.round(sc_h[r][:n], 5), ids_h[r][:n] * 0))
        ws = sorted(zip(np.round(sc_p[r][:n], 5), ids_p[r][:n] * 0))
        assert gs == ws, r
    # starved budgets never return wrong exact rows
    cnt_s, ids_s, sc_s, _, ex_s = run(
        n_cand=64, hstar=True, kb1=2, kb2=4, hs_fill=2
    )
    for r in np.nonzero(ex_s & ex_p)[0]:
        n = min(int(cnt_s[r]), 10, ids_s.shape[1])
        gs = sorted(np.round(sc_s[r][:n], 5).tolist())
        ws = sorted(np.round(sc_p[r][:n], 5).tolist())
        assert gs == ws, r
