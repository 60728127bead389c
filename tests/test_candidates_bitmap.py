"""Bit-packed bitmap candidate front end: packing correctness vs the dense
incidence, and full search parity vs the dense engine path."""

import random

import numpy as np
import pytest

from stringsearchlib_tpu.config import IndexConfig
from stringsearchlib_tpu.index.build import build_index
from stringsearchlib_tpu.search.engine import SearchEngine


def _gp(bm):
    """Gram-row count in either packed layout (resident tables are
    tile-major (ntiles, G, BLKB); see ops.bitmap_matmul._dispatch)."""
    return int(bm.shape[1] if bm.ndim == 3 else bm.shape[0])


def _rm(bm):
    """Row-major (G, NB) view of a packed table in either layout."""
    import jax.numpy as jnp

    from stringsearchlib_tpu.ops.bitmap_matmul import from_tile_major

    return jnp.asarray(from_tile_major(bm)) if bm.ndim == 3 else bm


def _corpus(n, seed=21):
    rng = random.Random(seed)
    syll = ["ka", "lo", "me", "ri", "su", "ta", "ve", "nor", "bel"]
    return [
        "".join(rng.choice(syll) for _ in range(rng.randint(2, 5)))
        for _ in range(n)
    ]


@pytest.fixture(scope="module")
def host_engine():
    host = build_index(_corpus(2500), 1, None, IndexConfig())
    engine = SearchEngine(host)
    engine.GM_BUDGET = 0  # force the ladder past the dense matmul
    return host, engine


def test_bitmap_matches_dense_incidence(host_engine):
    from stringsearchlib_tpu.ops.bitmap_matmul import plane_coords

    host, _ = host_engine
    bm, tl_pad = host.bitmap_tables()
    bm = np.asarray(_rm(bm)).view(np.uint8)  # (G_pad, tl_pad/8) plane-tiled
    gm = np.asarray(host.gram_matrix(1 << 40))  # (G, Tl) int8 0/1
    g, tl = gm.shape
    byte, bit = plane_coords(np.arange(tl_pad))
    exp = (bm[:, byte] >> bit.astype(np.uint8)) & 1  # (G_pad, tl_pad)
    np.testing.assert_array_equal(exp[:g, :tl], gm)
    mask = np.ones_like(exp, bool)
    mask[:g, :tl] = False
    assert not exp[mask].any()  # padded rows/columns carry no bits


def test_bitmap_kernel_matches_ref(host_engine):
    """Pallas unpack-matmul (interpret mode) == whole-table XLA unpack."""
    import jax.numpy as jnp

    from stringsearchlib_tpu.ops.bitmap_matmul import (
        bitmap_hits, bitmap_hits_ref,
    )

    host, _ = host_engine
    bm, _ = host.bitmap_tables()
    gp = _gp(bm)
    rng = np.random.default_rng(7)
    qcnt = rng.integers(0, 3, size=(16, gp)).astype(np.float32)
    qcnt[:, host.n_grams:] = 0
    q = jnp.asarray(qcnt, dtype=jnp.bfloat16)
    got = np.asarray(bitmap_hits(q, bm, interpret=True))
    want = np.asarray(bitmap_hits_ref(q, bm))
    np.testing.assert_array_equal(got, want)
    got8 = np.asarray(bitmap_hits(q, bm, interpret=True, int8_dots=True))
    np.testing.assert_array_equal(got8, want)


def test_bitmap_kernel_fused_blockmax(host_engine):
    """bitmap_hits_bmax (interpret) returns the same hits as bitmap_hits
    plus per-128-lane maxima matching the XLA block_hmax pass."""
    import jax.numpy as jnp

    from stringsearchlib_tpu.ops.bitmap_matmul import (
        bitmap_hits, bitmap_hits_bmax,
    )
    from stringsearchlib_tpu.search.candidates import _BLK, block_hmax

    host, _ = host_engine
    bm, _ = host.bitmap_tables()
    gp = _gp(bm)
    rng = np.random.default_rng(11)
    qcnt = rng.integers(0, 3, size=(16, gp)).astype(np.float32)
    qcnt[:, host.n_grams:] = 0
    q = jnp.asarray(qcnt, dtype=jnp.bfloat16)
    for int8_dots in (False, True):
        hits, bmax = bitmap_hits_bmax(
            q, bm, interpret=True, int8_dots=int8_dots
        )
        want_h = np.asarray(bitmap_hits(q, bm, interpret=True))
        np.testing.assert_array_equal(np.asarray(hits), want_h)
        nblk = want_h.shape[1] // _BLK
        want_b = np.asarray(block_hmax(jnp.asarray(want_h), nblk, _BLK))
        np.testing.assert_array_equal(np.asarray(bmax), want_b)


def test_bitmap_kernel_gtiled_fused_blockmax():
    """G-tiled (gtiles > 1) x fused blockmax: the epilogue must fire only
    after the LAST G step's accumulation."""
    import random as _random

    import jax.numpy as jnp

    from stringsearchlib_tpu.ops.bitmap_matmul import (
        GBLK, bitmap_hits, bitmap_hits_bmax,
    )
    from stringsearchlib_tpu.search.candidates import _BLK, block_hmax

    rng = _random.Random(3)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    words = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(8, 20)))
        for _ in range(3000)
    ]
    host = build_index(words, 1, None, IndexConfig())
    bm, _ = host.bitmap_tables()
    gp = _gp(bm)
    assert gp > GBLK, gp  # the corpus must actually force G-tiling
    nrng = np.random.default_rng(5)
    qcnt = (nrng.random((16, gp)) < 0.002).astype(np.float32)
    q = jnp.asarray(qcnt, dtype=jnp.bfloat16)
    hits, bmax = bitmap_hits_bmax(q, bm, interpret=True, int8_dots=True)
    want_h = np.asarray(bitmap_hits(q, bm, interpret=True, int8_dots=True))
    np.testing.assert_array_equal(np.asarray(hits), want_h)
    nblk = want_h.shape[1] // _BLK
    want_b = np.asarray(block_hmax(jnp.asarray(want_h), nblk, _BLK))
    np.testing.assert_array_equal(np.asarray(bmax), want_b)


@pytest.mark.parametrize("block_sel", [False, True])
def test_bitmap_mxu_front_end_parity(host_engine, block_sel):
    """candidates_bitmap_mxu (kernel, interpret) == candidates_bitmap
    (scan) on identical engine-shaped inputs, both finish variants."""
    import jax.numpy as jnp

    from stringsearchlib_tpu.search.candidates import (
        candidates_bitmap, candidates_bitmap_mxu,
    )

    host, engine = host_engine
    di = host.device
    bm, _ = host.bitmap_tables()
    pt, xt = host.prim_tables()
    words = host.key_strings.tolist()
    rng = random.Random(11)
    queries = []
    for i in range(8):
        w = words[rng.randrange(len(words))]
        queries.append(w if i % 2 else w[:-1] + "x")
    items = []
    for pos, q in enumerate(queries):
        qnorm, qlen = engine._normalize_query(q)
        promo = host.promo_key_ids(qnorm, qlen)
        items.append((pos, qnorm, qlen, promo))
    b, qtok, qlens, slots_a, nqg_a, use_short, _ = engine._prep_rows(
        items, 32
    )
    promo_a = np.full((b, engine.PROMO_KEYS), -1, np.int32)
    for r, it in enumerate(items):
        promo_a[r, : it[3].size] = it[3]
    promo_t, promo_w = engine._promo_tables(promo_a)
    lim = np.full((b,), 10, np.int32)
    kw = dict(
        compute_short=True, n_cand=64, n_edge=32,
        top_k=16, block_sel=block_sel,
    )
    args = (
        di, bm, pt, xt, jnp.asarray(qtok), jnp.asarray(qlens),
        jnp.asarray(slots_a), jnp.asarray(nqg_a), jnp.asarray(use_short),
        jnp.asarray(promo_a), jnp.asarray(promo_t), jnp.asarray(promo_w),
        jnp.asarray(lim), np.float32(0.25),
    )
    got = [np.asarray(x) for x in
           candidates_bitmap_mxu(*args, interpret=True, **kw)]
    want = [np.asarray(x) for x in candidates_bitmap(*args, **kw)]
    # counts, exact flags identical; ranked (score, len) slices identical
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[4], want[4])
    for r in range(b):
        n = min(int(got[0][r]), got[1].shape[1])
        gs = sorted(zip(np.round(got[2][r][:n], 5), got[3][r][:n]))
        ws = sorted(zip(np.round(want[2][r][:n], 5), want[3][r][:n]))
        assert gs == ws, (queries[r], gs, ws)


def test_bitmap_search_parity(host_engine):
    host, engine = host_engine
    words = host.key_strings.tolist()
    rng = random.Random(4)
    queries = []
    for i in range(64):
        w = words[rng.randrange(len(words))]
        j = rng.randrange(max(len(w) - 1, 1))
        queries.append(w if i % 3 == 0 else w[:j] + "x" + w[j + 1 :])
    got = engine.search_batch(queries, 0.25, 10, mode="candidates")
    want = engine.search_batch(queries, 0.25, 10, mode="dense")
    for q, g, w in zip(queries, got, want):
        gs = sorted((round(s, 5), len(k)) for k, s in zip(*g))
        ws = sorted((round(s, 5), len(k)) for k, s in zip(*w))
        assert gs == ws, (q, g, w)


def test_bitmap_duplicate_gram_multiplicity(host_engine):
    """Repeated query grams must accumulate multiply (nGramSearch.hpp:289)."""
    host, engine = host_engine
    got = engine.search_batch(["kakaka", "lolo"], 0.0, 10,
                              mode="candidates")
    want = engine.search_batch(["kakaka", "lolo"], 0.0, 10, mode="dense")
    for g, w in zip(got, want):
        gs = sorted((round(s, 5), len(k)) for k, s in zip(*g))
        ws = sorted((round(s, 5), len(k)) for k, s in zip(*w))
        assert gs == ws


def test_incidence_slabs_multislab_parity(host_engine):
    """Row-slabbed scatter (forced multi-slab via a tiny flat-index cap)
    must reproduce the single-slab tables bit for bit."""
    host, _ = host_engine
    bm, tl_pad = host.bitmap_tables()
    bm2 = np.asarray(_rm(bm))
    nb = bm2.shape[1]
    one = np.asarray(host._incidence_slabs(bm2.shape[0], nb, "bits"))
    np.testing.assert_array_equal(one, bm2)
    for cap in (nb, 3 * nb, 7 * nb + 13):
        many = np.asarray(
            host._incidence_slabs(bm2.shape[0], nb, "bits", max_flat=cap)
        )
        np.testing.assert_array_equal(many, one)
        # tile-major direct scatter ('bits3') == transpose of row-major,
        # across the same slab splits
        many3 = np.asarray(
            host._incidence_slabs(bm2.shape[0], nb, "bits3", max_flat=cap)
        )
        np.testing.assert_array_equal(
            many3.transpose(1, 0, 2).reshape(bm2.shape[0], nb), one
        )
    gm = np.asarray(host.gram_matrix(1 << 40))
    g, tl = gm.shape
    many = np.asarray(
        host._incidence_slabs(g, tl, "ones", max_flat=2 * tl)
    )
    np.testing.assert_array_equal(many, gm)


def test_bitmap_kernel_gtiled_parity(monkeypatch):
    """Multi-G-tile kernel (forced by a tiny GBLK) must accumulate to the
    same counts as the whole-table reference, both dot dtypes."""
    import jax.numpy as jnp

    from stringsearchlib_tpu.ops import bitmap_matmul as bm

    monkeypatch.setattr(bm, "GBLK", 256)
    monkeypatch.setattr(bm, "SBLK_MAX", 256)  # force tiling below 4096 rows
    rng = np.random.default_rng(5)
    gp, nb = 1024, 2 * bm.BLKB  # 4 G tiles x 2 T tiles
    planes = jnp.asarray(
        rng.integers(0, 256, size=(gp, nb), dtype=np.uint8).view(np.int8)
    )
    # respect the <= 127 count contract (hits <= n_qgrams): each query
    # activates <= 40 grams with multiplicities <= 3, spread across tiles
    qf = np.zeros((8, gp), np.float32)
    for r in range(8):
        cols = rng.choice(gp, 40, replace=False)
        qf[r, cols] = rng.integers(1, 4, 40)
    q = jnp.asarray(qf, dtype=jnp.bfloat16)
    want = np.asarray(bm.bitmap_hits_ref(q, planes))
    got = np.asarray(bm.bitmap_hits(q, planes, interpret=True))
    np.testing.assert_array_equal(got, want)
    got8 = np.asarray(
        bm.bitmap_hits(q, planes, interpret=True, int8_dots=True)
    )
    np.testing.assert_array_equal(got8, want)


def test_engine_compact_rows_parity(monkeypatch):
    """Gram-union row compaction through the ENGINE (kernel forced via
    interpret mode): results must match the dense path exactly, and the
    routing record must show a compact table."""
    import functools
    import random as _random

    import jax

    from stringsearchlib_tpu.search import candidates as cmod
    from stringsearchlib_tpu.search import engine as emod

    rng = _random.Random(9)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    words = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(8, 16)))
        for _ in range(4000)
    ]  # gram-rich: thousands of distinct trigrams
    host = build_index(words, 1, None, IndexConfig())
    # row compaction is a row-major-table trade (the engine declines it
    # on tile-major); pin the cache to the row-major layout to drive it
    bm3, tlp = host.bitmap_tables()
    host._bitmap_cache = (_rm(bm3), tlp)
    eng = SearchEngine(host)
    eng.GM_BUDGET = 0
    monkeypatch.setattr(
        cmod, "candidates_bitmap_mxu",
        functools.partial(cmod.candidates_bitmap_mxu, interpret=True),
    )
    monkeypatch.setattr(emod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(eng, "CAND_MIN_TERMS", 100)
    queries = [w[:-1] + "x" for w in words[:24]]
    got = eng.search_batch(queries, 0.25, 10, mode="candidates")
    assert eng.last_routing["variant"] == "bitmap_kernel"
    assert eng.last_routing["compact_rows"] > 0
    monkeypatch.setattr(emod.jax, "default_backend", jax.default_backend)
    want = eng.search_batch(queries, 0.25, 10, mode="dense")
    for q, g, w in zip(queries, got, want):
        gs = sorted((round(s, 5), len(k)) for k, s in zip(*g))
        ws = sorted((round(s, 5), len(k)) for k, s in zip(*w))
        assert gs == ws, (q, g, w)


def test_compact_gram_rows_remap():
    host = build_index(_corpus(300), 1, None, IndexConfig())
    eng = SearchEngine(host)
    slots = np.array([[5, 900, -1, 5], [70, -1, 900, 2]], np.int32)
    rows, remapped, gp_c = eng._compact_gram_rows(slots, 1 << 20)
    assert gp_c == 512 and rows.shape == (512,)
    used = sorted({5, 900, 70, 2})
    assert rows[:4].tolist() == used
    for (i, j), v in np.ndenumerate(slots):
        if v < 0:
            assert remapped[i, j] == -1
        else:
            assert rows[remapped[i, j]] == v
    # too-large union fraction declines
    assert eng._compact_gram_rows(slots, 1000) is None


def test_engine_virtual_bitmap_parity(monkeypatch):
    """Virtual per-batch compact bitmap (full table over budget): engine
    results must match the dense path; routing must show virtual=True."""
    import functools
    import random as _random

    import jax

    from stringsearchlib_tpu.search import candidates as cmod
    from stringsearchlib_tpu.search import engine as emod

    rng = _random.Random(17)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    words = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(8, 16)))
        for _ in range(4000)
    ]
    host = build_index(words, 1, None, IndexConfig())
    eng = SearchEngine(host)
    eng.GM_BUDGET = 0
    eng.BITMAP_BUDGET = 0  # full table "over budget" -> virtual route
    eng.BITMAP_VIRTUAL = True  # default-off (slow scatter build on TPU)
    eng.SKETCH_MIN_TERMS = 10**9  # keep the sketch out of the way
    monkeypatch.setattr(
        cmod, "candidates_bitmap_mxu",
        functools.partial(cmod.candidates_bitmap_mxu, interpret=True),
    )
    monkeypatch.setattr(emod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(eng, "CAND_MIN_TERMS", 100)
    queries = [w[:-1] + "x" for w in words[:24]]
    got = eng.search_batch(queries, 0.25, 10, mode="candidates")
    assert eng.last_routing["variant"] == "bitmap_kernel"
    assert eng.last_routing["virtual"] is True
    monkeypatch.setattr(emod.jax, "default_backend", jax.default_backend)
    want = eng.search_batch(queries, 0.25, 10, mode="dense")
    for q, g, w in zip(queries, got, want):
        gs = sorted((round(s, 5), len(k)) for k, s in zip(*g))
        ws = sorted((round(s, 5), len(k)) for k, s in zip(*w))
        assert gs == ws, (q, g, w)


def test_virtual_bitmap_rows_match_full_table(host_engine):
    """bitmap_rows_table row content == the full table's rows."""
    host, eng = host_engine
    bm, _ = host.bitmap_tables()
    full = np.asarray(_rm(bm))
    rng = np.random.default_rng(3)
    used = np.unique(rng.choice(host.n_grams, 40))
    rows = np.full(64, -1, np.int32)
    rows[: used.size] = used
    lens = host.host_posting_lens
    s_cap = 1 << 14
    assert int(lens[used].sum()) < s_cap
    got = np.asarray(host.bitmap_rows_table(rows, s_cap))
    np.testing.assert_array_equal(got[: used.size], full[used])
    assert not got[used.size :].any()  # pad rows carry no bits


def test_hstar_front_end_parity(host_engine):
    """Integer h*-threshold selection (candidates._hstar_finish) ==
    scan path on identical engine-shaped inputs: rows hstar marks exact
    must match the scan's ranked slices; at generous block budgets every
    row must be exact."""
    import jax.numpy as jnp

    from stringsearchlib_tpu.search.candidates import (
        candidates_bitmap, candidates_bitmap_mxu,
    )

    host, engine = host_engine
    assert host.uniform_weights
    di = host.device
    bm, _ = host.bitmap_tables()
    pt, xt = host.prim_tables()
    words = host.key_strings.tolist()
    rng = random.Random(13)
    queries = []
    for i in range(8):
        w = words[rng.randrange(len(words))]
        queries.append(w if i % 2 else w[:-1] + "x")
    items = []
    for pos, q in enumerate(queries):
        qnorm, qlen = engine._normalize_query(q)
        promo = host.promo_key_ids(qnorm, qlen)
        items.append((pos, qnorm, qlen, promo))
    b, qtok, qlens, slots_a, nqg_a, use_short, _ = engine._prep_rows(
        items, 32
    )
    promo_a = np.full((b, engine.PROMO_KEYS), -1, np.int32)
    for r, it in enumerate(items):
        promo_a[r, : it[3].size] = it[3]
    promo_t, promo_w = engine._promo_tables(promo_a)
    lim = np.full((b,), 10, np.int32)
    args = (
        di, bm, pt, xt, jnp.asarray(qtok), jnp.asarray(qlens),
        jnp.asarray(slots_a), jnp.asarray(nqg_a), jnp.asarray(use_short),
        jnp.asarray(promo_a), jnp.asarray(promo_t), jnp.asarray(promo_w),
        jnp.asarray(lim), np.float32(0.25),
    )
    # generous budgets AND a covering n_cand: every row exact, full parity
    base = dict(compute_short=True, n_cand=4096, n_edge=32, top_k=16)
    want = [np.asarray(x) for x in candidates_bitmap(*args, **base)]
    got = [np.asarray(x) for x in candidates_bitmap_mxu(
        *args, interpret=True, hstar=True, kb1=64, kb2=64, **base
    )]
    assert got[4].all(), "generous budgets must cover every row"
    np.testing.assert_array_equal(got[0], want[0])
    for r in range(b):
        n = min(int(got[0][r]), got[1].shape[1])
        gs = sorted(zip(np.round(got[2][r][:n], 5), got[3][r][:n]))
        ws = sorted(zip(np.round(want[2][r][:n], 5), want[3][r][:n]))
        assert gs == ws, (queries[r], gs, ws)
    # starved budgets + narrow n_cand: exact rows still match; inexact
    # rows are allowed (the engine escalates them)
    base["n_cand"] = 64
    got2 = [np.asarray(x) for x in candidates_bitmap_mxu(
        *args, interpret=True, hstar=True, kb1=2, kb2=4, **base
    )]
    for r in range(b):
        if not got2[4][r]:
            continue
        # guard-pass (not covered) rows clamp count to limit; covered rows
        # report the true reached count — min(count, limit) matches either
        # way, which is all the host emits
        assert min(int(got2[0][r]), 10) == min(int(want[0][r]), 10)
        n = min(int(got2[0][r]), 10, got2[1].shape[1])
        gs = sorted(zip(np.round(got2[2][r][:n], 5), got2[3][r][:n]))
        ws = sorted(zip(np.round(want[2][r][:n], 5), want[3][r][:n]))
        assert gs == ws, (queries[r], gs, ws)


def test_gather_rows_dma_interpret(host_engine):
    """Pipelined-DMA row gather (interpret mode) == jnp.take."""
    import jax.numpy as jnp

    from stringsearchlib_tpu.ops.bitmap_matmul import gather_rows_dma

    host, _ = host_engine
    bm = _rm(host.bitmap_tables()[0])  # the DMA gather is row-major-only
    gp = _gp(bm)
    rng = np.random.default_rng(3)
    rows = jnp.asarray(
        np.sort(rng.choice(gp, 48, replace=False)).astype(np.int32)
    )
    got = np.asarray(gather_rows_dma(bm, rows, interpret=True))
    want = np.asarray(jnp.take(bm, rows, axis=0))
    np.testing.assert_array_equal(got, want)


def test_bitmap_gather_front_end_parity(host_engine):
    """Gathered-row front end == scan front end on identical
    engine-shaped inputs (hits from the batch's own gram rows)."""
    import jax.numpy as jnp

    from stringsearchlib_tpu.search.candidates import (
        candidates_bitmap, candidates_bitmap_gather,
    )

    host, engine = host_engine
    di = host.device
    bm, _ = host.bitmap_tables()
    pt, xt = host.prim_tables()
    words = host.key_strings.tolist()
    rng = random.Random(23)
    queries = []
    for i in range(8):
        w = words[rng.randrange(len(words))]
        queries.append(w if i % 2 else w[:-1] + "x")
    items = []
    for pos, q in enumerate(queries):
        qnorm, qlen = engine._normalize_query(q)
        promo = host.promo_key_ids(qnorm, qlen)
        items.append((pos, qnorm, qlen, promo))
    b, qtok, qlens, slots_a, nqg_a, use_short, _ = engine._prep_rows(
        items, 32, min_b=8
    )
    promo_a = np.full((b, engine.PROMO_KEYS), -1, np.int32)
    for r, it in enumerate(items):
        promo_a[r, : it[3].size] = it[3]
    promo_t, promo_w = engine._promo_tables(promo_a)
    lim = np.full((b,), 10, np.int32)
    plan = engine._gather_rows_plan(slots_a)
    assert plan is not None
    rows, slots_g, gc = plan
    base = dict(compute_short=True, n_cand=2048, n_edge=32, top_k=16)
    want = [np.asarray(x) for x in candidates_bitmap(
        di, bm, pt, xt, jnp.asarray(qtok), jnp.asarray(qlens),
        jnp.asarray(slots_a), jnp.asarray(nqg_a), jnp.asarray(use_short),
        jnp.asarray(promo_a), jnp.asarray(promo_t), jnp.asarray(promo_w),
        jnp.asarray(lim), np.float32(0.25), **base,
    )]
    for hstar in (False, True):
        kw = dict(base)
        if hstar:
            kw.update(hstar=True, kb1=64, kb2=64)
        got = [np.asarray(x) for x in candidates_bitmap_gather(
            di, bm, jnp.asarray(rows), pt, xt, jnp.asarray(qtok),
            jnp.asarray(qlens), jnp.asarray(slots_g), jnp.asarray(nqg_a),
            jnp.asarray(use_short), jnp.asarray(promo_a),
            jnp.asarray(promo_t), jnp.asarray(promo_w), jnp.asarray(lim),
            np.float32(0.25), interpret=True, **kw,
        )]
        assert got[4].all(), f"hstar={hstar}: every row must be exact"
        np.testing.assert_array_equal(got[0], want[0])
        for r in range(b):
            n = min(int(got[0][r]), got[1].shape[1])
            gs = sorted(zip(np.round(got[2][r][:n], 5), got[3][r][:n]))
            ws = sorted(zip(np.round(want[2][r][:n], 5), want[3][r][:n]))
            assert gs == ws, (hstar, queries[r] if r < 8 else r, gs, ws)


def test_engine_gather_routing(monkeypatch):
    """Small batches route the gathered-row front end (variant
    bitmap_gather) and match the dense path exactly."""
    import functools

    import jax

    from stringsearchlib_tpu.search import candidates as cmod
    from stringsearchlib_tpu.search import engine as emod

    host = build_index(_corpus(3000, seed=61), 1, None, IndexConfig())
    eng = SearchEngine(host)
    eng.GM_BUDGET = 0
    eng.BITMAP_GATHER_TMAJ = True  # tile-major default routes the kernel
    monkeypatch.setattr(cmod, "GATHER_IMPL", "take")
    monkeypatch.setattr(
        cmod, "candidates_bitmap_gather",
        functools.partial(cmod.candidates_bitmap_gather, interpret=True),
    )
    monkeypatch.setattr(emod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(eng, "CAND_MIN_TERMS", 100)
    words = host.key_strings.tolist()
    rng = random.Random(3)
    for nq in (1, 2, 8):
        queries = []
        for i in range(nq):
            w = words[rng.randrange(len(words))]
            queries.append(w if i % 2 else w[:-1] + "x")
        got = eng.search_batch(queries, 0.25, 10, mode="candidates")
        assert eng.last_routing["variant"] == "bitmap_gather", (
            nq, eng.last_routing)
        assert eng.last_routing["gather_rows"] >= 32
        monkeypatch.setattr(emod.jax, "default_backend", jax.default_backend)
        want = eng.search_batch(queries, 0.25, 10, mode="dense")
        monkeypatch.setattr(emod.jax, "default_backend", lambda: "tpu")
        for q, g, w in zip(queries, got, want):
            gs = sorted((round(s, 5), len(k)) for k, s in zip(*g))
            ws = sorted((round(s, 5), len(k)) for k, s in zip(*w))
            assert gs == ws, (nq, q, g, w)


def test_hstar_retry_from_retained_hits(host_engine):
    """hstar_retry on rows taken from a keep_hits first pass == a full
    front-end pass at the same generous budgets (the retained hit counts
    are bit-identical, so selection-only escalation is exact)."""
    import jax.numpy as jnp

    from stringsearchlib_tpu.search.candidates import (
        candidates_bitmap_mxu, hstar_retry,
    )

    host, engine = host_engine
    di = host.device
    bm, _ = host.bitmap_tables()
    pt, xt = host.prim_tables()
    words = host.key_strings.tolist()
    rng = random.Random(17)
    queries = []
    for i in range(8):
        w = words[rng.randrange(len(words))]
        queries.append(w if i % 2 else w[:-1] + "x")
    items = []
    for pos, q in enumerate(queries):
        qnorm, qlen = engine._normalize_query(q)
        promo = host.promo_key_ids(qnorm, qlen)
        items.append((pos, qnorm, qlen, promo))
    b, qtok, qlens, slots_a, nqg_a, use_short, _ = engine._prep_rows(
        items, 32
    )
    promo_a = np.full((b, engine.PROMO_KEYS), -1, np.int32)
    for r, it in enumerate(items):
        promo_a[r, : it[3].size] = it[3]
    promo_t, promo_w = engine._promo_tables(promo_a)
    lim = np.full((b,), 10, np.int32)
    args = (
        di, bm, pt, xt, jnp.asarray(qtok), jnp.asarray(qlens),
        jnp.asarray(slots_a), jnp.asarray(nqg_a), jnp.asarray(use_short),
        jnp.asarray(promo_a), jnp.asarray(promo_t), jnp.asarray(promo_w),
        jnp.asarray(lim), np.float32(0.25),
    )
    base = dict(compute_short=True, n_cand=4096, n_edge=32, top_k=16)
    want = [np.asarray(x) for x in candidates_bitmap_mxu(
        *args, interpret=True, hstar=True, kb1=64, kb2=64, **base
    )]
    assert want[4].all()
    # starved first pass retains hits/hmax; some rows must fail its guard
    got = candidates_bitmap_mxu(
        *args, interpret=True, hstar=True, kb1=1, kb2=1, keep_hits=True,
        **base,
    )
    assert len(got) == 7
    failed = np.flatnonzero(~np.asarray(got[4]))
    assert failed.size, "starved budgets should fail at least one guard"
    idx = jnp.asarray(
        np.concatenate([failed, failed[:1].repeat(8 - failed.size % 8)])
        if failed.size % 8 else failed
    )
    re = [np.asarray(x) for x in hstar_retry(
        di, jnp.take(got[5], idx, axis=0), jnp.take(got[6], idx, axis=0),
        pt, xt,
        jnp.asarray(qtok)[idx], jnp.asarray(qlens)[idx],
        jnp.asarray(nqg_a)[idx], jnp.asarray(use_short)[idx],
        jnp.asarray(promo_a)[idx], jnp.asarray(promo_t)[idx],
        jnp.asarray(promo_w)[idx], jnp.asarray(lim)[idx],
        np.float32(0.25),
        compute_short=True, kb1=64, kb2=64, n_cand=4096, top_k=16,
        n_edge=32, vmax=int(slots_a.shape[1]),
    )]
    assert re[4][: failed.size].all(), "generous retry must cover"
    for p, r in enumerate(failed):
        assert int(re[0][p]) == int(want[0][r])
        n = min(int(re[0][p]), 16)
        gs = sorted(zip(np.round(re[2][p][:n], 5), re[3][p][:n]))
        ws = sorted(zip(np.round(want[2][r][:n], 5), want[3][r][:n]))
        assert gs == ws, (queries[r], gs, ws)


def test_engine_hstar_selection_retry(monkeypatch):
    """Starved first-pass budgets escalate through _hstar_sel_retry (the
    retained-hits selection-only pass), results stay dense-exact, and the
    routing record shows the retry."""
    import functools

    import jax

    from stringsearchlib_tpu.search import candidates as cmod
    from stringsearchlib_tpu.search import engine as emod

    host = build_index(_corpus(3000, seed=47), 1, None, IndexConfig())
    eng = SearchEngine(host)
    eng.GM_BUDGET = 0
    monkeypatch.setattr(
        cmod, "candidates_bitmap_mxu",
        functools.partial(cmod.candidates_bitmap_mxu, interpret=True),
    )
    monkeypatch.setattr(emod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(eng, "CAND_MIN_TERMS", 100)
    monkeypatch.setattr(eng, "HSTAR_KB1", 1)
    monkeypatch.setattr(eng, "HSTAR_KB2", 1)
    sel_calls = []
    orig = eng._hstar_sel_retry

    def spy(sel_ctx, threshold, limit, out):
        sel_calls.append(len(sel_ctx["fails"]))
        return orig(sel_ctx, threshold, limit, out)

    monkeypatch.setattr(eng, "_hstar_sel_retry", spy)
    words = host.key_strings.tolist()
    rng = random.Random(7)
    queries = []
    for i in range(24):
        w = words[rng.randrange(len(words))]
        j = rng.randrange(max(len(w) - 1, 1))
        queries.append(w if i % 3 == 0 else w[:j] + "x" + w[j + 1:])
    got = eng.search_batch(queries, 0.25, 10, mode="candidates")
    assert sel_calls and sel_calls[0] > 0, "selection retry never ran"
    assert "retry_sel" in eng.last_routing
    monkeypatch.setattr(emod.jax, "default_backend", jax.default_backend)
    want = eng.search_batch(queries, 0.25, 10, mode="dense")
    for q, g, w in zip(queries, got, want):
        gs = sorted((round(s, 5), len(k)) for k, s in zip(*g))
        ws = sorted((round(s, 5), len(k)) for k, s in zip(*w))
        assert gs == ws, (q, g, w)


def test_engine_hstar_parity(monkeypatch):
    """h* selection through the ENGINE (kernel forced via interpret mode):
    results match the dense path exactly and routing records hstar."""
    import functools

    import jax

    from stringsearchlib_tpu.search import candidates as cmod
    from stringsearchlib_tpu.search import engine as emod

    host = build_index(_corpus(3000, seed=31), 1, None, IndexConfig())
    assert host.uniform_weights
    eng = SearchEngine(host)
    eng.GM_BUDGET = 0
    used = []
    wrapped = functools.partial(cmod.candidates_bitmap_mxu, interpret=True)

    def recording(*a, **kw):
        used.append(bool(kw.get("hstar")))
        return wrapped(*a, **kw)

    monkeypatch.setattr(cmod, "candidates_bitmap_mxu", recording)
    monkeypatch.setattr(emod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(eng, "CAND_MIN_TERMS", 100)
    monkeypatch.setattr(eng, "HSTAR_KB1", 4)
    monkeypatch.setattr(eng, "HSTAR_KB2", 8)
    words = host.key_strings.tolist()
    rng = random.Random(5)
    queries = []
    for i in range(24):
        w = words[rng.randrange(len(words))]
        j = rng.randrange(max(len(w) - 1, 1))
        queries.append(w if i % 3 == 0 else w[:j] + "x" + w[j + 1:])
    got = eng.search_batch(queries, 0.25, 10, mode="candidates")
    assert any(used), "h* selection never dispatched"
    monkeypatch.setattr(emod.jax, "default_backend", jax.default_backend)
    want = eng.search_batch(queries, 0.25, 10, mode="dense")
    for q, g, w in zip(queries, got, want):
        gs = sorted((round(s, 5), len(k)) for k, s in zip(*g))
        ws = sorted((round(s, 5), len(k)) for k, s in zip(*w))
        assert gs == ws, (q, g, w)


def test_hstar_gated_off_for_weighted_index(monkeypatch):
    """Non-uniform weights must keep h* selection off (its guard bound is
    only sound when every edge weight == 1)."""
    import functools

    from stringsearchlib_tpu.search import candidates as cmod
    from stringsearchlib_tpu.search import engine as emod

    words = _corpus(1200, seed=33)
    w = np.ones(len(words))
    w[::7] = 0.5
    host = build_index(words, 1, w, IndexConfig())
    assert not host.uniform_weights
    eng = SearchEngine(host)
    eng.GM_BUDGET = 0
    monkeypatch.setattr(
        cmod, "candidates_bitmap_mxu",
        functools.partial(cmod.candidates_bitmap_mxu, interpret=True),
    )
    monkeypatch.setattr(cmod, "GATHER_IMPL", "take")
    monkeypatch.setattr(
        cmod, "candidates_bitmap_gather",
        functools.partial(cmod.candidates_bitmap_gather, interpret=True),
    )
    monkeypatch.setattr(emod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(eng, "CAND_MIN_TERMS", 100)
    # two queries route the gathered front end (forced on tile-major);
    # h* must stay off there too
    eng.BITMAP_GATHER_TMAJ = True
    eng.search_batch(
        [words[0][:-1] + "x", words[1][:-1] + "x"], 0.25, 10,
        mode="candidates",
    )
    assert eng.last_routing["variant"] == "bitmap_gather"
    assert eng.last_routing["hstar"] is False
    eng.BITMAP_GATHER_TMAJ = False
    # and a full-size batch keeps h* off on the kernel route as well
    eng.search_batch(
        [w[:-1] + "x" for w in words[:12]], 0.25, 10, mode="candidates",
    )
    assert eng.last_routing["variant"] == "bitmap_kernel"
    assert eng.last_routing["hstar"] is False


def test_bitmap_kernel_pair_dots(host_engine):
    """Two bit planes per int8 operand (int8_dots="pair") must reproduce
    the reference counts exactly while total query windows <= 31."""
    import jax.numpy as jnp

    from stringsearchlib_tpu.ops.bitmap_matmul import (
        bitmap_hits, bitmap_hits_bmax, bitmap_hits_ref,
    )

    host, _ = host_engine
    bm, _ = host.bitmap_tables()
    gp = _gp(bm)
    rng = np.random.default_rng(17)
    qcnt = np.zeros((16, gp), np.float32)
    for r in range(16):
        # total windows <= 31 (the pair-pack exactness condition)
        cols = rng.choice(gp, size=12, replace=False)
        qcnt[r, cols] = rng.integers(1, 3, size=12)
        assert qcnt[r].sum() <= 31
    q = jnp.asarray(qcnt, dtype=jnp.bfloat16)
    want = np.asarray(bitmap_hits_ref(q, bm))
    got = np.asarray(bitmap_hits(q, bm, interpret=True, int8_dots="pair"))
    np.testing.assert_array_equal(got, want)
    hits2, bmax = bitmap_hits_bmax(q, bm, interpret=True, int8_dots="pair")
    np.testing.assert_array_equal(np.asarray(hits2), want)


def test_bitmap_kernel_pair_dots_gtiled(monkeypatch):
    """Paired dots under G-tiling: per-tile partials unpack before the
    int8 accumulation, so multi-tile totals stay exact."""
    import jax.numpy as jnp

    from stringsearchlib_tpu.ops import bitmap_matmul as bmod

    host = build_index(_corpus(1500, seed=41), 1, None, IndexConfig())
    bm, _ = host.bitmap_tables()
    gp = _gp(bm)
    monkeypatch.setattr(bmod, "SBLK_MAX", 128)
    monkeypatch.setattr(bmod, "GBLK", 128)
    assert gp % 128 == 0 and gp // 128 > 1
    rng = np.random.default_rng(23)
    qcnt = np.zeros((8, gp), np.float32)
    for r in range(8):
        cols = rng.choice(gp, size=10, replace=False)
        qcnt[r, cols] = rng.integers(1, 3, size=10)
    q = jnp.asarray(qcnt, dtype=jnp.bfloat16)
    want = np.asarray(bmod.bitmap_hits_ref(q, bm))
    got = np.asarray(
        bmod.bitmap_hits(q, bm, interpret=True, int8_dots="pair")
    )
    np.testing.assert_array_equal(got, want)


def test_gather_rows_pallas_matches_take(host_engine):
    import jax.numpy as jnp

    from stringsearchlib_tpu.ops.bitmap_matmul import gather_rows_pallas

    host, _ = host_engine
    bm = _rm(host.bitmap_tables()[0])  # the row-DMA gather is row-major-only
    rng = np.random.default_rng(9)
    rows = rng.integers(0, bm.shape[0], size=64).astype(np.int32)
    got = np.asarray(
        gather_rows_pallas(bm, jnp.asarray(rows), interpret=True)
    )
    want = np.asarray(bm)[rows]
    np.testing.assert_array_equal(got, want)


def test_bitmap_kernel_tile_major_parity(host_engine):
    """Tile-major (ntiles, G, BLKB) tables must produce identical hits
    and blockmax to the row-major layout for every dot mode."""
    import jax.numpy as jnp

    from stringsearchlib_tpu.ops.bitmap_matmul import (
        bitmap_hits, bitmap_hits_bmax, to_tile_major,
    )

    host, _ = host_engine
    bm3, _ = host.bitmap_tables()
    assert bm3.ndim == 3  # resident layout is tile-major
    bm2 = _rm(bm3)
    np.testing.assert_array_equal(
        np.asarray(to_tile_major(bm2)), np.asarray(bm3)
    )
    gp = _gp(bm3)
    rng = np.random.default_rng(29)
    qcnt = np.zeros((16, gp), np.float32)
    for r in range(16):
        cols = rng.choice(gp, size=12, replace=False)
        qcnt[r, cols] = rng.integers(1, 3, size=12)
    q = jnp.asarray(qcnt, dtype=jnp.bfloat16)
    for dots in (False, True, "pair"):
        want = np.asarray(bitmap_hits(q, bm2, interpret=True,
                                      int8_dots=dots))
        got = np.asarray(bitmap_hits(q, bm3, interpret=True,
                                     int8_dots=dots))
        np.testing.assert_array_equal(got, want)
    h2, b2 = bitmap_hits_bmax(q, bm2, interpret=True, int8_dots="pair")
    h3, b3 = bitmap_hits_bmax(q, bm3, interpret=True, int8_dots="pair")
    np.testing.assert_array_equal(np.asarray(h3), np.asarray(h2))
    np.testing.assert_array_equal(np.asarray(b3), np.asarray(b2))
