"""Engine conformance: the compiled pipeline must match the oracle exactly.

Covers the golden fixture, tier interactions, promotion, thresholds,
wildcards, weights, gram sizes 2-4, and randomized property tests
(SURVEY section 4).
"""

import random

import numpy as np
import pytest

from stringsearchlib_tpu.config import IndexConfig
from stringsearchlib_tpu.index.build import build_index
from stringsearchlib_tpu.search.engine import SearchEngine
from stringsearchlib_tpu.utils.oracle import OracleIndex

FIXTURE = ["LWMS", "LWM", "LWMA", "LWYY", "L", "I", "GHRSDGSDGS Egdsrtg g"]


def make_pair(words, row_size=1, weights=None, gram_size=3, wide=False):
    cfg = IndexConfig(gram_size=gram_size, wide=wide)
    host = build_index(words, row_size, weights, cfg)
    oracle = OracleIndex(words, row_size, weights, gram_size=gram_size, wide=wide)
    return SearchEngine(host), oracle


def assert_match(engine, oracle, query, threshold=0.0, limit=0, msg=""):
    got_s, got_v = engine.search(query, threshold, limit)
    want_s, want_v = oracle.search(query, threshold, limit)
    ctx = f"{msg} query={query!r} thr={threshold} limit={limit}"
    assert len(got_s) == len(want_s), f"{ctx}: count {len(got_s)} != {len(want_s)}"
    assert got_s == want_s, f"{ctx}: strings {got_s} != {want_s}"
    np.testing.assert_allclose(got_v, want_v, rtol=0, atol=1e-6, err_msg=ctx)


def test_fixture_anchors():
    engine, oracle = make_pair(FIXTURE)
    assert engine.host.n_terms == 7
    assert engine.host.n_grams == 16
    got_s, got_v = engine.search("LWMS", 0.5, 0)
    assert len(got_s) == 4
    assert got_s[0] == "LWMS" and got_v[0] == 100.0
    assert_match(engine, oracle, "LWMS", 0.5, 0)


@pytest.mark.parametrize("query", [
    "LWMS", "LWM", "lwms", "  lwms  ", "LW", "L", "*", "", "!!!",
    "GHRSDGSDGS Egdsrtg g", "ghrsdgsdgs", "SDGS", "XYZQ", "LWMSLWMSLWMS",
])
@pytest.mark.parametrize("threshold", [0.0, 0.3, 0.5, 0.75, 1.0])
def test_fixture_queries(query, threshold):
    engine, oracle = make_pair(FIXTURE)
    assert_match(engine, oracle, query, threshold, 0)
    assert_match(engine, oracle, query, threshold, 3)


def test_master_key_rows():
    words = ["Widget A", "wdgt", "gadget a", "Widget B", "wb", "small b"]
    engine, oracle = make_pair(words, row_size=3)
    for q in ["WDGT", "wb", "widget", "gadget a", "small", "*"]:
        assert_match(engine, oracle, q)


def test_weights():
    words = ["keyA", "altA", "keyB", "altB"]
    weights = [1.0, 0.25, 0.5, 0.0]
    engine, oracle = make_pair(words, row_size=2, weights=weights)
    for q in ["ALTA", "ALTB", "KEYA", "keyb", "*", "alt"]:
        for thr in [0.0, 0.2, 0.3]:
            assert_match(engine, oracle, q, thr)


def test_limit_and_threshold_edges():
    engine, oracle = make_pair(FIXTURE)
    for limit in [1, 2, 4, 7, 100]:
        assert_match(engine, oracle, "LWMS", 0.5, limit)
    # threshold exactly at a score keeps it (strict '<' drop)
    assert_match(engine, oracle, "LWMS", 0.75, 0)


def test_short_query_brute_force():
    words = ["ABCDEFGH", "ABX", "xxABCyy zz", "A B C"]
    engine, oracle = make_pair(words)
    for q in ["ABC", "AB", "A", "X", "ZZ"]:
        assert_match(engine, oracle, q, 0.0)
        assert_match(engine, oracle, q, 0.5)


def test_gram_sizes():
    words = ["alpha beta", "alphabet soup", "beta", "soup", "al", "be"]
    for g in [2, 3, 4]:
        engine, oracle = make_pair(words, gram_size=g)
        for q in ["alpha", "bet", "soup", "alphabet", "zz", "a"]:
            assert_match(engine, oracle, q, 0.0, msg=f"g={g}")
            assert_match(engine, oracle, q, 0.4, msg=f"g={g}")


def test_wide():
    words = ["北京烤鸭店", "Càfé au lait", "tokyo tower", "烤鸭"]
    engine, oracle = make_pair(words, wide=True)
    for q in ["北京烤鸭", "càfé", "CAFE", "tokyo", "烤鸭", "鸭"]:
        assert_match(engine, oracle, q, 0.0)
        assert_match(engine, oracle, q, 0.3)


def test_wide_gram4():
    words = ["北京烤鸭店在北京", "東京タワーの近く", "普通的词条内容"]
    engine, oracle = make_pair(words, wide=True, gram_size=4)
    for q in ["北京烤鸭", "タワー", "普通", "XXXX"]:
        assert_match(engine, oracle, q, 0.0, msg="wide g4")


def test_exact_promotion_requires_case_match():
    # stored key is not uppercased before the comparison
    # (nGramSearch.hpp:330-332): lowercase keys never promote.
    engine, oracle = make_pair(["widget", "WIDGET2"])
    assert_match(engine, oracle, "widget", 0.5)
    s, v = engine.search("widget", 0.5)
    assert v[0] < 100.0  # "widget" != "WIDGET"
    s2, v2 = engine.search("WIDGET2", 0.5)
    assert v2[0] == 100.0


def test_not_indexed():
    engine, _ = make_pair(["only"])
    assert engine.search("only") == ([], [])


_ALPHABET = "ABCDEFab01.% "


def _rand_word(rng, lo=1, hi=14):
    return "".join(rng.choice(_ALPHABET) for _ in range(rng.randint(lo, hi)))


@pytest.mark.parametrize("seed", range(6))
def test_property_random_corpus(seed):
    rng = random.Random(seed)
    n = rng.randint(4, 40)
    row_size = rng.choice([1, 1, 2, 3])
    words = []
    for _ in range(n):
        w = _rand_word(rng)
        words.append(None if rng.random() < 0.05 else w)
    weights = None
    if rng.random() < 0.5:
        weights = [round(rng.random() * 2, 3) for _ in words]
    g = rng.choice([2, 3, 3])
    engine, oracle = make_pair(words, row_size=row_size, weights=weights, gram_size=g)

    queries = ["*", "", "zz"]
    for _ in range(12):
        base = rng.choice([w for w in words if w] or ["x"])
        mode = rng.random()
        if mode < 0.4:
            q = base
        elif mode < 0.7:  # substring
            i = rng.randrange(len(base))
            q = base[i : i + rng.randint(1, 8)]
        else:  # mutation
            chars = list(base)
            for _ in range(rng.randint(1, 3)):
                chars[rng.randrange(len(chars))] = rng.choice(_ALPHABET)
            q = "".join(chars)
        queries.append(q)

    for q in queries:
        thr = rng.choice([0.0, 0.2, 0.5])
        limit = rng.choice([0, 1, 5])
        assert_match(engine, oracle, q, thr, limit, msg=f"seed={seed}")


def test_single_query_candidate_routing_matches_dense():
    """Large-index single queries route through the candidate batch path;
    force the routing on a small corpus and compare with the dense path."""
    import random

    from stringsearchlib_tpu.utils.oracle import OracleIndex

    rng = random.Random(42)
    words = [
        "".join(rng.choice("abcdefgh ij.") for _ in range(rng.randint(2, 14)))
        for _ in range(300)
    ]
    engine, oracle = make_pair(words)
    engine.CAND_MIN_TERMS = 0  # instance attr shadows the class threshold
    for q in ["abcd", "efgh ij", "abcdefgh", "zzzz"]:
        got = engine.search(q, 0.25, 10)
        ws, wsc = oracle.search(q, 0.25, 10)
        got_c = sorted(zip([round(s, 4) for s in got[1]], map(len, got[0])))
        want_c = sorted(zip([round(s, 4) for s in wsc], map(len, ws)))
        assert got_c == want_c, (q, got, ws)


def test_tiny_batch_runs_override_parity():
    """Small batches on gm-less large indexes take the sorted-runs front
    end (fixed full-table streams are wasteful per query); results must
    match the dense path exactly.  Thresholds lowered to engage the
    route on a test-sized corpus."""
    import numpy as np

    from stringsearchlib_tpu.config import IndexConfig
    from stringsearchlib_tpu.index.build import build_index
    from stringsearchlib_tpu.search.engine import SearchEngine

    rng = np.random.default_rng(17)
    alpha = list("ABCDEFGH")
    words = [
        "".join(rng.choice(alpha, size=rng.integers(6, 16)))
        for _ in range(3000)
    ]
    host = build_index(words, 1, None, IndexConfig())
    eng = SearchEngine(host)
    eng.GM_BUDGET = 0
    eng.SKETCH_MIN_TERMS = 1  # let tiny_runs engage at test size
    queries = [words[i][:-1] + "X" for i in range(5)]  # b_all <= 8
    got = eng.search_batch(queries, 0.25, 10, mode="candidates")
    dense = SearchEngine(host).search_batch(queries, 0.25, 10, mode="dense")
    for q, g, w in zip(queries, got, dense):
        gs = sorted((round(s, 5), len(k)) for k, s in zip(*g))
        ws = sorted((round(s, 5), len(k)) for k, s in zip(*w))
        assert gs == ws, (q, g, w)


def test_promotion_beyond_eight_keys():
    """More than PROMO_KEYS raw keys normalizing to the same text must ALL
    promote to 100 (a fixed-width promo slice silently dropped the 9th+;
    the reference promotes every matching key, nGramSearch.hpp:328-336)."""
    import numpy as np

    from stringsearchlib_tpu.utils.oracle import OracleIndex

    # 12 distinct raw keys whose escapeBlank text is identically "KEY X"
    # (each invalid char maps to a space; trims are no-ops)
    variants = [f"KEY{c}X" for c in "_-#!&*()+=[]"]
    words = variants + ["KEY XQ", "OTHERWORD", "PADDING TERM HERE"]
    host = build_index(words, 1, None, IndexConfig())
    eng = SearchEngine(host)
    oracle = OracleIndex(words, 1)
    for limit in (0, 20):
        got_k, got_s = eng.search("KEY X", 0.1, limit)
        want_k, want_s = oracle.search("KEY X", 0.1, limit)
        promoted = [k for k, s in zip(got_k, got_s) if s == 100.0]
        want_prom = [k for k, s in zip(want_k, want_s) if s == 100.0]
        assert sorted(promoted) == sorted(want_prom)
        assert len(promoted) == 12, (limit, got_k, got_s)
    # batched path too
    (bk, bs), = eng.search_batch(["KEY X"], 0.1, 20)
    assert sum(1 for s in bs if s == 100.0) == 12
