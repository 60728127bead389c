"""Batched search must match the single-query path exactly."""

import numpy as np

from stringsearchlib_tpu.config import IndexConfig
from stringsearchlib_tpu.index.build import build_index
from stringsearchlib_tpu.search.engine import SearchEngine

WORDS = [
    "telephone", "telegraph", "photograph", "telescope", "microphone",
    "LWMS", "LWM", "LWMA", "LWYY", "L", "I", "GHRSDGSDGS Egdsrtg g",
    "Widget Alpha", "wdgt", "acme sensor 42", "a b c",
]

QUERIES = [
    "telephon", "graph", "LWMS", "tele", "a", "zz", "wdgt", "*", "",
    "acme sensor", "!!!", "LW", "GHRSDGSDGS EGDSRTG G",
    "x" * 40,  # over the qp bucket -> single-path fallback
]


def test_batch_matches_single():
    host = build_index(WORDS, 1, None, IndexConfig())
    engine = SearchEngine(host)
    for threshold in (0.0, 0.3):
        for limit in (0, 5, 100):
            batched = engine.search_batch(QUERIES, threshold, limit)
            for q, got in zip(QUERIES, batched):
                want = engine.search(q, threshold, limit)
                assert got[0] == want[0], (q, threshold, limit, got, want)
                np.testing.assert_allclose(got[1], want[1], atol=1e-6)


def test_long_queries_batch_in_groups():
    """Queries past qp_bucket batch in pow2-width groups (round 1 paid
    one dispatch per long query) and match the single path exactly."""
    host = build_index(WORDS, 1, None, IndexConfig())
    engine = SearchEngine(host)
    long_qs = [
        "GHRSDGSDGS EGDSRTG G PHOTOGRAPH TELESCOPE",
        "telephone telegraph photograph " * 2,
        "x" * 45,
        "WIDGET ALPHA ACME SENSOR 42 MICROPHONE EXTRA",
        "tele",  # short one mixed in
    ]
    got = engine.search_batch(long_qs, 0.2, 10, qp_bucket=16)
    for q, g in zip(long_qs, got):
        want = engine.search(q, 0.2, 10)
        assert g[0] == want[0], q
        np.testing.assert_allclose(g[1], want[1], atol=1e-6)


def test_batch_bucketing():
    host = build_index(WORDS, 1, None, IndexConfig())
    engine = SearchEngine(host)
    queries = ["telephon"] * 37  # pads to a pow2 batch with dummies
    res = engine.search_batch(queries, 0.3, 10, batch_bucket=16)
    want = engine.search("telephon", 0.3, 10)
    for got in res:
        assert got[0] == want[0]


def _rand_words(rng, n):
    import string

    alphabet = string.ascii_letters + " .%"
    return [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 18)))
        for _ in range(n)
    ]


def test_candidate_front_ends_match_oracle():
    """Both candidate front ends (MXU matmul + sorted runs) are exact."""
    import random

    from stringsearchlib_tpu.utils.oracle import OracleIndex

    rng = random.Random(5)
    words = _rand_words(rng, 3000)
    weights = [0.5 if rng.random() < 0.2 else 1.0 for _ in range(3000)]
    host = build_index(words, 2, weights, IndexConfig())
    oracle = OracleIndex(words, row_size=2, weights=weights)
    engine = SearchEngine(host)
    queries = [words[rng.randrange(3000)][: rng.randint(4, 12)] for _ in range(8)]
    queries += ["zzzz9", words[0]]

    def run(label):
        outs = engine.search_batch(queries, 0.25, 20, mode="candidates")
        for q, (r, s) in zip(queries, outs):
            ws, wsc = oracle.search(q, 0.25, 20)
            got = sorted(zip([round(float(x), 4) for x in s], [len(k) for k in r]))
            want = sorted(zip([round(v, 4) for v in wsc], [len(k) for k in ws]))
            assert got == want, (label, q, r[:3], ws[:3])

    assert host.gram_matrix() is not None
    run("matmul")
    host._gram_matrix_cache = False  # force the sorted-runs front end
    run("runs")


def test_gram_matrix_budget():
    host = build_index(WORDS, 1, None, IndexConfig())
    assert host.gram_matrix(budget_bytes=1) is None  # over budget -> None
    # and the over-budget outcome is cached as a miss, not an array
    assert host._gram_matrix_cache is False


def test_tiny_batches_route_through_runs():
    """Single/small batches on gm-less indexes must take the sorted-runs
    front end (per-query posting cost) instead of streaming the full
    bitmap table per dispatch: the bitmap tables are never built."""
    host = build_index(WORDS * 20, 1, None, IndexConfig())
    engine = SearchEngine(host)
    engine.GM_BUDGET = 0  # force gm=None
    engine.SKETCH_MIN_TERMS = 0
    engine.CAND_MIN_TERMS = 1
    got = engine.search_batch(["telephon"], 0.3, 10)
    assert host._bitmap_cache is None, "tiny batch built the bitmap table"
    want = engine.search_batch(
        ["telephon"], 0.3, 10, mode="dense"
    )
    assert got == want
    # larger batches DO use the table-streaming front ends
    engine.search_batch(["telephon"] * 32, 0.3, 10)
    assert host._bitmap_cache is not None


def test_brute_short_batched_parity():
    """qlen <= gram_size queries run through the batched brute tier and
    must match the single-query path exactly."""
    import numpy as np

    from stringsearchlib_tpu.config import IndexConfig
    from stringsearchlib_tpu.index.build import build_index
    from stringsearchlib_tpu.search.engine import SearchEngine

    rng = np.random.default_rng(61)
    words = [
        "".join(rng.choice(list("ABCDE FG"), size=rng.integers(1, 14)))
        for _ in range(600)
    ]
    host = build_index(words, 1, None, IndexConfig())
    eng = SearchEngine(host)
    queries = ["A", "AB", "ABC", "E", "FG", "ZZ", "B C", "  ", "DE"]
    got = eng.search_batch(queries, 0.2, 25)
    want = [eng.search(q, 0.2, 25) for q in queries]
    assert got == want
