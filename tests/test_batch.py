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


def test_batch_bucketing():
    host = build_index(WORDS, 1, None, IndexConfig())
    engine = SearchEngine(host)
    queries = ["telephon"] * 37  # pads to a pow2 batch with dummies
    res = engine.search_batch(queries, 0.3, 10, batch_bucket=16)
    want = engine.search("telephon", 0.3, 10)
    for got in res:
        assert got[0] == want[0]
