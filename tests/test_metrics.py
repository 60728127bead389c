"""Observability: index stats, query metrics, profiler context."""

from stringsearchlib_tpu import StringSearchIndex
from stringsearchlib_tpu.utils import metrics

WORDS = ["LWMS", "LWM", "LWMA", "LWYY", "L", "I", "GHRSDGSDGS Egdsrtg g",
         "telephone", "telegraph", "photograph"]


def test_index_stats():
    idx = StringSearchIndex(WORDS)
    st = metrics.index_stats(idx.host)
    assert st["keys"] == len(WORDS)
    assert st["terms"] == 10
    assert st["grams"] > 0
    assert st["postings"] >= st["grams"]
    assert st["device_bytes"] > 0
    assert st["terms_short_tier"] + st["terms_long_tier"] == st["terms"]
    import json

    json.dumps(st)  # must be JSON-serializable


def test_query_metrics_single_and_batch():
    idx = StringSearchIndex(WORDS)
    idx.engine.metrics = m = metrics.QueryMetrics()
    idx.engine.search("LWMS", 0.5, 10)
    idx.engine.search_batch(["telephon", "photogr"], 0.3, 10)
    snap = m.snapshot()
    assert snap["queries"] == 3
    assert snap["p50_ms"] >= 0.0
    assert snap["queries_per_sec"] > 0
    m.reset()
    assert m.snapshot()["queries"] == 0


def test_metrics_no_double_count_on_fallback():
    idx = StringSearchIndex(WORDS)
    idx.engine.metrics = m = metrics.QueryMetrics()
    # wildcard + brute-force rows fall back to the single path internally
    idx.engine.search_batch(["*", "LW", "telephon"], 0.0, 5)
    assert m.snapshot()["queries"] == 3


def test_profile_noop():
    with metrics.profile(None):
        pass
