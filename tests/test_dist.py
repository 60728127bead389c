"""Sharded search on a virtual 8-device CPU mesh must match single-chip
results exactly (global top-k with exact tie-breaks, SURVEY hard parts)."""

import numpy as np
import pytest

from stringsearchlib_tpu.config import IndexConfig
from stringsearchlib_tpu.index.build import build_index
from stringsearchlib_tpu.parallel.dist import ShardedEngine, make_mesh, shard_index
from stringsearchlib_tpu.search.engine import SearchEngine

FIXTURE = ["LWMS", "LWM", "LWMA", "LWYY", "L", "I", "GHRSDGSDGS Egdsrtg g"]

WORDS = [
    "telephone", "telegraph", "photograph", "telescope", "microphone",
    "phonograph", "graphite", "telephony", "phone", "graph", "tele", "scope",
    "micro", "mic", "LWMS", "LWM", "LWMA", "L", "a b c", "abc def ghi",
]


@pytest.fixture(scope="module", params=[2, 8])
def mesh_size(request):
    return request.param


def _engines(words, n_shards, row_size=1, weights=None):
    host = build_index(words, row_size, weights, IndexConfig())
    single = SearchEngine(host)
    mesh = make_mesh(n_shards)
    sharded = ShardedEngine(shard_index(host, n_shards), mesh)
    return single, sharded


@pytest.mark.parametrize("query", [
    "telephon", "graph", "LWMS", "tele", "a", "zz", "abc", "micro phone",
])
@pytest.mark.parametrize("threshold", [0.0, 0.3])
def test_sharded_matches_single(mesh_size, query, threshold):
    single, sharded = _engines(WORDS, mesh_size)
    want = single.search(query, threshold, 0)
    got = sharded.search(query, threshold, 0)
    assert got[0] == want[0]
    np.testing.assert_allclose(got[1], want[1], atol=1e-6)


def test_sharded_fixture(mesh_size):
    single, sharded = _engines(FIXTURE, mesh_size)
    got = sharded.search("LWMS", 0.5, 0)
    assert got[0] == ["LWMS", "LWM", "LWMA", "LWYY"]
    assert got[1][0] == 100.0


def test_sharded_with_master_rows(mesh_size):
    words = ["Widget A", "wdgt", "gadget a", "Widget B", "wb", "small b"]
    single, sharded = _engines(words, mesh_size, row_size=3)
    for q in ["WDGT", "wb", "widget", "*"]:
        assert sharded.search(q, 0.0, 0) == single.search(q, 0.0, 0)


def test_sharded_limit(mesh_size):
    single, sharded = _engines(WORDS, mesh_size)
    got = sharded.search("graph", 0.2, 3)
    want = single.search("graph", 0.2, 3)
    assert got == want


def test_sharded_batch_matches_single(mesh_size):
    single, sharded = _engines(WORDS, mesh_size)
    queries = ["telephon", "graph", "LWMS", "tele", "zz", "micro phone",
               "*", "", "a", "x" * 40]
    for threshold in (0.0, 0.3):
        got = sharded.search_batch(queries, threshold, 10)
        for q, g in zip(queries, got):
            want = single.search(q, threshold, 10)
            assert g[0] == want[0], (q, threshold, g, want)
            np.testing.assert_allclose(g[1], want[1], atol=1e-6)


def test_sharded_batch_weights(mesh_size):
    words = ["Widget A", "wdgt", "gadget a", "Widget B", "wb", "small b"]
    weights = [1.0, 0.5, 0.7, 1.0, 0.2, 0.9]
    single, sharded = _engines(words, mesh_size, row_size=3, weights=weights)
    got = sharded.search_batch(["widget", "gadget"], 0.0, 5)
    for q, g in zip(["widget", "gadget"], got):
        assert g == single.search(q, 0.0, 5)
