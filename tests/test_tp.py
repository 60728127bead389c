"""Gram-dimension tensor parallelism (parallel.tp): exact parity with the
single-chip engine on a virtual 8-device CPU mesh."""

import numpy as np
import pytest

from stringsearchlib_tpu.config import IndexConfig
from stringsearchlib_tpu.index.build import build_index
from stringsearchlib_tpu.parallel.tp import (
    GramShardedEngine, shard_index_by_grams,
)
from stringsearchlib_tpu.parallel.dist import make_mesh
from stringsearchlib_tpu.search.engine import SearchEngine

AXIS = "grams"


def _corpus(n=800, seed=31):
    rng = np.random.default_rng(seed)
    syll = ["KA", "LO", "ME", "RI", "SU", "TA", "VE", "NOR", "BEL", "X Q"]
    return [
        "".join(rng.choice(syll, size=rng.integers(2, 6)))
        for _ in range(n)
    ]


@pytest.fixture(scope="module")
def engines():
    words = _corpus()
    dense_host = build_index(words, 1, None, IndexConfig())
    host = build_index(words, 1, None, IndexConfig(), to_device=False)
    gx = shard_index_by_grams(host, 8)
    mesh = make_mesh(8, AXIS)
    tp_eng = GramShardedEngine(gx, mesh)
    return SearchEngine(dense_host), tp_eng, words


QUERIES = [
    "KALOME", "NORBEL", "KA", "A", "SURI", "MEXX", "*", "", "ZZZZZZ",
    "X QKA", "BELNORTAVE",
]


def test_tp_shards_cover_all_postings(engines):
    _, tp_eng, _ = engines
    gx = tp_eng.gx
    total = int(gx.host_shard_posting_lens.sum())
    assert total == int(np.asarray(gx.host.device.gram_ptr)[-1])
    # each gram's postings live on exactly one shard
    per_gram = gx.host_shard_posting_lens
    owners = (per_gram > 0).sum(axis=0)
    lens = np.diff(np.asarray(gx.host.device.gram_ptr))
    assert np.all(owners == (lens > 0).astype(owners.dtype))


@pytest.mark.parametrize("threshold,limit", [(0.0, 10), (0.3, 5), (0.2, 0)])
def test_tp_matches_single_chip(engines, threshold, limit):
    ref, tp_eng, _ = engines
    want = [ref.search(q, threshold, limit) for q in QUERIES]
    got = tp_eng.search_batch(QUERIES, threshold, limit)
    for q, g, w in zip(QUERIES, got, want):
        assert g[0] == w[0], (q, threshold, limit, g, w)
        np.testing.assert_allclose(g[1], w[1], atol=1e-6)


def test_tp_dense_mode_matches(engines):
    ref, tp_eng, _ = engines
    got = tp_eng.search_batch(QUERIES, 0.25, 8, mode="dense")
    want = [ref.search(q, 0.25, 8) for q in QUERIES]
    for q, g, w in zip(QUERIES, got, want):
        assert g[0] == w[0], q
        np.testing.assert_allclose(g[1], w[1], atol=1e-6)


def test_tp_single_query_entry(engines):
    ref, tp_eng, _ = engines
    for q in ("KALOME", "*", "A"):
        assert tp_eng.search(q, 0.1, 7) == ref.search(q, 0.1, 7)


def test_tp_weighted_2d_rows():
    """2D rows with weights (multi-edge promo keys, weight-0 drops) must
    match the dense engine through the TP psum path."""
    words = _corpus(240, seed=41)
    flat, weights = [], []
    for j, k in enumerate(words):
        flat += [k, k[1:] + "X"]
        weights += [1.0, 0.0 if j % 5 == 0 else 0.5]
    dense_host = build_index(flat, 2, weights, IndexConfig())
    host = build_index(flat, 2, weights, IndexConfig(), to_device=False)
    tp_eng = GramShardedEngine(
        shard_index_by_grams(host, 8), make_mesh(8, AXIS)
    )
    ref = SearchEngine(dense_host)
    qs = [words[0], words[3][1:] + "X", words[5][:-1], "*", "QQQQ"]
    got = tp_eng.search_batch(qs, 0.2, 12)
    for q, g in zip(qs, got):
        w = ref.search(q, 0.2, 12)
        assert g[0] == w[0], (q, g, w)
        np.testing.assert_allclose(g[1], w[1], atol=1e-6)
    # exact-match promotion must reach 100 through the psum path
    assert got[0][1][0] == 100.0
