"""Bit-packed bitmap candidate front end: packing correctness vs the dense
incidence, and full search parity vs the dense engine path."""

import random

import numpy as np
import pytest

from stringsearchlib_tpu.config import IndexConfig
from stringsearchlib_tpu.index.build import build_index
from stringsearchlib_tpu.search.engine import SearchEngine


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
    host, _ = host_engine
    bm, tl_pad = host.bitmap_tables()
    bm = np.asarray(bm)
    gm = np.asarray(host.gram_matrix(1 << 40))  # (G, Tl) int8 0/1
    g, tl = gm.shape
    # expand the packed rows and compare
    exp = ((bm[:, :, None] >> np.arange(8, dtype=np.uint8)) & 1).reshape(
        g, tl_pad
    )
    np.testing.assert_array_equal(exp[:, :tl], gm)
    assert not exp[:, tl:].any()  # padded columns carry no bits


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
