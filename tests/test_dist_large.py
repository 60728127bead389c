"""Candidate-sparse sharded search vs single-chip on a larger randomized
corpus: cross-shard key contributions, guard retries, weights, batches.

Parity is exact through the public engines; ties compare as (score,
key-length) multisets where the reference order is unspecified
(unordered-container ties, SURVEY section 4)."""

import random

import numpy as np
import pytest

from stringsearchlib_tpu.config import IndexConfig
from stringsearchlib_tpu.index.build import build_index
from stringsearchlib_tpu.parallel.dist import (
    ShardedEngine, make_mesh, shard_index,
)
from stringsearchlib_tpu.search.engine import SearchEngine


def _corpus(n, seed=11):
    rng = random.Random(seed)
    syll = ["ba", "do", "ke", "mi", "ra", "tu", "zo", "len", "car", "pix"]
    out = []
    for _ in range(n):
        w = "".join(rng.choice(syll) for _ in range(rng.randint(2, 5)))
        if rng.random() < 0.3:
            w += " " + rng.choice(syll)
        out.append(w)
    return out


def _tiegroups(res):
    keys, scores = res
    return sorted((round(s, 5), len(k)) for k, s in zip(keys, scores))


@pytest.fixture(scope="module")
def engines():
    words = _corpus(3000)
    # row_size 3: every third word is a master key; terms map across rows,
    # so keys collect contributions from terms that land on DIFFERENT shards
    host_single = build_index(words, 3, None, IndexConfig())
    single = SearchEngine(host_single)
    host_sharded = build_index(
        words, 3, None, IndexConfig(), to_device=False
    )
    mesh = make_mesh(8)
    sharded = ShardedEngine(shard_index(host_sharded, 8), mesh)
    return single, sharded, words


def test_no_unsharded_device_leaves(engines):
    """The sharded host index must stay host-resident (numpy leaves)."""
    _, sharded, _ = engines
    assert isinstance(sharded.host.device.gram_terms, np.ndarray)
    assert isinstance(sharded.host.device.edge_key, np.ndarray)


@pytest.mark.parametrize("threshold", [0.0, 0.25, 0.6])
def test_batch_parity_candidates(engines, threshold):
    single, sharded, words = engines
    rng = random.Random(5)
    queries = []
    for i in range(0, 120):
        w = words[rng.randrange(len(words))]
        # mutate to force fuzzy scoring (and occasional exact promotions)
        if i % 4 == 0:
            queries.append(w)
        else:
            j = rng.randrange(max(len(w), 1))
            queries.append(w[:j] + "x" + w[j + 1 :])
    queries += ["*", "", "zz", "a", "q" * 40]
    got = sharded.search_batch(queries, threshold, 10)
    want = single.search_batch(queries, threshold, 10)
    for q, g, w in zip(queries, got, want):
        assert _tiegroups(g) == _tiegroups(w), (q, threshold, g, w)


def test_batch_parity_unbounded_limit(engines):
    """limit 0 -> INT32_MAX routes the sharded path densely; full parity."""
    single, sharded, words = engines
    for q in [words[7], words[123][:-1] + "z", "bado"]:
        got = sharded.search(q, 0.4, 0)
        want = single.search(q, 0.4, 0)
        assert _tiegroups(got) == _tiegroups(want), q


def test_weighted_rows_parity():
    words = _corpus(600, seed=3)
    weights = [round(0.2 + (i % 9) * 0.1, 2) for i in range(len(words))]
    host_single = build_index(words, 2, weights, IndexConfig())
    single = SearchEngine(host_single)
    host_sharded = build_index(
        words, 2, weights, IndexConfig(), to_device=False
    )
    sharded = ShardedEngine(shard_index(host_sharded, 4), make_mesh(4))
    rng = random.Random(9)
    queries = [words[rng.randrange(len(words))][:-1] + "q" for _ in range(40)]
    got = sharded.search_batch(queries, 0.2, 8)
    want = single.search_batch(queries, 0.2, 8)
    for q, g, w in zip(queries, got, want):
        assert _tiegroups(g) == _tiegroups(w), q


def test_forced_narrow_candidates_retry(engines):
    """A tiny candidate cap forces guard failures; the dense retry must
    restore exactness."""
    single, sharded, words = engines
    old_fast, old_full = sharded.CAND_TERMS_FAST, sharded.CAND_TERMS
    try:
        sharded.CAND_TERMS_FAST = 16
        sharded.CAND_TERMS = 32
        sharded._jitted.clear()
        queries = [words[i][:-1] + "z" for i in range(0, 60, 3)]
        got = sharded.search_batch(queries, 0.0, 5)
        want = single.search_batch(queries, 0.0, 5)
        for q, g, w in zip(queries, got, want):
            assert _tiegroups(g) == _tiegroups(w), q
    finally:
        sharded.CAND_TERMS_FAST, sharded.CAND_TERMS = old_fast, old_full
        sharded._jitted.clear()
