"""Property tests: batched search (all modes/front ends) vs the oracle
across gram sizes and narrow/wide strings."""

import random

import pytest

from stringsearchlib_tpu.config import IndexConfig
from stringsearchlib_tpu.index.build import build_index
from stringsearchlib_tpu.search.engine import SearchEngine
from stringsearchlib_tpu.utils.oracle import OracleIndex

NARROW_ALPHABET = "abcdefgHIJKLm nopQ.%"
WIDE_ALPHABET = "día中文かなΩ é. ab"


def _corpus(rng, n, wide):
    alphabet = WIDE_ALPHABET if wide else NARROW_ALPHABET
    return [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14)))
        for _ in range(n)
    ]


def _canon(pairs):
    from collections import defaultdict

    d = defaultdict(list)
    for k, v in pairs:
        d[round(v, 4)].append(len(k))
    return {v: sorted(ks) for v, ks in d.items()}


@pytest.mark.parametrize("wide", [False, True])
@pytest.mark.parametrize("gram_size", [2, 3, 4])
def test_batch_modes_match_oracle(wide, gram_size):
    rng = random.Random(100 * gram_size + wide)
    words = _corpus(rng, 600, wide)
    weights = [0.5 if rng.random() < 0.2 else 1.0 for _ in words]
    cfg = IndexConfig(gram_size=gram_size, wide=wide)
    host = build_index(words, 2, weights, cfg)
    oracle = OracleIndex(words, row_size=2, weights=weights,
                         gram_size=gram_size, wide=wide)
    engine = SearchEngine(host)

    queries = [words[rng.randrange(len(words))][: rng.randint(2, 10)]
               for _ in range(6)] + ["*", ""]
    # over-width queries (> qp_bucket 32) exercise the pow2 width groups
    queries += [
        words[rng.randrange(len(words))] + words[rng.randrange(len(words))]
        + words[rng.randrange(len(words))] + words[rng.randrange(len(words))]
        for _ in range(2)
    ]
    for threshold, limit in ((0.0, 10), (0.3, 5)):
        want = {}
        for q in queries:
            rs, ss = oracle.search(q, threshold, limit)
            want[q] = _canon(zip(rs, ss))
        for mode in ("candidates", "dense", "auto"):
            outs = engine.search_batch(
                queries, threshold, limit, mode=mode
            )
            for q, (r, s) in zip(queries, outs):
                got = _canon(zip(r, [float(x) for x in s]))
                assert got == want[q], (wide, gram_size, mode, threshold, q)


@pytest.mark.parametrize("wide", [False, True])
def test_batch_runs_front_end_matches_oracle(wide):
    """Force the sorted-runs front end (gram matrix disabled)."""
    rng = random.Random(7 + wide)
    words = _corpus(rng, 500, wide)
    host = build_index(words, 1, None, IndexConfig(wide=wide))
    host._gram_matrix_cache = False
    oracle = OracleIndex(words, row_size=1, wide=wide)
    engine = SearchEngine(host)
    queries = [words[rng.randrange(len(words))][: rng.randint(4, 10)]
               for _ in range(6)]
    outs = engine.search_batch(queries, 0.25, 10, mode="candidates")
    for q, (r, s) in zip(queries, outs):
        rs, ss = oracle.search(q, 0.25, 10)
        assert _canon(zip(r, map(float, s))) == _canon(zip(rs, ss)), (wide, q)
