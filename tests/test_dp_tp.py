"""2-D DP x TP mesh ('shards' x 'grams'): exact parity with the
single-chip dense engine on the 8-device virtual CPU mesh."""

import random

import numpy as np
import pytest

from stringsearchlib_tpu.config import IndexConfig
from stringsearchlib_tpu.index.build import build_index
from stringsearchlib_tpu.parallel.dp_tp import (
    DpTpEngine, make_mesh_2d, shard_index_2d,
)
from stringsearchlib_tpu.search.engine import SearchEngine


def _corpus(n, seed=13):
    rng = random.Random(seed)
    syll = ["ka", "lo", "me", "ri", "su", "ta", "ve", "nor", "bel", "qu"]
    return [
        "".join(rng.choice(syll) for _ in range(rng.randint(1, 6)))
        for _ in range(n)
    ]


def _norm(res):
    return sorted((round(float(s), 5), len(k)) for k, s in zip(*res))


@pytest.fixture(scope="module")
def setup():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    words = _corpus(3000)
    w = np.ones(len(words))
    w[::7] = 0.5  # weighted edges exercise the wmax/propagation path
    host_np = build_index(words, 1, w, IndexConfig(), to_device=False)
    ref = SearchEngine(build_index(words, 1, w, IndexConfig()))
    return words, host_np, ref


@pytest.mark.parametrize("st,sg", [(4, 2), (2, 4)])
def test_dp_tp_parity(setup, st, sg):
    words, host_np, ref = setup
    mesh = make_mesh_2d(st, sg)
    eng = DpTpEngine(shard_index_2d(host_np, st, sg), mesh)
    rng = random.Random(5)
    queries = []
    for i in range(40):
        w = words[rng.randrange(len(words))]
        if i % 5 == 0:
            queries.append(w)  # exact -> promotion to 100
        elif i % 5 == 1:
            queries.append(w[:2])  # brute-short tier
        else:
            j = rng.randrange(max(len(w) - 1, 1))
            queries.append(w[:j] + "x" + w[j + 1 :])
    queries += ["*", "", "!!!@@@##"]
    got = eng.search_batch(queries, 0.25, 10)
    want = ref.search_batch(queries, 0.25, 10, mode="dense")
    for q, g, w_ in zip(queries, got, want):
        assert _norm(g) == _norm(w_), (q, g, w_)


def test_dp_tp_postings_split_covers_everything(setup):
    _, host_np, _ = setup
    dx = shard_index_2d(host_np, 2, 4)
    # every (term shard, gram) posting count must be preserved by the split
    ptr = dx.sx.leaves["gram_ptr"].astype(np.int64)
    lens_1d = np.diff(ptr, axis=1)  # (St, G)
    assert dx.lens3.sum(axis=1).astype(np.int64).tolist() == \
        lens_1d.astype(np.int64).tolist()
    # slice CSR offsets are consistent with slice contents
    st, sg, _ = dx.gram_ptr2.shape
    for i in range(st):
        for j in range(sg):
            total = int(dx.gram_ptr2[i, j, -1])
            assert total <= dx.gram_terms2.shape[2]
