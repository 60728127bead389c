"""Length-tiered long-tier DP: bucket construction and exact parity.

The long tier is stored length-ascending (index.build sorts it) so the
brute/long DP can run per width bucket (search.editdist.dp_match_tiered)
instead of padding every term to the tier's global max width.
"""

import numpy as np

from stringsearchlib_tpu.config import IndexConfig
from stringsearchlib_tpu.index.build import build_index
from stringsearchlib_tpu.search.engine import SearchEngine


def _skewed_words(rng, n=400):
    """Mostly ~8-char long terms, a handful of very long ones."""
    alpha = list("ABCDEFGH ")
    words = [
        "".join(rng.choice(alpha, size=rng.integers(6, 13)))
        for _ in range(n)
    ]
    words += [
        "".join(rng.choice(alpha, size=rng.integers(150, 200)))
        for _ in range(6)
    ]
    rng.shuffle(words)
    return words


def test_long_tier_sorted_by_length():
    rng = np.random.default_rng(7)
    for use_native in (False, True):
        host = build_index(
            _skewed_words(rng), 1, None, IndexConfig(), use_native=use_native
        )
        ll = np.asarray(host.device.long_lengths)
        assert np.all(ll[:-1] <= ll[1:]), use_native
        assert host.host_long_lengths is not None
        np.testing.assert_array_equal(host.host_long_lengths, ll)


def test_buckets_cover_tier_and_bound_widths():
    rng = np.random.default_rng(11)
    host = build_index(_skewed_words(rng), 1, None, IndexConfig())
    host.DP_MIN_BUCKET_ROWS = 4  # the test tier is small
    host._dp_bucket_cache = None
    buckets = host.long_dp_buckets()
    ll = host.host_long_lengths
    n = ll.shape[0]
    full_w = int(host.device.long_tokens.shape[1])
    assert len(buckets) >= 2  # the skew must actually split
    assert buckets[-1][0] == n
    lo = 0
    for end, w in buckets:
        assert lo < end <= n
        assert w <= full_w
        assert int(ll[lo:end].max()) <= w  # width covers every member
        lo = end
    # the narrow bucket must be much narrower than the global pad
    assert buckets[0][1] < full_w // 4


def test_tiered_brute_parity():
    """qlen <= gram_size queries (whole-tier DP) must return identical
    results whether the DP runs tiered or single-width."""
    rng = np.random.default_rng(13)
    host = build_index(_skewed_words(rng), 1, None, IndexConfig())
    host.DP_MIN_BUCKET_ROWS = 4
    host._dp_bucket_cache = None
    assert len(host.long_dp_buckets()) >= 2

    flat = build_index(_skewed_words(np.random.default_rng(13)), 1, None,
                       IndexConfig())
    flat._dp_bucket_cache = ()  # force the single full-width DP

    tiered_eng, flat_eng = SearchEngine(host), SearchEngine(flat)
    queries = ["A", "AB", "ABC", "GH", "  ", "E F"]
    for q in queries:
        got = tiered_eng.search(q, 0.1, 25)
        want = flat_eng.search(q, 0.1, 25)
        assert got[0] == want[0], q
        np.testing.assert_allclose(got[1], want[1], atol=1e-6)
    got_b = tiered_eng.search_batch(queries, 0.1, 25)
    want_b = flat_eng.search_batch(queries, 0.1, 25)
    for g, w, q in zip(got_b, want_b, queries):
        assert g[0] == w[0], q
        np.testing.assert_allclose(g[1], w[1], atol=1e-6)


def test_strided_sharding_balances_sorted_tier():
    """The length-sorted long tier must not skew posting mass onto the
    last shard: strided assignment keeps shards balanced AND each
    shard's local tier length-ascending."""
    from stringsearchlib_tpu.parallel.dist import shard_index

    rng = np.random.default_rng(23)
    host = build_index(
        _skewed_words(rng, 600), 1, None, IndexConfig(), to_device=False
    )
    sx = shard_index(host, 4)
    per_shard = sx.host_shard_posting_lens.sum(axis=1)
    assert per_shard.sum() == int(np.asarray(host.device.gram_ptr)[-1])
    # contiguous chunks over the sorted tier would put ALL the 150+ char
    # terms (and their postings) on the last shard; strided stays tight
    assert per_shard.max() <= 1.25 * max(per_shard.min(), 1), per_shard
    ll = sx.leaves["long_lengths"]
    for i in range(4):
        row = ll[i][ll[i] > 0]
        assert np.all(row[:-1] <= row[1:])


def test_tiered_matches_longer_queries_too():
    """Sanity: the long-tier permutation is invisible to gram-path
    queries (term ids are internal)."""
    rng = np.random.default_rng(17)
    words = _skewed_words(rng)
    host_n = build_index(words, 1, None, IndexConfig(), use_native=True)
    host_p = build_index(words, 1, None, IndexConfig(), use_native=False)
    for f in ("gram_ptr", "gram_terms", "edge_term", "edge_key",
              "long_lengths"):
        np.testing.assert_array_equal(
            np.asarray(getattr(host_n.device, f)),
            np.asarray(getattr(host_p.device, f)),
            err_msg=f,
        )
    e = SearchEngine(host_n)
    res = e.search("ABCDEFGH", 0.0, 10)
    assert len(res[0]) <= 10
