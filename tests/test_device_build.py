"""On-device postings build must be bit-identical to the host build."""

from __future__ import annotations

import numpy as np
import pytest

from stringsearchlib_tpu.config import IndexConfig
from stringsearchlib_tpu.index.build import build_index


def _corpus(n, seed, alpha="ABCDEFGH IJKLMNOP", lo=2, hi=24):
    rng = np.random.default_rng(seed)
    return [
        "".join(rng.choice(list(alpha), size=rng.integers(lo, hi)))
        for _ in range(n)
    ]


@pytest.mark.parametrize("gram_size", [2, 3])
@pytest.mark.parametrize("use_native", [False, None])
def test_device_postings_bit_identical(gram_size, use_native):
    words = _corpus(1200, seed=gram_size * 7 + (use_native is None))
    cfg = IndexConfig(gram_size=gram_size)
    a = build_index(words, 1, None, cfg, use_native=use_native,
                    device_postings=True)
    b = build_index(words, 1, None, cfg, use_native=use_native,
                    device_postings=False)
    np.testing.assert_array_equal(a.gram_ids, b.gram_ids)
    np.testing.assert_array_equal(
        np.asarray(a.device.gram_ptr), np.asarray(b.device.gram_ptr)
    )
    np.testing.assert_array_equal(
        np.asarray(a.device.gram_terms), np.asarray(b.device.gram_terms)
    )
    np.testing.assert_array_equal(a.host_posting_lens, b.host_posting_lens)
    assert a.n_grams == b.n_grams


def test_device_postings_search_parity():
    words = _corpus(900, seed=23)
    a = build_index(words, 1, None, IndexConfig(), device_postings=True)
    b = build_index(words, 1, None, IndexConfig(), device_postings=False)
    from stringsearchlib_tpu.search.engine import SearchEngine

    ea, eb = SearchEngine(a), SearchEngine(b)
    qs = [w[:6] for w in words[:30]] + ["", "*", "ZXQW"]
    assert ea.search_batch(qs, 0.3, 20) == eb.search_batch(qs, 0.3, 20)


def test_device_postings_empty_and_short_only():
    # no long terms at all: the device path must not engage / must not break
    words = ["AB", "CD", "EF", "GH"]
    h = build_index(words, 1, None, IndexConfig(), device_postings=True)
    assert h.n_grams == 0
    from stringsearchlib_tpu.search.engine import SearchEngine

    res, sc = SearchEngine(h).search("AB", 0.4, 0)
    assert res and res[0] == "AB"
