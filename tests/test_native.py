"""Native (C++) builder must match the numpy builder exactly."""

import random

import numpy as np
import pytest

from stringsearchlib_tpu.config import IndexConfig
from stringsearchlib_tpu.index import native as nativelib
from stringsearchlib_tpu.index.build import build_index
from stringsearchlib_tpu.search.engine import SearchEngine

pytestmark = pytest.mark.skipif(
    nativelib.get_native() is None, reason="native builder unavailable"
)

FIXTURE = ["LWMS", "LWM", "LWMA", "LWYY", "L", "I", "GHRSDGSDGS Egdsrtg g"]


def _compare(words, row_size=1, weights=None, gram_size=3, queries=()):
    cfg = IndexConfig(gram_size=gram_size)
    a = build_index(words, row_size, weights, cfg, use_native=True)
    b = build_index(words, row_size, weights, cfg, use_native=False)
    assert a.n_terms == b.n_terms
    assert a.n_grams == b.n_grams
    np.testing.assert_array_equal(a.gram_ids, b.gram_ids)
    np.testing.assert_array_equal(np.asarray(a.device.gram_ptr), np.asarray(b.device.gram_ptr))
    np.testing.assert_array_equal(np.asarray(a.device.gram_terms), np.asarray(b.device.gram_terms))
    np.testing.assert_array_equal(np.asarray(a.device.key_len), np.asarray(b.device.key_len))
    np.testing.assert_array_equal(np.asarray(a.device.short_lengths), np.asarray(b.device.short_lengths))
    np.testing.assert_array_equal(np.asarray(a.device.long_lengths), np.asarray(b.device.long_lengths))
    assert a.key_strings.tolist() == b.key_strings.tolist()
    # edge sets (order may differ; weights must agree)
    ea = sorted(zip(np.asarray(a.device.edge_term).tolist(),
                    np.asarray(a.device.edge_key).tolist(),
                    np.asarray(a.device.edge_weight).tolist()))
    eb = sorted(zip(np.asarray(b.device.edge_term).tolist(),
                    np.asarray(b.device.edge_key).tolist(),
                    np.asarray(b.device.edge_weight).tolist()))
    assert ea == eb
    sa, sb = SearchEngine(a), SearchEngine(b)
    for q in queries:
        for thr in (0.0, 0.3):
            ra = sa.search(q, thr, 0)
            rb = sb.search(q, thr, 0)
            assert ra[0] == rb[0], (q, thr, ra, rb)
            np.testing.assert_allclose(ra[1], rb[1], atol=1e-6)


def test_fixture_native():
    _compare(FIXTURE, queries=["LWMS", "LWM", "SDGS", "*", "a"])


def test_master_rows_native():
    _compare(
        ["Widget A", "wdgt", "gadget a", "Widget B", "wb", None],
        row_size=3,
        queries=["WDGT", "wb", "widget"],
    )


def test_weights_native():
    _compare(
        ["keyA", "altA", "keyB", "altB"],
        row_size=2,
        weights=[1.0, 0.25, 0.5, 0.0],
        queries=["ALTA", "ALTB", "keyb"],
    )


def test_gram_sizes_native():
    for g in (2, 3, 4):
        _compare(
            ["alpha beta", "alphabet soup", "beta", "soup", "al"],
            gram_size=g,
            queries=["alpha", "soup", "zz"],
        )


def test_bytes_and_nul_native():
    _compare([b"a\x00b", b"ab", b"  pad  ", "mixed"], queries=["ab", "pad"])


@pytest.mark.parametrize("seed", range(4))
def test_property_native(seed):
    rng = random.Random(seed)
    alphabet = "ABCDEFab01.% \t-"
    n = rng.randint(4, 60)
    row_size = rng.choice([1, 2, 3])
    words = [
        None
        if rng.random() < 0.05
        else "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 14)))
        for _ in range(n)
    ]
    weights = None
    if rng.random() < 0.5:
        weights = [round(rng.random() * 2, 2) for _ in words]
    queries = ["*", "zz"]
    for _ in range(6):
        base = rng.choice([w for w in words if w] or ["x"])
        queries.append(base[: rng.randint(1, max(len(base), 1))])
    _compare(words, row_size=row_size, weights=weights, queries=queries)


def test_non_string_elements_native():
    """Both builders stringify non-str/bytes elements identically (the
    numpy path uses str(s); the native path must not diverge by raising)."""
    _compare(
        ["Widget 7", 1234, 56.5, True, "gadget"],
        row_size=1,
        queries=["1234", "56.5", "widget", "True"],
    )
