"""Oracle conformance: the reference's golden fixture and unit semantics.

Anchors from /root/reference/SearchTest/test.cpp:13-19 (see BASELINE.md):
getSize == 7, getLibSize == 16, search("LWMS", 0.5, unlimited) -> 4 results.
"""

import numpy as np
import pytest

from stringsearchlib_tpu.utils.oracle import OracleIndex

FIXTURE = ["LWMS", "LWM", "LWMA", "LWYY", "L", "I", "GHRSDGSDGS Egdsrtg g"]


@pytest.fixture
def idx():
    return OracleIndex(FIXTURE, row_size=1)


def test_fixture_sizes(idx):
    assert idx.size() == 7
    assert idx.lib_size() == 16


def test_fixture_search(idx):
    results, scores = idx.search("LWMS", threshold=0.5, limit=0)
    assert len(results) == 4
    assert results[0] == "LWMS"
    assert scores[0] == 100.0  # exact-match promotion
    assert set(results[1:3]) == {"LWM", "LWMA"}
    assert scores[1] == scores[2] == 0.75
    assert results[3] == "LWYY"
    assert scores[3] == 0.5  # threshold filter is strictly '<'


def test_threshold_strictness(idx):
    results, _ = idx.search("LWMS", threshold=0.5001, limit=0)
    assert "LWYY" not in results


def test_limit(idx):
    results, _ = idx.search("LWMS", threshold=0.0, limit=2)
    assert len(results) == 2
    assert results[0] == "LWMS"


def test_not_indexed():
    idx = OracleIndex(["only"], row_size=1)  # size < 2 -> unusable
    assert idx.search("only") == ([], [])
    assert idx.size() == 0


def test_wildcard(idx):
    results, scores = idx.search("*", threshold=0.0, limit=0)
    assert len(results) == 7
    assert all(s == 1.0 for s in scores)
    results2, _ = idx.search("", threshold=0.0, limit=0)
    assert sorted(results2) == sorted(results)


def test_string_match_semi_global(idx):
    # Free leading/trailing gaps in source: query matches any substring.
    assert idx.string_match("ABC", "XXABCXX") == 3
    assert idx.string_match("ABC", "ABD") == 2
    assert idx.string_match("A", "BCA") == 1  # 1-char containment
    assert idx.string_match("A", "BCD") == 0
    assert idx.string_match("AB", "") == 0


def test_master_key_mapping():
    # rowSize=3: tail words map to the row's master key (nGramSearch.hpp:150-168).
    idx = OracleIndex(
        ["Widget A", "wdgt", "gadget a", "Widget B", "wb", None],
        row_size=3,
    )
    results, scores = idx.search("WDGT", threshold=0.5)
    assert results == ["Widget A"]
    results, _ = idx.search("wb", threshold=0.9)
    assert results == ["Widget B"]


def test_weights_zero_drops_pair():
    idx = OracleIndex(
        ["keyA", "altA", "keyB", "altB"],
        row_size=2,
        weights=[1.0, 0.0, 1.0, 0.5],
    )
    # altA had weight 0 -> never indexed.
    results, _ = idx.search("ALTA", threshold=0.9)
    assert results == []
    results, scores = idx.search("ALTB", threshold=0.4)
    assert results == ["keyB"]
    assert scores[0] == pytest.approx(0.5)


def test_long_tier_gram_overlap():
    idx = OracleIndex(["telephone", "telegraph", "photograph"], row_size=1)
    results, scores = idx.search("telephon", threshold=0.2)
    # "TELEPHON" has 6 trigrams, all present in TELEPHONE -> score 1.0 but
    # no promotion (normalized key "telephone" != query "TELEPHON").
    assert results[0] == "telephone"
    assert scores[0] == pytest.approx(1.0)
    assert "photograph" not in results  # no shared trigrams above threshold


def test_duplicate_query_grams_count_multiply():
    # Query "AAAA" -> grams AAA, AAA (duplicate kept, nGramSearch.hpp:289-297).
    idx = OracleIndex(["AAABBB", "AAABBBCCC"], row_size=1)
    _, scores = idx.search("AAAA", threshold=0.0)
    # qlen=4 <= brute force cutoff? no: 4 > 3, grams used. AAAB... contains AAA
    # once in posting set; both query grams hit it -> 2/2 = 1.0.
    assert scores[0] == pytest.approx(1.0)


def test_short_query_brute_forces_long_tier():
    idx = OracleIndex(["ABCDEFGH", "ABX"], row_size=1)
    results, scores = idx.search("ABC", threshold=0.5)
    # qlen=3 <= 3: DP over the long tier too; ABC substring of ABCDEFGH -> 1.0;
    # plus gram tier: 1 query gram ABC hits ABCDEFGH -> also 1.0.
    assert "ABCDEFGH" in results
    assert scores[results.index("ABCDEFGH")] == pytest.approx(1.0)
    # ABX: short tier, match=2 -> 2/3.
    assert scores[results.index("ABX")] == pytest.approx(2.0 / 3.0, abs=1e-6)


def test_set_valid_char():
    idx = OracleIndex(["foo-bar", "baz"], row_size=1)
    # '-' invalid by default: "FOO BAR".
    r1, _ = idx.search("foo-bar", threshold=0.9)
    assert r1 == ["foo-bar"]  # exact promotion via escape on both sides
    idx.set_valid_char(b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ-")
    # now '-' survives in the query ("FOO-BAR"), but the index terms were
    # built with the old set ("FOO BAR"): only grams FOO and BAR still hit.
    r2, s2 = idx.search("foo-bar", threshold=0.3)
    assert r2 == ["foo-bar"]
    assert s2[0] == np.float32(2.0) / np.float32(5.0)


def test_wide_strings():
    idx = OracleIndex(
        ["北京烤鸭店", "Càfé au lait", "tokyo"], row_size=1, wide=True
    )
    results, scores = idx.search("北京烤鸭", threshold=0.3)
    assert results[0] == "北京烤鸭店"
    results, _ = idx.search("cafe", threshold=0.3)
    assert results == []  # accents are distinct codepoints
    results, _ = idx.search("càfé au", threshold=0.3)
    assert results[0] == "Càfé au lait"


def test_gram_size_2():
    idx = OracleIndex(["ab", "abcd", "zz"], row_size=1, gram_size=2)
    # long cutoff = 4: "ABCD" is long tier, 3 bigrams.
    assert idx.lib_size() == 3
    results, scores = idx.search("abc", threshold=0.4, limit=0)
    assert "abcd" in results
