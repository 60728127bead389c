"""Unit tests for gram window extraction and packing."""

import numpy as np
import pytest

from stringsearchlib_tpu.core import grams, text


def _gram_list(s, g, wide=False, vocab=None):
    tokens, lengths = text.encode_batch([s], wide=wide)
    ids, valid = grams.gram_ids(tokens, lengths, g, wide, vocab)
    return ids[0][valid[0]].tolist()


def test_trigram_matches_reference_hash():
    # For ASCII g=3 the packed value equals gramHash (nGramSearch.h:147-150).
    got = _gram_list("ABC", 3)
    assert got == [(ord("A") << 16) | (ord("B") << 8) | ord("C")]


def test_window_counts():
    assert _gram_list("ABCD", 3) == [
        (65 << 16) | (66 << 8) | 67,
        (66 << 16) | (67 << 8) | 68,
    ]
    assert _gram_list("AB", 3) == []
    assert _gram_list("", 3) == []
    assert len(_gram_list("ABCD", 2)) == 3
    assert len(_gram_list("ABCDE", 4)) == 2


def test_duplicates_preserved_query_side():
    ids = _gram_list("AAAA", 3)
    assert len(ids) == 2 and ids[0] == ids[1]


def test_unique_grams_per_row():
    tokens, lengths = text.encode_batch(["AAAA"], wide=False)
    ids, valid = grams.gram_ids(tokens, lengths, 3, False)
    uids, uvalid = grams.unique_grams_per_row(ids, valid)
    assert uvalid.sum() == 1


def test_wide_packing_injective():
    a = _gram_list("北京烤", 3, wide=True)
    b = _gram_list("北京鸭", 3, wide=True)
    assert a != b and len(a) == len(b) == 1


def test_wide_g4_vocab():
    tokens, _ = text.encode_batch(["北京烤鸭店"], wide=True)
    vocab = grams.WideVocab(tokens.ravel())
    ids = _gram_list("北京烤鸭店", 4, wide=True, vocab=vocab)
    assert len(ids) == 2 and ids[0] != ids[1]
    # unseen codepoint maps through id 0, producing a gram no index row has
    unseen = _gram_list("XXXX", 4, wide=True, vocab=vocab)
    assert unseen[0] not in ids


def test_distinct_count_fixture():
    # "GHRSDGSDGS EGDSRTG G" -> 18 trigrams, 16 distinct (test.cpp:15).
    s = "GHRSDGSDGS EGDSRTG G"
    ids = _gram_list(s, 3)
    assert len(ids) == 18
    assert len(set(ids)) == 16
