"""Unit tests for vectorized normalization vs the oracle's char-level ops."""

import numpy as np

from stringsearchlib_tpu.core import text
from stringsearchlib_tpu.utils.oracle import OracleIndex


def _oracle():
    return OracleIndex(["a", "b"], row_size=1)


def _norm_via_matrix(strings, upper=True, wide=False):
    tables = text.TextTables(wide=wide)
    tokens, lengths = text.encode_batch(strings, wide=wide)
    out, out_len = text.normalize_matrix(tokens, lengths, tables, upper=upper)
    return [text.decode_row(out[i], int(out_len[i]), wide) for i in range(len(strings))]


def test_normalize_matches_oracle():
    oracle = _oracle()
    cases = [
        "  hello world  ",
        "MiXeD-CaSe!",
        "...",
        "",
        "\t tabs\tand\nnewlines \r",
        "a!b@c#d$e%f",
        "   ",
        "UPPER lower 0123",
    ]
    got = _norm_via_matrix(cases)
    want = [oracle.normalize(c) for c in cases]
    assert got == want


def test_normalize_no_upper_matches_oracle():
    oracle = _oracle()
    cases = ["  Foo-Bar  ", "LWMS", "x!y"]
    got = _norm_via_matrix(cases, upper=False)
    want = [oracle.normalize(c, upper=False) for c in cases]
    assert got == want


def test_wide_normalize():
    oracle = OracleIndex(["北", "京"], row_size=1, wide=True)
    cases = ["  北京 café ", "Ärger!", "ｗｉｄｅ"]
    got = _norm_via_matrix(cases, wide=True)
    want = [oracle.normalize(c) for c in cases]
    assert got == want


def test_trim_all_space_row():
    tables = text.TextTables()
    tokens, lengths = text.encode_batch(["   ", "a"], wide=False)
    out, out_len = text.trim_matrix(tokens, lengths, tables)
    assert out_len.tolist() == [0, 1]
    assert (out[0] == 0).all()


def test_escape_blank_preserves_pad():
    tables = text.TextTables()
    tokens, lengths = text.encode_batch(["a!b", "xy"], wide=False)
    out = text.escape_blank_matrix(tokens, lengths, tables)
    assert text.decode_row(out[0], 3, False) == "a b"
    assert out[1, 2] == 0  # pad untouched


def test_upper_only_ascii_lowercase():
    tables = text.TextTables()
    tokens, lengths = text.encode_batch(["abZ9.", "\xe9"], wide=False)
    out = text.upper_matrix(tokens, lengths, tables)
    assert text.decode_row(out[0], 5, False) == "ABZ9."
    # latin-1 e-acute is untouched by C toupper in the C locale
    assert text.decode_row(out[1], 1, False) == "\xe9"


def _upper_wide(s, mode):
    tables = text.TextTables(wide=True, wide_upper=mode)
    tokens, lengths = text.encode_batch([s], wide=True)
    out = text.upper_matrix(tokens, lengths, tables)
    return text.decode_row(out[0], int(lengths[0]), True)


def test_wide_upper_divergent_codepoints():
    """The towupper parity decision (IndexConfig.wide_upper), pinned on
    exactly the codepoints where C towupper / Unicode full / Unicode
    simple uppercase disagree (reference: nGramSearch.h:83-87)."""
    cases = [
        # (input, simple-mode expected, note)
        ("\xe9", "\xc9", "e-acute -> E-acute (latin-1 range)"),
        ("\xff", "Ÿ", "y-diaeresis -> U+0178 (maps above 256)"),
        ("\xdf", "\xdf", "sharp s: full upper SS is 2 cps -> unchanged"),
        ("ı", "I", "dotless i -> ASCII I"),
        ("İ", "İ", "dotted capital I already uppercase"),
        ("ﬁ", "ﬁ", "fi ligature: full upper FI -> unchanged"),
        ("\xb5", "Μ", "micro sign -> greek capital mu"),
        ("ǆ", "Ǆ", "dz-caron digraph -> DZ-caron (simple map)"),
    ]
    for s, want, note in cases:
        assert _upper_wide(s, "simple") == want, note
        # "c" mode: C-locale towupper touches ASCII only
        assert _upper_wide(s, "c") == s, note
    # both modes agree on ASCII
    assert _upper_wide("abz", "simple") == "ABZ"
    assert _upper_wide("abz", "c") == "ABZ"


def test_wide_upper_modes_match_oracle():
    cases = ["Stra\xdfe", "ırmak", "caf\xe9 \xff", "ﬁne"]
    for mode in ("simple", "c"):
        oracle = OracleIndex(["a", "b"], row_size=1, wide=True,
                             wide_upper=mode)
        tables = text.TextTables(wide=True, wide_upper=mode)
        tokens, lengths = text.encode_batch(cases, wide=True)
        out, out_len = text.normalize_matrix(tokens, lengths, tables)
        got = [text.decode_row(out[i], int(out_len[i]), True)
               for i in range(len(cases))]
        assert got == [oracle.normalize(c) for c in cases], mode
