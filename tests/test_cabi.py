"""C-ABI shim round trip: drive the library through raw ctypes calling
conventions, mirroring the reference's SearchTest fixture
(SearchTest/test.cpp:7-18, intended row_size=1 contract - SURVEY section 4).
"""

from __future__ import annotations

import ctypes as ct

from stringsearchlib_tpu.api import cabi

WORDS = [b"LWMS", b"LWM", b"LWMA", b"LWYY", b"L", b"I",
         b"GHRSDGSDGS Egdsrtg g"]


def _char_pp(items):
    arr = (ct.c_char_p * len(items))()
    for i, b in enumerate(items):
        arr[i] = b
    return arr


def test_cabi_fixture_roundtrip():
    words = _char_pp(WORDS)
    h = cabi.indexN(words, len(WORDS), 1, None)
    assert h >= 1
    assert cabi.getSize(h) == 7
    assert cabi.getLibSize(h) == 16

    results = ct.POINTER(ct.c_char_p)()
    scores = ct.POINTER(ct.c_float)()
    n = cabi.score(h, b"LWMS", ct.byref(results), ct.byref(scores),
                   ct.c_float(0.5), 0)
    assert n == 4
    got = [(results[i].decode(), round(scores[i], 4)) for i in range(n)]
    assert got[0] == ("LWMS", 100.0)
    assert set(got[1:3]) == {("LWM", 0.75), ("LWMA", 0.75)}
    assert got[3] == ("LWYY", 0.5)
    # NULL terminator present
    assert results[n] is None
    cabi.release(h, results, scores)

    # search-only variant
    res2 = ct.POINTER(ct.c_char_p)()
    n2 = cabi.search(h, b"LWMS", ct.byref(res2), ct.c_float(0.5), 0)
    assert n2 == 4 and res2[0] == b"LWMS"
    cabi.release(h, res2, None)

    # weights: zero weight drops the pair
    w = (ct.c_float * len(WORDS))(*([1.0] * len(WORDS)))
    w[0] = 0.0
    h2 = cabi.indexN(words, len(WORDS), 1, w)
    res3 = ct.POINTER(ct.c_char_p)()
    n3 = cabi.search(h2, b"LWMS", ct.byref(res3), ct.c_float(0.5), 0)
    got3 = [res3[i] for i in range(n3)]
    assert b"LWMS" not in got3
    cabi.release(h2, res3, None)

    # setValidChar then dispose; missing handle -> 0 results
    cabi.setValidChar(h, b"ABC", 3)
    cabi.dispose(h)
    cabi.dispose(h2)
    n4 = cabi.search(h, b"LWMS", ct.byref(res3), ct.c_float(0.5), 0)
    assert n4 == 0
    assert cabi.getSize(h) == 0


def test_cabi_function_table():
    tbl = cabi.function_table()
    assert set(tbl) == {"indexN", "search", "score", "release", "dispose",
                        "getSize", "getLibSize", "setValidChar"}
    for _, (fn, addr) in tbl.items():
        assert isinstance(addr, int) and addr != 0


def test_cabi_guid_narrow_roundtrip():
    """README-documented guid-keyed narrow family through raw ctypes
    (Readme.md:69-85,115-131,157-165,182-186,200-222)."""
    words = _char_pp(WORDS)
    cabi.index_guid(b"fixture-guid", words, len(WORDS), 1, None, 3)
    assert cabi.getSize_guid(b"fixture-guid") == 7
    assert cabi.getLibSize_guid(b"fixture-guid") == 16

    results = ct.POINTER(ct.c_char_p)()
    n = ct.c_uint32(0)
    cabi.search_guid(
        b"fixture-guid", b"LWMS", ct.byref(results), ct.byref(n),
        ct.c_float(0.5), 0,
    )
    assert n.value == 4
    got = [results[i].decode() for i in range(n.value)]
    assert got[0] == "LWMS" and results[n.value] is None
    cabi.release_guid(b"fixture-guid", ct.byref(results), n.value)
    cabi.dispose_guid(b"fixture-guid")
    cabi.search_guid(
        b"fixture-guid", b"LWMS", ct.byref(results), ct.byref(n),
        ct.c_float(0.5), 0,
    )
    assert n.value == 0  # disposed guid -> 0 results


def test_cabi_guid_wide_roundtrip():
    """searchW through raw ctypes: wchar_t in/out (Readme.md:91-109,135)."""
    wide_words = ["café", "naïve", "汉字检索", "übermut", "汉字系统"]
    arr = (ct.c_wchar_p * len(wide_words))(*wide_words)
    cabi.indexW_guid(b"wide-guid", arr, len(wide_words), 1, None, 2)
    assert cabi.getSize_guid(b"wide-guid") == len(wide_words)

    results = ct.POINTER(ct.c_wchar_p)()
    n = ct.c_uint32(0)
    cabi.searchW_guid(
        b"wide-guid", "汉字检索", ct.byref(results), ct.byref(n),
        ct.c_float(0.2), 0,
    )
    assert n.value >= 1
    got = [results[i] for i in range(n.value)]
    assert got[0] == "汉字检索"
    assert "汉字系统" in got  # shares the 汉字 bigram
    cabi.releaseW_guid(b"wide-guid", ct.byref(results), n.value)
    cabi.disposeW_guid(b"wide-guid")


def test_cabi_guid_2d_roundtrip():
    """index2D through raw ctypes: char*** rows + float** weights
    (Readme.md:31-43)."""
    rows_py = [
        [b"ALPHA KEY", b"first description text"],
        [b"BETA KEY", b"second description text"],
    ]
    row_arrs = [(ct.c_char_p * 2)(*r) for r in rows_py]
    key = (ct.POINTER(ct.c_char_p) * 2)(
        *[ct.cast(a, ct.POINTER(ct.c_char_p)) for a in row_arrs]
    )
    w_rows = [(ct.c_float * 2)(1.0, 0.4) for _ in rows_py]
    weight = (ct.POINTER(ct.c_float) * 2)(
        *[ct.cast(a, ct.POINTER(ct.c_float)) for a in w_rows]
    )
    cabi.index2D_guid(b"2d-guid", key, 2, 2, weight, 3)
    results = ct.POINTER(ct.c_char_p)()
    n = ct.c_uint32(0)
    cabi.search_guid(
        b"2d-guid", b"first description", ct.byref(results), ct.byref(n),
        ct.c_float(0.2), 0,
    )
    assert n.value >= 1
    assert results[0] == b"ALPHA KEY"  # description maps to its row key
    cabi.release_guid(b"2d-guid", ct.byref(results), n.value)
    cabi.dispose_guid(b"2d-guid")


def test_cabi_guid_function_table():
    tbl = cabi.function_table_guid()
    assert set(tbl) == {
        "index", "indexW", "index2D", "index2DW", "search", "searchW",
        "release", "releaseW", "dispose", "disposeW", "getSize",
        "getSizeW", "getLibSize", "getLibSizeW",
    }
    for name, (fn, addr) in tbl.items():
        assert isinstance(addr, int) and addr != 0, name
