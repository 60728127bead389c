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
