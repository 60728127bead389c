"""Binary C-ABI shim (ctypes) with the reference DLL's exact signatures.

The reference's product is an ``extern "C"`` surface (dllmain.cpp:37-151):

  uint32_t indexN(char** words, uint64_t size, uint16_t rowSize, float* weight)
  uint32_t search(uint32_t handle, const char* query, char*** results,
                  float threshold, uint32_t limit)
  uint32_t score(uint32_t handle, const char* query, char*** results,
                 float** scores, float threshold, uint32_t limit)
  void     release(uint32_t handle, char** results, float* scores)
  void     dispose(uint32_t handle)
  uint64_t getSize(uint32_t handle)
  uint64_t getLibSize(uint32_t handle)
  void     setValidChar(uint32_t handle, char* characters, int n)

This module reproduces that surface as ctypes CFUNCTYPE callbacks - int
handles, out-parameters, count returns, and explicit release() ownership of
the allocated result arrays - so a C host (through the CPython API or any
FFI that accepts raw function pointers) drives the library exactly like the
DLL.  ``function_table()`` returns the callbacks plus their raw addresses.

Semantics match api.capi: result strings are COPIES (the reference returns
pointers into its string pool that die with the index, nGramSearch.hpp:
461-468; here release() frees the copies instead), weight is read per
flattened element (nGramSearch.hpp:141-148), limit 0 = unbounded, missing
handle = 0 results.
"""

from __future__ import annotations

import ctypes as ct
import threading

from . import capi

_LOCK = threading.Lock()
# results-array address -> (keepalive objects) while the caller may read it
_LIVE: dict[int, tuple] = {}

_SEARCH_SIG = ct.CFUNCTYPE(
    ct.c_uint32, ct.c_uint32, ct.c_char_p, ct.POINTER(ct.POINTER(ct.c_char_p)),
    ct.c_float, ct.c_uint32,
)
_SCORE_SIG = ct.CFUNCTYPE(
    ct.c_uint32, ct.c_uint32, ct.c_char_p, ct.POINTER(ct.POINTER(ct.c_char_p)),
    ct.POINTER(ct.POINTER(ct.c_float)), ct.c_float, ct.c_uint32,
)
_INDEXN_SIG = ct.CFUNCTYPE(
    ct.c_uint32, ct.POINTER(ct.c_char_p), ct.c_uint64, ct.c_uint16,
    ct.POINTER(ct.c_float),
)
_RELEASE_SIG = ct.CFUNCTYPE(
    None, ct.c_uint32, ct.POINTER(ct.c_char_p), ct.POINTER(ct.c_float)
)
_DISPOSE_SIG = ct.CFUNCTYPE(None, ct.c_uint32)
_GETSIZE_SIG = ct.CFUNCTYPE(ct.c_uint64, ct.c_uint32)
_SETVALID_SIG = ct.CFUNCTYPE(None, ct.c_uint32, ct.c_char_p, ct.c_int)


def _decode(b: bytes | None):
    if b is None:
        return None
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return b.decode("latin-1")


@_INDEXN_SIG
def indexN(words, size, rowSize, weight):
    py_words = [_decode(words[i]) for i in range(size)]
    w = None
    if weight:
        w = [float(weight[i]) for i in range(size)]
    return capi.indexN(py_words, size, rowSize, w)


def _alloc_results(strings):
    """(char** array, keepalive bufs) with a NULL terminator slot."""
    n = len(strings)
    arr = (ct.c_char_p * (n + 1))()
    bufs = []
    for i, s in enumerate(strings):
        b = ct.create_string_buffer(s.encode("utf-8"))
        bufs.append(b)
        arr[i] = ct.cast(b, ct.c_char_p)
    arr[n] = None
    return arr, bufs


@_SEARCH_SIG
def search(handle, query, results, threshold, limit):
    strings = capi.search(
        handle, _decode(query) or "", float(threshold), int(limit)
    )
    if not results:
        return len(strings)
    arr, bufs = _alloc_results(strings)
    ptr = ct.cast(arr, ct.POINTER(ct.c_char_p))
    results[0] = ptr
    with _LOCK:
        _LIVE[ct.addressof(arr)] = (arr, bufs)
    return len(strings)


@_SCORE_SIG
def score(handle, query, results, scores, threshold, limit):
    strings, vals = capi.score(
        handle, _decode(query) or "", float(threshold), int(limit)
    )
    n = len(strings)
    if results:
        arr, bufs = _alloc_results(strings)
        results[0] = ct.cast(arr, ct.POINTER(ct.c_char_p))
        with _LOCK:
            _LIVE[ct.addressof(arr)] = (arr, bufs)
    if scores:
        sarr = (ct.c_float * max(n, 1))(*[float(v) for v in vals])
        scores[0] = ct.cast(sarr, ct.POINTER(ct.c_float))
        with _LOCK:
            _LIVE[ct.addressof(sarr)] = (sarr,)
    return n


@_RELEASE_SIG
def release(handle, results, scores):
    with _LOCK:
        if results:
            _LIVE.pop(ct.addressof(results.contents), None)
        if scores:
            _LIVE.pop(ct.addressof(scores.contents), None)


@_DISPOSE_SIG
def dispose(handle):
    capi.dispose(int(handle))


@_GETSIZE_SIG
def getSize(handle):
    return capi.getSize(int(handle))


@_GETSIZE_SIG
def getLibSize(handle):
    return capi.getLibSize(int(handle))


@_SETVALID_SIG
def setValidChar(handle, characters, n):
    if characters is None:
        return
    capi.setValidChar(int(handle), characters[: n] if n >= 0 else characters)


def function_table():
    """All C-ABI callbacks plus their raw addresses (for a C host)."""
    fns = {
        "indexN": indexN,
        "search": search,
        "score": score,
        "release": release,
        "dispose": dispose,
        "getSize": getSize,
        "getLibSize": getLibSize,
        "setValidChar": setValidChar,
    }
    return {
        name: (fn, ct.cast(fn, ct.c_void_p).value) for name, fn in fns.items()
    }
