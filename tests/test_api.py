"""API surface tests: handle/guid registries, README variants, quirks."""

import threading

import pytest

from stringsearchlib_tpu import StringSearchIndex
from stringsearchlib_tpu.api import capi
from stringsearchlib_tpu.api.registry import GLOBAL_REGISTRY, RWLock

FIXTURE = ["LWMS", "LWM", "LWMA", "LWYY", "L", "I", "GHRSDGSDGS Egdsrtg g"]


@pytest.fixture(autouse=True)
def clean_registry():
    GLOBAL_REGISTRY.clear()
    yield
    GLOBAL_REGISTRY.clear()


def test_handle_lifecycle():
    h = capi.indexN(FIXTURE, rowSize=1)
    assert h == 1
    assert capi.getSize(h) == 7
    assert capi.getLibSize(h) == 16
    res = capi.search(h, "LWMS", 0.5, 0)
    assert len(res) == 4 and res[0] == "LWMS"
    strings, scores = capi.score(h, "LWMS", 0.5, 0)
    assert scores[0] == 100.0
    capi.release(h, strings, scores)  # no-op
    capi.dispose(h)
    assert capi.search(h, "LWMS") == []
    assert capi.getSize(h) == 0
    capi.dispose(h)  # missing handle ignored


def test_handle_reuse_lowest_free():
    h1 = capi.indexN(["a", "b"], rowSize=1)
    h2 = capi.indexN(["c", "d"], rowSize=1)
    assert (h1, h2) == (1, 2)
    capi.dispose(h1)
    h3 = capi.indexN(["e", "f"], rowSize=1)
    assert h3 == 1  # lowest free handle >= 1 (dllmain.cpp:41-46)


def test_guid_keyed_index():
    capi.index("lib-1", FIXTURE, rowSize=1)
    assert capi.getSize("lib-1") == 7
    assert capi.search("lib-1", "LWMS", 0.5, 0)[0] == "LWMS"
    capi.dispose("lib-1")
    assert capi.search("lib-1", "LWMS") == []


def test_missing_keys_return_zero():
    assert capi.search(42, "q") == []
    assert capi.score("nope", "q") == ([], [])
    assert capi.getSize(42) == 0
    assert capi.getLibSize("nope") == 0


def test_size_truncation():
    h = capi.indexN(FIXTURE + ["EXTRA"], size=7, rowSize=1)
    assert capi.getSize(h) == 7  # size param truncates the flat array


def test_unusable_small_index_still_gets_handle():
    h = capi.indexN(["only"], rowSize=1)
    assert h >= 1  # emplace happens regardless (dllmain.cpp:47)
    assert capi.search(h, "only") == []


def test_index_wide():
    capi.indexW("w", ["北京烤鸭店", "Càfé au lait"], rowSize=1)
    assert capi.searchW("w", "北京烤鸭", 0.3)[0] == "北京烤鸭店"
    assert capi.getSizeW("w") == 2
    capi.disposeW("w")


def test_index2d():
    rows = [
        ["Widget A", "wdgt", "gadget a"],
        ["Widget B", "wb"],
    ]
    capi.index2D("2d", rows)
    assert capi.search("2d", "WDGT", 0.5) == ["Widget A"]
    assert capi.search("2d", "wb", 0.9) == ["Widget B"]


def test_index2d_weights():
    rows = [["keyA", "altA"], ["keyB", "altB"]]
    weight = [[1.0, 0.0], [1.0, 0.5]]
    capi.index2DW("2dw", rows, weight=weight)
    assert capi.searchW("2dw", "ALTA", 0.9) == []
    strings, scores = capi.scoreW("2dw", "ALTB", 0.4)
    assert strings == ["keyB"] and scores[0] == pytest.approx(0.5)


def test_gsize_parameter():
    capi.index("g2", ["ab", "abcd", "zz"], gSize=2)
    assert capi.getLibSize("g2") == 3
    assert "abcd" in capi.search("g2", "abc", 0.4, 0)


def test_set_valid_char():
    h = capi.indexN(["foo-bar", "baz"], rowSize=1)
    assert capi.search(h, "foo-bar", 0.9) == ["foo-bar"]
    capi.setValidChar(h, "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ-")
    strings, scores = capi.score(h, "foo-bar", 0.3)
    assert strings == ["foo-bar"] and scores[0] == pytest.approx(0.4)


def test_pythonic_class():
    idx = StringSearchIndex(FIXTURE)
    assert idx.size() == 7 and idx.lib_size() == 16
    strings, scores = idx.score("LWMS", 0.5, limit=0)
    assert strings[0] == "LWMS" and scores[0] == 100.0
    assert idx.search("lwm", 0.5)[0] in ("LWM", "LWMS")


def test_concurrent_readers_and_writers():
    h = capi.indexN(FIXTURE, rowSize=1)
    errors = []

    def reader():
        try:
            for _ in range(20):
                capi.search(h, "LWMS", 0.5)
                capi.getSize(h)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def writer():
        try:
            for i in range(10):
                hh = capi.indexN(["x", "y"], rowSize=1)
                capi.dispose(hh)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=reader) for _ in range(4)] + [
        threading.Thread(target=writer) for _ in range(2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors


def test_rwlock_excludes_writers():
    lock = RWLock()
    state = {"readers": 0, "writer": False, "max_readers": 0}
    bad = []

    def read_task():
        for _ in range(50):
            with lock.read():
                state["readers"] += 1
                if state["writer"]:
                    bad.append("reader saw writer")
                state["max_readers"] = max(state["max_readers"], state["readers"])
                state["readers"] -= 1

    def write_task():
        for _ in range(20):
            with lock.write():
                if state["readers"] or state["writer"]:
                    bad.append("writer not exclusive")
                state["writer"] = True
                state["writer"] = False

    threads = [threading.Thread(target=read_task) for _ in range(4)] + [
        threading.Thread(target=write_task) for _ in range(2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not bad
