"""saveIndex/loadIndex through the flat C-style API."""

from stringsearchlib_tpu.api import capi

WORDS = ["LWMS", "LWM", "LWMA", "LWYY", "L", "I", "GHRSDGSDGS Egdsrtg g"]


def test_save_load_handle(tmp_path):
    h = capi.indexN(WORDS, rowSize=1)
    path = tmp_path / "idx.npz"
    assert capi.saveIndex(h, path)
    h2 = capi.loadIndex(path)
    assert h2 != h
    assert capi.getSize(h2) == capi.getSize(h) == 7
    assert capi.getLibSize(h2) == 16
    assert capi.score(h2, "LWMS", 0.5, 0) == capi.score(h, "LWMS", 0.5, 0)
    capi.dispose(h)
    capi.dispose(h2)


def test_save_missing_handle(tmp_path):
    assert not capi.saveIndex(999999, tmp_path / "x.npz")


def test_load_guid(tmp_path):
    h = capi.indexN(WORDS, rowSize=1)
    path = tmp_path / "idx.npz"
    capi.saveIndex(h, path)
    capi.dispose(h)
    key = capi.loadIndex(path, guid="restored")
    assert key == "restored"
    assert capi.getSize("restored") == 7
    capi.dispose("restored")
