"""Save/load round-trip: a loaded index is bit-identical to the built one."""

import io

import numpy as np
import pytest

from stringsearchlib_tpu.config import IndexConfig
from stringsearchlib_tpu.index.build import build_index
from stringsearchlib_tpu.index.serialize import (
    FORMAT_VERSION, load_index, save_index,
)
from stringsearchlib_tpu.search.engine import SearchEngine

WORDS = [
    "LWMS", "LWM", "LWMA", "LWYY", "L", "I", "GHRSDGSDGS Egdsrtg g",
    "telephone", "telegraph", "photograph", "microscope", "wdgt",
]


def _roundtrip(host):
    buf = io.BytesIO()
    save_index(host, buf)
    buf.seek(0)
    return load_index(buf)


def test_roundtrip_narrow(tmp_path):
    host = build_index(WORDS, 1, None, IndexConfig())
    path = tmp_path / "idx.npz"
    save_index(host, path)
    loaded = load_index(path)

    assert loaded.n_terms == host.n_terms
    assert loaded.n_grams == host.n_grams
    assert loaded.config == host.config
    np.testing.assert_array_equal(loaded.gram_ids, host.gram_ids)
    for f in ("gram_ptr", "gram_terms", "edge_term", "edge_key"):
        np.testing.assert_array_equal(
            np.asarray(getattr(loaded.device, f)),
            np.asarray(getattr(host.device, f)),
        )

    e1, e2 = SearchEngine(host), SearchEngine(loaded)
    for q in ("LWMS", "teleph", "photogra", "xyz", "*", ""):
        r1, s1 = e1.search(q, 0.3, 10)
        r2, s2 = e2.search(q, 0.3, 10)
        assert r1 == r2
        assert s1 == s2


def test_roundtrip_weights_and_rows():
    host = build_index(
        ["key a", "alias one", "key b", "alias two"], 2, [1.0, 0.5, 1.0, 0.25]
    )
    loaded = _roundtrip(host)
    e1, e2 = SearchEngine(host), SearchEngine(loaded)
    for q in ("alias", "key", "*"):
        assert e1.search(q, 0.0, 5) == e2.search(q, 0.0, 5)


def test_roundtrip_wide():
    words = ["café crème", "中文搜索引擎", "naïve test"]
    host = build_index(words, 1, None, IndexConfig(wide=True))
    loaded = _roundtrip(host)
    e1, e2 = SearchEngine(host), SearchEngine(loaded)
    for q in ("café", "中文搜", "naive"):
        assert e1.search(q, 0.0, 5) == e2.search(q, 0.0, 5)


def test_roundtrip_wide_g4_vocab():
    words = ["中文搜索引擎字符", "abcdefgh ijklmnop"]
    host = build_index(words, 1, None, IndexConfig(gram_size=4, wide=True))
    loaded = _roundtrip(host)
    assert loaded.vocab is not None
    np.testing.assert_array_equal(
        loaded.vocab.codepoints, host.vocab.codepoints
    )
    e1, e2 = SearchEngine(host), SearchEngine(loaded)
    assert e1.search("中文搜索", 0.0, 5) == e2.search(
        "中文搜索", 0.0, 5
    )


def test_version_guard(tmp_path):
    host = build_index(WORDS, 1, None, IndexConfig())
    path = tmp_path / "idx.npz"
    save_index(host, path)
    with np.load(path) as z:
        payload = {k: z[k] for k in z.files}
    payload["format_version"] = np.int64(FORMAT_VERSION + 1)
    np.savez(path, **payload)
    with pytest.raises(ValueError, match="format version"):
        load_index(path)


def test_set_valid_char_survives_roundtrip():
    host = build_index(WORDS, 1, None, IndexConfig())
    host.set_valid_char(b"ABCDEFGHIJKLMNOPQRSTUVWXYZ")
    loaded = _roundtrip(host)
    assert loaded.tables.valid_chars == host.tables.valid_chars
    e1, e2 = SearchEngine(host), SearchEngine(loaded)
    assert e1.search("LWMS", 0.3, 5) == e2.search("LWMS", 0.3, 5)
