"""Failure recovery (SURVEY section 5): search is stateless per batch, so
recovery = re-shard from host arrays (or reload from a checkpoint) and
re-run; results must be identical."""

import io

import numpy as np

from stringsearchlib_tpu.config import IndexConfig
from stringsearchlib_tpu.index.build import build_index
from stringsearchlib_tpu.index.serialize import load_index, save_index
from stringsearchlib_tpu.parallel.dist import (
    ShardedEngine, make_mesh, shard_index,
)

WORDS = [
    "telephone", "telegraph", "photograph", "telescope", "microphone",
    "phonograph", "graphite", "telephony", "phone", "graph", "tele",
    "LWMS", "LWM", "LWMA", "L", "a b c",
]
QUERIES = ["telephon", "graph", "LWMS", "tele", "micro phone"]


def _results(engine):
    return [engine.search(q, 0.2, 10) for q in QUERIES]


def test_reshard_reproduces_results():
    host = build_index(WORDS, 1, None, IndexConfig())
    mesh = make_mesh(4)
    first = _results(ShardedEngine(shard_index(host, 4), mesh))
    # simulate losing the sharded state: re-shard from the host index
    again = _results(ShardedEngine(shard_index(host, 4), make_mesh(4)))
    assert first == again


def test_checkpoint_then_reshard_reproduces_results():
    host = build_index(WORDS, 1, None, IndexConfig())
    want = _results(ShardedEngine(shard_index(host, 4), make_mesh(4)))
    buf = io.BytesIO()
    save_index(host, buf)
    buf.seek(0)
    loaded = load_index(buf)
    got = _results(ShardedEngine(shard_index(loaded, 4), make_mesh(4)))
    assert got == want


def test_shard_count_change_reproduces_results():
    """Elastic recovery onto a different mesh size gives identical
    results (global merge is a max; shard layout cannot matter)."""
    host = build_index(WORDS, 1, None, IndexConfig())
    r2 = _results(ShardedEngine(shard_index(host, 2), make_mesh(2)))
    r8 = _results(ShardedEngine(shard_index(host, 8), make_mesh(8)))
    assert r2 == r8
