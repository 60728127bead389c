"""Pallas DP kernel vs the XLA formulation and the oracle (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tools.experimental import dp_pallas
from stringsearchlib_tpu.search.editdist import dp_match
from stringsearchlib_tpu.utils.oracle import OracleIndex


@pytest.fixture(autouse=True)
def _interpret():
    old = dp_pallas.INTERPRET
    dp_pallas.INTERPRET = True
    yield
    dp_pallas.INTERPRET = old


def _encode(words, width):
    toks = np.zeros((len(words), width), np.int32)
    lens = np.zeros(len(words), np.int32)
    for i, w in enumerate(words):
        b = w.encode()[:width]
        toks[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    return jnp.asarray(toks), jnp.asarray(lens)


WORDS = ["LWMS", "LWM", "LWMA", "LWYY", "L", "I", "AB", "ZZZZZ", "QWERT"]
QUERIES = ["LWMS", "LW", "A", "ZZZ", "QWERTY12", "MMMM"]


def test_matches_xla_dp():
    toks, lens = _encode(WORDS, 8)
    qp = 8
    qt = np.zeros((len(QUERIES), qp), np.int32)
    ql = np.zeros(len(QUERIES), np.int32)
    for i, q in enumerate(QUERIES):
        b = q.encode()[:qp]
        qt[i, : len(b)] = np.frombuffer(b, np.uint8)
        ql[i] = len(b)
    got = np.asarray(
        dp_pallas.dp_match_batch(toks, lens, jnp.asarray(qt), jnp.asarray(ql), tile=8)
    )
    for i in range(len(QUERIES)):
        want = np.asarray(
            dp_match(toks, lens, jnp.asarray(qt[i]), jnp.int32(ql[i]))
        )
        np.testing.assert_array_equal(got[i], want, err_msg=QUERIES[i])


def test_matches_oracle_string_match():
    oracle = OracleIndex(["x"], row_size=1)  # just for _string_match
    words = ["BANANA", "BAND", "ANA", "NAB", "XYZ"]
    toks, lens = _encode(words, 8)
    for q in ["ANA", "BAN", "NA", "B", "Q"]:
        qb = q.encode()
        qt = np.zeros((1, 8), np.int32)
        qt[0, : len(qb)] = np.frombuffer(qb, np.uint8)
        got = np.asarray(
            dp_pallas.dp_match_batch(
                toks, lens, jnp.asarray(qt),
                jnp.asarray([len(qb)], np.int32), tile=8,
            )
        )[0]
        for i, w in enumerate(words):
            assert got[i] == oracle.string_match(q, w), (q, w, got[i])


def test_uneven_tile_and_empty():
    toks, lens = _encode(WORDS, 8)
    qt = jnp.asarray(np.zeros((1, 8), np.int32))
    ql = jnp.asarray(np.array([0], np.int32))
    out = dp_pallas.dp_match_batch(toks, lens, qt, ql, tile=4)
    assert out.shape == (1, len(WORDS))
    empty = dp_pallas.dp_match_batch(
        jnp.zeros((0, 8), jnp.int32), jnp.zeros(0, jnp.int32), qt, ql
    )
    assert empty.shape == (1, 0)
