"""Bucket-sketch candidate path: exactness vs the dense path.

The sketch front end (search.sketch) selects candidates from hashed-bucket
upper bounds and re-scores them exactly from the term->gram table; rows
whose guard fails escalate and ultimately recompute densely.  The public
results must therefore be bit-identical to the dense path for every
query/threshold/limit - including under heavy bucket collisions (tiny D).
"""

from __future__ import annotations

import numpy as np
import pytest

from stringsearchlib_tpu.config import IndexConfig
from stringsearchlib_tpu.index.build import build_index
from stringsearchlib_tpu.search.engine import SearchEngine


def _corpus(n, seed=3, alpha="ABCDEFGHIJKLMNOP", lo=4, hi=20):
    rng = np.random.default_rng(seed)
    return [
        "".join(rng.choice(list(alpha), size=rng.integers(lo, hi)))
        for _ in range(n)
    ]


def _queries(words, seed=5, n=48):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        w = words[rng.integers(len(words))]
        lo = rng.integers(0, max(len(w) - 4, 1))
        out.append(w[lo : lo + rng.integers(4, 14)])
    out += [words[0], words[1].lower(), "ZZZZQQ", "ABCD"]
    return out


def _sketch_engine(host, budget=6 << 30):
    eng = SearchEngine(host)
    eng.GM_BUDGET = 0  # no dense incidence -> sketch eligible
    eng.BITMAP_BUDGET = 0  # no packed incidence either
    eng.SKETCH_MIN_TERMS = 0
    eng.CAND_MIN_TERMS = 0
    eng.SKETCH_BUDGET = budget
    return eng


def _assert_parity(eng, queries, thresholds=(0.0, 0.3, 0.6), limits=(5, 100)):
    for thr in thresholds:
        for lim in limits:
            got = eng.search_batch(queries, thr, lim, mode="candidates")
            want = eng.search_batch(queries, thr, lim, mode="dense")
            for q, a, b in zip(queries, got, want):
                assert a == b, (q, thr, lim, a[:3], b[:3])


def test_sketch_parity_narrow_g3():
    words = _corpus(3000)
    host = build_index(words, 1, None, IndexConfig())
    eng = _sketch_engine(host)
    assert host.sketch_tables() is not None
    _assert_parity(eng, _queries(words))


def test_sketch_parity_tiny_buckets():
    """128 buckets over a large gram space: heavy collisions make the
    upper bounds loose; escalation + guard must keep results exact."""
    words = _corpus(2000, seed=11)
    host = build_index(words, 1, None, IndexConfig())
    tl = int(host.device.long_lengths.shape[0])
    # budget that only allows d_log2 = 7
    from stringsearchlib_tpu.search.sketch import _TILE

    tlp = -(-tl // _TILE) * _TILE
    eng = _sketch_engine(host, budget=128 * tlp)
    sk = host.sketch_tables(eng.SKETCH_BUDGET)
    assert sk is not None and sk[3] == 7
    _assert_parity(eng, _queries(words, seed=13))


def test_sketch_parity_g2():
    words = _corpus(1500, seed=17, lo=3, hi=12)
    host = build_index(words, 1, None, IndexConfig(gram_size=2))
    eng = _sketch_engine(host)
    assert host.sketch_tables() is not None
    _assert_parity(eng, _queries(words, seed=19), thresholds=(0.0, 0.4))


def test_sketch_parity_wide():
    """Wide strings route through the numpy sketch builder."""
    rng = np.random.default_rng(23)
    alpha = list("ABCDEFÉÜ中文日本")
    words = [
        "".join(rng.choice(alpha, size=rng.integers(5, 16)))
        for _ in range(800)
    ]
    host = build_index(words, 1, None, IndexConfig(wide=True))
    eng = _sketch_engine(host)
    assert host.sketch_tables() is not None
    _assert_parity(eng, _queries(words, seed=29), thresholds=(0.0, 0.3))


def test_sketch_parity_weights_and_rows():
    """2D rows (term -> shared master key), zero and negative weights."""
    rng = np.random.default_rng(31)
    words = _corpus(1800, seed=31)
    row = 3
    n = len(words) - len(words) % row
    words = words[:n]
    weights = rng.choice(
        [1.0, 0.5, 2.0, 0.0, -0.5], size=n, p=[0.5, 0.2, 0.15, 0.1, 0.05]
    )
    host = build_index(words, row, weights.tolist(), IndexConfig())
    eng = _sketch_engine(host)
    _assert_parity(eng, _queries(words, seed=37), thresholds=(0.0, 0.3))


def test_sketch_device_matches_host_build():
    """The on-device sketch builder must agree with the numpy builder."""
    from stringsearchlib_tpu.search import sketch as sketchlib
    import jax.numpy as jnp

    words = _corpus(700, seed=41)
    host = build_index(words, 1, None, IndexConfig())
    d = host.device
    tl = int(d.long_lengths.shape[0])
    tlp = -(-tl // sketchlib._TILE) * sketchlib._TILE
    tgw = int(d.long_tokens.shape[1]) - host.config.gram_size + 1
    inc_d, tg_d = sketchlib.build_sketch_device(
        d.long_tokens, d.long_lengths,
        jnp.asarray(host.gram_ids.astype(np.int32)),
        gram_size=host.config.gram_size, d_log2=9, tl_pad=tlp, tgw=tgw,
    )
    inc_h, tg_h = sketchlib.build_sketch_host(
        np.asarray(d.long_tokens), np.asarray(d.long_lengths),
        host.lookup_gram_slots, host.config.gram_size, False, None,
        9, tlp, tgw,
    )
    np.testing.assert_array_equal(np.asarray(tg_d), np.asarray(tg_h))
    np.testing.assert_array_equal(np.asarray(inc_d), np.asarray(inc_h))


def test_sketch_upper_bound_property():
    """Sketch hit counts must never under-count true hits (soundness of
    the selection bound and the exactness guard)."""
    from stringsearchlib_tpu.search import sketch as sketchlib
    import jax.numpy as jnp

    words = _corpus(900, seed=43)
    host = build_index(words, 1, None, IndexConfig())
    sk = host.sketch_tables(1 << 26)
    assert sk is not None
    inc, tg, wmax_pad, d_log2 = sk
    inc_np, tg_np = np.asarray(inc), np.asarray(tg)

    rng = np.random.default_rng(47)
    eng = SearchEngine(host)
    for _ in range(40):
        w = words[rng.integers(len(words))]
        q = w[: rng.integers(4, max(len(w), 5))]
        qnorm, qlen = eng._normalize_query(q)
        if qlen < host.config.gram_size + 1:
            continue
        _, _, slots, nqg, _ = eng._query_buffers(qnorm, qlen)
        qs = slots[slots >= 0]
        # true hits per long term: distinct-slot membership with query
        # multiplicity
        true_hits = (tg_np[:, :, None] == qs[None, None, :]).sum(
            axis=(1, 2)
        )
        bk = sketchlib.bucket_of_np(qs, d_log2)
        qcnt = np.bincount(bk, minlength=inc_np.shape[0])
        sketch_hits = qcnt @ inc_np
        assert (sketch_hits >= true_hits).all()


def test_packed_inc_matches_unpacked():
    """Packed device build == pack(unpacked device build), and the numpy
    packer agrees."""
    from stringsearchlib_tpu.search import sketch as sketchlib
    import jax.numpy as jnp

    words = _corpus(900, seed=51)
    host = build_index(words, 1, None, IndexConfig())
    d = host.device
    tl = int(d.long_lengths.shape[0])
    tlp = -(-tl // sketchlib._TILE) * sketchlib._TILE
    tgw = int(d.long_tokens.shape[1]) - host.config.gram_size + 1
    kw = dict(gram_size=host.config.gram_size, d_log2=9, tl_pad=tlp, tgw=tgw)
    gids = jnp.asarray(host.gram_ids.astype(np.int32))
    inc, tg = sketchlib.build_sketch_device(
        d.long_tokens, d.long_lengths, gids, **kw
    )
    pinc, ptg = sketchlib.build_sketch_device_packed(
        d.long_tokens, d.long_lengths, gids, **kw
    )
    np.testing.assert_array_equal(np.asarray(tg), np.asarray(ptg))
    want = sketchlib.pack_inc_np(np.asarray(inc))
    np.testing.assert_array_equal(np.asarray(pinc), want)


def test_sketch_packed_parity(monkeypatch):
    """Engine parity on the PACKED sketch route (kernel in interpret
    mode); routing must show sketch_packed."""
    import functools

    import jax

    from stringsearchlib_tpu.search import sketch as sketchlib
    from stringsearchlib_tpu.search import engine as emod

    words = _corpus(2200, seed=53)
    host = build_index(words, 1, None, IndexConfig())
    eng = _sketch_engine(host)
    monkeypatch.setattr(
        emod, "jax", emod.jax
    )
    monkeypatch.setattr(emod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(
        sketchlib, "candidates_sketch",
        functools.partial(sketchlib.candidates_sketch, interpret=True),
    )
    # the engine imports candidates_sketch per call from .sketch
    import stringsearchlib_tpu.search.candidates  # noqa: F401

    queries = _queries(words, seed=57, n=24)
    got = eng.search_batch(queries, 0.3, 10, mode="candidates")
    assert eng.last_routing["variant"] in ("sketch_packed", "sketch")
    monkeypatch.setattr(emod.jax, "default_backend", jax.default_backend)
    want = eng.search_batch(queries, 0.3, 10, mode="dense")
    for q, a, b in zip(queries, got, want):
        assert a == b, (q, a[:3], b[:3])
