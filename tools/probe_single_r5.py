"""Round-5 singleton bisect on the cached 10M index: where do ~30 ms of
device time go at b=8 pad on the gathered-row front end?

Stages: tile-major axis-1 row gather alone; gathered kernel (dots);
full gathered front at kb budgets {1024, 256, 128}; guard failures at
each budget (the engine needs the smallest budget that stays exact).

Usage: python tools/probe_single_r5.py [n_keys]
"""

from __future__ import annotations

import os
import random
import sys
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import _mutate, _product_names  # noqa: E402


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


_RTT_MS = [0.0]


def _settle(out):
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    return jax.device_get([leaf.ravel()[:1] for leaf in leaves])


def timeit(name, fn, reps=5):
    import traceback

    try:
        _settle(fn(0))
        ts = []
        for r in range(1, reps + 1):
            t0 = time.perf_counter()
            _settle(fn(r))
            ts.append(time.perf_counter() - t0)
    except Exception:  # noqa: BLE001
        traceback.print_exc()
        log(f"{name}: FAILED")
        return float("nan")
    ms = float(np.median(ts) * 1e3) - _RTT_MS[0]
    log(f"{name}: {ms:.1f} ms net "
        f"(reps {['%.1f' % (t * 1e3) for t in ts]})")
    return ms


def main():
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000

    import jax
    import jax.numpy as jnp

    from stringsearchlib_tpu.index.serialize import load_index
    from stringsearchlib_tpu.search.candidates import (
        candidates_bitmap_gather,
    )
    from stringsearchlib_tpu.search.engine import SearchEngine

    log(f"devices: {jax.devices()}")

    def nop(r):
        return jnp.asarray(np.float32(r)) + 1.0

    _settle(nop(0))
    ts = []
    for r in range(5):
        t0 = time.perf_counter()
        _settle(nop(r))
        ts.append(time.perf_counter() - t0)
    _RTT_MS[0] = float(np.median(ts) * 1e3)
    log(f"rtt {_RTT_MS[0]:.1f} ms")

    host = load_index(f"/tmp/idx_{n_keys}.npz")
    engine = SearchEngine(host)
    engine.GM_BUDGET = 0
    table = host.bitmap_tables(engine.BITMAP_BUDGET)[0]
    di = host.device
    pt, xt = host.prim_tables()

    words = _product_names(n_keys, seed=2)
    rng = random.Random(11)
    # 5 separate singleton inputs (b=8 pad), prepped exactly as the engine
    VAR = []
    for r in range(5):
        q = _mutate(rng, rng.choice(words))
        qnorm, qlen = engine._normalize_query(q)
        items = [(0, qnorm, qlen, host.promo_key_ids(qnorm, qlen))]
        b, qtok, qlens, slots, nqg, use_short, _ = engine._prep_rows(
            items, 32, min_b=8
        )
        plan = engine._gather_rows_plan(slots)
        rows, slots_g, gc = plan
        if gc != 32:
            continue
        promo_a = np.full((b, engine.PROMO_KEYS), -1, np.int32)
        promo_a[0, : items[0][3].size] = items[0][3]
        promo_t, promo_w = engine._promo_tables(promo_a)
        VAR.append(tuple(
            jnp.asarray(a) for a in (
                qtok, qlens, slots_g, nqg, use_short, promo_a, promo_t,
                promo_w, rows,
            )
        ))
    log(f"{len(VAR)} singleton variants at gc=32")
    jax.block_until_ready(VAR)
    lim = jnp.asarray(np.full((8,), 100, np.int32))

    @jax.jit
    def gather_only(t, rows):
        return jnp.take(t, rows, axis=1)

    timeit("axis-1 row gather (32 rows, tile-major)",
           lambda r: gather_only(table, VAR[r % len(VAR)][8]))

    def front(r, kb):
        v = VAR[r % len(VAR)]
        return candidates_bitmap_gather(
            di, table, v[8], pt, xt, v[0], v[1], v[2], v[3], v[4], v[5],
            v[6], v[7], lim, np.float32(0.3),
            compute_short=False, n_cand=1024, n_edge=16384, top_k=128,
            hstar=True, kb1=kb, kb2=kb, hs_fill=0, pair_dots=True,
        )

    for kb in (1024, 256, 128):
        fails = 0
        for r in range(len(VAR)):
            got = jax.device_get(front(r, kb))
            fails += int((~np.asarray(got[4][:1])).sum())
        timeit(f"gathered front kb={kb}", lambda r, kb=kb: front(r, kb))
        log(f"  guard failures {fails}/{len(VAR)}")





def extra_fulltable():
    """Appendix probe: full-table kernel at tiny b (no gather at all)."""
    import jax
    import jax.numpy as jnp

    from stringsearchlib_tpu.index.serialize import load_index
    from stringsearchlib_tpu.ops.bitmap_matmul import bitmap_hits_bmax
    from stringsearchlib_tpu.search.candidates import candidates_bitmap_mxu
    from stringsearchlib_tpu.search.engine import SearchEngine

    def nop(r):
        return jnp.asarray(np.float32(r)) + 1.0

    _settle(nop(0))
    ts = []
    for r in range(5):
        t0 = time.perf_counter()
        _settle(nop(r))
        ts.append(time.perf_counter() - t0)
    _RTT_MS[0] = float(np.median(ts) * 1e3)
    log(f"rtt {_RTT_MS[0]:.1f} ms")

    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    host = load_index(f"/tmp/idx_{n_keys}.npz")
    engine = SearchEngine(host)
    engine.GM_BUDGET = 0
    table = host.bitmap_tables(engine.BITMAP_BUDGET)[0]
    gp = int(table.shape[1])
    di = host.device
    pt, xt = host.prim_tables()

    words = _product_names(n_keys, seed=2)
    rng = random.Random(13)
    VAR = []
    for r in range(5):
        q = _mutate(rng, rng.choice(words))
        qnorm, qlen = engine._normalize_query(q)
        items = [(0, qnorm, qlen, host.promo_key_ids(qnorm, qlen))]
        b, qtok, qlens, slots, nqg, use_short, _ = engine._prep_rows(
            items, 32, min_b=8
        )
        promo_a = np.full((b, engine.PROMO_KEYS), -1, np.int32)
        promo_a[0, : items[0][3].size] = items[0][3]
        promo_t, promo_w = engine._promo_tables(promo_a)
        qcnt = np.zeros((b, gp), np.float32)
        sl = slots[0][slots[0] >= 0]
        np.add.at(qcnt[0], sl, 1.0)
        VAR.append(tuple(
            jnp.asarray(a) for a in (
                qtok, qlens, slots, nqg, use_short, promo_a, promo_t,
                promo_w,
            )
        ) + (jnp.asarray(qcnt, dtype=jnp.bfloat16),))
    jax.block_until_ready(VAR)
    lim = jnp.asarray(np.full((8,), 100, np.int32))

    timeit("full-table kernel b=8 (pair+bmax)",
           lambda r: bitmap_hits_bmax(
               VAR[r % 5][8], table, int8_dots="pair"
           ))

    def front(r):
        v = VAR[r % 5]
        return candidates_bitmap_mxu(
            di, table, pt, xt, v[0], v[1], v[2], v[3], v[4], v[5], v[6],
            v[7], lim, np.float32(0.3),
            compute_short=False, n_edge=16384,
            top_k=128, n_cand=1024, hstar=True, kb1=1024, kb2=1024,
            hs_fill=0, pair_dots=True, fused_bmax=True,
        )

    fails = 0
    for r in range(5):
        got = jax.device_get(front(r))
        fails += int((~np.asarray(got[4][:1])).sum())
    timeit("full-table front b=8 (kernel+finish)", front)
    log(f"  guard failures {fails}/5")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[2] == "full":
        extra_fulltable()
    else:
        main()
