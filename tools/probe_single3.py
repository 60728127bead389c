"""Singleton latency, part 3: honest device-time numbers for the new
kernel-tile gathered front (gp = 32, tile_mult) + engine-level e2e p50.

Times against a measured nop round trip in the SAME run:
  - nop RTT (device_get of a tiny resident array)
  - new front alone (bitmap_hits_bmax on gathered rows, tile_mult)
  - full candidates_bitmap_gather (new internals)
  - engine.search singleton e2e p50/p90 over 32 real mutated queries

Usage: python tools/probe_single3.py [n_keys]
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


def _settle(out):
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    return jax.device_get([leaf.ravel()[:1] for leaf in leaves])


def timeit(name, fn, reps=6):
    _settle(fn(0))
    ts = []
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        _settle(fn(r))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3
    med = sorted(ts)[len(ts) // 2] * 1e3
    log(f"{name}: min {ms:.1f} / med {med:.1f} ms")
    return ms


def main():
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000

    import jax
    import jax.numpy as jnp

    from stringsearchlib_tpu.config import IndexConfig
    from stringsearchlib_tpu.index.build import build_index
    from stringsearchlib_tpu.ops.bitmap_matmul import (
        bitmap_hits_bmax, pick_tile_mult, BLKB,
    )
    from stringsearchlib_tpu.search.candidates import (
        candidates_bitmap_gather,
    )
    from stringsearchlib_tpu.search.engine import SearchEngine

    log(f"devices: {jax.devices()}")
    words = _product_names(n_keys, seed=2)
    rng = random.Random(11)

    cache = f"/tmp/idx_{n_keys}.npz"
    if os.path.exists(cache):
        from stringsearchlib_tpu.index.serialize import load_index

        host = load_index(cache)
        log("loaded cached index")
    else:
        host = build_index(words, 1, None, IndexConfig())
    engine = SearchEngine(host)
    engine.GM_BUDGET = 0
    bm, _ = host.bitmap_tables(engine.BITMAP_BUDGET)
    di = host.device
    pt, xt = host.prim_tables()

    nop = jnp.zeros((8,), jnp.int32) + 1
    nop.block_until_ready()
    timeit("nop RTT", lambda r: nop + r)

    packs = []
    qs = []
    for q in (_mutate(rng, rng.choice(words)) for _ in range(32)):
        qnorm, qlen = engine._normalize_query(q)
        promo = host.promo_key_ids(qnorm, qlen)
        items = [(0, qnorm, qlen, promo)]
        b, qtok, qlens, slots, nqg, us, _ = engine._prep_rows(
            items, 32, min_b=8
        )
        plan = engine._gather_rows_plan(slots)
        if plan is None:
            continue
        rows, slots_g, gc = plan
        promo_a = np.full((b, engine.PROMO_KEYS), -1, np.int32)
        promo_a[0, : promo.size] = promo
        p_t, p_w = engine._promo_tables(promo_a)
        lim = np.full((b,), 100, np.int32)
        packs.append((
            jnp.asarray(rows), jnp.asarray(qtok), jnp.asarray(qlens),
            jnp.asarray(slots_g), jnp.asarray(nqg), jnp.asarray(us),
            jnp.asarray(promo_a), jnp.asarray(p_t), jnp.asarray(p_w),
            jnp.asarray(lim), gc,
        ))
        qs.append(q)
    gcs = sorted({p[-1] for p in packs})
    gc0 = max(gcs, key=lambda g: sum(1 for p in packs if p[-1] == g))
    packs0 = [p for p in packs if p[-1] == gc0]
    vmax = int(packs0[0][3].shape[1])
    nt = int(bm.shape[1]) // BLKB
    tm = pick_tile_mult(8, gc0, nt)
    log(f"gc={gc0} x{len(packs0)}, slot width {vmax}, tile_mult {tm}, "
        f"grid {nt // tm} steps")

    @jax.jit
    def front(bmt, rows, slots_g):
        gc = rows.shape[0]
        qcnt = jax.vmap(
            lambda row: jnp.zeros((gc,), jnp.bfloat16)
            .at[jnp.where(row >= 0, row, gc)]
            .add(1, mode="drop")
        )(slots_g)
        rm = jnp.take(bmt, rows, axis=0)
        return bitmap_hits_bmax(
            qcnt, rm, int8_dots="pair" if vmax <= 31 else True,
            tile_mult=tm,
        )

    timeit("front kernel-tile gp=32", lambda r: front(
        bm, packs0[r % len(packs0)][0], packs0[r % len(packs0)][3]))

    def full(r):
        p = packs0[r % len(packs0)]
        return candidates_bitmap_gather(
            di, bm, p[0], pt, xt, p[1], p[2], p[3], p[4], p[5],
            p[6], p[7], p[8], p[9], np.float32(0.3),
            compute_short=False, n_cand=1024, n_edge=16384,
            top_k=128, block_sel=False, hstar=True, kb1=1024,
            kb2=1024, hs_fill=0,
        )

    timeit("full gather (new front)", full)

    # engine-level e2e singleton p50 (includes prep, fetch, ranking)
    lat = []
    for q in qs:
        engine.search(q, threshold=0.3, limit=100)  # warm compile cache
        break
    for q in qs:
        t0 = time.perf_counter()
        engine.search(q, threshold=0.3, limit=100)
        lat.append(time.perf_counter() - t0)
    lat_ms = sorted(x * 1e3 for x in lat)
    log(f"engine singleton e2e: p50 {lat_ms[len(lat_ms)//2]:.1f} ms, "
        f"p90 {lat_ms[int(len(lat_ms)*0.9)]:.1f} ms, "
        f"min {lat_ms[0]:.1f} ms over {len(lat_ms)}")
    log(f"routing: {engine.last_routing}")


if __name__ == "__main__":
    main()
