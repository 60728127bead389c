"""Singleton-latency stage breakdown on the gathered front end (10M).

Times, at b = 8 pad (the engine's singleton shape):
  1. gather+dots front alone (hits materialized, no selection)
  2. full candidates_bitmap_gather at h* budgets kb 1024 / 512 / 256
     x n_cand 1024 / 256, with per-budget guard-failure counts over 32
     real mutated queries (failures escalate, costing a second pass)

Usage: python tools/probe_single_r4.py [n_keys]
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


def timeit(name, fn, reps=3):
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
    ms = min(ts) * 1e3
    log(f"{name}: {ms:.1f} ms (reps {[f'{t*1e3:.1f}' for t in ts]})")
    return ms


def main():
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000

    import jax
    import jax.numpy as jnp

    from stringsearchlib_tpu.config import IndexConfig
    from stringsearchlib_tpu.index.build import build_index
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
    gp = int(bm.shape[0])

    # 32 singleton query rows, one prep per query (engine singleton shape)
    packs = []
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
    gcs = sorted({p[-1] for p in packs})
    log(f"{len(packs)} singleton packs, gc buckets {gcs}")
    gc0 = max(gcs, key=lambda g: sum(1 for p in packs if p[-1] == g))
    packs0 = [p for p in packs if p[-1] == gc0]
    log(f"timing bucket gc={gc0}: {len(packs0)} packs")

    # 1. front alone: gather + 8 plane dots + hits (no selection)
    from stringsearchlib_tpu.ops.bitmap_matmul import BLKB

    @jax.jit
    def front(bmt, rows, slots_g):
        gc = rows.shape[0]
        qcnt = jax.vmap(
            lambda row: jnp.zeros((gc,), jnp.int8)
            .at[jnp.where(row >= 0, row, gc)]
            .add(1, mode="drop")
        )(slots_g)
        rm = jnp.take(bmt, rows, axis=0)
        u = rm.astype(jnp.uint8)
        nb = rm.shape[1]
        nt = nb // BLKB
        accs = []
        for p in range(8):
            op = ((u >> p) & jnp.uint8(1)).astype(jnp.int8)
            acc = jnp.dot(qcnt, op, preferred_element_type=jnp.int32)
            accs.append(acc.reshape(8, nt, BLKB))
        return jnp.stack(accs, axis=2).reshape(8, nt * 8 * BLKB).astype(
            jnp.int8
        )

    timeit(
        "front (gather+dots+hits)",
        lambda r: front(bm, packs0[r][0], packs0[r][3]),
        reps=4,
    )

    # 2. full gathered call at budget variants
    for kb in (1024, 512, 256):
        for ncand in (1024, 256):
            if ncand > kb * 128:
                continue
            def full(r, kb=kb, ncand=ncand):
                p = packs0[r % len(packs0)]
                return candidates_bitmap_gather(
                    di, bm, p[0], pt, xt, p[1], p[2], p[3], p[4], p[5],
                    p[6], p[7], p[8], p[9], np.float32(0.3),
                    compute_short=False, n_cand=ncand, n_edge=16384,
                    top_k=128, block_sel=False, hstar=True, kb1=kb,
                    kb2=kb, hs_fill=0,
                )
            ms = timeit(f"full kb={kb} n_cand={ncand}", full, reps=4)
            if ms == ms:  # not nan: count guard failures (one gc bucket
                # to bound compiles)
                fails = 0
                for p in packs0:
                    res = candidates_bitmap_gather(
                        di, bm, p[0], pt, xt, p[1], p[2], p[3], p[4],
                        p[5], p[6], p[7], p[8], p[9], np.float32(0.3),
                        compute_short=False, n_cand=ncand, n_edge=16384,
                        top_k=128, block_sel=False, hstar=True, kb1=kb,
                        kb2=kb, hs_fill=0,
                    )
                    ex = np.asarray(jax.device_get(res[4]))
                    fails += 0 if ex[0] else 1
                log(f"  guard failures at kb={kb} n_cand={ncand}: "
                    f"{fails}/{len(packs0)}")


if __name__ == "__main__":
    main()
