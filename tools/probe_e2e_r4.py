"""End-to-end decomposition of the 10M headline path (round 4).

probe_hstar_stages measured front (kernel+selection) = 75 ms/256-chunk,
but e2e = ~196 ms/chunk (1,307 q/s).  This probe finds the other
~120 ms: host prep, dispatch, device compute, result fetch, emit, and
the guard-retry passes.

Usage: python tools/probe_e2e_r4.py [n_keys] [n_queries]
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


def main():
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    import jax
    import jax.numpy as jnp

    from stringsearchlib_tpu.config import IndexConfig
    from stringsearchlib_tpu.index.build import build_index
    from stringsearchlib_tpu.search.engine import SearchEngine

    log(f"devices: {jax.devices()}")
    words = _product_names(n_keys, seed=2)
    rng = random.Random(7)
    queries = [_mutate(rng, rng.choice(words)) for _ in range(n_q)]

    cache = f"/tmp/idx_{n_keys}.npz"
    if os.path.exists(cache):
        from stringsearchlib_tpu.index.serialize import load_index

        host = load_index(cache)
        log("loaded cached index")
    else:
        host = build_index(words, 1, None, IndexConfig())
        jax.device_get(host.device.gram_ptr[:1])
        from stringsearchlib_tpu.index.serialize import save_index

        save_index(host, cache)
        log("saved index cache")

    engine = SearchEngine(host)
    engine.GM_BUDGET = 0
    host.bitmap_tables(engine.BITMAP_BUDGET)

    # warm (compile)
    t0 = time.time()
    engine.search_batch(queries, 0.3, 100, batch_bucket=512)
    log(f"warm batch {time.time()-t0:.1f}s, routing {engine.last_routing}")

    for rep in range(3):
        t0 = time.perf_counter()
        engine.search_batch(queries, 0.3, 100, batch_bucket=512)
        dt = time.perf_counter() - t0
        log(f"e2e rep{rep}: {dt*1e3:.1f} ms -> {n_q/dt:.0f} q/s "
            f"(retry_fast {engine.last_routing.get('retry_fast')}, "
            f"retry_full {engine.last_routing.get('retry_full', 0)})")

    # --- stage decomposition of one batch -------------------------------
    # 1. host prep (normalize, promo, gram slots)
    t0 = time.perf_counter()
    items = []
    for pos, q in enumerate(queries):
        qnorm, qlen = engine._normalize_query(q)
        promo = host.promo_key_ids(qnorm, qlen)
        items.append((pos, qnorm, qlen, promo))
    t_norm = time.perf_counter() - t0
    qp = 32
    t0 = time.perf_counter()
    b, qtok, qlens, slots, nqg, use_short, s_cap = engine._prep_rows(
        items, qp
    )
    t_prep = time.perf_counter() - t0
    t0 = time.perf_counter()
    promo_all = np.full((b, engine.PROMO_KEYS), -1, dtype=np.int32)
    for r, item in enumerate(items):
        promo_all[r, : item[3].size] = item[3]
    promo_t, promo_w = engine._promo_tables(promo_all)
    t_promo = time.perf_counter() - t0
    log(f"host: normalize+promo_ids {t_norm*1e3:.1f} ms, prep_rows "
        f"{t_prep*1e3:.1f} ms, promo_tables {t_promo*1e3:.1f} ms "
        f"(per {n_q} queries)")
    log(f"n_short={host.device.n_short} n_long={host.device.n_long} "
        f"compute_short={bool(use_short.any())} "
        f"n_use_short={int(use_short.sum())}")

    # 2. result fetch cost: a representative device-resident result tuple
    step = 256
    top_k = 128

    @jax.jit
    def fake_result(seed):
        k = jax.random.PRNGKey(seed)
        ids = jax.random.randint(k, (step, top_k), 0, 1 << 20)
        return (
            jnp.ones((step,), jnp.int32),
            ids,
            jnp.ones((step, top_k), jnp.float32),
            jnp.ones((step, top_k), jnp.int32),
            jnp.ones((step,), jnp.bool_),
        )

    res = [jax.block_until_ready(fake_result(i)) for i in range(2)]
    t0 = time.perf_counter()
    got = jax.device_get(res)
    t_fetch = time.perf_counter() - t0
    nbytes = sum(
        np.asarray(leaf).nbytes for leaf in jax.tree_util.tree_leaves(got)
    )
    log(f"fetch 2-chunk result tuples ({nbytes/1e6:.2f} MB): "
        f"{t_fetch*1e3:.1f} ms")

    # 3. emit cost (host-side ranking slice per row)
    out = [None] * n_q
    counts, ids_b, scores_b, lens_b, exact = got[0]
    t0 = time.perf_counter()
    for r, item in enumerate(items[:step]):
        engine._emit_row(out, item[0], counts[r], ids_b[r], scores_b[r], 100)
    t_emit = time.perf_counter() - t0
    log(f"emit {step} rows: {t_emit*1e3:.1f} ms")

    # 4. retry-pass cost: run _cand_pass over a tiny retry set
    retry_items = items[:3]
    for cap, name in ((engine.CAND_TERMS_FAST, "fast"),
                      (engine.CAND_TERMS, "full")):
        out2 = [None] * n_q
        t0 = time.perf_counter()
        engine._cand_pass(retry_items, 0.3, 100, 512, qp, out2, cap)
        dt = time.perf_counter() - t0
        log(f"retry pass ({name}, cap={cap}, 3 rows): {dt*1e3:.1f} ms")

    # 5. upload cost for the batch arrays
    t0 = time.perf_counter()
    ups = [
        jnp.asarray(qtok), jnp.asarray(qlens), jnp.asarray(slots),
        jnp.asarray(nqg), jnp.asarray(use_short), jnp.asarray(promo_all),
        jnp.asarray(promo_t), jnp.asarray(promo_w),
    ]
    jax.block_until_ready(ups)
    jax.device_get(ups[0][:1, :1])
    t_up = time.perf_counter() - t0
    nbytes = sum(u.nbytes for u in ups)
    log(f"upload batch arrays ({nbytes/1e6:.2f} MB): {t_up*1e3:.1f} ms")


if __name__ == "__main__":
    main()
