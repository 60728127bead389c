"""Round-5 2D/sketch-path bisect: where do 0.64 ms/query go at the 2D
config (2M keys, 47k grams, packed D=8192 sketch), and what clears the
38/1024 guard retries?

Stages: packed-sketch kernel alone (tile-major), full sketch front at
production budgets, budget sweep (ksb, kb, n_cand) with retry counts.

Usage: python tools/probe_2d_r5.py [n_rows]
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
from bench import _mutate, _product_names, _rich_names  # noqa: E402


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


_RTT_MS = [0.0]


def _settle(out):
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    return jax.device_get([leaf.ravel()[:1] for leaf in leaves])


def timeit(name, fn, reps=4):
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
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    import jax
    import jax.numpy as jnp

    from stringsearchlib_tpu.config import IndexConfig
    from stringsearchlib_tpu.index.build import build_index
    from stringsearchlib_tpu.ops.bitmap_matmul import bitmap_hits
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

    rows = _product_names(n_rows, seed=5)
    descs = _rich_names(n_rows, seed=6)
    flat = [x for kv in zip(rows, descs) for x in kv]
    w = np.tile(np.array([1.0, 0.4]), n_rows)
    t0 = time.time()
    host = build_index(flat, 2, w, IndexConfig())
    log(f"built {time.time()-t0:.0f}s  n_terms={host.n_terms} "
        f"n_grams={host.n_grams}")
    engine = SearchEngine(host)
    engine.GM_BUDGET = 0

    sk = host.sketch_tables(engine.SKETCH_BUDGET, packed=True)
    inc, tg, wmax_pad, d_log2 = sk
    log(f"packed inc {inc.shape} d_log2={d_log2} tg {tg.shape}")

    rng = random.Random(7)
    queries = [_mutate(rng, rng.choice(rows)) for _ in range(512)]

    # warm through the engine; record production routing + e2e
    engine.search_batch(queries, 0.3, 100, batch_bucket=512)
    log(f"routing {engine.last_routing}")
    for rep in range(3):
        t0 = time.perf_counter()
        engine.search_batch(queries, 0.3, 100, batch_bucket=512)
        dt = time.perf_counter() - t0
        log(f"e2e rep{rep}: {dt*1e3:.0f} ms -> {512/dt:.0f} q/s "
            f"(retry_fast {engine.last_routing.get('retry_fast')})")

    # kernel alone on the packed sketch table
    d = 1 << d_log2
    qs = np.zeros((512, d), np.float32)
    nrng = np.random.default_rng(0)
    for r in range(512):
        qs[r, nrng.choice(d, 25, replace=False)] = 1.0
    qv = [jnp.asarray(np.roll(qs, r, axis=0), dtype=jnp.bfloat16)
          for r in range(5)]
    jax.block_until_ready(qv)
    timeit("sketch kernel (packed, tile-major) B=512",
           lambda r: bitmap_hits(qv[r], inc, int8_dots=True))

    # budget sweep via engine attributes: retries + e2e
    for ksb, kb, nc in ((256, 512, 4096), (256, 1024, 4096),
                        (512, 1024, 4096), (256, 512, 8192)):
        engine.SK_KSB, engine.SK_KB = ksb, kb
        engine.CAND_TERMS = nc
        engine.search_batch(queries, 0.3, 100, batch_bucket=512)  # warm
        t0 = time.perf_counter()
        engine.search_batch(queries, 0.3, 100, batch_bucket=512)
        dt = time.perf_counter() - t0
        log(f"ksb={ksb} kb={kb} n_cand={nc}: {512/dt:.0f} q/s "
            f"retry_fast {engine.last_routing.get('retry_fast')}")


if __name__ == "__main__":
    main()
