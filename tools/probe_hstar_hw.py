"""Hardware A/B: integer h*-threshold selection vs the float bound
cascade on the 10M-key headline corpus (v5e).

Usage: python tools/probe_hstar_hw.py [n_keys] [n_queries] [reps]
Prints per-variant qps + routing + retry counts, and cross-checks the
two variants' results on the first 64 queries.
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
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import jax

    from stringsearchlib_tpu.config import IndexConfig
    from stringsearchlib_tpu.index.build import build_index
    from stringsearchlib_tpu.search.engine import SearchEngine

    log(f"devices: {jax.devices()}")
    words = _product_names(n_keys, seed=2)
    rng = random.Random(7)
    queries = [_mutate(rng, rng.choice(words)) for _ in range(n_q)]

    t0 = time.time()
    cache = f"/tmp/idx_{n_keys}.npz"
    if os.path.exists(cache):
        from stringsearchlib_tpu.index.serialize import load_index

        host = load_index(cache)
        log(f"loaded cached index {time.time()-t0:.1f}s")
    else:
        host = build_index(words, 1, None, IndexConfig())
        jax.device_get(host.device.gram_ptr[:1])
        log(f"build {time.time()-t0:.1f}s; uniform={host.uniform_weights}")
    engine = SearchEngine(host)
    engine.GM_BUDGET = 0  # force bitmap even if the incidence would fit
    host.bitmap_tables(engine.BITMAP_BUDGET)

    results = {}
    for name, flag in (("hstar", True), ("bounds", False)):
        engine.HSTAR_SEL = flag
        t0 = time.time()
        out = engine.search_batch(queries, 0.3, 100, batch_bucket=512)
        log(f"{name}: warm {time.time()-t0:.1f}s routing={engine.last_routing}")
        lat = []
        for _ in range(reps):
            t1 = time.perf_counter()
            engine.search_batch(queries, 0.3, 100, batch_bucket=512)
            lat.append((time.perf_counter() - t1) / n_q)
        per_q = float(np.median(lat))
        log(f"{name}: qps={1/per_q:.1f} p50={per_q*1e3:.3f} ms "
            f"retry_fast={engine.last_routing.get('retry_fast')} "
            f"retry_full={engine.last_routing.get('retry_full')}")
        results[name] = out

    mism = 0
    for i in range(min(64, n_q)):
        a = sorted((round(s, 5), len(k)) for k, s in zip(*results["hstar"][i]))
        b = sorted((round(s, 5), len(k)) for k, s in zip(*results["bounds"][i]))
        if a != b:
            mism += 1
            if mism <= 3:
                log(f"MISMATCH q{i}: {queries[i]!r}")
    log(f"parity: {64-mism}/64 match")


if __name__ == "__main__":
    main()
