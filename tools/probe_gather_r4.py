"""Hardware probe: gathered-row small-batch front end (round 4).

Measures, on the real chip at 10M keys:
  1. row-gather primitives at Gc in {32, 128, 256, 512}:
     jnp.take vs gather_rows_pallas (per-row grid steps) vs
     gather_rows_dma (one step, pipelined HBM->HBM copies)
  2. candidates_bitmap_gather vs candidates_bitmap_mxu: parity + time
     at B = 8 real mutated queries
  3. engine singleton search p50 via the new bitmap_gather route

Usage: python tools/probe_gather_r4.py [n_keys]
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
        _settle(fn(0))  # compile
        ts = []
        for r in range(1, reps + 1):
            t0 = time.perf_counter()
            _settle(fn(r))
            ts.append(time.perf_counter() - t0)
    except Exception:  # noqa: BLE001 - probe must survive variants
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
    from stringsearchlib_tpu.ops.bitmap_matmul import (
        gather_rows_dma, gather_rows_pallas,
    )
    from stringsearchlib_tpu.search.engine import SearchEngine

    log(f"devices: {jax.devices()}")
    words = _product_names(n_keys, seed=2)
    rng = random.Random(7)

    cache = f"/tmp/idx_{n_keys}.npz"
    if os.path.exists(cache):
        from stringsearchlib_tpu.index.serialize import load_index

        host = load_index(cache)
        log("loaded cached index")
    else:
        host = build_index(words, 1, None, IndexConfig())
    engine = SearchEngine(host)
    engine.GM_BUDGET = 0
    bm = host.bitmap_tables(engine.BITMAP_BUDGET)
    table = bm[0]
    gp, nb = table.shape
    log(f"table {gp} x {nb} ({gp*nb/2**20:.0f} MB packed)")

    # --- 1. gather primitives -------------------------------------------
    for gc in (32, 128, 256, 512):
        rows_sets = [
            jnp.asarray(
                np.sort(
                    np.random.RandomState(100 + gc + r).choice(
                        gp, gc, replace=False
                    )
                ).astype(np.int32)
            )
            for r in range(4)
        ]
        timeit(
            f"take     gc={gc}",
            lambda r, rs=rows_sets: jnp.take(table, rs[r], axis=0),
        )
        timeit(
            f"dma      gc={gc}",
            lambda r, rs=rows_sets: gather_rows_dma(table, rs[r]),
        )
        if gc <= 128:
            timeit(
                f"pallas   gc={gc}",
                lambda r, rs=rows_sets: gather_rows_pallas(table, rs[r]),
            )
    # correctness of the DMA gather on hardware (guarded: a Mosaic
    # failure here must not kill the engine measurements below)
    try:
        rows = jnp.asarray(
            np.sort(
                np.random.RandomState(1).choice(gp, 64, replace=False)
            ).astype(np.int32)
        )
        a = np.asarray(jax.device_get(gather_rows_dma(table, rows)))
        b = np.asarray(jax.device_get(jnp.take(table, rows, axis=0)))
        assert (a == b).all(), "DMA gather mismatch vs take"
        log("DMA gather parity vs take: OK (64 rows)")
    except Exception:  # noqa: BLE001
        import traceback

        traceback.print_exc()
        log("DMA gather parity: FAILED (continuing with take)")

    # --- 2/3. engine small-batch routes ---------------------------------
    queries = [_mutate(rng, rng.choice(words)) for _ in range(64)]

    def run_batch(qs):
        t0 = time.perf_counter()
        res = engine.search_batch(qs, 0.3, 100)
        return time.perf_counter() - t0, res

    # warm both shapes
    for nq in (1, 8):
        dt, _ = run_batch(queries[:nq])
        log(
            f"warm B={nq}: {dt:.1f}s routing "
            f"{ {k: engine.last_routing.get(k) for k in ('variant', 'gather_rows', 'hstar', 'step')} }"
        )
    for nq in (1, 8):
        ts = []
        for r in range(8):
            qs = queries[r * nq: r * nq + nq] or queries[:nq]
            dt, _ = run_batch(qs)
            ts.append(dt)
        ts_ms = sorted(t * 1e3 for t in ts)
        log(
            f"B={nq}: p50 {ts_ms[len(ts_ms)//2]:.1f} ms, min {ts_ms[0]:.1f}"
            f" ms, per-q {ts_ms[len(ts_ms)//2]/nq:.1f} ms"
            f" (variant {engine.last_routing.get('variant')})"
        )

    # parity: gathered vs dense on 16 queries (2 batches of 8 so the
    # gathered route stays active)
    got = engine.search_batch(queries[:8], 0.3, 100) + engine.search_batch(
        queries[8:16], 0.3, 100
    )
    v_got = engine.last_routing.get("variant")
    want = engine.search_batch(queries[:16], 0.3, 100, mode="dense")
    bad = 0
    for q, g, w in zip(queries[:16], got, want):
        gs = sorted((round(s, 5), len(k)) for k, s in zip(*g))
        ws = sorted((round(s, 5), len(k)) for k, s in zip(*w))
        if gs != ws:
            bad += 1
            log(f"MISMATCH {q!r}")
    log(f"parity vs dense: {16 - bad}/16 (front {v_got})")


if __name__ == "__main__":
    main()
