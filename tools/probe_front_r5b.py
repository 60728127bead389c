"""Bisect the 590 ms probe_front_r5 kernel anomaly: pre-staged device
operands (no per-rep jnp.roll), hits-only vs fused-bmax epilogue.

Usage: python tools/probe_front_r5b.py [n_keys] [B]
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
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    bsz = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import jax
    import jax.numpy as jnp

    from stringsearchlib_tpu.index.serialize import load_index
    from stringsearchlib_tpu.ops.bitmap_matmul import (
        bitmap_hits, bitmap_hits_bmax,
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
    gp = int(table.shape[1])
    log(f"table {table.shape}")

    words = _product_names(n_keys, seed=2)
    rng = random.Random(7)
    queries = [_mutate(rng, rng.choice(words)) for _ in range(bsz)]
    items = []
    for pos, q in enumerate(queries):
        qnorm, qlen = engine._normalize_query(q)
        items.append((pos, qnorm, qlen, None))
    b, qtok, qlens, slots, nqg, use_short, _ = engine._prep_rows(items, 32)
    qcnt_np = np.zeros((bsz, gp), np.float32)
    for r in range(bsz):
        sl = slots[r][slots[r] >= 0]
        np.add.at(qcnt_np[r], sl, 1.0)
    # 5 pre-staged variants, uploaded once
    qs = [
        jnp.asarray(np.roll(qcnt_np, r, axis=0), dtype=jnp.bfloat16)
        for r in range(5)
    ]
    jax.block_until_ready(qs)

    timeit("hits only (pair, tile-major)",
           lambda r: bitmap_hits(qs[r], table, int8_dots="pair"))
    timeit("hits+bmax (pair, tile-major)",
           lambda r: bitmap_hits_bmax(qs[r], table, int8_dots="pair"))
    timeit("hits only (int8, tile-major)",
           lambda r: bitmap_hits(qs[r], table, int8_dots=True))

    # roll-inside variant (reproduce the r5 anomaly?)
    timeit("hits only w/ jnp.roll per rep",
           lambda r: bitmap_hits(
               jnp.roll(qs[0], r, axis=0), table, int8_dots="pair"
           ))


if __name__ == "__main__":
    main()
