"""Round-5: does tile_mult=2 pay on the RESIDENT tile-major table?

2448 grid steps x a few-us fixed step cost is a visible slice of the
32.5 ms hits kernel; fusing 2 layout tiles per step halves it, at the
price of a bigger per-step working set (2x byte tile + 2x out block).

Usage: python tools/probe_tmult_r5.py [n_keys]
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
    ntiles = int(table.shape[0])
    log(f"table {table.shape}")

    words = _product_names(n_keys, seed=2)
    rng = random.Random(7)
    queries = [_mutate(rng, rng.choice(words)) for _ in range(256)]
    items = []
    for pos, q in enumerate(queries):
        qnorm, qlen = engine._normalize_query(q)
        items.append((pos, qnorm, qlen, None))
    b, qtok, qlens, slots, nqg, use_short, _ = engine._prep_rows(items, 32)
    qcnt_np = np.zeros((256, gp), np.float32)
    for r in range(256):
        sl = slots[r][slots[r] >= 0]
        np.add.at(qcnt_np[r], sl, 1.0)
    qs = [jnp.asarray(np.roll(qcnt_np, r, axis=0), dtype=jnp.bfloat16)
          for r in range(5)]
    jax.block_until_ready(qs)

    outs = {}
    for tm in (1, 2, 4):
        if ntiles % tm:
            continue
        ms = timeit(
            f"hits tile_mult={tm}",
            lambda r, tm=tm: bitmap_hits(
                qs[r], table, int8_dots="pair", tile_mult=tm
            ),
        )
        if np.isfinite(ms):
            outs[tm] = np.asarray(jax.device_get(
                bitmap_hits(qs[0], table, int8_dots="pair",
                            tile_mult=tm)[:, :4096]
            ))
        timeit(
            f"hits+bmax tile_mult={tm}",
            lambda r, tm=tm: bitmap_hits_bmax(
                qs[r], table, int8_dots="pair", tile_mult=tm
            ),
        )
    ks = sorted(outs)
    for k in ks[1:]:
        log(f"parity tm={k} vs tm={ks[0]}: "
            f"{np.array_equal(outs[k], outs[ks[0]])}")


if __name__ == "__main__":
    main()
