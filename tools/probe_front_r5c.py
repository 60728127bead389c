"""Round-5 kernel follow-ups on the cached 10M index:
  - B=512 single-chunk pair kernel (tile-major changed the VMEM picture;
    row-major B=512 measured 197 ms vs 2x65 in round 4)
  - XLA reshape-max blockmax over the hits matrix vs the fused epilogue
    (epilogue now costs +17.6 ms of a 32.5 ms kernel)

Usage: python tools/probe_front_r5c.py [n_keys]
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
    tlp = int(table.shape[0]) * 8 * 512
    log(f"table {table.shape} tlp {tlp}")

    words = _product_names(n_keys, seed=2)
    rng = random.Random(7)
    queries = [_mutate(rng, rng.choice(words)) for _ in range(512)]
    items = []
    for pos, q in enumerate(queries):
        qnorm, qlen = engine._normalize_query(q)
        items.append((pos, qnorm, qlen, None))
    b, qtok, qlens, slots, nqg, use_short, _ = engine._prep_rows(items, 32)
    qcnt_np = np.zeros((512, gp), np.float32)
    for r in range(512):
        sl = slots[r][slots[r] >= 0]
        np.add.at(qcnt_np[r], sl, 1.0)
    qs512 = [
        jnp.asarray(np.roll(qcnt_np, r, axis=0), dtype=jnp.bfloat16)
        for r in range(5)
    ]
    qs256 = [q[:256] for q in qs512]
    jax.block_until_ready(qs512)

    timeit("B=256 hits+bmax (fused)",
           lambda r: bitmap_hits_bmax(qs256[r], table, int8_dots="pair"))
    timeit("B=512 hits only",
           lambda r: bitmap_hits(qs512[r], table, int8_dots="pair"))
    timeit("B=512 hits+bmax (fused)",
           lambda r: bitmap_hits_bmax(qs512[r], table, int8_dots="pair"))

    nblk = tlp // 128

    @jax.jit
    def xla_bmax(h):
        return jnp.max(h.reshape(h.shape[0], nblk, 128), axis=2)

    h256 = jax.block_until_ready(
        bitmap_hits(qs256[0], table, int8_dots="pair")
    )
    timeit("XLA blockmax128 over (256, 10M) hits",
           lambda r: xla_bmax(jnp.bitwise_xor(h256, np.int8(0))))
    # bitwise_xor(h, 0) defeats the tunnel result cache without a copy
    # cost concern (XLA fuses it into the reduce)

    @jax.jit
    def hits_then_bmax(q, t):
        h = bitmap_hits(q, t, int8_dots="pair")
        return h, jnp.max(h.reshape(q.shape[0], nblk, 128), axis=2)

    timeit("B=256 hits + XLA bmax (one jit)",
           lambda r: hits_then_bmax(qs256[r], table))
    timeit("B=512 hits + XLA bmax (one jit)",
           lambda r: hits_then_bmax(qs512[r], table))


if __name__ == "__main__":
    main()
