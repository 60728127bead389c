"""Round-5 front-end split: tile-major kernel alone vs full h* front
(kernel + selection finish) on the cached 10M index.

Usage: python tools/probe_front_r5.py [n_keys] [B]
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
    from stringsearchlib_tpu.ops.bitmap_matmul import bitmap_hits_bmax
    from stringsearchlib_tpu.search.candidates import candidates_bitmap_mxu
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
    bm = host.bitmap_tables(engine.BITMAP_BUDGET)
    table = bm[0]
    log(f"table {table.shape} (tile-major: {table.ndim == 3})")
    gp = int(table.shape[1] if table.ndim == 3 else table.shape[0])

    words = _product_names(n_keys, seed=2)
    rng = random.Random(7)
    queries = [_mutate(rng, rng.choice(words)) for _ in range(bsz)]
    items = []
    for pos, q in enumerate(queries):
        qnorm, qlen = engine._normalize_query(q)
        items.append((pos, qnorm, qlen, host.promo_key_ids(qnorm, qlen)))
    b, qtok, qlens, slots, nqg, use_short, _ = engine._prep_rows(items, 32)
    qcnt_np = np.zeros((bsz, gp), np.float32)
    for r in range(bsz):
        sl = slots[r][slots[r] >= 0]
        np.add.at(qcnt_np[r], sl, 1.0)
    q_dev = jnp.asarray(qcnt_np, dtype=jnp.bfloat16)

    def kern(r):
        return bitmap_hits_bmax(
            jnp.roll(q_dev, r, axis=0), table, int8_dots="pair"
        )

    timeit("kernel pair+bmax (tile-major, full table)", kern)

    di = host.device
    pt, xt = host.prim_tables()
    promo_a = np.full((b, engine.PROMO_KEYS), -1, np.int32)
    for r, it in enumerate(items):
        promo_a[r, : it[3].size] = it[3]
    promo_t, promo_w = engine._promo_tables(promo_a)
    lim = np.full((b,), 100, np.int32)
    slots_d = jnp.asarray(slots)
    qtok_d = jnp.asarray(qtok)

    def front(r, kb):
        return candidates_bitmap_mxu(
            di, table, pt, xt, jnp.roll(qtok_d, r, axis=0),
            jnp.asarray(np.roll(qlens, r)), jnp.roll(slots_d, r, axis=0),
            jnp.asarray(np.roll(nqg, r)),
            jnp.asarray(np.roll(use_short, r)),
            jnp.asarray(np.roll(promo_a, r, axis=0)),
            jnp.asarray(np.roll(promo_t, r, axis=0)),
            jnp.asarray(np.roll(promo_w, r, axis=0)),
            jnp.asarray(lim), np.float32(0.3),
            compute_short=bool(use_short.any()), n_edge=16384,
            top_k=128, n_cand=1024, hstar=True, kb1=kb, kb2=kb,
            hs_fill=0, pair_dots=True, fused_bmax=True,
        )

    got = jax.device_get(front(0, 1024))
    fails = int((~np.asarray(got[4])).sum())
    timeit("front hstar kb=1024 (kernel+finish)", lambda r: front(r, 1024))
    log(f"  guard failures {fails}/{bsz}")


if __name__ == "__main__":
    main()
