"""h* first-pass sweep #2: failures vs (kb, n_cand) + cheap-kb timing.

probe_b512_pair showed kb 1024->2048 leaves guard failures unchanged
(1/256, 3/512): the failing rows aren't block-budget-bound.  Sweep the
lane budget (n_cand) and the cheap kb=512 point.

Usage: python tools/probe_sweep2.py [n_keys]
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
    ms = float(np.median(ts) * 1e3) - _RTT_MS[0]
    log(f"{name}: {ms:.1f} ms net (reps {['%.1f' % (t*1e3) for t in ts]})")
    return ms


def main():
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    bsz = 512

    import jax
    import jax.numpy as jnp

    from stringsearchlib_tpu.config import IndexConfig
    from stringsearchlib_tpu.index.build import build_index
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

    words = _product_names(n_keys, seed=2)
    rng = random.Random(7)
    queries = [_mutate(rng, rng.choice(words)) for _ in range(bsz)]

    cache = f"/tmp/idx_{n_keys}.npz"
    if os.path.exists(cache):
        from stringsearchlib_tpu.index.serialize import load_index

        host = load_index(cache)
    else:
        host = build_index(words, 1, None, IndexConfig())
    engine = SearchEngine(host)
    engine.GM_BUDGET = 0
    bm = host.bitmap_tables(engine.BITMAP_BUDGET)
    table = bm[0]

    items = []
    for pos, q in enumerate(queries):
        qnorm, qlen = engine._normalize_query(q)
        items.append((pos, qnorm, qlen, host.promo_key_ids(qnorm, qlen)))
    b, qtok, qlens, slots, nqg, use_short, _ = engine._prep_rows(items, 32)
    di = host.device
    pt, xt = host.prim_tables()
    promo_a = np.full((b, engine.PROMO_KEYS), -1, np.int32)
    for r, it in enumerate(items):
        promo_a[r, : it[3].size] = it[3]
    promo_t, promo_w = engine._promo_tables(promo_a)
    lim = np.full((b,), 100, np.int32)

    def front(r, bq, kb, n_cand):
        sl_ = slice(0, bq)
        q = np.roll(qtok[sl_], r, axis=0)
        s = np.roll(slots[sl_], r, axis=0)
        return candidates_bitmap_mxu(
            di, table, pt, xt, jnp.asarray(q),
            jnp.asarray(np.roll(qlens[sl_], r)), jnp.asarray(s),
            jnp.asarray(np.roll(nqg[sl_], r)),
            jnp.asarray(np.roll(use_short[sl_], r)),
            jnp.asarray(np.roll(promo_a[sl_], r, axis=0)),
            jnp.asarray(np.roll(promo_t[sl_], r, axis=0)),
            jnp.asarray(np.roll(promo_w[sl_], r, axis=0)),
            jnp.asarray(lim[sl_]), np.float32(0.3),
            compute_short=bool(use_short[sl_].any()), n_edge=16384,
            top_k=128, n_cand=n_cand, hstar=True, kb1=kb, kb2=kb,
            hs_fill=0, pair_dots=True, fused_bmax=True,
        )

    # which rows fail, and what do they look like?
    got = jax.device_get(front(0, 512, 1024, 1024))
    fails = np.where(~np.asarray(got[4]))[0]
    for i in fails:
        log(f"fail row {i}: q={queries[i]!r} nqg={nqg[i]} "
            f"count={got[0][i]}")

    for bq, kb, n_cand in ((256, 512, 1024), (512, 512, 1024),
                           (512, 1024, 2048), (512, 1024, 4096),
                           (512, 512, 4096)):
        try:
            got = jax.device_get(front(0, bq, kb, n_cand))
            nf = int((~np.asarray(got[4])).sum())
        except Exception as e:  # noqa: BLE001
            log(f"front B={bq} kb={kb} nc={n_cand}: FAILED "
                f"{type(e).__name__}")
            continue
        t = timeit(
            f"front B={bq} kb={kb} nc={n_cand}",
            lambda r, bq=bq, kb=kb, nc=n_cand: front(r, bq, kb, nc),
        )
        log(f"  -> failures {nf}/{bq}, {t/bq*1e3:.1f} us/query")


if __name__ == "__main__":
    main()
