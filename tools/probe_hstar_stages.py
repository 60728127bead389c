"""Stage-level hardware profile of the 10M bitmap+h* path (v5e).

Times, with varied operands (the tunnel serves identical-argument
repeats from a result cache):
  - row-compaction gather (2816 -> 512 rows)
  - bitmap_hits_bmax kernel alone: int8 vs paired dots
  - full candidates_bitmap_mxu: hstar vs bounds finish
  - the h* histogram pass in isolation

Usage: python tools/probe_hstar_stages.py [n_keys] [B]
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
    """Force real completion: fetch one element of every output leaf.
    block_until_ready through the axon tunnel returned in ~1.5 ms for
    calls that provably stream gigabytes - it does not block; a
    device->host read of the RESULT does."""
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
    except Exception as e:  # noqa: BLE001 - probe must survive variants
        traceback.print_exc()
        log(f"{name}: FAILED {type(e).__name__}")
        return float("nan")
    ms = float(np.median(ts) * 1e3) - _RTT_MS[0]
    log(f"{name}: {ms:.1f} ms net (rtt {_RTT_MS[0]:.1f}; reps "
        f"{['%.1f' % (t*1e3) for t in ts]})")
    return ms


def measure_rtt():
    import jax.numpy as jnp

    def nop(r):
        return jnp.asarray(np.float32(r)) + 1.0

    _RTT_MS[0] = 0.0
    t = timeit("tunnel rtt (nop)", nop, reps=5)
    _RTT_MS[0] = max(t, 0.0)


def main():
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    bsz = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import jax
    import jax.numpy as jnp

    from stringsearchlib_tpu.config import IndexConfig
    from stringsearchlib_tpu.index.build import build_index
    from stringsearchlib_tpu.search.engine import SearchEngine, _gather_rows

    log(f"devices: {jax.devices()}")
    measure_rtt()
    words = _product_names(n_keys, seed=2)
    rng = random.Random(7)
    queries = [_mutate(rng, rng.choice(words)) for _ in range(bsz)]

    t0 = time.time()
    cache = f"/tmp/idx_{n_keys}.npz"
    if os.path.exists(cache):
        from stringsearchlib_tpu.index.serialize import load_index

        host = load_index(cache)
        log(f"loaded cached index {time.time()-t0:.1f}s")
    else:
        host = build_index(words, 1, None, IndexConfig())
        jax.device_get(host.device.gram_ptr[:1])
        log(f"build {time.time()-t0:.1f}s")
        try:
            from stringsearchlib_tpu.index.serialize import save_index

            save_index(host, cache)
            log(f"cached -> {cache}")
        except Exception as e:  # noqa: BLE001
            log(f"cache save failed: {e}")
    engine = SearchEngine(host)
    engine.GM_BUDGET = 0
    bm = host.bitmap_tables(engine.BITMAP_BUDGET)
    di = host.device

    # engine-shaped batch
    items = []
    for pos, q in enumerate(queries):
        qnorm, qlen = engine._normalize_query(q)
        promo = host.promo_key_ids(qnorm, qlen)
        items.append((pos, qnorm, qlen, promo))
    b, qtok, qlens, slots, nqg, use_short, _ = engine._prep_rows(items, 32)
    comp = engine._compact_gram_rows(slots, int(bm[0].shape[0]))
    if comp is None:  # union too large for the engine's 3x rule: force it
        used = np.unique(slots[slots >= 0])
        gp_c = -(-int(used.size) // 128) * 128
        rows = np.zeros(gp_c, np.int32)
        rows[: used.size] = used
        cslots = np.full(slots.shape, -1, np.int32)
        m = slots >= 0
        cslots[m] = np.searchsorted(used, slots[m]).astype(np.int32)
    else:
        rows, cslots, gp_c = comp
    log(f"compact rows: {gp_c} (union {np.unique(slots[slots>=0]).size})")

    table_full = bm[0]
    timeit("row-compaction gather (jnp.take)", lambda r: _gather_rows(
        table_full, jnp.asarray((rows + r) % rows.max())
    ))
    from stringsearchlib_tpu.ops.bitmap_matmul import gather_rows_pallas

    timeit("row-compaction gather (pallas)", lambda r: gather_rows_pallas(
        table_full, jnp.asarray((rows + r) % rows.max())
    ))
    ctable = _gather_rows(table_full, jnp.asarray(rows))
    jax.block_until_ready(ctable)
    # also time the kernel at the FULL (uncompacted) table for reference
    gp_full = int(table_full.shape[0])

    from stringsearchlib_tpu.ops.bitmap_matmul import bitmap_hits_bmax

    gp = int(ctable.shape[0])
    qcnt_np = np.zeros((bsz, gp), np.float32)
    for r in range(bsz):
        sl = cslots[r][cslots[r] >= 0]
        np.add.at(qcnt_np[r], sl, 1.0)

    def k_int8(r):
        q = jnp.asarray(
            np.roll(qcnt_np, r, axis=0), dtype=jnp.bfloat16
        )
        return bitmap_hits_bmax(q, ctable, int8_dots=True)

    def k_pair(r):
        q = jnp.asarray(
            np.roll(qcnt_np, r, axis=0), dtype=jnp.bfloat16
        )
        return bitmap_hits_bmax(q, ctable, int8_dots="pair")

    t8 = timeit("kernel int8 (compact)", k_int8)
    tp = timeit("kernel pair (compact)", k_pair)
    packed_mb = gp * int(ctable.shape[1]) / 1e6
    log(f"packed compact table {packed_mb:.0f} MB -> "
        f"{packed_mb/t8*1000/1000:.0f} / {packed_mb/tp*1000/1000:.0f} GB/s")

    qfull_np = np.zeros((bsz, gp_full), np.float32)
    for r in range(bsz):
        sl = slots[r][slots[r] >= 0]
        np.add.at(qfull_np[r], sl, 1.0)

    def k_full(r, dots):
        q = jnp.asarray(np.roll(qfull_np, r, axis=0), dtype=jnp.bfloat16)
        return bitmap_hits_bmax(q, table_full, int8_dots=dots)

    timeit("kernel int8 (full 2816)", lambda r: k_full(r, True))
    timeit("kernel pair (full 2816)", lambda r: k_full(r, "pair"))

    # h* histogram in isolation
    hits, hmax = jax.block_until_ready(k_int8(0))

    @jax.jit
    def hist(hm, off):
        vals = np.arange(1, 31, dtype=np.int8)
        return jnp.sum(
            ((hm + off)[:, :, None] >= vals[None, None, :]).astype(jnp.int32),
            axis=1,
        )

    timeit("cnt128 histogram", lambda r: hist(hmax, np.int8(r % 2)))

    # full front ends
    from stringsearchlib_tpu.search.candidates import (
        candidates_bitmap_mxu,
    )

    pt, xt = host.prim_tables()
    promo_a = np.full((b, engine.PROMO_KEYS), -1, np.int32)
    for r, it in enumerate(items):
        promo_a[r, : it[3].size] = it[3]
    promo_t, promo_w = engine._promo_tables(promo_a)
    lim = np.full((b,), 100, np.int32)

    def front(r, **kw):
        q = np.roll(qtok, r, axis=0)
        s = np.roll(cslots, r, axis=0)
        return candidates_bitmap_mxu(
            di, ctable, pt, xt, jnp.asarray(q),
            jnp.asarray(np.roll(qlens, r)), jnp.asarray(s),
            jnp.asarray(np.roll(nqg, r)),
            jnp.asarray(np.roll(use_short, r)),
            jnp.asarray(np.roll(promo_a, r, axis=0)),
            jnp.asarray(np.roll(promo_t, r, axis=0)),
            jnp.asarray(np.roll(promo_w, r, axis=0)),
            jnp.asarray(lim), np.float32(0.3),
            compute_short=bool(use_short.any()), n_edge=16384,
            top_k=128, **kw,
        )

    timeit("front hstar+pair", lambda r: front(
        r, n_cand=1024, hstar=True, kb1=512, kb2=512, pair_dots=True,
        fused_bmax=True,
    ))
    timeit("front hstar", lambda r: front(
        r, n_cand=1024, hstar=True, kb1=512, kb2=512, fused_bmax=True,
    ))
    timeit("front bounds", lambda r: front(
        r, n_cand=1024, block_sel=True, fused_bmax=True,
    ))

    # B=512 kernel (VMEM model says 13.9 MB of the 14 MB budget)
    from stringsearchlib_tpu.ops.bitmap_matmul import fits_vmem

    log(f"fits_vmem(512, {gp_full}) = {fits_vmem(512, gp_full)}")
    q512 = np.concatenate([qfull_np, qfull_np], axis=0)

    def k_full_512(r, dots):
        q = jnp.asarray(np.roll(q512, r, axis=0), dtype=jnp.bfloat16)
        return bitmap_hits_bmax(q, table_full, int8_dots=dots)

    timeit("kernel pair B=512 (full)", lambda r: k_full_512(r, "pair"))

    # tiny-batch XLA scan path (candidates_bitmap): the platform streams
    # 1.2 TB/s through XLA - single queries should not pay the Pallas
    # kernel's full-table compute
    from stringsearchlib_tpu.search.candidates import candidates_bitmap

    def tiny(r, b):
        sl_ = slice(0, b)
        q = np.roll(qtok[sl_], r, axis=0)
        return candidates_bitmap(
            di, table_full, pt, xt, jnp.asarray(q),
            jnp.asarray(qlens[sl_]), jnp.asarray(slots[sl_]),
            jnp.asarray(nqg[sl_]), jnp.asarray(use_short[sl_]),
            jnp.asarray(promo_a[sl_]), jnp.asarray(promo_t[sl_]),
            jnp.asarray(promo_w[sl_]), jnp.asarray(lim[sl_]),
            np.float32(0.3),
            compute_short=bool(use_short[sl_].any()), n_edge=1024,
            top_k=128, n_cand=1024, block_sel=True,
        )

    timeit("xla-scan front B=1", lambda r: tiny(r, 1))
    timeit("xla-scan front B=8", lambda r: tiny(r, 8))


if __name__ == "__main__":
    main()
