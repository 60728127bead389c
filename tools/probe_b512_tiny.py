"""Lean probe: B=512 full-table kernel + tiny-batch XLA-scan front end
(no compact-table copy resident, avoiding the HBM OOM cascade the full
stage probe hit).  Uses the cached 10M index."""

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
from tools.probe_hstar_stages import _RTT_MS, log, measure_rtt, timeit  # noqa: E402,E501


def main():
    import jax
    import jax.numpy as jnp

    from stringsearchlib_tpu.index.serialize import load_index
    from stringsearchlib_tpu.ops.bitmap_matmul import bitmap_hits_bmax
    from stringsearchlib_tpu.search.candidates import (
        candidates_bitmap, candidates_bitmap_mxu,
    )
    from stringsearchlib_tpu.search.engine import SearchEngine

    log(f"devices: {jax.devices()}")
    measure_rtt()
    host = load_index("/tmp/idx_10000000.npz")
    eng = SearchEngine(host)
    eng.GM_BUDGET = 0
    bm, _ = host.bitmap_tables(eng.BITMAP_BUDGET)
    di = host.device
    gp = int(bm.shape[0])

    n_keys = 10_000_000
    words = _product_names(n_keys, seed=2)
    rng = random.Random(7)
    queries = [_mutate(rng, rng.choice(words)) for _ in range(512)]
    items = []
    for pos, q in enumerate(queries):
        qnorm, qlen = eng._normalize_query(q)
        promo = host.promo_key_ids(qnorm, qlen)
        items.append((pos, qnorm, qlen, promo))
    b, qtok, qlens, slots, nqg, use_short, _ = eng._prep_rows(items, 32)
    promo_a = np.full((b, eng.PROMO_KEYS), -1, np.int32)
    for r, it in enumerate(items):
        promo_a[r, : it[3].size] = it[3]
    promo_t, promo_w = eng._promo_tables(promo_a)
    lim = np.full((b,), 100, np.int32)

    qfull = np.zeros((b, gp), np.float32)
    for r in range(b):
        sl = slots[r][slots[r] >= 0]
        np.add.at(qfull[r], sl, 1.0)

    def kern(r, bsz, dots):
        q = jnp.asarray(np.roll(qfull[:bsz], r, axis=0), dtype=jnp.bfloat16)
        return bitmap_hits_bmax(q, bm, int8_dots=dots)

    timeit("kernel pair B=256", lambda r: kern(r, 256, "pair"))
    timeit("kernel pair B=512", lambda r: kern(r, 512, "pair"))

    def front(r, bsz, **kw):
        sl_ = slice(0, bsz)
        return candidates_bitmap_mxu(
            di, bm, *host.prim_tables(),
            jnp.asarray(np.roll(qtok[sl_], r, axis=0)),
            jnp.asarray(qlens[sl_]), jnp.asarray(slots[sl_]),
            jnp.asarray(nqg[sl_]), jnp.asarray(use_short[sl_]),
            jnp.asarray(promo_a[sl_]), jnp.asarray(promo_t[sl_]),
            jnp.asarray(promo_w[sl_]), jnp.asarray(lim[sl_]),
            np.float32(0.3),
            compute_short=bool(use_short[sl_].any()), n_edge=1024,
            top_k=128, **kw,
        )

    timeit("front hstar+pair B=512 (full table)", lambda r: front(
        r, 512, n_cand=1024, hstar=True, kb1=512, kb2=512,
        pair_dots=True, fused_bmax=True,
    ))

    def tiny(r, bsz):
        sl_ = slice(0, bsz)
        return candidates_bitmap(
            di, bm, *host.prim_tables(),
            jnp.asarray(np.roll(qtok[sl_], r, axis=0)),
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
