"""Singleton latency, part 2: kernel-on-gathered-rows front + finish bisect.

Compares, at the engine's singleton shape (b = 8 pad, gc = 32 union rows,
10M keys):
  A. current gathered front (8 XLA plane dots)          [baseline ~48 ms e2e]
  B. Pallas kernel on the gathered rows zero-padded to 128 (fused bmax)
  C. full candidates path via B (candidates_bitmap_mxu on the gathered
     table) vs A's full path, with parity on the returned arrays
  D. finish-stage bisect on top of B's hits/hmax: h* counts -> coarse
     top-k -> fine top-k -> lane gather+counts -> per-row lane top-k

Usage: python tools/probe_single2.py [n_keys]
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
    ms = min(ts) * 1e3
    log(f"{name}: {ms:.1f} ms (reps {[f'{t*1e3:.1f}' for t in ts]})")
    return ms


def main():
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000

    import jax
    import jax.numpy as jnp

    from stringsearchlib_tpu.config import IndexConfig
    from stringsearchlib_tpu.index.build import build_index
    from stringsearchlib_tpu.search.candidates import (
        _BLK,
        candidates_bitmap_gather,
        candidates_bitmap_mxu,
    )
    from stringsearchlib_tpu.search.engine import SearchEngine

    log(f"devices: {jax.devices()}")
    words = _product_names(n_keys, seed=2)
    rng = random.Random(11)

    cache = f"/tmp/idx_{n_keys}.npz"
    if os.path.exists(cache):
        from stringsearchlib_tpu.index.serialize import load_index

        host = load_index(cache)
        log("loaded cached index")
    else:
        host = build_index(words, 1, None, IndexConfig())
    engine = SearchEngine(host)
    engine.GM_BUDGET = 0
    bm, _ = host.bitmap_tables(engine.BITMAP_BUDGET)
    di = host.device
    pt, xt = host.prim_tables()

    packs = []
    for q in (_mutate(rng, rng.choice(words)) for _ in range(32)):
        qnorm, qlen = engine._normalize_query(q)
        promo = host.promo_key_ids(qnorm, qlen)
        items = [(0, qnorm, qlen, promo)]
        b, qtok, qlens, slots, nqg, us, _ = engine._prep_rows(
            items, 32, min_b=8
        )
        plan = engine._gather_rows_plan(slots)
        if plan is None:
            continue
        rows, slots_g, gc = plan
        promo_a = np.full((b, engine.PROMO_KEYS), -1, np.int32)
        promo_a[0, : promo.size] = promo
        p_t, p_w = engine._promo_tables(promo_a)
        lim = np.full((b,), 100, np.int32)
        packs.append((
            jnp.asarray(rows), jnp.asarray(qtok), jnp.asarray(qlens),
            jnp.asarray(slots_g), jnp.asarray(nqg), jnp.asarray(us),
            jnp.asarray(promo_a), jnp.asarray(p_t), jnp.asarray(p_w),
            jnp.asarray(lim), gc,
        ))
    gcs = sorted({p[-1] for p in packs})
    gc0 = max(gcs, key=lambda g: sum(1 for p in packs if p[-1] == g))
    packs0 = [p for p in packs if p[-1] == gc0]
    log(f"{len(packs)} packs, gc buckets {gcs}; timing gc={gc0} "
        f"({len(packs0)}), slot width {packs0[0][3].shape}")

    from stringsearchlib_tpu.ops.bitmap_matmul import (
        BLKB,
        bitmap_hits_bmax,
    )

    nb = int(bm.shape[1])
    gp_k = 128  # kernel G padding (assert gp % 128 == 0)

    # -- A. current 8-dot front ------------------------------------------
    @jax.jit
    def front_a(bmt, rows, slots_g):
        gc = rows.shape[0]
        qcnt = jax.vmap(
            lambda row: jnp.zeros((gc,), jnp.int8)
            .at[jnp.where(row >= 0, row, gc)]
            .add(1, mode="drop")
        )(slots_g)
        rm = jnp.take(bmt, rows, axis=0)
        u = rm.astype(jnp.uint8)
        nt = nb // BLKB
        accs = []
        for p in range(8):
            op = ((u >> p) & jnp.uint8(1)).astype(jnp.int8)
            acc = jnp.dot(qcnt, op, preferred_element_type=jnp.int32)
            accs.append(acc.reshape(8, nt, BLKB))
        return jnp.stack(accs, axis=2).reshape(8, nt * 8 * BLKB).astype(
            jnp.int8
        )

    timeit("A front 8-dot", lambda r: front_a(
        bm, packs0[r % len(packs0)][0], packs0[r % len(packs0)][3]))

    # -- B. Pallas kernel on gathered rows (zero-padded to 128) ----------
    vmax = int(packs0[0][3].shape[1])
    pair_ok = vmax <= 31
    log(f"pair gate: slot width {vmax} -> pair_dots={pair_ok}")

    @jax.jit
    def front_b(bmt, rows, slots_g):
        gc = rows.shape[0]
        qcnt = jax.vmap(
            lambda row: jnp.zeros((gp_k,), jnp.bfloat16)
            .at[jnp.where(row >= 0, row, gp_k)]
            .add(1, mode="drop")
        )(slots_g)
        rm = jnp.take(bmt, rows, axis=0)
        rm = jnp.pad(rm, ((0, gp_k - gc), (0, 0)))
        return bitmap_hits_bmax(
            qcnt, rm, int8_dots="pair" if pair_ok else True
        )

    timeit("B front kernel128", lambda r: front_b(
        bm, packs0[r % len(packs0)][0], packs0[r % len(packs0)][3]))

    # parity A vs B
    p0 = packs0[0]
    ha = np.asarray(jax.device_get(front_a(bm, p0[0], p0[3])))
    hb_, hm_ = front_b(bm, p0[0], p0[3])
    hb_ = np.asarray(jax.device_get(hb_))
    if np.array_equal(ha, hb_):
        log("front parity A == B: OK")
    else:
        bad = np.argwhere(ha != hb_)
        log(f"front parity FAILED: {bad.shape[0]} mismatches, first "
            f"{bad[:4].tolist()}")

    # -- C. full candidates path via the kernel front --------------------
    def full_mxu(r, kb=1024, ncand=1024):
        p = packs0[r % len(packs0)]
        gc = p[0].shape[0]
        rm = jnp.take(bm, p[0], axis=0)
        rm = jnp.pad(rm, ((0, gp_k - gc), (0, 0)))
        return candidates_bitmap_mxu(
            di, rm, pt, xt, p[1], p[2], p[3], p[4], p[5],
            p[6], p[7], p[8], p[9], np.float32(0.3),
            compute_short=False, n_cand=ncand, n_edge=16384,
            top_k=128, block_sel=False, hstar=True, kb1=kb,
            kb2=kb, hs_fill=0, pair_dots=pair_ok,
        )

    def full_gather(r, kb=1024, ncand=1024):
        p = packs0[r % len(packs0)]
        return candidates_bitmap_gather(
            di, bm, p[0], pt, xt, p[1], p[2], p[3], p[4], p[5],
            p[6], p[7], p[8], p[9], np.float32(0.3),
            compute_short=False, n_cand=ncand, n_edge=16384,
            top_k=128, block_sel=False, hstar=True, kb1=kb,
            kb2=kb, hs_fill=0,
        )

    timeit("C full gather(A)", full_gather)
    timeit("C full mxu(B)", full_mxu)

    ra = jax.device_get(full_gather(0))
    rb = jax.device_get(full_mxu(0))
    ok = all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(ra[:4], rb[:4])
    )
    log(f"full parity gather vs mxu (first 4 outs): {'OK' if ok else 'FAIL'}")

    # -- D. finish-stage bisect on B's hits/hmax -------------------------
    hits_d, hmax_d = front_b(bm, p0[0], p0[3])
    hits_d.block_until_ready()
    b = 8
    tlp = int(hits_d.shape[1])
    nblk = tlp // _BLK
    c1 = 8
    n1 = -(-nblk // c1)
    vals = np.arange(1, vmax + 1, dtype=np.int8)
    kb1 = kb2 = 1024
    n_cand = 1024

    def stage(n):
        @jax.jit
        def run(hits, hmax, nqg, limits):
            hm = hmax
            if n1 * c1 != nblk:
                hm = jnp.pad(hmax, ((0, 0), (0, n1 * c1 - nblk)),
                             constant_values=np.int8(-1))
            hm3 = hm.reshape(b, n1, c1)
            bm1 = jnp.max(hm3, axis=2)
            cnt128 = jnp.sum(
                (hm[:, :, None] >= vals[None, None, :]).astype(jnp.int32),
                axis=1,
            )
            cnt1 = jnp.sum(
                (bm1[:, :, None] >= vals[None, None, :]).astype(jnp.int32),
                axis=1,
            )
            nqg_f = jnp.maximum(nqg.astype(jnp.float32), 1.0)
            floor_h = jnp.clip(
                jnp.ceil(0.3 * nqg_f - 1e-6).astype(jnp.int32), 1, vmax
            )
            fits = (cnt128 <= kb2) & (cnt1 <= kb1)
            first_fit = jnp.argmax(fits, axis=1).astype(jnp.int32) + 1
            any_fit = jnp.any(fits, axis=1)
            fits_floor = jnp.take_along_axis(
                fits, jnp.clip(floor_h - 1, 0, vmax - 1)[:, None], axis=1
            )[:, 0]
            hstar = jnp.where(
                fits_floor & (floor_h >= first_fit), floor_h,
                jnp.where(any_fit, jnp.maximum(floor_h, first_fit),
                          np.int32(vmax + 1)),
            )
            if n == 1:
                return hstar
            h8 = hstar.astype(jnp.int8)[:, None]
            bv, bsel = jax.lax.top_k(bm1, min(kb1, n1))
            if n == 2:
                return bv, bsel
            bvalid = bv >= h8
            sub = jnp.take_along_axis(hm3, bsel[:, :, None], axis=1)
            sub = jnp.where(bvalid[:, :, None], sub, np.int8(-1))
            subid = bsel[:, :, None] * c1 + jnp.arange(c1, dtype=jnp.int32)
            kb1_eff = sub.shape[1]
            fv, fs = jax.lax.top_k(
                sub.reshape(b, kb1_eff * c1), min(kb2, kb1_eff * c1)
            )
            fvalid = fv >= h8
            fid = jnp.take_along_axis(
                subid.reshape(b, kb1_eff * c1), fs, axis=1
            )
            fid = jnp.clip(fid, 0, nblk - 1)
            if n == 3:
                return fid
            h3 = hits.reshape(b, nblk, _BLK)
            hb = jnp.take_along_axis(h3, fid[:, :, None], axis=1)
            hb = jnp.where(fvalid[:, :, None], hb, np.int8(0))
            kb2_eff = hb.shape[1]
            s2 = hb.astype(jnp.float32) / nqg_f[:, None, None]
            pass2 = (hb > 0) & (nqg[:, None, None] > 0) & (s2 >= 0.3)
            hbp = jnp.where(pass2, hb, np.int8(0)).reshape(
                b, kb2_eff * _BLK
            )
            cnt_l = jnp.sum(
                (hbp[:, :, None] >= vals[None, None, :]).astype(jnp.int32),
                axis=1,
            )
            if n == 4:
                return hbp, cnt_l
            hv, ls = jax.vmap(
                lambda row: jax.lax.top_k(row, n_cand)
            )(hbp)
            return hv, ls

        return run

    for n in range(1, 6):
        fn = stage(n)
        timeit(
            f"D finish stage{n}",
            lambda r, fn=fn: fn(
                hits_d, hmax_d,
                packs0[r % len(packs0)][4], packs0[r % len(packs0)][9],
            ),
        )


if __name__ == "__main__":
    main()
