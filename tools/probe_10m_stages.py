"""Stage-level timing of the 10M-key gram-dense headline path (real TPU).

Run ALONE (one tunnel client).  Builds the bench's 10M corpus, then times
each stage of the bitmap-kernel candidate path with real engine tables:

  kernel   - qcnt build + Pallas bitmap_hits (int8 dots)
  bmax_*   - blockmax bound formulations over materialized (B, Tl) hits
  btopk    - chunked top-k over (B, nblk) block bounds
  bgather  - per-query selected-block gather from materialized hits
  ltopk    - chunked lane top-k over (B, kb*128) rescored bounds
  frontend - full candidates_bitmap_mxu call
  e2e      - engine.search_batch(512)

Timings cycle distinct query chunks between reps (the tunnel serves
identical-argument repeats from a result cache).  Large device arrays are
always ARGUMENTS, never jit-closure captures (remote compile serializes
captures into the compile request).
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N_KEYS = int(os.environ.get("PROBE_KEYS", 10_000_000))
B = int(os.environ.get("PROBE_B", 256))
THRESHOLD = 0.3
N_CAND = 1024


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def tm(f, argsets, n=4):
    """Median seconds/call over n calls cycling argsets; one tiny fetch
    per call (block_until_ready lies through the tunnel)."""
    f(*argsets[0])  # warm/compile
    ts = []
    for i in range(n):
        a = argsets[(i + 1) % len(argsets)]
        t0 = time.perf_counter()
        r = f(*a)
        jax.device_get(jax.tree.leaves(r)[0].ravel()[:1])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


@functools.partial(jax.jit, static_argnames=("gp",))
def qcnt_of(slots, gp):
    return jax.vmap(
        lambda row: jnp.zeros((gp,), jnp.bfloat16)
        .at[jnp.where(row >= 0, row, gp)]
        .add(1, mode="drop")
    )(slots)


@functools.partial(jax.jit, static_argnames=("nblk", "blk"))
def bmax_a(h, nqg, wblk, nblk, blk):
    b = h.shape[0]
    h3 = h.reshape(b, nblk, blk)
    hmax = jnp.max(h3, axis=2)
    smax = hmax.astype(jnp.float32) / jnp.maximum(
        nqg.astype(jnp.float32), 1.0)[:, None]
    ok = (hmax > 0) & (nqg[:, None] > 0) & (smax >= THRESHOLD)
    ub = jnp.where(wblk[None, :] >= 0, wblk[None, :] * smax,
                   wblk[None, :] * THRESHOLD)
    return jnp.where(ok, ub, np.float32(-np.inf))


@functools.partial(jax.jit, static_argnames=("nblk", "blk"))
def bmax_b(h, nblk, blk):
    b = h.shape[0]
    h3 = h.reshape(b, nblk, blk)
    return jnp.max(h3, axis=2)  # int8-only, no f32 epilogue


@functools.partial(jax.jit, static_argnames=("nblk", "blk"))
def bmax_c(h, nblk, blk):
    # sublane-first: fold 8 consecutive lanes-rows into sublanes
    b = h.shape[0]
    h4 = h.reshape(b, nblk, blk // 128, 128)
    m1 = jnp.max(h4, axis=3)
    return jnp.max(m1, axis=2) if m1.ndim == 3 else m1


@functools.partial(jax.jit, static_argnames=("nblk", "blk"))
def bgather(h, bsel, nblk, blk):
    b = h.shape[0]
    h3 = h.reshape(b, nblk, blk)
    return jnp.take_along_axis(
        h3, jnp.clip(bsel, 0, nblk - 1)[:, :, None], axis=1)


@functools.partial(jax.jit, static_argnames=("nblk", "blk", "n_cand"))
def rescore_ltopk(hb, bsel, nqg, wpad_dev, nblk, blk, n_cand):
    from stringsearchlib_tpu.search.candidates import topk_chunked

    b = hb.shape[0]
    nqg3 = jnp.maximum(nqg.astype(jnp.float32), 1.0)[:, None, None]
    wb = wpad_dev.reshape(nblk, blk)[jnp.clip(bsel, 0, nblk - 1)]
    s2 = hb.astype(jnp.float32) / nqg3
    ok = (hb > 0) & (s2 >= THRESHOLD)
    u2 = jnp.where(ok, wb * s2, np.float32(-np.inf)).reshape(
        b, hb.shape[1] * blk)
    return topk_chunked(u2, n_cand)


def ltopk_int8(hb, bsel, nqg, n_cand):
    """Uniform-weight selection probe: top-k directly on int8 hits (u
    order == hits order when every weight is 1.0).  If this beats the
    f32 path, the engine grows a uniform-weights fast lane."""
    from stringsearchlib_tpu.search.candidates import topk_chunked

    b = hb.shape[0]
    thr = jnp.ceil(
        THRESHOLD * jnp.maximum(nqg.astype(jnp.float32), 1.0)
    ).astype(jnp.int8)[:, None, None]
    masked = jnp.where(hb >= thr, hb, jnp.int8(-1))
    return topk_chunked(
        masked.reshape(b, hb.shape[1] * hb.shape[2]), n_cand
    )


def main():
    import random

    import bench
    from stringsearchlib_tpu.config import IndexConfig
    from stringsearchlib_tpu.index.build import build_index
    from stringsearchlib_tpu.search.engine import SearchEngine
    from stringsearchlib_tpu.search.candidates import (
        _BLK, topk_chunked, candidates_bitmap_mxu,
    )
    from stringsearchlib_tpu.ops.bitmap_matmul import bitmap_hits
    import stringsearchlib_tpu.core.text as textlib

    log(f"devices: {jax.devices()}")
    words = bench._product_names(N_KEYS, seed=2)
    log(f"corpus ready ({N_KEYS} keys)")
    t0 = time.perf_counter()
    host = build_index(words, 1, None, IndexConfig())
    jax.device_get(host.device.gram_ptr[:1])
    log(f"index built in {time.perf_counter() - t0:.1f}s "
        f"(n_terms={host.n_terms}, n_grams={host.n_grams})")

    engine = SearchEngine(host)
    bm = host.bitmap_tables(engine.BITMAP_BUDGET)
    planes, tlp = bm[0], int(bm[1])
    log(f"bitmap table: {planes.shape} ({planes.size / 1e9:.2f} GB), "
        f"tlp={tlp}")

    rng = random.Random(7)
    queries = [bench._mutate(rng, rng.choice(words)) for _ in range(512)]

    # --- e2e first (it also compiles everything the engine needs) -------
    t0 = time.perf_counter()
    engine.search_batch(queries, THRESHOLD, 100, batch_bucket=512)
    log(f"e2e warmup (compiles): {time.perf_counter() - t0:.1f}s")
    es = []
    for rep in range(3):
        qs = [bench._mutate(rng, rng.choice(words)) for _ in range(512)]
        t0 = time.perf_counter()
        engine.search_batch(qs, THRESHOLD, 100, batch_bucket=512)
        es.append(time.perf_counter() - t0)
    e2e = float(np.median(es))
    log(f"e2e 512q: {e2e * 1e3:.0f} ms = {512 / e2e:.0f} qps "
        f"(reps {[f'{x:.2f}' for x in es]})")

    # --- staged chunks ---------------------------------------------------
    di = host.device
    pt, xt = host.prim_tables()
    chunks = []
    for c in range(3):
        qs = [bench._mutate(rng, rng.choice(words)) for _ in range(B)]
        tokens, lengths = textlib.encode_batch(qs, False)
        norm_tok, norm_len = textlib.normalize_matrix(
            tokens, lengths, host.tables
        )
        promo_rows = host.promo_key_ids_batch(norm_tok, norm_len)
        items = [
            (j, norm_tok[j], int(norm_len[j]),
             promo_rows[j][: engine.PROMO_KEYS])
            for j in range(len(qs))
        ]
        b, qtok, qlens, slots, nqg, use_short, s_cap = engine._prep_rows(
            items, 32)
        promo = engine._promo_array(items, b)
        promo_t, promo_w = engine._promo_tables(promo)
        chunks.append((
            jnp.asarray(qtok), jnp.asarray(qlens), jnp.asarray(slots),
            jnp.asarray(nqg), jnp.asarray(use_short), jnp.asarray(promo),
            jnp.asarray(promo_t), jnp.asarray(promo_w),
        ))
    log(f"prepped {len(chunks)} chunks of B={chunks[0][0].shape[0]}, "
        f"qmax={chunks[0][2].shape[1]}")

    gp = int(planes.shape[0])
    interp = jax.default_backend() == "cpu"  # CPU dry runs only
    kern = functools.partial(bitmap_hits, int8_dots=True, interpret=interp)
    qcnts = [qcnt_of(c[2], gp) for c in chunks]
    dt = tm(lambda q: kern(q, planes), [(q,) for q in qcnts], n=4)
    log(f"kernel (B={B}): {dt * 1e3:.1f} ms")

    from stringsearchlib_tpu.ops.bitmap_matmul import bitmap_hits_bmax

    kern_f = functools.partial(
        bitmap_hits_bmax, int8_dots=True, interpret=interp
    )
    dt = tm(lambda q: kern_f(q, planes), [(q,) for q in qcnts], n=4)
    log(f"kernel+fused bmax (B={B}): {dt * 1e3:.1f} ms")

    hits0 = jax.device_put(kern(qcnts[0], planes))
    nblk = tlp // _BLK
    ts = di.n_short
    wmax_long = np.asarray(jax.device_get(di.term_wmax[ts:]))
    wpad = np.zeros((tlp,), np.float32)
    wpad[: wmax_long.size] = wmax_long
    wblk = jnp.asarray(wpad.reshape(nblk, _BLK).max(axis=1))
    wpad_dev = jnp.asarray(wpad)
    nqgs = [c[3] for c in chunks]

    dt_a = tm(lambda h, g: bmax_a(h, g, wblk, nblk, _BLK),
              [(hits0, g) for g in nqgs], n=4)
    log(f"bmax_a reshape-max+bound: {dt_a * 1e3:.1f} ms")
    dt_b = tm(lambda h, g: (bmax_b(h, nblk, _BLK), g),
              [(hits0, g) for g in nqgs], n=4)
    log(f"bmax_b int8-only max: {dt_b * 1e3:.1f} ms")
    dt_c = tm(lambda h, g: (bmax_c(h, nblk, _BLK), g),
              [(hits0, g) for g in nqgs], n=4)
    log(f"bmax_c split-lane max: {dt_c * 1e3:.1f} ms")

    kb = min(N_CAND, nblk)
    bmaxes = [jax.device_put(bmax_a(hits0, g, wblk, nblk, _BLK))
              for g in nqgs[:2]]
    btopk = jax.jit(functools.partial(topk_chunked, k=kb))
    dt = tm(lambda x: btopk(x), [(x,) for x in bmaxes], n=4)
    log(f"btopk ({B},{nblk})->{kb}: {dt * 1e3:.1f} ms")

    bsels = [jax.device_put(btopk(x)[1]) for x in bmaxes]
    dt = tm(lambda h, s: bgather(h, s, nblk, _BLK),
            [(hits0, s) for s in bsels], n=4)
    log(f"bgather ({B},{kb},{_BLK}): {dt * 1e3:.1f} ms")

    n_cand = min(N_CAND, kb * _BLK)
    hbs = [jax.device_put(bgather(hits0, s, nblk, _BLK)) for s in bsels]
    dt = tm(
        lambda hb, s, g: rescore_ltopk(hb, s, g, wpad_dev, nblk, _BLK,
                                       n_cand),
        [(hb, s, g) for hb, s, g in zip(hbs, bsels, nqgs)], n=4)
    log(f"rescore+ltopk ({B},{kb * _BLK})->{n_cand}: {dt * 1e3:.1f} ms")
    dt = tm(
        lambda hb, s, g: ltopk_int8(hb, s, g, n_cand),
        [(hb, s, g) for hb, s, g in zip(hbs, bsels, nqgs)], n=4)
    log(f"int8 ltopk ({B},{kb * _BLK})->{n_cand}: {dt * 1e3:.1f} ms")

    # block-size sweep: gather volume is kept_lanes = kb_v * blk (held
    # constant) but row size changes gather bandwidth, and btopk lane
    # count = tlp/blk changes selection cost.  Picks the engine's _BLK.
    for blk_v in (256, 512, 1024):
        nblk_v = tlp // blk_v
        kb_v = max(kb * _BLK // blk_v, 16)
        bm_v = [jax.device_put(bmax_b(hits0, nblk_v, blk_v))
                for _ in range(1)]
        btopk_v = jax.jit(functools.partial(topk_chunked, k=kb_v))
        dt_t = tm(lambda x: btopk_v(x), [(x,) for x in bm_v], n=3)
        bsel_v = jax.device_put(btopk_v(bm_v[0])[1])
        dt_g = tm(lambda h, s2: bgather(h, s2, nblk_v, blk_v),
                  [(hits0, bsel_v)], n=3)
        log(f"blk={blk_v}: btopk ({B},{nblk_v})->{kb_v} {dt_t*1e3:.1f} ms, "
            f"bgather ({B},{kb_v},{blk_v}) {dt_g*1e3:.1f} ms")
    del hbs, bmaxes, hits0

    cs = bool(np.any(jax.device_get(chunks[0][4])))

    def fe(c0, c1, c2, c3, c4, c5, c6, c7):
        return candidates_bitmap_mxu(
            di, planes, pt, xt, c0, c1, c2, c3, c4, c5, c6, c7,
            jnp.full((B,), 100, jnp.int32), np.float32(THRESHOLD),
            compute_short=cs, n_cand=n_cand,
            n_edge=16384, top_k=128, block_sel=True,
            interpret=interp,
        )

    dt = tm(fe, chunks, n=4)
    log(f"frontend full: {dt * 1e3:.1f} ms -> {B / dt:.0f} qps streamed")

    log("done")


if __name__ == "__main__":
    main()
