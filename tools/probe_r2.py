"""Round-2 primitive probes on the real TPU (run alone: one client rule).

All test data is generated ON DEVICE (jax.random / iota arithmetic): the
tunnel uploads at ~0.04-2.5 MB/s, so host-generated operands would take
hours to ship.  Timings via device_get on a tiny reduction
(block_until_ready does not synchronize through the axon tunnel).
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def tm(f, *args, n=4, warm=1):
    for _ in range(warm):
        r = f(*args)
    jax.device_get(jax.tree.leaves(r)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.device_get(jax.tree.leaves(r)[0].ravel()[:1])
    return (time.perf_counter() - t0) / n


def mk(shape, lo, hi, dtype, seed=0):
    """Device array of random ints, generated on device."""
    k = jax.random.PRNGKey(seed)
    f = jax.jit(
        lambda key: jax.random.randint(key, shape, lo, hi).astype(dtype),
    )
    return jax.device_put(f(k))


def mkf(shape, seed=0):
    k = jax.random.PRNGKey(seed)
    return jax.jit(lambda key: jax.random.uniform(key, shape))(k)


def main():
    print("devices:", jax.devices(), flush=True)

    # --- 1. int8 sketch matmul (B, D) @ (D, Tl) -> int8 -----------------
    for b, d, tl in ((128, 512, 4 << 20), (256, 512, 4 << 20)):
        q = mk((b, d), 0, 3, jnp.int8, 1)
        m = mk((d, tl), 0, 2, jnp.int8, 2)
        f = jax.jit(lambda a, c: jnp.dot(
            a, c, preferred_element_type=jnp.int32).astype(jnp.int8)[:1, :1])
        dt = tm(f, q, m, n=2)
        print(f"int8 matmul ({b},{d})@({d},{tl>>20}M)->int8: {dt*1e3:.1f} ms",
              flush=True)
        wmax = mkf((tl,), 3)

        def mm_blockmax(a, c, w):
            h = jnp.dot(a, c, preferred_element_type=jnp.int32)
            u = jnp.where(h >= 9, w[None, :] * h.astype(jnp.float32),
                          np.float32(-np.inf))
            return u.reshape(a.shape[0], -1, 128).max(axis=2)

        f2 = jax.jit(lambda a, c, w: mm_blockmax(a, c, w)[:1, :1])
        dt = tm(f2, q, m, wmax, n=2)
        print(f"  + fused u+blockmax: {dt*1e3:.1f} ms", flush=True)
        del q, m, wmax

    # --- 2. hits8 materialized then blockmax (two-pass variant) ---------
    hits8 = mk((128, 8 << 20), 0, 20, jnp.int8, 4)
    wm = mkf((8 << 20,), 5)
    f = jax.jit(lambda h, w: jnp.where(
        h >= 9, w[None, :] * h.astype(jnp.float32), np.float32(-np.inf)
    ).reshape(h.shape[0], -1, 128).max(axis=2)[:1, :1])
    dt = tm(f, hits8, wm)
    print(f"blockmax from hits8 (128,8M): {dt*1e3:.1f} ms", flush=True)

    # --- 3. top_k shapes for hierarchical selection ---------------------
    for b, lanes, k in ((128, 78_125, 512), (128, 65_536, 2048),
                        (128, 8192, 512), (128, 32_768, 1024),
                        (128, 512, 256), (128, 131_072, 2048)):
        xx = mkf((b, lanes), 6)
        f = jax.jit(lambda a: jax.lax.top_k(a, k)[0][:, :1])
        dt = tm(f, xx)
        print(f"top_k ({b},{lanes})->k={k}: {dt*1e3:.1f} ms", flush=True)
        del xx

    # --- 4. per-query block gather (128, kb*128) int8 from (128, 8M) ----
    kb = 512
    bi = mk((128, kb), 0, (8 << 20) // 128, jnp.int32, 7)
    f = jax.jit(
        lambda h, i: jnp.sum(
            jax.vmap(lambda row, idx: row.reshape(-1, 128)[idx])(h, i),
            dtype=jnp.int32,
        )
    )
    dt = tm(f, hits8, bi)
    print(f"block-gather (128,{kb}x128) int8 from (128,8M): {dt*1e3:.1f} ms",
          flush=True)
    del hits8, wm

    # --- 5. exact rescore compare (B, C, W) grams vs (B, Qm) slots ------
    b, c, w_, qm = 128, 1024, 32, 32
    tg = mk((b, c, w_), 0, 50_000, jnp.int32, 8)
    qs = mk((b, qm), 0, 50_000, jnp.int32, 9)
    f = jax.jit(lambda t, q: jnp.sum(
        (t[:, :, :, None] == q[:, None, None, :]).astype(jnp.int32),
        axis=(2, 3))[:1, :1])
    dt = tm(f, tg, qs)
    print(f"rescore compare ({b},{c},{w_})x({b},{qm}): {dt*1e3:.1f} ms",
          flush=True)

    # --- 6. TG row gather: 131k random rows of (8M, 32) int32 -----------
    tgt = mk((8 << 20, 32), 0, 50_000, jnp.int32, 10)
    ridx2 = mk((128 * 1024,), 0, 8 << 20, jnp.int32, 11)
    f = jax.jit(lambda m, i: jnp.sum(m[i], dtype=jnp.int32))
    dt = tm(f, tgt, ridx2)
    print(f"TG row-gather 131k rows of (8M,32)int32: {dt*1e3:.1f} ms",
          flush=True)
    del tgt

    # --- 7. device sketch build: pack + searchsorted + sort + bitmask ---
    ltok = mk((2 << 20, 40), 65, 91, jnp.uint8, 12)
    lens = mk((2 << 20,), 6, 38, jnp.int32, 13)
    gram_ids = jnp.sort(mk((50_000,), 0, 1 << 24, jnp.int32, 14))

    def build(tok, ln, gi):
        t = tok.astype(jnp.int32)
        g3 = (t[:, :-2] << 16) | (t[:, 1:-1] << 8) | t[:, 2:]
        pos = jax.lax.broadcasted_iota(jnp.int32, g3.shape, 1)
        valid = pos < (ln[:, None] - 2)
        idx = jnp.searchsorted(gi, g3).astype(jnp.int32)
        idx = jnp.where(valid, idx, 2**30)
        s = jnp.sort(idx, axis=1)
        dup = jnp.concatenate(
            [jnp.zeros((s.shape[0], 1), bool), s[:, 1:] == s[:, :-1]], axis=1)
        tg2 = jnp.where(dup | (s >= 2**30), -1, s)
        # bucket bitmask
        bkt = jnp.where(
            tg2 >= 0,
            ((tg2.astype(jnp.uint32) * jnp.uint32(2654435761))
             >> jnp.uint32(23)).astype(jnp.int32),
            -1)
        words = jnp.arange(16, dtype=jnp.int32)
        mask = jnp.zeros((tg2.shape[0], 16), jnp.uint32)
        for j in range(tg2.shape[1]):
            bj = bkt[:, j]
            wj = bj >> 5
            bit = jnp.uint32(1) << (bj & 31).astype(jnp.uint32)
            mask = mask | jnp.where(
                (bj[:, None] >= 0) & (wj[:, None] == words[None, :]),
                bit[:, None], jnp.uint32(0))
        wt = mask.T
        didx = jnp.arange(512, dtype=jnp.int32)
        inc = ((wt[didx >> 5, :] >> (didx & 31).astype(jnp.uint32)[:, None])
               & jnp.uint32(1)).astype(jnp.int8)
        return inc[:1, :1], tg2[:1, :1]

    f = jax.jit(build)
    dt = tm(f, ltok, lens, gram_ids, n=2)
    print(f"device sketch build 2M terms (inc 512 + tg): {dt*1e3:.1f} ms",
          flush=True)
    del ltok, lens

    # --- 8. device postings build: shingle + 64-bit sort ----------------
    ltok = mk((2 << 20, 40), 65, 91, jnp.uint8, 15)
    lens2 = mk((2 << 20,), 6, 38, jnp.int32, 16)

    def build_postings(tok, ln):
        t = tok.astype(jnp.int32)
        g3 = (t[:, :-2] << 16) | (t[:, 1:-1] << 8) | t[:, 2:]
        pos = jax.lax.broadcasted_iota(jnp.int32, g3.shape, 1)
        valid = pos < (ln[:, None] - 2)
        tid = jax.lax.broadcasted_iota(jnp.int32, g3.shape, 0)
        key = jnp.where(
            valid,
            g3.astype(jnp.float64) * (4 << 20) + tid.astype(jnp.float64),
            np.float64(2.0**62),
        )
        # float64 keys: exact for < 2^52 and sortable without x64 ints
        ks = jnp.sort(key.ravel())
        return ks[:1]

    try:
        f = jax.jit(build_postings)
        dt = tm(f, ltok, lens2, n=2)
        print(f"device postings sort (f64 keys) 2Mx38: {dt*1e3:.1f} ms",
              flush=True)
    except Exception as e:
        print(f"f64 postings sort failed: {e}", flush=True)

    def build_postings32(tok, ln):
        t = tok.astype(jnp.int32)
        g3 = (t[:, :-2] << 16) | (t[:, 1:-1] << 8) | t[:, 2:]
        pos = jax.lax.broadcasted_iota(jnp.int32, g3.shape, 1)
        valid = pos < (ln[:, None] - 2)
        tid = jax.lax.broadcasted_iota(jnp.int32, g3.shape, 0)
        g3 = jnp.where(valid, g3, 2**24)
        ks, ts_ = jax.lax.sort(
            (g3.ravel(), tid.ravel()), num_keys=2)
        return ks[:1], ts_[:1]

    f = jax.jit(build_postings32)
    dt = tm(f, ltok, lens2, n=2)
    print(f"device postings 2-key sort (gram,term) 2Mx38: {dt*1e3:.1f} ms",
          flush=True)
    del ltok, lens2

    # --- 9. big sorts / cumsum ------------------------------------------
    keys = mk((16 << 20,), 0, 1 << 30, jnp.int32, 17)
    f = jax.jit(lambda k: jnp.sort(k)[:1])
    dt = tm(f, keys)
    print(f"sort 16M int32: {dt*1e3:.1f} ms", flush=True)
    pay = mk((16 << 20,), 0, 1 << 30, jnp.int32, 18)
    f2 = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1)[1][:1])
    dt = tm(f2, keys, pay)
    print(f"sort 16M int32+payload: {dt*1e3:.1f} ms", flush=True)
    del keys, pay

    x1 = mk((16 << 20,), 0, 3, jnp.int32, 19)
    f = jax.jit(lambda a: jnp.cumsum(a)[-1:])
    dt = tm(f, x1)
    print(f"cumsum 16M int32 1D: {dt*1e3:.1f} ms", flush=True)
    del x1

    # --- 10. uploads last (steady-state, small sizes) -------------------
    rng = np.random.default_rng(0)
    for mb in (1, 4, 16):
        x = rng.integers(0, 255, size=mb << 20, dtype=np.uint8)
        t0 = time.perf_counter()
        d = jax.device_put(x)
        jax.device_get(d[:1])
        dt = time.perf_counter() - t0
        print(f"upload {mb}MB: {dt*1e3:.0f} ms = {mb/dt:.2f} MB/s",
              flush=True)
        del d, x


if __name__ == "__main__":
    main()
