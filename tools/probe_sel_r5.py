"""Round-5 selection-stage probe: where do the ~58 ms/256 of the h*
back half go, and does a 32-lane fine level cut the big lane top-k?

The strong-scaling fit (SCALING.json) shows a 0.453 ms/query FIXED term;
the selection back half (budgets kb1=kb2=1024, n_cand=1024 - all
T-independent) is its largest component.  This probe times each stage of
search.candidates._hstar_finish in isolation on synthetic hits/hmax at
the 10M headline shape, plus a proposed replacement for the fine
extraction: rank 32-lane sub-blocks (bmax32) so the final exact-hits
gather shrinks 131k -> ~33k lanes and the dominant topk_chunked
((256, 131k) -> 1024, ~25-50 ms by the round-2 cost surface) runs at a
shape where lax.top_k costs ~2-8 ms.

Usage: python tools/probe_sel_r5.py [ntiles] [B]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

sys.path.insert(0, "/root/repo")


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
    ntiles = int(sys.argv[1]) if len(sys.argv) > 1 else 2560
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import functools

    import jax
    import jax.numpy as jnp

    from stringsearchlib_tpu.ops.bitmap_matmul import BLKB, TILE_LANES
    from stringsearchlib_tpu.search.candidates import topk_chunked

    blk = 128
    tlp = ntiles * TILE_LANES
    nblk = tlp // blk
    nblk32 = tlp // 32
    kb1, kb2, n_cand, vmax = 1024, 1024, 1024, 31
    log(f"devices: {jax.devices()}  tlp={tlp} nblk={nblk} b={b}")

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

    # synthetic hits with realistic sparsity: geometric-ish tail, most
    # lanes 0, ~1% small positive, a few high counts per query
    key = jax.random.PRNGKey(0)

    @jax.jit
    def make_hits(k):
        u = jax.random.uniform(k, (b, tlp))
        h = jnp.where(u > 0.99, (u - 0.99) * 800.0, 0.0)
        return jnp.minimum(h, 30.0).astype(jnp.int8)

    hits = jax.block_until_ready(make_hits(key))
    log(f"hits {hits.shape} = {hits.size / 1e9:.2f} GB resident")

    @jax.jit
    def bmax128(h):
        return jnp.max(h.reshape(b, nblk, blk), axis=2)

    hmax = jax.block_until_ready(bmax128(hits))
    roll = functools.partial(jnp.roll, shift=1, axis=0)

    # --- stage timings at production budgets ---
    vals = np.arange(1, vmax + 1, dtype=np.int8)

    @jax.jit
    def s_hist(hm):
        c = jnp.sum(
            (hm[:, :, None] >= vals[None, None, :]).astype(jnp.int32),
            axis=1,
        )
        return c

    timeit("cnt128 histogram (b,nblk,31)", lambda r: s_hist(roll(hmax)))

    @jax.jit
    def s_coarse(hm):
        c1 = 8
        n1 = nblk // c1
        hm3 = hm.reshape(b, n1, c1)
        bm1 = jnp.max(hm3, axis=2)
        bv, bsel = jax.lax.top_k(bm1, kb1)
        sub = jnp.take_along_axis(hm3, bsel[:, :, None], axis=1)
        subid = bsel[:, :, None] * c1 + jnp.arange(c1, dtype=jnp.int32)
        fv, fs = jax.lax.top_k(sub.reshape(b, kb1 * c1), kb2)
        fid = jnp.take_along_axis(subid.reshape(b, kb1 * c1), fs, axis=1)
        return fv, fid  # fid: GLOBAL 128-block ids (production pattern)

    timeit("coarse top_k x2 (10k->1024->1024)",
           lambda r: s_coarse(roll(hmax)))

    fid = jax.block_until_ready(
        jax.jit(lambda hm: s_coarse(hm)[1])(hmax)
    )  # (b, kb2) -- block ids in [0, kb1*8); remap to real block ids
    fid = jax.block_until_ready(
        jnp.clip(fid.astype(jnp.int32), 0, nblk - 1)
    )

    @jax.jit
    def s_gather128(h, f):
        h3 = h.reshape(b, nblk, blk)
        return jnp.take_along_axis(h3, f[:, :, None], axis=1)

    timeit("hits gather (b,1024,128)", lambda r: s_gather128(hits, roll(fid)))

    hb = jax.block_until_ready(
        jax.jit(
            lambda h, f: s_gather128(h, f).reshape(b, kb2 * blk)
        )(hits, fid)
    )

    @jax.jit
    def s_lanehist(x):
        return jnp.sum(
            (x[:, :, None] >= vals[None, None, :]).astype(jnp.int32),
            axis=1,
        )

    timeit("cnt_l lane histogram (b,131k,31)",
           lambda r: s_lanehist(roll(hb)))

    timeit("topk_chunked (b,131k)->1024",
           lambda r: topk_chunked(roll(hb), n_cand))

    timeit("lax.top_k (b,131k)->1024",
           lambda r: jax.lax.top_k(roll(hb), n_cand))

    # --- proposed 32-lane fine level ---
    @jax.jit
    def s_bmax32(h):
        return jnp.max(h.reshape(b, nblk32, 32), axis=2)

    timeit("XLA bmax32 over full hits", lambda r: s_bmax32(roll(hits)))

    @jax.jit
    def s_bmax32_of128(h, f):
        # only the kept 128-blocks' 32-lane submaxima (4 per block)
        hb4 = jnp.take_along_axis(
            h.reshape(b, nblk, blk), f[:, :, None], axis=1
        ).reshape(b, kb2, 4, 32)
        return jnp.max(hb4, axis=3)

    timeit("bmax32 of kept blocks (gather+reduce)",
           lambda r: s_bmax32_of128(hits, roll(fid)))

    sub32 = jax.block_until_ready(s_bmax32_of128(hits, fid))

    @jax.jit
    def s_fine32(s32, h, f):
        # rank 32-lane sub-blocks, keep kb3=1024, gather 32-lane chunks
        kb3 = 1024
        fv, fs = jax.lax.top_k(s32.reshape(b, kb2 * 4), kb3)
        sb_id = jnp.take_along_axis(
            (f[:, :, None] * 4
             + jnp.arange(4, dtype=jnp.int32)).reshape(b, kb2 * 4),
            fs, axis=1,
        )  # (b, kb3) 32-lane sub-block ids
        h32 = h.reshape(b, nblk32, 32)
        lanes = jnp.take_along_axis(h32, sb_id[:, :, None], axis=1)
        return lanes.reshape(b, kb3 * 32), sb_id

    timeit("fine32: top_k(4096)+gather 33k lanes",
           lambda r: s_fine32(sub32, hits, roll(fid)))

    hb32, _ = s_fine32(sub32, hits, fid)
    hb32 = jax.block_until_ready(hb32)

    timeit("topk_chunked (b,33k)->1024",
           lambda r: topk_chunked(roll(hb32), n_cand))
    timeit("lax.top_k (b,33k)->1024",
           lambda r: jax.lax.top_k(roll(hb32), n_cand))

    # --- candidate full-pipeline comparison: current vs 32-lane ---
    @jax.jit
    def pipe_now(h, hm):
        fv, fs = s_coarse(hm)
        f = jnp.clip(fs.astype(jnp.int32), 0, nblk - 1)
        x = s_gather128(h, f).reshape(b, kb2 * blk)
        cl = s_lanehist(x)
        v, i = topk_chunked(x, n_cand)
        return v, i, cl

    @jax.jit
    def pipe_32(h, hm):
        fv, fs = s_coarse(hm)
        f = jnp.clip(fs.astype(jnp.int32), 0, nblk - 1)
        s32 = s_bmax32_of128(h, f)
        x32, sb = s_fine32(s32, h, f)
        cl = jnp.sum(
            (x32[:, :, None] >= vals[None, None, :]).astype(jnp.int32),
            axis=1,
        )
        v, i = topk_chunked(x32, n_cand)
        return v, i, cl

    timeit("PIPE current (coarse+gather+hist+topk)",
           lambda r: pipe_now(hits, roll(hmax)))
    timeit("PIPE 32-lane fine level",
           lambda r: pipe_32(hits, roll(hmax)))


if __name__ == "__main__":
    main()
