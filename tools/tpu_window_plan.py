"""Orchestrated TPU validation window: run this ALONE the moment the
pool answers (one tunnel client at a time!).

Sequence (cheapest/highest-information first; each stage logs and
continues on failure so one bad kernel doesn't waste the window):

  1. smoke      - devices + tiny fixture search on the real chip
  2. fused      - compile + parity-check bitmap_hits_bmax on hardware
                  (the engine's BITMAP_FUSED_BMAX gate flips only if
                  this passes AND beats the separate blockmax pass)
  3. mid        - 1M-key gram-dense engine run: e2e qps with fused bmax
                  off vs on
  4. stages     - tools/probe_10m_stages.py at PROBE_KEYS (default 10M)

Usage:  python tools/tpu_window_plan.py [smoke fused mid stages]
"""

import functools
import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
sys.path.insert(0, "/root/repo")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def tm(f, argsets, n=4):
    import jax
    import numpy as np

    f(*argsets[0])
    ts = []
    for i in range(n):
        a = argsets[(i + 1) % len(argsets)]
        t0 = time.perf_counter()
        r = f(*a)
        jax.device_get(jax.tree.leaves(r)[0].ravel()[:1])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def stage_smoke():
    import jax

    t0 = time.perf_counter()
    log(f"devices: {jax.devices()} ({time.perf_counter() - t0:.1f}s)")
    from stringsearchlib_tpu.api import capi

    h = capi.indexN(
        ["LWMS", "LWM", "LWMA", "LWYY", "L", "I", "GHRSDGSDGS Egdsrtg g"],
        rowSize=1,
    )
    res, sc = capi.score(h, "LWMS", threshold=0.5, limit=0)
    assert res[0] == "LWMS" and sc[0] == 100.0, (res, sc)
    assert capi.getSize(h) == 7 and capi.getLibSize(h) == 16
    capi.dispose(h)
    log("smoke OK (fixture anchors on real chip)")


def stage_fused():
    """Compile the fused-bmax kernel on hardware; parity + timing."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stringsearchlib_tpu.config import IndexConfig
    from stringsearchlib_tpu.index.build import build_index
    from stringsearchlib_tpu.ops.bitmap_matmul import (
        bitmap_hits, bitmap_hits_bmax,
    )
    from stringsearchlib_tpu.search.candidates import _BLK, block_hmax

    import bench

    words = bench._product_names(400_000)
    host = build_index(words, 1, None, IndexConfig())
    bm, _ = host.bitmap_tables()
    gp = int(bm.shape[0])
    rng = np.random.default_rng(5)
    B = 256
    qs = [
        jnp.asarray(
            (rng.integers(0, 2, size=(B, gp)) *
             (rng.random((B, gp)) < 0.01)).astype(np.int8)
        )
        for _ in range(3)
    ]
    plain = functools.partial(bitmap_hits, int8_dots=True)
    fused = functools.partial(bitmap_hits_bmax, int8_dots=True)
    log(f"compiling fused kernel (gp={gp}, B={B})...")
    t0 = time.perf_counter()
    hits_f, bmax_f = fused(qs[0], bm)
    jax.device_get(bmax_f.ravel()[:1])
    log(f"fused compiled+ran in {time.perf_counter() - t0:.1f}s")
    hits_p = plain(qs[0], bm)
    np.testing.assert_array_equal(np.asarray(hits_f), np.asarray(hits_p))
    nblk = int(hits_p.shape[1]) // _BLK
    want_b = np.asarray(block_hmax(hits_p, nblk, _BLK))
    np.testing.assert_array_equal(np.asarray(bmax_f), want_b)
    log("fused bmax PARITY OK on hardware")

    dt_p = tm(lambda q: plain(q, bm), [(q,) for q in qs])
    dt_f = tm(lambda q: fused(q, bm), [(q,) for q in qs])
    dt_b = tm(
        lambda q: block_hmax(plain(q, bm), nblk, _BLK),
        [(q,) for q in qs],
    )
    log(
        f"kernel plain {dt_p * 1e3:.1f} ms | fused {dt_f * 1e3:.1f} ms | "
        f"plain+XLA blockmax {dt_b * 1e3:.1f} ms -> fused wins: "
        f"{dt_f < dt_b}"
    )
    return dt_f < dt_b


def stage_gtile():
    """Compile + parity-check the G-TILED kernel variant (tables over
    GBLK gram rows) on hardware; flips BITMAP_GTILE_OK if it passes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stringsearchlib_tpu.config import IndexConfig
    from stringsearchlib_tpu.index.build import build_index
    from stringsearchlib_tpu.ops.bitmap_matmul import (
        BLKB, GBLK, TILE_LANES, bitmap_hits, plane_coords,
    )

    import bench

    words = bench._rich_names(150_000)  # ~46k distinct trigrams > GBLK
    host = build_index(words, 1, None, IndexConfig())
    bm, _ = host.bitmap_tables()
    gp = int(bm.shape[0])
    assert gp > GBLK, f"corpus only made {gp} gram rows; need > {GBLK}"
    rng = np.random.default_rng(9)
    B = 128
    qn = (rng.random((B, gp)) < 0.0006).astype(np.int8)
    q = jnp.asarray(qn)
    log(f"compiling G-tiled kernel (gp={gp}, {gp // GBLK} tiles)...")
    t0 = time.perf_counter()
    hits = bitmap_hits(q, bm, int8_dots=True)
    hits_np = np.asarray(hits)
    log(f"G-tiled compiled+ran in {time.perf_counter() - t0:.1f}s")
    # parity vs a HOST numpy unpack on sampled column tiles (the XLA
    # whole-table unpack reference materializes 14 GB at this shape)
    bm_np = np.asarray(bm).view(np.uint8)
    ntiles = bm_np.shape[1] // BLKB
    byte, bit = plane_coords(np.arange(TILE_LANES))
    for j in rng.choice(ntiles, size=8, replace=False):
        tile = bm_np[:, j * BLKB : (j + 1) * BLKB]  # (gp, BLKB)
        exp = (tile[:, byte] >> bit.astype(np.uint8)) & 1  # (gp, 4096)
        want = qn.astype(np.int32) @ exp.astype(np.int32)
        got = hits_np[:, j * TILE_LANES : (j + 1) * TILE_LANES]
        np.testing.assert_array_equal(got, want.astype(np.int8))
    log("G-tiled kernel PARITY OK on hardware -> flip "
        "SearchEngine.BITMAP_GTILE_OK = True")
    dt = tm(lambda x: bitmap_hits(x, bm, int8_dots=True), [(q,)])
    log(f"G-tiled kernel: {dt * 1e3:.1f} ms "
        f"({bm.size / dt / 1e9:.0f} GB/s packed)")
    return True


def stage_mid(fused_ok: bool):
    import random

    import bench
    from stringsearchlib_tpu.config import IndexConfig
    from stringsearchlib_tpu.index.build import build_index
    from stringsearchlib_tpu.search.engine import SearchEngine

    n = int(os.environ.get("MID_KEYS", 1_000_000))
    words = bench._product_names(n)
    host = build_index(words, 1, None, IndexConfig())
    rng = random.Random(7)
    queries = [bench._mutate(rng, rng.choice(words)) for _ in range(512)]

    for fused in ([False, True] if fused_ok else [False]):
        eng = SearchEngine(host)
        eng.GM_BUDGET = 0  # force the bitmap path even at 1M
        eng.BITMAP_FUSED_BMAX = fused
        eng.search_batch(queries, 0.3, 100)  # warm
        t0 = time.perf_counter()
        eng.search_batch(queries, 0.3, 100)
        dt = time.perf_counter() - t0
        log(f"1M bitmap path fused={fused}: {512 / dt:.0f} qps")


def stage_stages():
    import subprocess

    env = dict(os.environ)
    env.setdefault("PROBE_KEYS", "10000000")
    r = subprocess.run(
        [sys.executable, "tools/probe_10m_stages.py"], env=env,
        cwd="/root/repo",
    )
    log(f"stage probe rc={r.returncode}")


def main():
    stages = sys.argv[1:] or ["smoke", "fused", "gtile", "mid", "stages"]
    fused_ok = False
    gtile_ok = False
    for s in stages:
        log(f"=== stage {s} ===")
        try:
            if s == "smoke":
                stage_smoke()
            elif s == "fused":
                fused_ok = stage_fused()
            elif s == "gtile":
                gtile_ok = stage_gtile()
            elif s == "mid":
                stage_mid(fused_ok)
            elif s == "stages":
                stage_stages()
        except Exception:
            traceback.print_exc()
            log(f"stage {s} FAILED - continuing")
    if fused_ok or gtile_ok:
        # record hardware-validated switches: SearchEngine reads this at
        # import, so the driver's separate bench process picks them up
        import json

        path = "/root/repo/.hw_switches.json"
        try:
            with open(path) as f:
                hw = json.load(f)
        except (OSError, ValueError):
            hw = {}
        if fused_ok:
            hw["fused_bmax"] = True
        if gtile_ok:
            hw["gtile_ok"] = True
        with open(path, "w") as f:
            json.dump(hw, f)
        log(f"wrote {path}: {hw}")
    log("window plan done")


if __name__ == "__main__":
    main()
