"""Kernel-structure probe: where do the bitmap kernel's 59.5 ms go?

probe_hstar_stages showed halving gram rows saves only 6.5 of 59.5 ms,
so ~46 ms is per-OUTPUT work: the 8-plane field decode (i32 shifts +
masks) and the i32 -> i8 pack, serialized with the dots per tile.

Variants timed here (B=256, full 2816-row table, 10M terms):
  A  baseline pair kernel (bitmap_hits_bmax, int8_dots="pair")
  B  raw-acc kernel: 5 dots, store UNDECODED pair accumulators as i16
     (no plane decode, no 4:1 pack) -> out (B, ntiles*5*BLKB) i16
  C  XLA decode of B's raw acc -> (hits i8, hmax) fused elementwise
     at XLA stream rate (the work the kernel no longer does)
  D  bmax-only kernel: decode in VMEM but store ONLY the per-128 maxima
     (floor for a no-hits-store formulation)
  E  raw-acc kernel at B=512 (VMEM ~7 MB: fits where decoded B=512
     did not)

Usage: python tools/probe_kernel_raw.py [n_keys] [B]
"""

from __future__ import annotations

import functools
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
    bsz = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from stringsearchlib_tpu.config import IndexConfig
    from stringsearchlib_tpu.index.build import build_index
    from stringsearchlib_tpu.ops.bitmap_matmul import (
        BLKB, TILE_LANES, bitmap_hits_bmax,
    )
    from stringsearchlib_tpu.search.engine import SearchEngine

    log(f"devices: {jax.devices()}")

    import jax.numpy as _jnp

    def nop(r):
        return _jnp.asarray(np.float32(r)) + 1.0

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
    gp = int(table.shape[0])
    nb = int(table.shape[1])
    ntiles = nb // BLKB
    log(f"table ({gp}, {nb}) = {gp*nb/1e9:.2f} GB, ntiles {ntiles}")

    items = []
    for pos, q in enumerate(queries):
        qnorm, qlen = engine._normalize_query(q)
        items.append((pos, qnorm, qlen, host.promo_key_ids(qnorm, qlen)))
    b, qtok, qlens, slots, nqg, use_short, _ = engine._prep_rows(items, 32)
    qcnt_np = np.zeros((bsz, gp), np.float32)
    for r in range(bsz):
        sl = slots[r][slots[r] >= 0]
        np.add.at(qcnt_np[r], sl, 1.0)

    # ---------------- raw-acc pair kernel --------------------------------
    NSLOT = 5  # pair slots per byte tile: (0,5) (1,6) (2,7) 3 4

    def make_raw_kernel(store_i16: bool):
        def kernel(q_ref, bm_ref, out_ref):
            q = q_ref[:]
            t = bm_ref[:]

            def st(s, acc):
                sl = slice(s * BLKB, (s + 1) * BLKB)
                out_ref[:, sl] = acc.astype(
                    jnp.int16 if store_i16 else jnp.int32
                )

            for s, mask in enumerate((0b100001, 0b1000010)):
                op = t & np.int8(mask)
                st(s, jnp.dot(q, op, preferred_element_type=jnp.int32))
            op = t & np.int8(-124)  # (2,7) signed
            st(2, jnp.dot(q, op, preferred_element_type=jnp.int32))
            for i, p in enumerate((3, 4)):
                op = t & np.int8(1 << p)
                st(3 + i, jnp.dot(q, op, preferred_element_type=jnp.int32))

        return kernel

    @functools.partial(jax.jit, static_argnames=("i16",))
    def raw_hits(qcnt, planes, *, i16=True):
        bq = qcnt.shape[0]
        return pl.pallas_call(
            make_raw_kernel(i16),
            grid=(ntiles,),
            in_specs=[
                pl.BlockSpec((bq, gp), lambda j: (0, 0)),
                pl.BlockSpec((gp, BLKB), lambda j: (0, j)),
            ],
            out_specs=pl.BlockSpec((bq, NSLOT * BLKB), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct(
                (bq, ntiles * NSLOT * BLKB),
                jnp.int16 if i16 else jnp.int32,
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * bq * gp * ntiles * TILE_LANES,
                bytes_accessed=2 * bq * gp + gp * nb
                + 2 * bq * ntiles * NSLOT * BLKB,
                transcendentals=0,
            ),
        )(qcnt.astype(jnp.int8), planes)

    # ---------------- XLA decode: raw acc -> hits + hmax ------------------
    @functools.partial(jax.jit, static_argnames=("nt",))
    def xla_decode(raw, off=0, nt=ntiles):
        bq = raw.shape[0]
        r = raw.reshape(bq, nt, NSLOT, BLKB).astype(jnp.int32) + off
        p0, p1, p27, p3, p4 = (r[:, :, i] for i in range(NSLOT))
        h7 = (124 - p27) >> 7
        planes = [
            p0 & 31, (p1 >> 1) & 31, (p27 + (h7 << 7)) >> 2,
            p3 >> 3, p4 >> 4, p0 >> 5, p1 >> 6, h7,
        ]
        hs = jnp.stack(planes, axis=2).astype(jnp.int8)  # (b, nt, 8, BLKB)
        hits = hs.reshape(bq, nt * TILE_LANES)
        hmax = jnp.max(
            hs.reshape(bq, nt, 8, BLKB // 128, 128), axis=4
        ).reshape(bq, nt * TILE_LANES // 128)
        return hits, hmax

    @jax.jit
    def xla_decode_hmax_only(raw, off=0):
        bq = raw.shape[0]
        r = raw.reshape(bq, ntiles, NSLOT, BLKB).astype(jnp.int32) + off
        p0, p1, p27, p3, p4 = (r[:, :, i] for i in range(NSLOT))
        h7 = (124 - p27) >> 7
        planes = [
            p0 & 31, (p1 >> 1) & 31, (p27 + (h7 << 7)) >> 2,
            p3 >> 3, p4 >> 4, p0 >> 5, p1 >> 6, h7,
        ]
        hs = jnp.stack(planes, axis=2).astype(jnp.int8)
        return jnp.max(
            hs.reshape(bq, ntiles, 8, BLKB // 128, 128), axis=4
        ).reshape(bq, ntiles * TILE_LANES // 128)

    # parity check on a small slice first (CPU-free: compare vs baseline)
    def k_base(r):
        q = jnp.asarray(np.roll(qcnt_np, r, axis=0), dtype=jnp.bfloat16)
        return bitmap_hits_bmax(q, table, int8_dots="pair")

    # parity: fetch small slices immediately and free device refs between
    # steps - holding base hits (2.7 GB) + raw (3.4 GB) + decoded (2.7 GB)
    # + the 3.5 GB table OOMs the 16 GB chip
    q0 = jnp.asarray(qcnt_np, dtype=jnp.bfloat16)
    hits_ref, hmax_ref = k_base(0)
    a = np.asarray(jax.device_get(hits_ref[:4, : 1 << 16]))
    am = np.asarray(jax.device_get(hmax_ref[:4, :512]))
    del hits_ref, hmax_ref
    raw = raw_hits(q0, table)
    npref = 256
    raw_pref = raw[:, : npref * NSLOT * BLKB]
    del raw
    hits_raw, hmax_raw = xla_decode(raw_pref, nt=npref)
    del raw_pref
    c = np.asarray(jax.device_get(hits_raw[:4, : 1 << 16]))
    cm = np.asarray(jax.device_get(hmax_raw[:4, :512]))
    del hits_raw, hmax_raw
    log(f"parity hits raw-vs-base: {np.array_equal(a, c)}")
    log(f"parity hmax raw-vs-base: {np.array_equal(am, cm)}")

    t_a = timeit("A baseline pair kernel (hits+bmax)", k_base)

    def k_raw(r):
        q = jnp.asarray(np.roll(qcnt_np, r, axis=0), dtype=jnp.bfloat16)
        return raw_hits(q, table)

    t_b = timeit("B raw-acc kernel (i16 store)", k_raw)

    raw0 = jax.block_until_ready(raw_hits(q0, table))

    t_c = timeit(
        "C xla decode raw->hits+hmax", lambda r: xla_decode(raw0, r)
    )
    t_c2 = timeit(
        "C2 xla decode raw->hmax only",
        lambda r: xla_decode_hmax_only(raw0, r),
    )
    log(f"B+C = {t_b+t_c:.1f} ms vs A {t_a:.1f} "
        f"(B+C2 = {t_b+t_c2:.1f} if hits stay raw)")

    del raw0  # free 3.4 GB before the B=512 run

    # E: B=512 raw kernel
    q512 = np.concatenate([qcnt_np, qcnt_np], axis=0)

    def k_raw_512(r):
        q = jnp.asarray(np.roll(q512, r, axis=0), dtype=jnp.bfloat16)
        return raw_hits(q, table)

    timeit("E raw-acc kernel B=512", k_raw_512)

    def k512_decode(r):
        q = jnp.asarray(np.roll(q512, r, axis=0), dtype=jnp.bfloat16)
        return xla_decode_hmax_only(raw_hits(q, table))

    timeit("E2 raw B=512 + hmax decode", k512_decode)


if __name__ == "__main__":
    main()
