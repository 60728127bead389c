"""Bisect the pair kernel's per-tile cost + h* budget retry sweep.

probe_kernel_raw falsified "decode dominates": an i16 raw-acc store ran
3x SLOWER than the full decode+i8 path (Mosaic i16 handling).  This
probe isolates each component on the i8-out structure all variants
share (B=256, full 2816-row table, 10M terms, out (256, ntiles*W) i8):

  base     5 dots + decode 8 planes + 10 i8 stores   (= production, 61 ms)
  nodecode 5 dots + 5 truncating i8 stores           (isolates decode ops)
  rawi32   5 dots + 5 i32 stores (no narrowing)      (isolates 4:1 pack)
  onedot   1 dot + same 8-plane decode + stores      (isolates MXU time)
  onestore 5 dots + decode + ONE i8 store            (isolates store count)
  noand    5 dots on the RAW byte tile (no AND)      (isolates the ANDs)

Then: front-end h* budget sweep kb1=kb2 in {1024, 2048} x fill, counting
guard failures (engine retries cost 84 ms per batch for 3/512 rows).

Usage: python tools/probe_kernel_bisect.py [n_keys] [B]
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


PAIR_MASKS = (0b100001, 0b1000010, -124, 8, 16)


def main():
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    bsz = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from stringsearchlib_tpu.config import IndexConfig
    from stringsearchlib_tpu.index.build import build_index
    from stringsearchlib_tpu.ops.bitmap_matmul import BLKB, TILE_LANES
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
    gp = int(table.shape[0])
    nb = int(table.shape[1])
    ntiles = nb // BLKB
    log(f"table ({gp}, {nb}), ntiles {ntiles}")

    items = []
    for pos, q in enumerate(queries):
        qnorm, qlen = engine._normalize_query(q)
        items.append((pos, qnorm, qlen, host.promo_key_ids(qnorm, qlen)))
    b, qtok, qlens, slots, nqg, use_short, _ = engine._prep_rows(items, 32)
    qcnt_np = np.zeros((bsz, gp), np.float32)
    for r in range(bsz):
        sl = slots[r][slots[r] >= 0]
        np.add.at(qcnt_np[r], sl, 1.0)

    def decode_planes(accs):
        """accs[slot] i32 -> 8 decoded planes (production decode)."""
        p0, p1, p27, p3, p4 = accs
        h7 = (np.int32(127) - p27) >> 7
        return [
            p0 & 31, (p1 >> 1) & 31, (p27 + (h7 << 7)) >> 2,
            p3 >> 3, p4 >> 4, p0 >> 5, p1 >> 6, h7,
        ]

    def make_kernel(variant):
        def kernel(q_ref, bm_ref, out_ref):
            q = q_ref[:]
            t = bm_ref[:]
            if variant == "noand":
                accs = [
                    jnp.dot(q, t, preferred_element_type=jnp.int32)
                    for _ in range(5)
                ]
            else:
                accs = [
                    jnp.dot(
                        q, t & np.int8(m), preferred_element_type=jnp.int32
                    )
                    for m in PAIR_MASKS
                ]
            if variant == "onedot":
                accs = [accs[0]] * 5

            def st(s, v, dt=jnp.int8):
                out_ref[:, s * BLKB : (s + 1) * BLKB] = v.astype(dt)

            if variant in ("nodecode", "noand"):
                for s, acc in enumerate(accs):
                    st(s, acc & 127)  # bound to i8 range, no field decode
            elif variant == "rawi32":
                for s, acc in enumerate(accs):
                    st(s, acc, jnp.int32)
            elif variant == "onestore":
                planes = decode_planes(accs)
                tot = planes[0]
                for p in planes[1:]:
                    tot = tot + p
                st(0, tot & 127)
            else:  # base / onedot: full decode + 8 stores
                for s, p in enumerate(decode_planes(accs)):
                    st(s, p)

        return kernel

    WIDTH = {
        "base": 8, "onedot": 8, "nodecode": 5, "noand": 5, "rawi32": 5,
        "onestore": 1,
    }
    DTYPE = {"rawi32": jnp.int32}

    @functools.partial(jax.jit, static_argnames=("variant",))
    def run(qcnt, planes, *, variant):
        bq = qcnt.shape[0]
        w = WIDTH[variant]
        dt = DTYPE.get(variant, jnp.int8)
        return pl.pallas_call(
            make_kernel(variant),
            grid=(ntiles,),
            in_specs=[
                pl.BlockSpec((bq, gp), lambda j: (0, 0)),
                pl.BlockSpec((gp, BLKB), lambda j: (0, j)),
            ],
            out_specs=pl.BlockSpec((bq, w * BLKB), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((bq, ntiles * w * BLKB), dt),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * bq * gp * ntiles * TILE_LANES,
                bytes_accessed=2 * bq * gp + gp * nb
                + bq * ntiles * w * BLKB,
                transcendentals=0,
            ),
        )(qcnt.astype(jnp.int8), planes)

    for variant in ("noand", "onedot", "onestore", "base"):
        def f(r, v=variant):
            q = jnp.asarray(np.roll(qcnt_np, r, axis=0), dtype=jnp.bfloat16)
            return run(q, table, variant=v)

        timeit(f"kernel {variant}", f)

    return  # front sweep moved to probe_sweep2
    # ----------------- h* budget sweep: guard failures ------------------
    from stringsearchlib_tpu.search.candidates import candidates_bitmap_mxu

    di = host.device
    pt, xt = host.prim_tables()
    promo_a = np.full((b, engine.PROMO_KEYS), -1, np.int32)
    for r, it in enumerate(items):
        promo_a[r, : it[3].size] = it[3]
    promo_t, promo_w = engine._promo_tables(promo_a)
    lim = np.full((b,), 100, np.int32)

    def front(r, kb, n_cand, fill):
        q = np.roll(qtok, r, axis=0)
        s = np.roll(slots, r, axis=0)
        return candidates_bitmap_mxu(
            di, table, pt, xt, jnp.asarray(q),
            jnp.asarray(np.roll(qlens, r)), jnp.asarray(s),
            jnp.asarray(np.roll(nqg, r)),
            jnp.asarray(np.roll(use_short, r)),
            jnp.asarray(np.roll(promo_a, r, axis=0)),
            jnp.asarray(np.roll(promo_t, r, axis=0)),
            jnp.asarray(np.roll(promo_w, r, axis=0)),
            jnp.asarray(lim), np.float32(0.3),
            compute_short=bool(use_short.any()), n_edge=16384,
            top_k=128, n_cand=n_cand, hstar=True, kb1=kb, kb2=kb,
            hs_fill=fill, pair_dots=True, fused_bmax=True,
        )

    for kb, n_cand, fill in ((1024, 1024, 0), (2048, 1024, 0),
                             (2048, 2048, 0), (1024, 1024, 2)):
        got = jax.device_get(front(0, kb, n_cand, fill))
        fails = int((~np.asarray(got[4])).sum())
        t = timeit(
            f"front kb={kb} n_cand={n_cand} fill={fill}",
            lambda r, kb=kb, nc=n_cand, fl=fill: front(r, kb, nc, fl),
        )
        log(f"  -> guard failures {fails}/{bsz}")


if __name__ == "__main__":
    main()
