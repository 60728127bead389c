"""Round-5 kernel layout probe: is the 273 GB/s Pallas stream floor a
DMA-contiguity artifact?

The round-4 platform table (docs/PERF.md) shows XLA reading the resident
3.4 GB packed table at 1.2 TB/s while the Pallas tile-max stream runs at
273 GB/s with (2816, 512)-byte blocks.  Hypothesis: a (gp, BLKB) block
of the row-major (gp, NB) table is 2816 DISJOINT 512-byte segments - far
below the HBM-efficient transfer size - while XLA's reductions read full
contiguous rows.  A tile-major (ntiles, gp, BLKB) copy makes each kernel
step's block one contiguous 1.44 MB chunk.

Variants (synthetic 10M-term table, on-device generated):
  stream_row    pure tile-max, row-major blocks      (re-measure 273 GB/s)
  stream_tile   pure tile-max, tile-major blocks     (contiguity test)
  pair_row      production pair kernel, row-major    (baseline 45-60 ms)
  pair_tile     pair kernel, tile-major input
  pair_tile_q2  + 2 query blocks resident, shared table read (B=512 in)
  pair_tile_o3  + tile-major OUTPUT (ntiles, bq, 8*BLKB): contiguous 1 MB
                writes instead of (bq, 4 KB)-strided ones

Usage: python tools/probe_layout_r5.py [ntiles] [bq]
"""

from __future__ import annotations

import functools
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


def timeit(name, fn, reps=4, extra=""):
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
    log(f"{name}: {ms:.1f} ms net {extra} "
        f"(reps {['%.1f' % (t * 1e3) for t in ts]})")
    return ms


PAIR_MASKS = (0b100001, 0b1000010, -124, 8, 16)


def main():
    ntiles = int(sys.argv[1]) if len(sys.argv) > 1 else 2560
    bq = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    gp = 2816

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from stringsearchlib_tpu.ops.bitmap_matmul import BLKB, TILE_LANES

    log(f"devices: {jax.devices()}  ntiles={ntiles} gp={gp} bq={bq}")
    nb = ntiles * BLKB

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

    # on-device synthetic table, both layouts (values irrelevant to cost)
    key = jax.random.PRNGKey(0)
    t_row = jax.jit(
        lambda k: jax.random.randint(k, (gp, nb), -128, 128, jnp.int8)
    )(key)
    t_tile = jax.jit(
        lambda t: t.reshape(gp, ntiles, BLKB).transpose(1, 0, 2)
    )(t_row)
    t_tile = jax.block_until_ready(t_tile)
    gb = gp * nb / 1e9
    log(f"table {gb:.2f} GB resident, both layouts")

    qs = np.zeros((2 * bq, gp), np.float32)
    rng = np.random.default_rng(0)
    for r in range(2 * bq):
        qs[r, rng.choice(gp, 30, replace=False)] = 1.0
    q_dev = jnp.asarray(qs.astype(np.int8))

    # ---------------- pure streams ----------------
    stream_cost = pl.CostEstimate(
        flops=gp * nb, bytes_accessed=gp * nb + nb, transcendentals=0
    )

    @jax.jit
    def stream_row(t, r):
        return pl.pallas_call(
            lambda r_ref, t_ref, o_ref: o_ref.__setitem__(
                (slice(None), slice(None)),
                jnp.maximum(
                    jnp.max(
                        t_ref[:].astype(jnp.int32), axis=0, keepdims=True
                    ),
                    r_ref[:],
                ),
            ),
            grid=(ntiles,),
            in_specs=[
                pl.BlockSpec((1, BLKB), lambda j: (0, 0)),
                pl.BlockSpec((gp, BLKB), lambda j: (0, j)),
            ],
            out_specs=pl.BlockSpec((1, BLKB), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((1, nb), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            cost_estimate=stream_cost,
        )(r, t)

    @jax.jit
    def stream_tile(t, r):
        return pl.pallas_call(
            lambda r_ref, t_ref, o_ref: o_ref.__setitem__(
                (slice(None), slice(None), slice(None)),
                jnp.maximum(
                    jnp.max(
                        t_ref[:].astype(jnp.int32), axis=1, keepdims=True
                    ),
                    r_ref[:][None],
                ),
            ),
            grid=(ntiles,),
            in_specs=[
                pl.BlockSpec((1, BLKB), lambda j: (0, 0)),
                pl.BlockSpec((1, gp, BLKB), lambda j: (j, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, BLKB), lambda j: (j, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((ntiles, 1, BLKB), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            cost_estimate=stream_cost,
        )(r, t)

    def r_op(r):
        return jnp.full((1, BLKB), np.int32(r % 7 - 3))

    ms = timeit("stream_row", lambda r: stream_row(t_row, r_op(r)))
    log(f"  -> {gb / (ms / 1e3):.0f} GB/s")
    ms = timeit("stream_tile", lambda r: stream_tile(t_tile, r_op(r)))
    log(f"  -> {gb / (ms / 1e3):.0f} GB/s")

    # ---------------- pair kernels ----------------
    def decode_planes(accs):
        p0, p1, p27, p3, p4 = accs
        h7 = (np.int32(127) - p27) >> 7
        return [
            p0 & 31, (p1 >> 1) & 31, (p27 + (h7 << 7)) >> 2,
            p3 >> 3, p4 >> 4, p0 >> 5, p1 >> 6, h7,
        ]

    def body(q, t, store):
        accs = [
            jnp.dot(q, t & np.int8(m), preferred_element_type=jnp.int32)
            for m in PAIR_MASKS
        ]
        for s, p in enumerate(decode_planes(accs)):
            store(s, p.astype(jnp.int8))

    def pair_params(b):
        return dict(
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * gp * ntiles * TILE_LANES,
                bytes_accessed=2 * b * gp + gp * nb
                + b * ntiles * TILE_LANES,
                transcendentals=0,
            ),
        )

    @functools.partial(jax.jit, static_argnames=("variant",))
    def pair(q, t, *, variant):
        b = q.shape[0]
        if variant == "row":
            def kernel(q_ref, t_ref, o_ref):
                body(
                    q_ref[:], t_ref[:],
                    lambda s, v: o_ref.__setitem__(
                        (slice(None), slice(s * BLKB, (s + 1) * BLKB)), v
                    ),
                )

            return pl.pallas_call(
                kernel,
                grid=(ntiles,),
                in_specs=[
                    pl.BlockSpec((b, gp), lambda j: (0, 0)),
                    pl.BlockSpec((gp, BLKB), lambda j: (0, j)),
                ],
                out_specs=pl.BlockSpec((b, TILE_LANES), lambda j: (0, j)),
                out_shape=jax.ShapeDtypeStruct(
                    (b, ntiles * TILE_LANES), jnp.int8
                ),
                **pair_params(b),
            )(q, t)
        if variant == "tile":
            def kernel(q_ref, t_ref, o_ref):
                body(
                    q_ref[:], t_ref[0],
                    lambda s, v: o_ref.__setitem__(
                        (slice(None), slice(s * BLKB, (s + 1) * BLKB)), v
                    ),
                )

            return pl.pallas_call(
                kernel,
                grid=(ntiles,),
                in_specs=[
                    pl.BlockSpec((b, gp), lambda j: (0, 0)),
                    pl.BlockSpec((1, gp, BLKB), lambda j: (j, 0, 0)),
                ],
                out_specs=pl.BlockSpec((b, TILE_LANES), lambda j: (0, j)),
                out_shape=jax.ShapeDtypeStruct(
                    (b, ntiles * TILE_LANES), jnp.int8
                ),
                **pair_params(b),
            )(q, t)
        if variant == "tile_q2":
            # q is (2*bq, gp); both query blocks resident, one table read
            def kernel(q_ref, t_ref, o_ref):
                t = t_ref[0]
                for qi in range(2):
                    body(
                        q_ref[qi * bq:(qi + 1) * bq, :], t,
                        lambda s, v, qi=qi: o_ref.__setitem__(
                            (
                                slice(qi * bq, (qi + 1) * bq),
                                slice(s * BLKB, (s + 1) * BLKB),
                            ),
                            v,
                        ),
                    )

            return pl.pallas_call(
                kernel,
                grid=(ntiles,),
                in_specs=[
                    pl.BlockSpec((2 * bq, gp), lambda j: (0, 0)),
                    pl.BlockSpec((1, gp, BLKB), lambda j: (j, 0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (2 * bq, TILE_LANES), lambda j: (0, j)
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (2 * bq, ntiles * TILE_LANES), jnp.int8
                ),
                **pair_params(2 * bq),
            )(q, t)
        if variant == "tile_o3":
            # tile-major OUT: (ntiles, b, 8*BLKB), contiguous 1 MB writes
            def kernel(q_ref, t_ref, o_ref):
                body(
                    q_ref[:], t_ref[0],
                    lambda s, v: o_ref.__setitem__(
                        (0, slice(None), slice(s * BLKB, (s + 1) * BLKB)),
                        v,
                    ),
                )

            return pl.pallas_call(
                kernel,
                grid=(ntiles,),
                in_specs=[
                    pl.BlockSpec((b, gp), lambda j: (0, 0)),
                    pl.BlockSpec((1, gp, BLKB), lambda j: (j, 0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (1, b, TILE_LANES), lambda j: (j, 0, 0)
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (ntiles, b, TILE_LANES), jnp.int8
                ),
                **pair_params(b),
            )(q, t)
        raise ValueError(variant)

    outs = {}
    for variant, q, t in (
        ("row", q_dev[:bq], t_row),
        ("tile", q_dev[:bq], t_tile),
        ("tile_q2", q_dev, t_tile),
        ("tile_o3", q_dev[:bq], t_tile),
    ):
        nq = q.shape[0]

        def f(r, v=variant, q=q, t=t):
            return pair(jnp.roll(q, r, axis=0), t, variant=v)

        ms = timeit(f"pair_{variant}", f)
        if np.isfinite(ms):
            log(f"  -> {ms / (nq / 256):.1f} ms per 256 queries")
            outs[variant] = np.asarray(
                jax.device_get(pair(q, t, variant=variant))
            )

    # parity: tile/tile_o3/tile_q2 must reproduce row's hits
    if "row" in outs:
        ref = outs["row"]
        for v, got in outs.items():
            if v == "row":
                continue
            if v == "tile_q2":
                got = got[:bq]
            if v == "tile_o3":
                got = got.transpose(1, 0, 2).reshape(bq, -1)
            log(f"parity {v}: {np.array_equal(ref, got)}")


if __name__ == "__main__":
    main()
