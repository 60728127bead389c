"""Pure HBM stream bandwidth on the attached TPU (v5e via axon).

The bitmap kernel measures ~50-90 GB/s combined; v5e HBM is spec'd at
819 GB/s.  This probe separates platform from kernel: XLA reduces and a
minimal Pallas read-only pass over the resident 3.7 GB packed table.

Run after tools/probe_hstar_stages.py cached /tmp/idx_10000000.npz.
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


RTT = [0.0]


def timeit(name, fn, gb, reps=3):
    import jax

    def settle(o):
        return jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:1])

    settle(fn(0))
    ts = []
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        settle(fn(r))
        ts.append(time.perf_counter() - t0)
    net = float(np.median(ts)) - RTT[0]
    log(f"{name}: {net*1e3:.1f} ms net -> {gb/max(net,1e-9):.0f} GB/s "
        f"({['%.1f' % (t*1e3) for t in ts]})")
    return net


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    log(f"devices: {jax.devices()}")

    def nop(r):
        return jnp.asarray(np.float32(r)) + 1.0

    RTT[0] = timeit("rtt", nop, 0.0, reps=5)

    from stringsearchlib_tpu.index.serialize import load_index
    from stringsearchlib_tpu.search.engine import SearchEngine

    host = load_index("/tmp/idx_10000000.npz")
    eng = SearchEngine(host)
    eng.GM_BUDGET = 0
    bm, _ = host.bitmap_tables(eng.BITMAP_BUDGET)
    g, nb = int(bm.shape[0]), int(bm.shape[1])
    gb = g * nb / 1e9
    log(f"table {g} x {nb} = {gb:.2f} GB")

    @jax.jit
    def xla_max(t, r):
        return jnp.max(t ^ jnp.int8(r))

    timeit("xla max-reduce (read all)", lambda r: xla_max(bm, r), gb)

    @jax.jit
    def xla_sum_rows(t, r):
        return jnp.sum((t ^ jnp.int8(r)).astype(jnp.int32), axis=0)

    timeit("xla column-sum (read all)", lambda r: xla_sum_rows(bm, r), gb)

    # minimal pallas stream: per-tile max into a tiny output
    blkb = 512

    def kern(t_ref, o_ref):
        o_ref[:, :] = jnp.max(
            t_ref[:].astype(jnp.int32), axis=0, keepdims=True
        )

    @jax.jit
    def pl_stream(t, r):
        ntiles = nb // blkb
        return pl.pallas_call(
            kern,
            grid=(ntiles,),
            in_specs=[pl.BlockSpec((g, blkb), lambda j: (0, j))],
            out_specs=pl.BlockSpec((1, blkb), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((1, nb), jnp.int32),
        )(t ^ jnp.int8(r))

    timeit("pallas tile max (read all)", lambda r: pl_stream(bm, r), gb)

    # write bandwidth: materialize a (256, 10.5M) int8
    tl = nb * 8

    @jax.jit
    def xla_write(r):
        return jnp.full((256, tl), jnp.int8(r % 100))

    timeit("xla write 2.7GB", xla_write, 256 * tl / 1e9)

    # MXU peak check: big bf16 matmul, 8k^3
    a = jnp.ones((8192, 8192), jnp.bfloat16)

    @jax.jit
    def mm(r):
        return jnp.dot(a + jnp.bfloat16(r), a)

    flops = 2 * 8192**3
    t = timeit("bf16 matmul 8k^3", mm, 0.0)
    log(f"  -> {flops/max(t,1e-9)/1e12:.1f} TFLOPS (peak 197)")


if __name__ == "__main__":
    main()
