"""Blockmax formulations over a big (B, T) int8 hits matrix (real TPU).

The candidate back half needs per-128-lane block maxima of the hits
matrix; XLA's reshape+max measured ~27 GB/s in round 2.  This probes
alternatives, including reduce_window (the maxpool path XLA optimizes
for convnets) and coarse two-level variants.  Operands generated on
device.  Run ALONE.
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("PROBE_B", 256))
T = int(os.environ.get("PROBE_T", 10_035_200))  # 128*78400
BLK = 128


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def tm(f, argsets, n=4):
    f(*argsets[0])
    ts = []
    for i in range(n):
        a = argsets[(i + 1) % len(argsets)]
        t0 = time.perf_counter()
        r = f(*a)
        jax.device_get(jax.tree.leaves(r)[0].ravel()[:1])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    log(f"devices: {jax.devices()}  B={B} T={T}")
    nblk = T // BLK

    mk = jax.jit(lambda k: jax.random.randint(
        k, (B, T), 0, 25, jnp.int8))
    hs = [jax.device_put(mk(jax.random.PRNGKey(s))) for s in (0, 1)]
    gb = B * T / 1e9

    f_a = jax.jit(lambda h: jnp.max(h.reshape(B, nblk, BLK), axis=2))
    dt = tm(f_a, [(h,) for h in hs])
    log(f"a reshape+max lane:   {dt * 1e3:6.1f} ms = {gb / dt:5.0f} GB/s")

    f_b = jax.jit(lambda h: jax.lax.reduce_window(
        h, np.int8(-128), jax.lax.max, (1, BLK), (1, BLK), "VALID"))
    dt = tm(f_b, [(h,) for h in hs])
    log(f"b reduce_window:      {dt * 1e3:6.1f} ms = {gb / dt:5.0f} GB/s")

    f_c = jax.jit(lambda h: jnp.max(
        h.reshape(B, nblk, 4, 32), axis=3).max(axis=2))
    dt = tm(f_c, [(h,) for h in hs])
    log(f"c two-stage 32:       {dt * 1e3:6.1f} ms = {gb / dt:5.0f} GB/s")

    # maxpool on the f32-widened (how convnets run it)
    f_d = jax.jit(lambda h: jax.lax.reduce_window(
        h.astype(jnp.bfloat16), np.float16(-3e4).astype(jnp.bfloat16),
        jax.lax.max, (1, BLK), (1, BLK), "VALID"))
    dt = tm(f_d, [(h,) for h in hs])
    log(f"d reduce_window bf16: {dt * 1e3:6.1f} ms = {gb / dt:5.0f} GB/s")

    # two-level: 8-lane pool then 16-lane pool
    f_e = jax.jit(lambda h: jax.lax.reduce_window(
        jax.lax.reduce_window(
            h, np.int8(-128), jax.lax.max, (1, 8), (1, 8), "VALID"),
        np.int8(-128), jax.lax.max, (1, 16), (1, 16), "VALID"))
    dt = tm(f_e, [(h,) for h in hs])
    log(f"e rw 8 then 16:       {dt * 1e3:6.1f} ms = {gb / dt:5.0f} GB/s")

    del hs

    # --- top_k dtype cost: int8/int32 ranks vs f32 bounds ---------------
    from stringsearchlib_tpu.search.candidates import topk_chunked

    nb = nblk
    mkb = jax.jit(lambda k, d: jax.random.randint(
        k, (B, nb), 0, 25, jnp.int32).astype(d))
    for dt_name, d in (("int8", jnp.int8), ("int32", jnp.int32),
                       ("f32", jnp.float32)):
        xs = [jax.device_put(mkb(jax.random.PRNGKey(9 + s), d))
              for s in (0, 1)]
        f = jax.jit(lambda x: topk_chunked(x, 1024))
        t = tm(f, [(x,) for x in xs])
        log(f"topk_chunked ({B},{nb}) {dt_name}->1024: {t * 1e3:6.1f} ms")
        del xs

    # gather+rescore+lane-topk at int8 rank vs f32
    hits2 = jax.device_put(jax.jit(lambda k: jax.random.randint(
        k, (B, T), 0, 25, jnp.int8))(jax.random.PRNGKey(3)))
    bsel = jax.device_put(jax.jit(lambda k: jax.random.randint(
        k, (B, 1024), 0, nb, jnp.int32))(jax.random.PRNGKey(4)))

    def g_f32(h, s):
        h3 = h.reshape(B, nb, BLK)
        hb = jnp.take_along_axis(h3, s[:, :, None], axis=1)
        u = hb.astype(jnp.float32).reshape(B, 1024 * BLK)
        return topk_chunked(u, 1024)

    def g_i8(h, s):
        h3 = h.reshape(B, nb, BLK)
        hb = jnp.take_along_axis(h3, s[:, :, None], axis=1)
        return topk_chunked(hb.reshape(B, 1024 * BLK), 1024)

    t = tm(jax.jit(g_f32), [(hits2, bsel)])
    log(f"bgather+f32 ltopk:    {t * 1e3:6.1f} ms")
    t = tm(jax.jit(g_i8), [(hits2, bsel)])
    log(f"bgather+i8 ltopk:     {t * 1e3:6.1f} ms")

    log("done")


if __name__ == "__main__":
    main()
