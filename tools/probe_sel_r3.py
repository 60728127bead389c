"""Round-3 selection-cost probe (real TPU, run ALONE).

The 10M breakdown (tools/probe_10m_stages.py, round 3) puts the candidate
back half at ~0.66 ms/query vs 0.28 ms/query for the hits kernel.  This
probe times the replacement candidates:

  * jax.lax.approx_max_k vs exact chunked top_k at the two selection
    shapes (block bounds (B, nblk) -> kb and lane rescore (B, kb*128)
    -> n_cand), plus the soundness count (lanes > min(selected)) that
    upgrades an approximate selection to a guarded-exact one.
  * fused-bmax kernel at B in {128, 256, 512} (per-query scaling).
  * 512-lane fused blockmax epilogue variant feasibility (SUBS=8).

Synthetic tables sized like the 10M-key headline corpus; operands are
generated ON DEVICE (uploads through the tunnel are minutes/GB).
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


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


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


@functools.partial(jax.jit, static_argnames=("shape",))
def synth_bounds(seed, shape):
    """Plausible bound surface: mostly -inf, ~20 quantized positive levels."""
    k = jax.random.PRNGKey(seed)
    u = jax.random.uniform(k, shape)
    lv = jnp.floor(u * 64.0) / 20.0
    return jnp.where(u > 0.75, lv, -jnp.inf).astype(jnp.float32)


def main():
    log(f"devices: {jax.devices()}")
    from stringsearchlib_tpu.search.candidates import topk_chunked

    B, NBLK, KB, NC = 256, 78112, 1024, 1024

    for (rows, k, tag) in ((NBLK, KB, "btopk"), (KB * 128, NC, "ltopk")):
        xs = [synth_bounds(s, (B, rows)) for s in range(3)]
        exact = jax.jit(functools.partial(topk_chunked, k=k))
        dt_e = tm(lambda x: exact(x), [(x,) for x in xs], n=4)
        log(f"{tag} exact chunked ({B},{rows})->{k}: {dt_e * 1e3:.1f} ms")
        mono = jax.jit(lambda x: jax.lax.top_k(x, k))
        dt_m = tm(lambda x: mono(x), [(x,) for x in xs], n=4)
        log(f"{tag} monolithic top_k: {dt_m * 1e3:.1f} ms")
        for rt in (0.95, 0.99):
            ap = jax.jit(
                functools.partial(
                    jax.lax.approx_max_k, k=k, recall_target=rt
                )
            )
            dt_a = tm(lambda x: ap(x), [(x,) for x in xs], n=4)
            log(f"{tag} approx_max_k rt={rt}: {dt_a * 1e3:.1f} ms")

        # approx + soundness count: n_above = lanes strictly above the
        # selected min; if n_above <= k the selection provably contains
        # every lane above its own floor -> the exactness guard stays sound
        def ap_guard(x):
            v, i = jax.lax.approx_max_k(x, k, recall_target=0.95)
            vmin = v[:, -1:]
            n_above = jnp.sum((x > vmin).astype(jnp.int32), axis=1)
            return v, i, n_above

        apg = jax.jit(ap_guard)
        dt_g = tm(lambda x: apg(x), [(x,) for x in xs], n=4)
        log(f"{tag} approx+soundness count: {dt_g * 1e3:.1f} ms")

    # fused kernel B sweep on a synthetic 10M-scale packed table
    from stringsearchlib_tpu.ops.bitmap_matmul import (
        bitmap_hits, bitmap_hits_bmax,
    )

    GP, NB = 2816, 1249792  # 10M-key layout (2442 tiles)
    key = jax.random.PRNGKey(0)
    planes = jax.jit(
        lambda k: jax.random.randint(
            k, (GP, NB), -128, 128, dtype=jnp.int8
        )
    )(key)
    jax.device_get(planes.ravel()[:1])
    log(f"synthetic planes {planes.shape} ({planes.size / 1e9:.2f} GB)")

    for b in (128, 256, 512):
        qs = [
            jax.jit(
                lambda k: (
                    jax.random.uniform(k, (b, GP)) < 0.008
                ).astype(jnp.bfloat16)
            )(jax.random.PRNGKey(s))
            for s in range(3)
        ]
        try:
            dt_p = tm(
                lambda q: bitmap_hits(q, planes, int8_dots=True),
                [(q,) for q in qs], n=3,
            )
            dt_f = tm(
                lambda q: bitmap_hits_bmax(q, planes, int8_dots=True),
                [(q,) for q in qs], n=3,
            )
            log(
                f"B={b}: plain {dt_p * 1e3:.1f} ms "
                f"({dt_p / b * 1e6:.0f} us/q) | fused "
                f"{dt_f * 1e3:.1f} ms ({dt_f / b * 1e6:.0f} us/q)"
            )
        except Exception as e:  # noqa: BLE001
            log(f"B={b}: FAILED {type(e).__name__}: {e}")

    log("done")


if __name__ == "__main__":
    main()
