"""Historical A/B of the kernel grid semantics (round 3): "parallel"
tile axis won +31% on deeply G-tiled tables, lost 6% single-block; the
rule (parallel iff gtiles > 1) is now baked into ops.bitmap_matmul, so
both arms of this probe measure the same baked rule."""
import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from stringsearchlib_tpu.ops import bitmap_matmul as bm

def log(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)
def tm(f, argsets, n=3):
    f(*argsets[0])
    ts=[]
    for i in range(n):
        a=argsets[(i+1)%len(argsets)]
        t0=time.perf_counter(); r=f(*a)
        jax.device_get(jax.tree.leaves(r)[0].ravel()[:1])
        ts.append(time.perf_counter()-t0)
    return float(np.median(ts))

log(f"devices: {jax.devices()}")
for tag, gp, nb, b in (("gtile-rich", 47104, 125440, 256),
                       ("gtile-compact", 8192, 250368, 256),
                       ("single-dense", 2816, 1249792, 256)):
    key = jax.random.PRNGKey(1)
    planes = jax.jit(lambda k: jax.random.randint(k, (gp, nb), -128, 128, dtype=jnp.int8))(key)
    qs = [jax.jit(lambda k: (jax.random.uniform(k, (b, gp)) < (24.0/gp)).astype(jnp.bfloat16))(jax.random.PRNGKey(s)) for s in range(3)]
    bm.bitmap_hits.clear_cache()
    d_arb = tm(lambda q: bm.bitmap_hits(q, planes, int8_dots=True), [(q,) for q in qs])
    h_arb = np.asarray(bm.bitmap_hits(qs[0], planes, int8_dots=True))
    bm.bitmap_hits.clear_cache()
    try:
        h_par = np.asarray(bm.bitmap_hits(qs[0], planes, int8_dots=True))
        ok = (h_par == h_arb).all()
        d_par = tm(lambda q: bm.bitmap_hits(q, planes, int8_dots=True), [(q,) for q in qs])
        log(f"{tag} (gp={gp}): arbitrary {d_arb*1e3:.1f} ms | parallel {d_par*1e3:.1f} ms | parity={ok}")
    except Exception as e:
        log(f"{tag}: parallel FAILED {type(e).__name__}")
    bm.bitmap_hits.clear_cache()
    del planes, qs
log("done")
