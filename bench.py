"""Benchmark: query throughput against synthetic product-name indexes.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

The headline metric is the BASELINE.json north-star configuration:
queries/s/chip against a 10M-key index, top-100 (target 100k).  ``extra``
carries the 1M-key numbers for both corpus shapes (gram-dense, which takes
the dense MXU incidence path, and gram-rich, which takes the bucket-sketch
path), p50 latencies at both sizes, single-query p50, and index build MB/s.

Env knobs:
  BENCH_KEYS      headline index size (default 10_000_000)
  BENCH_1M_KEYS   secondary index size (default 1_000_000; 0 skips)
  BENCH_QUERIES   timed queries (default 512)
  BENCH_THRESHOLD match threshold (default 0.3)
  BENCH_REPS      timed repetitions per config (default 5)
"""

from __future__ import annotations

import gc
import json
import os

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")  # see package __init__
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import random
import time

import numpy as np

TARGET_QPS = 100_000.0

_SYLLABLES = [
    "al", "an", "ar", "ba", "be", "co", "da", "de", "el", "en", "er", "fa",
    "ga", "gi", "go", "ha", "in", "ka", "la", "le", "li", "lo", "ma", "me",
    "mi", "mo", "na", "ne", "no", "or", "pa", "pe", "po", "ra", "re", "ri",
    "ro", "sa", "se", "si", "so", "ta", "te", "ti", "to", "ur", "va", "ve",
    "vi", "zo",
]
_BRANDS = ["acme", "orion", "zenix", "nova", "apex", "volt", "lumen", "aero"]
_TYPES = ["widget", "sensor", "valve", "motor", "panel", "cable", "filter"]


def _product_names(n: int, seed: int = 0) -> list:
    """Vectorized product-name corpus (same distribution as round 1).
    Pure numpy string ops: the per-row f-string loop took ~20 min at 10M."""
    rng = np.random.default_rng(seed)
    brands = rng.choice(_BRANDS, n)
    kinds = rng.choice(_TYPES, n)
    nums = rng.integers(1, 10000, n).astype("U4")
    nsyl = rng.integers(2, 5, n)
    syl = rng.choice(_SYLLABLES, (n, 4)).astype("U2")
    for j in (2, 3):
        syl[nsyl <= j, j] = ""
    word = np.char.add(np.char.add(syl[:, 0], syl[:, 1]),
                       np.char.add(syl[:, 2], syl[:, 3]))
    sp = np.full(n, " ", dtype="U1")
    out = np.char.add(np.char.add(np.char.add(brands, sp), word), sp)
    out = np.char.add(np.char.add(np.char.add(out, kinds), sp), nums)
    return out.tolist()


def _rich_names(n: int, seed: int = 1) -> list:
    """Gram-rich corpus: random alphanumerics fill the trigram space, so no
    dense (G, Tl) incidence can exist at scale - exercises the sketch path."""
    rng = np.random.default_rng(seed)
    alpha = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz0123456789", np.uint8)
    lens = rng.integers(8, 31, n)
    mat = alpha[rng.integers(0, alpha.size, (n, 30))]
    flat = mat.tobytes().decode("ascii")
    return [flat[i * 30 : i * 30 + lens[i]] for i in range(n)]


_CJK = [chr(c) for c in range(0x4E00, 0x4E80)] + [
    chr(c) for c in range(0x30A0, 0x30F0)
]
_ACCENT = list("àáâäåçèéêëìíîïñòóôöøùúûüýāćēīłńōśūźżž")


def _wide_names(n: int, seed: int = 3) -> list:
    """Unicode corpus (CJK + accented Latin) for the indexW/searchW
    BASELINE config."""
    rng = np.random.default_rng(seed)
    pool = np.array(_CJK + _ACCENT + list("abcdefghij "), dtype="U1")
    lens = rng.integers(4, 14, n)
    mat = pool[rng.integers(0, pool.size, (n, 13))]
    return ["".join(mat[i, : lens[i]]).strip() or "pad" for i in range(n)]


def _mutate(rng: random.Random, s: str) -> str:
    chars = list(s)
    for _ in range(rng.randint(0, 2)):
        i = rng.randrange(len(chars))
        op = rng.random()
        if op < 0.4:
            chars[i] = rng.choice("abcdefghijklmnopqrstuvwxyz")
        elif op < 0.7 and len(chars) > 4:
            del chars[i]
        else:
            chars.insert(i, rng.choice("abcdefghijklmnopqrstuvwxyz"))
    return "".join(chars)


_RTT_CACHE: list = []


def _tunnel_rtt_ms() -> float:
    """Median dispatch+fetch round trip for a trivial op: the fixed
    per-call latency the remote PJRT tunnel adds (~25-40 ms; ~0 on a
    direct-attached chip)."""
    if _RTT_CACHE:
        return _RTT_CACHE[0]
    import jax
    import jax.numpy as jnp

    def nop(r):
        return jax.device_get(jnp.asarray(np.float32(r)) + 1.0)

    nop(0)
    ts = []
    for r in range(5):
        t0 = time.perf_counter()
        nop(r + 1)
        ts.append(time.perf_counter() - t0)
    _RTT_CACHE.append(float(np.median(ts) * 1e3))
    return _RTT_CACHE[0]


def _run_config(words, n_queries, threshold, limit, reps, singles=0,
                row_size=1, weights=None, config=None):
    """Build + search one corpus; returns a dict of measurements."""
    import jax

    from stringsearchlib_tpu.config import IndexConfig
    from stringsearchlib_tpu.index.build import build_index
    from stringsearchlib_tpu.search.engine import SearchEngine

    rng = random.Random(7)
    total_bytes = sum(len(w) for w in words)

    t0 = time.perf_counter()
    host = build_index(words, row_size, weights, config or IndexConfig())
    jax.device_get(host.device.gram_ptr[:1])  # settle uploads
    build_s = time.perf_counter() - t0
    engine = SearchEngine(host)

    queries = [_mutate(rng, rng.choice(words)) for _ in range(n_queries)]
    batch = int(os.environ.get("BENCH_BATCH", 512))

    # warmup: build the front-end tables + compile this query set's variants
    gm = host.gram_matrix(engine.GM_BUDGET)
    bm = sk = None
    if gm is None:
        bm = host.bitmap_tables(engine.BITMAP_BUDGET)
    if gm is None and bm is None:
        sk = host.sketch_tables(engine.SKETCH_BUDGET)
    engine.search_batch(queries, threshold, limit, batch_bucket=batch)

    lat = []
    for _ in range(reps):
        t1 = time.perf_counter()
        engine.search_batch(queries, threshold, limit, batch_bucket=batch)
        lat.append((time.perf_counter() - t1) / n_queries)
    # median rep: remote-tunnel hiccups hit individual reps; the median
    # reflects steady-state device throughput
    per_q = float(np.percentile(np.array(lat), 50))

    from stringsearchlib_tpu.index import build as buildmod

    out = {
        "qps": round(1.0 / per_q, 2),
        "p50_latency_ms": round(per_q * 1e3, 3),
        "build_s": round(build_s, 1),
        "build_mb_per_s": round(total_bytes / 1e6 / build_s, 2),
        # per-stage build wall clock (index.build.LAST_BUILD_BREAKDOWN):
        # BASELINE tracks build MB/s and round 3's 10M regression was
        # unexplained because no artifact showed where the time went
        "build_breakdown": dict(buildmod.LAST_BUILD_BREAKDOWN),
        "n_keys": len(words),
        "n_grams": host.n_grams,
        "hits_path": "matmul" if gm is not None else (
            "bitmap" if bm is not None else (
                "sketch" if sk is not None else "runs"
            )
        ),
        # the RESOLVED device path (kernel vs scan, tiling, batch step):
        # round 2's 20x regression was a silent kernel->scan fallback that
        # no artifact recorded
        "routing": dict(engine.last_routing),
    }
    # speed-of-light accounting for the kernel front ends.  Two bounds,
    # both per chunk (the table streams once per `step` queries):
    #  - bw_bound: packed table bytes / the platform's MEASURED XLA
    #    stream rate (1.2 TB/s, tools/probe_bandwidth.py) - the
    #    formulation's physics floor, compute assumed free;
    #  - mxu_bound: B x Gp x Tlp int8 MACs at 394 TOPS (x 5/8 when the
    #    masked-pair kernel is routed: 5 dots replace 8).
    # achieved_vs_* say how much of the e2e gap is front end vs
    # selection/ranking/host.
    if out["hits_path"] in ("bitmap", "matmul") and host.n_terms:
        rt = engine.last_routing
        gp_eff = rt.get("compact_rows") or rt.get("gp_rows") or host.n_grams
        tlp = ((host.n_terms + 32767) // 32768) * 32768
        step = max(int(rt.get("step", 256)), 1)
        pair = 5.0 / 8.0 if rt.get("pair_dots") else 1.0
        mxu_qps = 394e12 / max(2.0 * gp_eff * tlp * pair, 1.0)
        packed_bytes = gp_eff * tlp / 8.0
        bw_qps = 1.2e12 / max(packed_bytes / step, 1.0)
        out["roofline"] = {
            "mxu_bound_qps": round(mxu_qps, 1),
            "bw_bound_qps": round(bw_qps, 1),
            "achieved_vs_mxu_roofline": round(out["qps"] / mxu_qps, 4),
            "achieved_vs_bw_roofline": round(out["qps"] / bw_qps, 4),
        }
    if singles:
        qs = queries[:singles]
        import jax
        import jax.numpy as jnp

        def io_nop(r):
            # transport floor with the singleton's I/O pattern: fresh
            # small uploads, trivial compute, scalar fetch
            ups = [
                jnp.asarray(np.full((8, 32), r, np.int32))
                for _ in range(8)
            ]
            return jax.device_get(sum(u.sum() for u in ups))

        engine.search(qs[0], threshold, limit)  # warm single variants
        io_nop(0)
        # INTERLEAVE the transport-floor nops with the singles: the
        # tunnel round trip drifts 23-45 ms across minutes, so an rtt
        # snapshot taken before or after the loop makes the subtraction
        # noise-dominated (round-4/5 logs: engine.search p50 measured
        # BELOW a stale rtt median).  Paired medians cancel the drift.
        lat_q, lat_n = [], []
        for r, q in enumerate(qs):
            t2 = time.perf_counter()
            engine.search(q, threshold, limit)
            lat_q.append(time.perf_counter() - t2)
            t2 = time.perf_counter()
            io_nop(r + 1)
            lat_n.append(time.perf_counter() - t2)
        p50q = float(np.percentile(np.array(lat_q), 50) * 1e3)
        p50n = float(np.percentile(np.array(lat_n), 50) * 1e3)
        out["single_query_p50_ms"] = round(p50q, 3)
        out["single_query_routing"] = dict(engine.last_routing)
        out["tunnel_rtt_ms"] = round(_tunnel_rtt_ms(), 1)
        out["tunnel_rtt_upload_ms"] = round(p50n, 1)
        out["single_query_device_ms_est"] = round(max(p50q - p50n, 0.0), 3)
    del engine, host, gm, bm, sk
    gc.collect()
    return out


def _guarded(extra: dict, name: str, fn):
    """One bench config must not kill the whole run: record the error
    and keep going (the headline still prints)."""
    import traceback

    try:
        extra[name] = fn()
    except Exception as e:  # noqa: BLE001 - deliberately broad
        traceback.print_exc()
        extra[name] = {"error": f"{type(e).__name__}: {e}"}


def main() -> None:
    n_keys = int(os.environ.get("BENCH_KEYS", 10_000_000))
    n_1m = int(os.environ.get("BENCH_1M_KEYS", 1_000_000))
    n_queries = int(os.environ.get("BENCH_QUERIES", 512))
    threshold = float(os.environ.get("BENCH_THRESHOLD", 0.3))
    reps = max(1, int(os.environ.get("BENCH_REPS", 5)))
    limit = 100

    extra = {"threshold": threshold}

    if n_1m:
        _guarded(extra, "dense_1m", lambda: _run_config(
            _product_names(n_1m), n_queries, threshold, limit, reps,
            singles=32,
        ))
        _guarded(extra, "rich_1m", lambda: _run_config(
            _rich_names(n_1m), n_queries, threshold, limit, reps
        ))

    n_wide = int(os.environ.get("BENCH_WIDE_KEYS", 100_000))
    if n_wide:
        from stringsearchlib_tpu.config import IndexConfig

        wide_words = _wide_names(n_wide)
        for gs in (2, 3):
            _guarded(
                extra, f"wide_100k_g{gs}",
                lambda gs=gs: _run_config(
                    wide_words, min(n_queries, 256), threshold, limit,
                    max(1, reps - 2),
                    config=IndexConfig(wide=True, gram_size=gs),
                ),
            )

    n_2d = int(os.environ.get("BENCH_2D_ROWS", 1_000_000))
    if n_2d:
        def _run_2d():
            rows = _product_names(n_2d, seed=5)
            descs = _rich_names(n_2d, seed=6)
            flat = [x for kv in zip(rows, descs) for x in kv]
            w = np.tile(np.array([1.0, 0.4]), n_2d)
            r2d = _run_config(
                flat, min(n_queries * 2, 1024), threshold, limit,
                max(1, reps - 2), row_size=2, weights=w,
            )
            r2d["n_rows"] = n_2d
            return r2d

        _guarded(extra, "index2d_1m_rows", _run_2d)

    head = _run_config(
        _product_names(n_keys, seed=2), n_queries, threshold, limit, reps,
        singles=32,
    )
    extra["headline"] = head

    # shard-scaling artifact (tools/scaling_bench.py, virtual CPU mesh):
    # generated out-of-band because a second python process would steal
    # the TPU tunnel grant mid-bench; attach it so the driver captures it
    scaling_path = os.path.join(os.path.dirname(__file__), "SCALING.json")
    if os.path.exists(scaling_path):
        try:
            with open(scaling_path) as f:
                extra["shard_scaling"] = json.load(f)
        except (OSError, ValueError):
            pass

    # The driver captures only the LAST ~2000 chars of stdout, so the big
    # extras go to a side file (+ stdout, first) and the final line is ONE
    # compact headline that survives the tail capture (VERDICT r4 #3:
    # rounds 3 and 4 both lost their headline to extra-payload truncation).
    try:
        with open(
            os.path.join(os.path.dirname(__file__), "BENCH_EXTRA.json"), "w"
        ) as f:
            json.dump(extra, f)
    except OSError:
        pass
    print(json.dumps({"extra": extra}))
    print(
        json.dumps(
            {
                "metric": (
                    f"queries_per_sec_per_chip_{n_keys // 1000}k_keys_top100"
                ),
                "value": head["qps"],
                "unit": "queries/s",
                "vs_baseline": round(head["qps"] / TARGET_QPS, 4),
                "build_s": head.get("build_s"),
                "single_ms": head.get("single_query_p50_ms"),
                "extra_file": "BENCH_EXTRA.json",
            }
        )
    )


if __name__ == "__main__":
    main()
