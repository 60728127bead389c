"""Sharded engine at REAL scale (VERDICT round-3 item #4).

Round 3's largest sharded run was 100k keys; this builds the 10M-key
headline corpus HOST-side (build_index(..., to_device=False)), shards it
8 ways over the virtual CPU mesh, runs the full candidate+merge path,
and checks parity against the single-engine candidate path on the same
backend.  Also records measured per-shard bytes against the
docs/CAPACITY_100M.md plan's workspace terms.

Run:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python tools/sharded_10m.py   (CPU; ~20 min, needs ~40 GB RAM)
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from bench import _mutate, _product_names  # noqa: E402


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    from stringsearchlib_tpu.config import IndexConfig
    from stringsearchlib_tpu.index.build import build_index
    from stringsearchlib_tpu.parallel.dist import (
        ShardedEngine, make_mesh, shard_index,
    )
    from stringsearchlib_tpu.search.engine import SearchEngine

    n_keys = int(os.environ.get("SH10M_KEYS", 10_000_000))
    n_q = int(os.environ.get("SH10M_QUERIES", 64))
    n_shards = 8

    log(f"devices: {len(jax.devices())} (cpu virtual)")
    words = _product_names(n_keys, seed=2)
    rng = random.Random(7)
    queries = [_mutate(rng, rng.choice(words)) for _ in range(n_q)]

    t0 = time.time()
    host = build_index(words, 1, None, IndexConfig(), to_device=False)
    log(f"host build {time.time()-t0:.1f}s")

    t0 = time.time()
    mesh = make_mesh(n_shards)
    sx = shard_index(host, n_shards)
    log(f"shard x{n_shards} {time.time()-t0:.1f}s")

    # measured per-shard residency (the capacity plan's terms)
    per_shard = sum(
        leaf.nbytes // n_shards
        for leaf in sx.leaves.values()
        if hasattr(leaf, "nbytes")
    )
    log(f"sharded leaves: {per_shard/1e6:.1f} MB/shard")

    seng = ShardedEngine(sx, mesh)
    t0 = time.time()
    got = seng.search_batch(queries, 0.3, 100)
    t_warm = time.time() - t0
    log(f"sharded batch (incl compile) {t_warm:.1f}s")
    t0 = time.time()
    got = seng.search_batch(queries, 0.3, 100)
    t_run = time.time() - t0
    log(f"sharded batch warm {t_run:.1f}s -> {n_q/t_run:.1f} q/s (cpu)")

    eng = SearchEngine(host)  # single-engine reference on the same backend
    eng.GM_BUDGET = 0
    t0 = time.time()
    want = eng.search_batch(queries, 0.3, 100)
    log(f"single-engine reference {time.time()-t0:.1f}s")

    mism = 0
    for i, (g, w) in enumerate(zip(got, want)):
        gs = sorted((round(s, 5), len(k)) for k, s in zip(*g))
        ws = sorted((round(s, 5), len(k)) for k, s in zip(*w))
        if gs != ws:
            mism += 1
            if mism <= 3:
                log(f"MISMATCH q{i}: {queries[i]!r}")
    log(f"parity {n_q - mism}/{n_q}")

    out = {
        "n_keys": n_keys,
        "n_shards": n_shards,
        "n_queries": n_q,
        "parity": f"{n_q - mism}/{n_q}",
        "per_shard_device_mb": round(per_shard / 1e6, 1),
        "sharded_batch_s_cpu": round(t_run, 2),
        "note": (
            "virtual CPU mesh: validates the full 10M-key sharded "
            "candidate+merge path and measures per-shard residency; "
            "throughput on a CPU mesh is not a TPU efficiency claim "
            "(see SCALING.json real-chip study)"
        ),
    }
    with open("/root/repo/SHARDED_10M.json", "w") as f:
        json.dump(out, f, indent=1)
    log("written /root/repo/SHARDED_10M.json")


if __name__ == "__main__":
    main()
