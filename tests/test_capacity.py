"""100M-key capacity plan (docs/CAPACITY_100M.md): the estimator must
show 8-way term sharding fits a v5e chip and unsharded does not, and the
sharded machinery must hold at 100M SHAPE (8 strided shards, bitmap-
eligible tier sizes) on the virtual mesh."""

import random

import numpy as np
import pytest

from stringsearchlib_tpu.utils.capacity import (
    V5E_HBM_BYTES, estimate_shard_hbm,
)


def test_100m_plan_fits_at_8_shards():
    one = estimate_shard_hbm(100_000_000, shards=1)
    eight = estimate_shard_hbm(100_000_000, shards=8)
    assert one.total > V5E_HBM_BYTES  # unsharded cannot fit
    assert eight.total <= V5E_HBM_BYTES  # the planned deployment fits
    assert eight.total <= 10 << 30  # with headroom for build peaks
    # the bitmap table must dominate residency (it is why DP is required)
    assert eight.bitmap > eight.resident * 0.5


def test_100m_shape_sharded_parity():
    """Downscaled-but-100M-SHAPED run: 8 strided term shards over the
    virtual mesh, gram-dense corpus, candidate path + merge, parity vs
    the single-chip engine (the 100M deployment is this at 12.5M keys
    per shard instead of 2.5k)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import bench
    from stringsearchlib_tpu.config import IndexConfig
    from stringsearchlib_tpu.index.build import build_index
    from stringsearchlib_tpu.parallel.dist import (
        ShardedEngine, make_mesh, shard_index,
    )
    from stringsearchlib_tpu.search.engine import SearchEngine

    words = bench._product_names(20_000)
    host_np = build_index(words, 1, None, IndexConfig(), to_device=False)
    sx = shard_index(host_np, 8)
    # shard posting mass balanced within 5% (strided long tier)
    mass = sx.host_shard_posting_lens.sum(axis=1).astype(np.float64)
    assert mass.max() <= mass.mean() * 1.05
    eng = ShardedEngine(sx, make_mesh(8))
    ref = SearchEngine(build_index(words, 1, None, IndexConfig()))
    rng = random.Random(3)
    queries = [bench._mutate(rng, rng.choice(words)) for _ in range(32)]
    got = eng.search_batch(queries, 0.3, 100)
    want = ref.search_batch(queries, 0.3, 100)
    for q, g, w in zip(queries, got, want):
        gs = sorted((round(float(s), 5), len(k)) for k, s in zip(*g))
        ws = sorted((round(float(s), 5), len(k)) for k, s in zip(*w))
        assert gs == ws, q
