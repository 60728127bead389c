"""Pallas VMEM-staged gather vs numpy reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tools.experimental import vgather


@pytest.fixture(autouse=True)
def _interpret():
    old = vgather.INTERPRET
    vgather.INTERPRET = True
    yield
    vgather.INTERPRET = old


@pytest.mark.parametrize("t_total", [100, 5000, 4096])
@pytest.mark.parametrize("tile", [256, 1024])
def test_gather_matches_numpy(t_total, tile):
    rng = np.random.default_rng(t_total + tile)
    tab_f = jnp.asarray(rng.random(t_total, dtype=np.float32))
    tab_i = jnp.asarray(rng.integers(0, 99, t_total, dtype=np.int32))
    idx = rng.integers(-7, t_total + 7, (4, 128), dtype=np.int32)
    idx.sort(axis=1)
    out_f, out_i = vgather.gather_tables(
        jnp.asarray(idx), [tab_f, tab_i], (0.5, -1), tile=tile
    )
    ok = (idx >= 0) & (idx < t_total)
    ref_f = np.where(ok, np.asarray(tab_f)[np.clip(idx, 0, t_total - 1)], 0.5)
    ref_i = np.where(ok, np.asarray(tab_i)[np.clip(idx, 0, t_total - 1)], -1)
    np.testing.assert_allclose(np.asarray(out_f), ref_f)
    np.testing.assert_array_equal(np.asarray(out_i), ref_i)


def test_gather_unsorted_indices_still_correct():
    rng = np.random.default_rng(1)
    tab = jnp.asarray(rng.random(1000, dtype=np.float32))
    idx = rng.integers(0, 1000, (2, 64), dtype=np.int32)  # NOT sorted
    (out,) = vgather.gather_tables(jnp.asarray(idx), [tab], (0.0,), tile=256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(tab)[idx])
