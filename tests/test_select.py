"""ops/select.py: sort-free masked index selection vs numpy reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from gl_slam_tpu.ops import select


LOWEST = [select.select_lowest_ids, select.select_lowest_ids_cumsum,
          select.select_lowest_ids_ss]
NEWEST = [select.select_newest_ids, select.select_newest_ids_cumsum,
          select.select_newest_ids_ss]


@pytest.mark.parametrize("impl", LOWEST)
@pytest.mark.parametrize("seed,n,m,p", [(0, 100, 16, 0.3), (1, 4096, 256, 0.1),
                                        (2, 64, 64, 0.9), (3, 128, 8, 0.9)])
def test_select_lowest(impl, seed, n, m, p):
    rng = np.random.default_rng(seed)
    mask = rng.random(n) < p
    ids, valid = impl(jnp.asarray(mask), m)
    ids, valid = np.asarray(ids), np.asarray(valid)
    want = np.flatnonzero(mask)[:m]
    assert (ids[:len(want)] == want).all()
    assert valid.sum() == len(want)
    assert (ids[len(want):] == -1).all()


@pytest.mark.parametrize("impl", NEWEST)
@pytest.mark.parametrize("seed,n,m,p", [(0, 100, 16, 0.3), (1, 4096, 256, 0.1),
                                        (2, 64, 64, 0.9), (3, 128, 8, 0.9)])
def test_select_newest(impl, seed, n, m, p):
    rng = np.random.default_rng(seed)
    mask = rng.random(n) < p
    ids, valid = impl(jnp.asarray(mask), m)
    ids, valid = np.asarray(ids), np.asarray(valid)
    want = np.flatnonzero(mask)[::-1][:m]       # highest index first
    assert (ids[:len(want)] == want).all()
    assert valid.sum() == len(want)
    assert (ids[len(want):] == -1).all()


def test_select_empty_and_full():
    ids, valid = select.select_lowest_ids(jnp.zeros((32,), bool), 8)
    assert (np.asarray(ids) == -1).all() and not np.asarray(valid).any()
    ids, valid = select.select_newest_ids(jnp.ones((32,), bool), 8)
    assert (np.asarray(ids) == np.arange(31, 23, -1)).all()
    assert np.asarray(valid).all()
