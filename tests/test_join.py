"""Blocked searchsorted (ops/join.py) parity vs numpy searchsorted."""

import numpy as np
import jax.numpy as jnp
import pytest

from kslam_tpu.ops import join


@pytest.mark.parametrize("m,q,block", [(16, 7, 128), (128, 1000, 128),
                                       (1000, 513, 64), (4096, 4096, 128)])
@pytest.mark.parametrize("side", ["left", "right"])
def test_parity_random_uint64(m, q, block, side):
    rng = np.random.default_rng(m * q)
    arr = np.sort(rng.integers(0, 50, m, dtype=np.uint64))  # many dups
    queries = rng.integers(0, 55, q, dtype=np.uint64)
    want = np.searchsorted(arr, queries, side=side)
    got = np.asarray(join.searchsorted_blocked(
        jnp.asarray(arr), jnp.asarray(queries), side=side, block=block, force=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("side", ["left", "right"])
def test_parity_int64_cumsum(side):
    rng = np.random.default_rng(0)
    counts = rng.integers(0, 5, 2064).astype(np.int64)
    starts = np.cumsum(counts) - counts        # the expansion-join shape
    p = np.arange(1024, dtype=np.int64)
    want = np.searchsorted(starts, p, side=side)
    got = np.asarray(join.searchsorted_blocked(
        jnp.asarray(starts), jnp.asarray(p), side=side, force=True))
    np.testing.assert_array_equal(got, want)


def test_sentinel_padded_index():
    # the real index layout: sorted values then uint64-max sentinels
    arr = np.concatenate([np.sort(np.arange(10, 50, dtype=np.uint64)),
                          np.full(24, np.uint64(2**64 - 1))])
    queries = np.array([9, 10, 30, 49, 50], dtype=np.uint64)
    for side in ("left", "right"):
        want = np.searchsorted(arr, queries, side=side)
        got = np.asarray(join.searchsorted_blocked(
            jnp.asarray(arr), jnp.asarray(queries), side=side, block=16, force=True))
        np.testing.assert_array_equal(got, want)


def test_2d_queries():
    arr = np.sort(np.random.default_rng(1).integers(
        0, 100, 256, dtype=np.uint64))
    q = np.random.default_rng(2).integers(0, 100, (8, 17), dtype=np.uint64)
    want = np.searchsorted(arr, q.reshape(-1)).reshape(q.shape)
    got = np.asarray(join.searchsorted_blocked(jnp.asarray(arr),
                                               jnp.asarray(q), force=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("side", ["left", "right"])
def test_two_level_big(side):
    # large enough to engage the superblock hierarchy (S > 128)
    rng = np.random.default_rng(3)
    arr = np.sort(rng.integers(0, 10_000, 65536, dtype=np.uint64))
    queries = rng.integers(0, 10_100, 5000, dtype=np.uint64)
    want = np.searchsorted(arr, queries, side=side)
    got = np.asarray(join.searchsorted_blocked(
        jnp.asarray(arr), jnp.asarray(queries), side=side, block=64,
        force=True))
    np.testing.assert_array_equal(got, want)
