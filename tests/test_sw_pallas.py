"""Pallas SW kernel parity vs the XLA reference implementation (ops/sw.py).

Runs in Pallas interpreter mode on the CPU test mesh; ops/sw.py itself is
oracle-tested against the reference ssw.c (test_ssw_vs_oracle.py), so
agreement here transitively pins the kernel to the reference kernel's
score/end/tie-break contract.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from kslam_tpu.ops import sw, sw_pallas


def _random_codes(rng, b, l, n_frac=0.05):
    q = rng.integers(0, 4, (b, l)).astype(np.int32)
    mask = rng.random((b, l)) < n_frac
    q[mask] = 4
    return q


def _similar_pairs(rng, b, l, mut=0.1):
    """Pairs where r is a mutated copy of q (realistic high-score case)."""
    q = rng.integers(0, 4, (b, l)).astype(np.int32)
    r = q.copy()
    mask = rng.random((b, l)) < mut
    r[mask] = rng.integers(0, 4, int(mask.sum()))
    return q, r


PARAMS = [(2, 3, 5, 2), (1, 4, 6, 1), (3, 2, 2, 2)]


@pytest.mark.parametrize("params", PARAMS)
def test_forward_parity_random(params):
    rng = np.random.default_rng(11)
    b, l = 24, 40
    q = jnp.asarray(_random_codes(rng, b, l))
    r = jnp.asarray(_random_codes(rng, b, l))
    ref = sw.sw_forward_batch(q, r, *params)
    out = sw_pallas.sw_forward_batch(q, r, *params, block=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(out.score), np.asarray(ref.score))
    np.testing.assert_array_equal(np.asarray(out.ref_end),
                                  np.asarray(ref.ref_end))
    np.testing.assert_array_equal(np.asarray(out.read_end),
                                  np.asarray(ref.read_end))


def test_forward_parity_similar():
    rng = np.random.default_rng(5)
    b, l = 16, 48
    qn, rn = _similar_pairs(rng, b, l)
    q, r = jnp.asarray(qn), jnp.asarray(rn)
    ref = sw.sw_forward_batch(q, r, 2, 3, 5, 2)
    out = sw_pallas.sw_forward_batch(q, r, 2, 3, 5, 2, block=8,
                                     interpret=True)
    assert int(out.score.min()) > 0
    np.testing.assert_array_equal(np.asarray(out.score), np.asarray(ref.score))
    np.testing.assert_array_equal(np.asarray(out.ref_end),
                                  np.asarray(ref.ref_end))
    np.testing.assert_array_equal(np.asarray(out.read_end),
                                  np.asarray(ref.read_end))


def test_align_parity_with_begins():
    rng = np.random.default_rng(9)
    b, l = 16, 40
    qn, rn = _similar_pairs(rng, b, l, mut=0.15)
    # pad tails with N so some alignments end early
    qn[:, l - 4:] = 4
    q, r = jnp.asarray(qn), jnp.asarray(rn)
    ref = sw.sw_align_batch(q, r, 2, 3, 5, 2)
    out = sw_pallas.sw_align_batch(q, r, 2, 3, 5, 2, block=8, interpret=True)
    for a, b_ in zip(out, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_zero_score_rows():
    # all-N query can never score: contract is score 0, ref_end -1, read_end 0
    q = jnp.full((8, 24), 4, jnp.int32)
    r = jnp.asarray(np.random.default_rng(0).integers(0, 4, (8, 24)),
                    dtype=jnp.int32)
    out = sw_pallas.sw_forward_batch(q, r, 2, 3, 5, 2, block=8,
                                     interpret=True)
    assert np.all(np.asarray(out.score) == 0)
    assert np.all(np.asarray(out.ref_end) == -1)
    assert np.all(np.asarray(out.read_end) == 0)
