"""Native chain rescoring (csrc/rescore.cc) vs the pure-Python exact walk.

Both implement the reference's per-chain double-precision rescore
(PairedOverlap.h:517-573); the native one must agree bit-for-bit on
adversarial chains: zero spans (inf per-base), zero-length chains
(nan/inf coverage), single members (untouched), huge scores.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from kslam_tpu.io import native
from kslam_tpu.ops import screens_dev
from kslam_tpu.pipeline import device_path


def _run(cols, perm, cseg, use_native, monkeypatch):
    if not use_native:
        monkeypatch.setattr(native, "rescore_chains",
                            lambda *a, **k: None)
    return device_path.rescore_chains_host(cols, perm, cseg)


@pytest.mark.skipif(native.get_lib() is None
                    or not hasattr(native.get_lib(), "kslam_rescore_chains"),
                    reason="native lib unavailable")
def test_native_rescore_matches_python(monkeypatch):
    rng = np.random.default_rng(3)
    n = 4096
    valid = rng.random(n) < 0.8
    entry = rng.integers(0, 5, n).astype(np.int32)
    rs = rng.integers(0, 10_000, n).astype(np.int32)
    span = rng.integers(0, 300, n).astype(np.int32)
    span[rng.random(n) < 0.05] = 0            # inf per-base rows
    re = rs + span
    score = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    score[rng.random(n) < 0.05] = 0
    cols = screens_dev.PairCols(
        group=jnp.asarray(np.arange(n, dtype=np.int32)),
        r1_idx=jnp.asarray(np.zeros(n, np.int32)),
        r2_idx=jnp.asarray(np.zeros(n, np.int32)),
        combined_score=jnp.asarray(score.astype(np.int32)),
        entry_id=jnp.asarray(entry),
        ref_start=jnp.asarray(rs), ref_end=jnp.asarray(re),
        insert_size=jnp.asarray(np.zeros(n, np.uint32)),
        valid=jnp.asarray(valid))
    perm, cseg = screens_dev.pseudo_assembly_chains(cols)
    got_native = _run(cols, perm, cseg, True, monkeypatch)
    got_python = _run(cols, perm, cseg, False, monkeypatch)
    np.testing.assert_array_equal(got_native, got_python)


@pytest.mark.skipif(native.get_lib() is None
                    or not hasattr(native.get_lib(), "kslam_rescore_chains"),
                    reason="native lib unavailable")
def test_native_rescore_deep_chain(monkeypatch):
    """One long overlapping chain (deep coverage), scores near 2^32."""
    n = 2000
    rs = (np.arange(n) * 10).astype(np.int32)
    re = rs + 150
    cols = screens_dev.PairCols(
        group=jnp.asarray(np.arange(n, dtype=np.int32)),
        r1_idx=jnp.asarray(np.zeros(n, np.int32)),
        r2_idx=jnp.asarray(np.zeros(n, np.int32)),
        combined_score=jnp.asarray(
            np.full(n, 2**32 - 7, np.uint32).astype(np.int32)),
        entry_id=jnp.asarray(np.zeros(n, np.int32)),
        ref_start=jnp.asarray(rs), ref_end=jnp.asarray(re),
        insert_size=jnp.asarray(np.zeros(n, np.uint32)),
        valid=jnp.asarray(np.ones(n, bool)))
    perm, cseg = screens_dev.pseudo_assembly_chains(cols)
    got_native = _run(cols, perm, cseg, True, monkeypatch)
    got_python = _run(cols, perm, cseg, False, monkeypatch)
    np.testing.assert_array_equal(got_native, got_python)
    assert len(np.unique(got_native)) == 1   # one chain, one rescore
