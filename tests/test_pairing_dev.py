"""Device pairing sweep (ops/pairing_dev.py) vs the golden host sweep
(pipeline/pairing.py, itself a tested transcription of
PairedOverlap.h:132-271): exact emission parity INCLUDING order."""

import numpy as np
import jax.numpy as jnp
import pytest

from kslam_tpu.ops import pairing_dev
from kslam_tpu.pipeline import pairing as host_pairing
from kslam_tpu.pipeline.pairing import AlignedOverlap


def _random_overlaps(rng, n_pairs, n_entries, n, read_len=100):
    mid = n_pairs
    ovs = []
    for _ in range(n):
        read = int(rng.integers(0, 2 * mid))
        ent = int(rng.integers(0, n_entries))
        rel = int(rng.integers(-20, 200))
        rc = bool(rng.random() < 0.5)
        score = int(rng.integers(1, 200))
        rb = max(rel, 0) + int(rng.integers(0, 5))
        ovs.append(AlignedOverlap(
            read_id=read, entry_id=ent, rel_pos=rel, rc=rc, score=score,
            ref_begin=rb, ref_end=rb + read_len - 1, query_begin=0,
            query_end=read_len - 1))
    # the match engine emits overlaps sorted by (read, entry, rel, rc)
    ovs.sort(key=lambda o: (o.read_id, o.entry_id, o.rel_pos, o.rc))
    lengths = np.full(2 * mid, read_len, np.int32)
    return ovs, lengths, mid


def _golden(ovs, lengths, mid):
    out = []
    for p in host_pairing.get_paired_overlaps(list(ovs), lengths, mid):
        key = lambda o: (None if o is None else
                         (o.read_id, o.entry_id, o.rel_pos, o.rc, o.score))
        out.append((key(p.r1), key(p.r2), p.combined_score, p.entry_id,
                    p.ref_start, p.ref_end, p.insert_size & 0xFFFFFFFF))
    return out


def _device(ovs, lengths, mid, pad_to=None):
    n = len(ovs)
    cap = pad_to or n
    col = lambda f, d, t: jnp.asarray(np.array(
        [f(o) for o in ovs] + [d] * (cap - n), t))
    res = pairing_dev.pair_overlaps_device(
        col(lambda o: o.read_id, 0, np.int32),
        col(lambda o: o.entry_id, 0, np.int32),
        col(lambda o: o.rel_pos, 0, np.int32),
        col(lambda o: o.rc, False, bool),
        jnp.asarray(np.array([True] * n + [False] * (cap - n))),
        col(lambda o: o.score, 0, np.int32),
        col(lambda o: o.ref_begin, 0, np.int32),
        col(lambda o: o.ref_end, 0, np.int32),
        jnp.asarray(lengths), np.int32(mid))
    count = int(res.count)
    out = []
    for i in range(count):
        def side(idx):
            j = int(np.asarray(idx)[i])
            if j < 0:
                return None
            o = ovs[j]
            return (o.read_id, o.entry_id, o.rel_pos, o.rc, o.score)
        out.append((side(res.r1_idx), side(res.r2_idx),
                    int(np.asarray(res.combined_score)[i]),
                    int(np.asarray(res.entry_id)[i]),
                    int(np.asarray(res.ref_start)[i]),
                    int(np.asarray(res.ref_end)[i]),
                    int(np.asarray(res.insert_size)[i])))
    return out


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_parity(seed):
    rng = np.random.default_rng(seed)
    ovs, lengths, mid = _random_overlaps(
        rng, n_pairs=int(rng.integers(2, 6)),
        n_entries=int(rng.integers(1, 4)), n=int(rng.integers(5, 60)))
    assert _device(ovs, lengths, mid) == _golden(ovs, lengths, mid)


def test_dense_collisions():
    # many overlaps on the same (pair, entry) with equal rels: stresses
    # channel-state order and duplicate-pair emission
    rng = np.random.default_rng(99)
    ovs = []
    for read in (0, 3):           # pair 0: R1=0/R2=3 with mid=3
        for k in range(6):
            ovs.append(AlignedOverlap(
                read_id=read, entry_id=0, rel_pos=int(rng.integers(0, 3)),
                rc=bool(k % 2), score=10 + k, ref_begin=5, ref_end=90,
                query_begin=0, query_end=85))
    ovs.sort(key=lambda o: (o.read_id, o.entry_id, o.rel_pos, o.rc))
    lengths = np.full(6, 100, np.int32)
    assert _device(ovs, lengths, 3) == _golden(ovs, lengths, 3)


def test_padding_invariance():
    rng = np.random.default_rng(5)
    ovs, lengths, mid = _random_overlaps(rng, 3, 2, 20)
    assert _device(ovs, lengths, mid, pad_to=64) == \
        _device(ovs, lengths, mid)


def test_single_end_like_runs():
    # R1-only input: every emission must be an R1 half-pair in input order
    ovs = [AlignedOverlap(read_id=i % 3, entry_id=i // 3, rel_pos=i,
                          rc=False, score=5, ref_begin=0, ref_end=10,
                          query_begin=0, query_end=10)
           for i in range(9)]
    ovs.sort(key=lambda o: (o.read_id, o.entry_id, o.rel_pos, o.rc))
    lengths = np.full(6, 50, np.int32)
    got = _device(ovs, lengths, 3)
    assert got == _golden(ovs, lengths, 3)
    assert all(g[1] is None for g in got)
