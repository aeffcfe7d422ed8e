"""Device screens/pseudo-assembly (ops/screens_dev.py) vs host golden
(pipeline/pairing.py)."""

import copy

import numpy as np
import jax.numpy as jnp
import pytest

from kslam_tpu.ops import screens_dev
from kslam_tpu.pipeline import pairing as hp
from kslam_tpu.pipeline.pairing import (AlignedOverlap, PairedOverlap,
                                        ReadPairAlignments)


def _random_reads(rng, n_reads=12, max_pairs=6, entries=3, big_scores=False):
    """Random ReadPairAlignments + the flat overlap table backing them."""
    overlaps = []
    reads = []
    for g in range(n_reads):
        pairs = []
        for _ in range(int(rng.integers(0, max_pairs + 1))):
            ent = int(rng.integers(0, entries))
            rs = int(rng.integers(0, 500))
            span = int(rng.integers(0, 120))
            s1 = int(rng.integers(1, 4000 if big_scores else 200))
            s2 = int(rng.integers(1, 4000 if big_scores else 200))
            kind = rng.integers(0, 3)  # 0 full, 1 R1 half, 2 R2 half
            o1 = o2 = None
            if kind in (0, 1):
                o1 = AlignedOverlap(g, ent, rs, False, s1, rs,
                                    rs + span, 0, span)
                overlaps.append(o1)
            if kind in (0, 2):
                o2 = AlignedOverlap(g + n_reads, ent, rs + 30, True, s2,
                                    rs + 30, rs + 30 + span, 0, span)
                overlaps.append(o2)
            if kind == 0:
                ins = int(rng.integers(0, 1200))
                pairs.append(PairedOverlap(s1 + s2, ent, rs, rs + 30 + span,
                                           ins, o1, o2))
            elif kind == 1:
                pairs.append(PairedOverlap(s1, ent, rs, rs + span, 0, o1,
                                           None))
            else:
                pairs.append(PairedOverlap(s2, ent, rs + 30,
                                           rs + 30 + span, 0, None, o2))
        reads.append(ReadPairAlignments(g, g + n_reads, pairs))
    return reads, overlaps


def _to_cols(reads, overlaps, pad=0):
    omap = {id(o): i for i, o in enumerate(overlaps)}
    rows = []
    for read in reads:
        for p in read.pairs:
            rows.append((read.r1_pos,
                         omap[id(p.r1)] if p.r1 else -1,
                         omap[id(p.r2)] if p.r2 else -1,
                         p.combined_score, p.entry_id, p.ref_start,
                         p.ref_end, p.insert_size, True))
    for _ in range(pad):
        rows.append((0, -1, -1, 0, 0, 0, 0, 0, False))
    a = lambda i, t: jnp.asarray(np.array([r[i] for r in rows], t))
    return screens_dev.PairCols(
        group=a(0, np.int32), r1_idx=a(1, np.int32), r2_idx=a(2, np.int32),
        combined_score=a(3, np.int32), entry_id=a(4, np.int32),
        ref_start=a(5, np.int32), ref_end=a(6, np.int32),
        insert_size=a(7, np.uint32), valid=a(8, bool))


def _ov_cols(overlaps):
    a = lambda f: jnp.asarray(np.array([f(o) for o in overlaps], np.int32))
    return (a(lambda o: o.score), a(lambda o: o.ref_begin),
            a(lambda o: o.ref_end))


def _host_rows(reads):
    rows = []
    for read in reads:
        for p in read.pairs:
            rows.append((read.r1_pos, p.r1 is not None, p.r2 is not None,
                         p.combined_score & 0xFFFFFFFF, p.entry_id,
                         p.ref_start, p.ref_end, p.insert_size))
    return rows


def _dev_rows(cols):
    v = np.asarray(cols.valid)
    out = []
    for i in np.nonzero(v)[0]:
        out.append((int(np.asarray(cols.group)[i]),
                    int(np.asarray(cols.r1_idx)[i]) >= 0,
                    int(np.asarray(cols.r2_idx)[i]) >= 0,
                    int(np.asarray(cols.combined_score)[i]) & 0xFFFFFFFF,
                    int(np.asarray(cols.entry_id)[i]),
                    int(np.asarray(cols.ref_start)[i]),
                    int(np.asarray(cols.ref_end)[i]),
                    int(np.asarray(cols.insert_size)[i])))
    return out


@pytest.mark.parametrize("seed", range(5))
def test_score_screen_parity(seed):
    rng = np.random.default_rng(seed)
    reads, overlaps = _random_reads(rng)
    cols = _to_cols(reads, overlaps, pad=7)
    host = copy.deepcopy(reads)
    hp.screen_pairs_by_score(host, 0.95)
    got = screens_dev.screen_by_score_device(cols, 0.95)
    assert _dev_rows(got) == _host_rows(host)


@pytest.mark.parametrize("seed", range(5))
def test_insert_screen_parity(seed):
    rng = np.random.default_rng(100 + seed)
    reads, overlaps = _random_reads(rng)
    cols = _to_cols(reads, overlaps)
    host = copy.deepcopy(reads)
    hp.screen_pairs_by_insert_size(host, 400, replace=True)
    got = screens_dev.screen_by_insert_device(cols, 400,
                                              *_ov_cols(overlaps))
    assert _dev_rows(got) == _host_rows(host)


@pytest.mark.parametrize("seed", range(5))
def test_pseudo_assembly_parity(seed):
    rng = np.random.default_rng(200 + seed)
    reads, overlaps = _random_reads(rng)
    cols = _to_cols(reads, overlaps, pad=3)
    host = copy.deepcopy(reads)
    hp.pseudo_assembly(host)
    got = screens_dev.pseudo_assembly_device(cols)
    hrows = _host_rows(host)
    drows = _dev_rows(got)
    assert len(hrows) == len(drows)
    for h, d in zip(hrows, drows):
        assert h[:3] == d[:3] and h[4:] == d[4:]
        # f32 vs double rescoring: allow 1 ulp-of-truncation difference
        assert abs(int(h[3]) - int(d[3])) <= 1, (h, d)
