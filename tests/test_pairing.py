"""Unit tests for pairing, insert-size model, screens, pseudo-assembly
(PairedOverlap.h semantics)."""

import numpy as np

from kslam_tpu.pipeline import pairing
from kslam_tpu.pipeline.pairing import AlignedOverlap


def ov(read, entry, rel, rc, score, rb=None, re_=None):
    rb = rel if rb is None else rb
    re_ = rb + 149 if re_ is None else re_
    return AlignedOverlap(read, entry, rel, rc, score, rb, re_, 0, 149)


LENS = np.full(200, 150, dtype=np.int32)


def test_simple_fr_pair():
    # R1 forward at 100, R2 (rc) at 350 on the same entry: one pair,
    # insert = relR2 - relR1 + len(R2) = 350-100+150 = 400
    overlaps = [ov(0, 5, 100, False, 290), ov(10, 5, 350, True, 300)]
    pairs = pairing.get_paired_overlaps(overlaps, LENS, midpoint=10)
    assert len(pairs) == 1
    p = pairs[0]
    assert p.has_r1 and p.has_r2
    assert p.insert_size == 400
    assert p.combined_score == 590
    assert p.ref_start == 100 and p.ref_end == 499


def test_rf_orientation_pair():
    # R2 forward first, R1 rc after: orientation false,
    # insert = relR1 - relR2 + len(R1)
    overlaps = [ov(10, 5, 100, False, 300), ov(0, 5, 350, True, 280)]
    pairs = pairing.get_paired_overlaps(overlaps, LENS, midpoint=10)
    assert len(pairs) == 1
    assert pairs[0].insert_size == 350 - 100 + 150


def test_unpaired_become_half_pairs():
    overlaps = [ov(0, 5, 100, False, 290),   # R1 fwd, no opposite R2
                ov(10, 6, 400, False, 280)]  # R2 fwd on another entry
    pairs = pairing.get_paired_overlaps(overlaps, LENS, midpoint=10)
    assert len(pairs) == 2
    kinds = {(p.has_r1, p.has_r2) for p in pairs}
    assert kinds == {(True, False), (False, True)}
    assert all(p.insert_size == 0 for p in pairs)


def test_same_orientation_not_paired():
    # R1 fwd + R2 fwd: same orientation, no pair
    overlaps = [ov(0, 5, 100, False, 290), ov(10, 5, 350, False, 300)]
    pairs = pairing.get_paired_overlaps(overlaps, LENS, midpoint=10)
    assert all(not (p.has_r1 and p.has_r2) for p in pairs)
    assert len(pairs) == 2


def test_r2rc_before_r1fwd_pairs_with_orientation_false():
    # R2 rc at rel 10 precedes R1 fwd at rel 300 in the sweep; the R1-fwd
    # branch pairs them with orientation=false:
    # insert = relR1 - relR2 + len(R1) (PairedOverlap.h:177-181,114-119)
    overlaps = [ov(0, 5, 300, False, 290), ov(10, 5, 10, True, 300)]
    pairs = pairing.get_paired_overlaps(overlaps, LENS, midpoint=10)
    paired = [p for p in pairs if p.has_r1 and p.has_r2]
    assert len(paired) == 1
    assert paired[0].insert_size == 300 - 10 + 150


def test_group_per_read():
    overlaps = [ov(0, 5, 100, False, 290), ov(1, 6, 50, False, 280),
                ov(11, 6, 300, True, 280)]
    pairs = pairing.get_paired_overlaps(overlaps, LENS, midpoint=10)
    groups = pairing.group_pairs_per_read(pairs, midpoint=10)
    assert [g.r1_pos for g in groups] == [0, 1]
    assert len(groups[1].pairs) == 1  # read1+read11 paired


def test_insert_size_model_basic():
    rng = np.random.default_rng(0)
    sizes = rng.normal(400, 30, 500).astype(int)
    reads = []
    for s in sizes:
        p = pairing.PairedOverlap(500, 0, 0, 0, int(s),
                                  ov(0, 0, 0, False, 250),
                                  ov(10, 0, 0, True, 250))
        reads.append(pairing.ReadPairAlignments(0, 10, [p]))
    limit = pairing.max_allowed_insert_size(reads)
    # mean + 6 sigma of a N(400,30) sample
    assert 500 < limit < 700


def test_insert_size_model_empty():
    assert pairing.max_allowed_insert_size([]) == (1 << 32) - 1


def test_screen_by_score_fraction():
    pairs = [pairing.PairedOverlap(s, 0, 0, 100, 0, ov(0, 0, 0, False, s),
                                   None) for s in (300, 296, 200)]
    read = pairing.ReadPairAlignments(0, 10, list(pairs))
    pairing.screen_pairs_by_score([read], 0.95)
    kept = [p.combined_score for p in read.pairs]
    assert kept == [300, 296]  # 200 < 0.95*300


def test_screen_by_insert_size_splits():
    big = pairing.PairedOverlap(580, 0, 0, 600, 5000,
                                ov(0, 0, 0, False, 290),
                                ov(10, 0, 450, True, 290))
    ok = pairing.PairedOverlap(590, 0, 0, 500, 400,
                               ov(0, 0, 0, False, 295),
                               ov(10, 0, 350, True, 295))
    read = pairing.ReadPairAlignments(0, 10, [big, ok])
    pairing.screen_pairs_by_insert_size([read], 1000, replace=True)
    # big split into R2-only (mutated in place) + appended R1-only
    assert len(read.pairs) == 3
    split_r2 = [p for p in read.pairs if p.has_r2 and not p.has_r1]
    split_r1 = [p for p in read.pairs if p.has_r1 and not p.has_r2]
    assert len(split_r2) == 1 and len(split_r1) == 1
    assert split_r2[0].combined_score == 290
    assert split_r2[0].insert_size == 0


def test_pseudo_assembly_chains_and_rescores():
    # three alignments overlapping by >=20 bases along one entry
    mk = lambda start, score: pairing.PairedOverlap(
        score, 7, start, start + 149, 0, ov(0, 7, start, False, score), None)
    a, b, c = mk(0, 300), mk(100, 280), mk(200, 290)
    outlier = pairing.PairedOverlap(250, 8, 1000, 1149, 0,
                                    ov(1, 8, 1000, False, 250), None)
    reads = [pairing.ReadPairAlignments(0, 10, [a, b, c]),
             pairing.ReadPairAlignments(1, 11, [outlier])]
    pairing.pseudo_assembly(reads)
    # chain: starts 0,100,200 each overlapping previous by 49 >= 20
    # length=349-0, numBases=3*149, perbase=(300+280+290)/149
    length = 349.0
    num_bases = 3 * 149
    per_base = (300 + 280 + 290) / 149
    score = int((num_bases / length) * (per_base / 3) * length)
    assert a.combined_score == b.combined_score == c.combined_score == score
    assert outlier.combined_score == 250  # single, untouched


def test_pseudo_assembly_chain_break():
    mk = lambda start, score: pairing.PairedOverlap(
        score, 7, start, start + 149, 0, ov(0, 7, start, False, score), None)
    a, b = mk(0, 300), mk(140, 280)   # overlap 9 < 20: a ends 149,
    # b starts 140 > 149-20=129 -> same chain? 140 > 129 -> chain BREAKS
    reads = [pairing.ReadPairAlignments(0, 10, [a, b])]
    pairing.pseudo_assembly(reads)
    assert a.combined_score == 300 and b.combined_score == 280


def test_dummy_pairs_single_end():
    overlaps = [ov(0, 5, 100, False, 290), ov(0, 6, 50, True, 280),
                ov(2, 5, 10, False, 250)]
    groups = pairing.dummy_pairs_from_single_end(overlaps)
    assert [g.r1_pos for g in groups] == [0, 2]
    assert all(p.has_r1 and not p.has_r2
               for g in groups for p in g.pairs)
