"""Evaluation harness (eval/comparison.py) behavior tests."""

import numpy as np
import pytest

from kslam_tpu.db.taxonomy import TaxonomyDB
from kslam_tpu.eval import comparison


@pytest.fixture
def taxdb():
    db = TaxonomyDB()
    # 1 root -> 10 genusA -> 100 speciesA1 -> 1000 strainA1a
    #        -> 10 genusA -> 101 speciesA2
    #        -> 20 genusB -> 200 speciesB1
    # NB the rank walk stops at nodes whose parent is the root
    # (TaxonomyDatabase.h:309-310), so genera sit under a superkingdom
    rows = [(1, 1, "root", "no rank"),
            (5, 1, "Bacteria", "superkingdom"),
            (10, 5, "genusA", "genus"),
            (100, 10, "speciesA1", "species"),
            (1000, 100, "strainA1a", "no rank"),
            (101, 10, "speciesA2", "species"),
            (20, 5, "genusB", "genus"),
            (200, 20, "speciesB1", "species")]
    for tid, parent, name, rank in rows:
        db.parent_of[tid] = parent
        db.name_of[tid] = name
        db.rank_of[tid] = rank
    return db


def test_locus_of():
    assert comparison.locus_of("NC_0001.1 extra") == "NC_0001"
    assert comparison.locus_of("plainlocus") == "plainlocus"
    assert comparison.locus_of("a b") == "a"


def test_evaluate_results(taxdb, tmp_path):
    truth = {"r1": 1000, "r2": 101, "r3": 200, "r4": 200}
    rows = [("r1.x", 100),    # strain truth -> species match
            ("r2.x", 100),    # wrong species, right genus
            ("r3.x", 200),    # exact
            ("r4.x", 10)]     # genus-level prediction: no species verdict
    s = comparison.evaluate_results(rows, truth, taxdb)
    assert s.species_correct == 2
    assert s.num_incorrect == 1
    # r1, r2 genus-correct; r3 genus-correct; r4 pred maps to genus A != B
    assert s.genus_correct == 3
    out = tmp_path / "acc.tsv"
    comparison.evaluate_results(rows, truth, taxdb, out_path=str(out))
    lines = out.read_text().strip().split("\n")
    assert any(line.startswith("strainA1a\t1\t1") for line in lines)


def test_mcnemar(taxdb):
    truth = {"r%d" % i: 100 for i in range(10)}
    a = [("r%d" % i, 100 if i < 8 else 101) for i in range(10)]
    b = [("r%d" % i, 100 if i < 5 else 101) for i in range(10)]
    n01, n10, chi = comparison.mcnemar(a, b, truth, taxdb)
    assert (n01, n10) == (3, 0)
    assert chi == pytest.approx(((3 - 1) ** 2) / 3)


def test_evaluate_overlaps(taxdb):
    from kslam_tpu.db.genbank import GenbankEntry, GenbankIndex
    from kslam_tpu.pipeline.pairing import (AlignedOverlap, PairedOverlap,
                                            ReadPairAlignments)
    gindex = GenbankIndex([GenbankEntry(bases="A" * 40, taxonomy_id=1000),
                           GenbankEntry(bases="C" * 40, taxonomy_id=200)])
    truth = {"q0": 100, "q1": 100}

    def mk(read_id, entry_id, score):
        o = AlignedOverlap(read_id=read_id, entry_id=entry_id, rel_pos=0,
                           rc=False, score=score, ref_begin=0, ref_end=10,
                           query_begin=0, query_end=10)
        return PairedOverlap(score, entry_id, 0, 10, 0, o, None)

    reads = [
        ReadPairAlignments(0, 0, [mk(0, 0, 50)]),      # hits speciesA1 ✓
        ReadPairAlignments(1, 1, [mk(1, 1, 50)]),      # hits speciesB1 ✗
    ]
    s = comparison.evaluate_overlaps(reads, gindex, ["q0.a", "q1.a"],
                                     truth, taxdb)
    assert s.species_correct == 1
    assert s.num_incorrect == 1
