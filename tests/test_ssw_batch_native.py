"""Parity of the batched native SSW+traceback (csrc/ssw_batch.cc) with the
golden scalar model (golden/ssw.py), which is itself differential-tested
against the compiled reference ssw.c (tests/oracle/).

Cases cover: forward/RC overlaps, negative rel_pos, windows truncated at
the entry end, mutations + indels (band doubling), N bases, short/long
reads, and score-filtered cigars.
"""

import numpy as np
import pytest

from kslam_tpu.config import SWParams
from kslam_tpu.golden import ssw as golden
from kslam_tpu.io import native
from kslam_tpu.ops import encode

pytestmark = pytest.mark.skipif(
    not native.available() or not hasattr(native.get_lib(),
                                          "kslam_ssw_cigar_batch"),
    reason="native library unavailable")

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _mutate(rng, seq, n_sub, n_ins, n_del):
    seq = list(seq)
    for _ in range(n_sub):
        i = rng.integers(len(seq))
        seq[i] = int(rng.choice(BASES))
    for _ in range(n_ins):
        i = rng.integers(len(seq) + 1)
        seq.insert(i, int(rng.choice(BASES)))
    for _ in range(n_del):
        if len(seq) > 20:
            i = rng.integers(len(seq))
            del seq[i]
    return np.array(seq, dtype=np.uint8)


def _make_cases(rng, n_cases, max_len=160):
    """Random planted-read cases -> (reads, lengths, genome, offsets, cols)."""
    n_entries = 8
    entries = []
    for _ in range(n_entries):
        elen = int(rng.integers(200, 1200))
        entries.append(rng.choice(BASES, size=elen))
    genome = np.concatenate(entries)
    offsets = np.zeros(n_entries + 1, np.int64)
    np.cumsum([len(e) for e in entries], out=offsets[1:])

    reads = np.zeros((n_cases, max_len), np.uint8)
    reads[:] = ord("A")
    lengths = np.zeros(n_cases, np.int32)
    cols = {k: np.zeros(n_cases, np.int32)
            for k in ("read_id", "entry_id", "rel_pos")}
    cols["rc"] = np.zeros(n_cases, np.uint8)
    for i in range(n_cases):
        eid = int(rng.integers(n_entries))
        elen = len(entries[eid])
        rlen = int(rng.integers(40, max_len + 1))
        pos = int(rng.integers(0, max(elen - rlen, 1)))
        seq = entries[eid][pos:pos + rlen].copy()
        kind = rng.integers(5)
        if kind == 1:   # substitutions
            seq = _mutate(rng, seq, rng.integers(1, 8), 0, 0)
        elif kind == 2:  # indels -> band doubling paths
            seq = _mutate(rng, seq, rng.integers(0, 4),
                          rng.integers(1, 5), rng.integers(1, 5))
        elif kind == 3:  # random junk (low/zero score)
            seq = rng.choice(BASES, size=rlen)
        elif kind == 4:  # sprinkle Ns
            seq = seq.copy()
            nn = rng.integers(1, 6)
            seq[rng.integers(0, len(seq), nn)] = ord("N")
        seq = seq[:max_len]  # insertions can overflow the padded width
        rc = bool(rng.integers(2))
        if rc:
            comp = {65: 84, 67: 71, 71: 67, 84: 65, 78: 78}
            seq = np.array([comp[int(b)] for b in seq[::-1]], np.uint8)
        rlen = len(seq)
        reads[i, :rlen] = seq
        lengths[i] = rlen
        # rel_pos near the true position, sometimes negative / off the end
        jitter = int(rng.integers(-3, 4))
        rel = pos + jitter
        if rng.integers(10) == 0:
            rel = int(rng.integers(-20, 5))
        if rng.integers(12) == 0:
            rel = elen - int(rng.integers(1, rlen))  # truncated window
        cols["read_id"][i] = i
        cols["entry_id"][i] = eid
        cols["rel_pos"][i] = rel
        cols["rc"][i] = rc
    return reads, lengths, genome, offsets, cols


def _golden_one(reads, lengths, genome, offsets, cols, i, p,
                report_cigar=True, score_filter=0):
    rid = int(cols["read_id"][i])
    eid = int(cols["entry_id"][i])
    q = encode.sw_codes_np(reads[rid, :lengths[rid]])
    g = encode.sw_codes_np(genome[offsets[eid]:offsets[eid + 1]])
    return golden.slam_overlap_align(
        q, g, int(cols["rel_pos"][i]), bool(cols["rc"][i]), p,
        report_cigar=report_cigar, score_filter=score_filter)


@pytest.mark.parametrize("seed", [0, 1])
def test_batch_matches_golden(seed):
    rng = np.random.default_rng(seed)
    p = SWParams()
    n = 400
    reads, lengths, genome, offsets, cols = _make_cases(rng, n)
    out = native.ssw_cigar_batch(reads, lengths, genome, offsets,
                                 cols["read_id"], cols["entry_id"],
                                 cols["rel_pos"], cols["rc"], p)
    for i in range(n):
        al = _golden_one(reads, lengths, genome, offsets, cols, i, p)
        exp_score = al.sw_score
        assert out["score"][i] == exp_score, i
        if exp_score > 0:
            assert out["ref_begin"][i] == al.ref_begin, i
            assert out["ref_end"][i] == al.ref_end, i
            assert out["query_begin"][i] == al.query_begin, i
            assert out["query_end"][i] == al.query_end, i
        got = native.unpack_cigar(out["cigar_buf"][i], out["cigar_len"][i])
        exp = al.cigar
        assert got == exp, (i, got, exp)


def test_score_filter_skips_cigar():
    rng = np.random.default_rng(7)
    p = SWParams()
    reads, lengths, genome, offsets, cols = _make_cases(rng, 64)
    out = native.ssw_cigar_batch(reads, lengths, genome, offsets,
                                 cols["read_id"], cols["entry_id"],
                                 cols["rel_pos"], cols["rc"], p,
                                 score_filter=100)
    for i in range(64):
        al = _golden_one(reads, lengths, genome, offsets, cols, i, p,
                         score_filter=100)
        assert out["score"][i] == al.sw_score
        got = native.unpack_cigar(out["cigar_buf"][i], out["cigar_len"][i])
        if al.sw_score < 100:
            assert out["cigar_len"][i] == -2 and al.cigar is None
        else:
            assert got == al.cigar


def test_score_only_mode():
    rng = np.random.default_rng(3)
    p = SWParams()
    reads, lengths, genome, offsets, cols = _make_cases(rng, 64)
    out = native.ssw_cigar_batch(reads, lengths, genome, offsets,
                                 cols["read_id"], cols["entry_id"],
                                 cols["rel_pos"], cols["rc"], p,
                                 report_cigar=False)
    for i in range(64):
        al = _golden_one(reads, lengths, genome, offsets, cols, i, p,
                         report_cigar=False)
        assert out["score"][i] == al.sw_score
        assert out["cigar_len"][i] == -2
