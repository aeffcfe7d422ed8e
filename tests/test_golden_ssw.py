import numpy as np
import pytest

from kslam_tpu.config import SWParams
from kslam_tpu.golden import ssw
from kslam_tpu.ops import encode

P = SWParams()  # match 2, mismatch 3, gap open 5, gap extend 2


def codes(s):
    return encode.sw_codes_np(encode.encode_seq(s))


def naive_gotoh_score(q, r, p):
    """Independent 3-matrix Gotoh local alignment, plain loops."""
    m, n = len(q), len(r)
    NEG = -10**9
    H = np.zeros((m + 1, n + 1), dtype=np.int64)
    E = np.full((m + 1, n + 1), NEG, dtype=np.int64)  # gap in ref direction
    F = np.full((m + 1, n + 1), NEG, dtype=np.int64)  # gap in query direction
    best = 0
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            if q[i - 1] == 4 or r[j - 1] == 4:
                s = 0
            elif q[i - 1] == r[j - 1]:
                s = p.match
            else:
                s = -p.mismatch
            E[i][j] = max(H[i][j - 1] - p.gap_open, E[i][j - 1] - p.gap_extend)
            F[i][j] = max(H[i - 1][j] - p.gap_open, F[i - 1][j] - p.gap_extend)
            H[i][j] = max(0, H[i - 1][j - 1] + s, E[i][j], F[i][j])
            best = max(best, H[i][j])
    return best


def test_perfect_match():
    q = codes("ACGTACGTACGT")
    score, ref_end, read_end = ssw.sw_forward_ends(q, q, P)
    assert score == 2 * len(q)
    assert ref_end == len(q) - 1
    assert read_end == len(q) - 1


def test_substring_match_positions():
    ref = codes("TTTTTACGTACGTACGTTTTTT")
    q = codes("ACGTACGTACGT")
    al = ssw.ssw_align(q, ref, P, report_cigar=True)
    assert al.sw_score == 24
    assert al.ref_begin == 5
    assert al.ref_end == 16
    assert al.query_begin == 0
    assert al.query_end == 11
    assert al.cigar_string() == "12M"


def test_mismatch_score():
    q = codes("ACGTACGTAC")
    r = codes("ACGTTCGTAC")
    al = ssw.ssw_align(q, r, P)
    assert al.sw_score == 2 * 10 - (2 + 3)  # mismatch replaces one match


def test_gap_alignment_cigar():
    # query has one extra base (insertion relative to ref)
    r = codes("ACGTACGTACGTACGTACGT")
    q = codes("ACGTACGTACCGTACGTACGT")  # extra C after 10 bases
    al = ssw.ssw_align(q, r, P, report_cigar=True)
    # 20 matches, one insertion: 40 - 5
    assert al.sw_score == 40 - 5
    # the banded traceback's direction preferences pick one of the
    # equivalent placements of the inserted C (verified vs oracle)
    assert al.cigar_string() in ("10M1I10M", "11M1I9M", "9M1I11M")
    assert sum(l for l, op in al.cigar if op in "MI") == \
        al.query_end - al.query_begin + 1


def test_deletion_cigar():
    q = codes("ACGTACGTACGTACGTACG")
    r = codes("ACGTACGTACCGTACGTACG")  # ref has extra C
    al = ssw.ssw_align(q, r, P, report_cigar=True)
    assert al.sw_score == 2 * 19 - 5
    assert "D" in al.cigar_string()


def test_n_scores_zero():
    q = codes("ACGTNACGT")
    r = codes("ACGTAACGT")
    al = ssw.ssw_align(q, r, P)
    # N vs A scores 0, the rest match: best local alignment keeps the N
    # inside (16 > two separate 8s)
    assert al.sw_score == 16


def test_score_matches_naive_gotoh_random():
    rng = np.random.default_rng(42)
    for _ in range(12):
        m = int(rng.integers(5, 40))
        n = int(rng.integers(5, 40))
        q = rng.integers(0, 4, m).astype(np.uint8)
        r = rng.integers(0, 4, n).astype(np.uint8)
        got, _, _ = ssw.sw_forward_ends(q, r, P)
        want = naive_gotoh_score(q, r, P)
        assert got == want


def test_end_position_tiebreak_first_column():
    # Two identical perfect hits; ssw reports the first (lowest ref pos)
    r = codes("AAACGTACGTTTTTTACGTACGTTT")
    q = codes("ACGTACGT")
    al = ssw.ssw_align(q, r, P)
    assert al.sw_score == 16
    assert al.ref_begin == 2
    assert al.ref_end == 9


def test_zero_score_alignment():
    q = codes("AAAA")
    r = codes("TTTT")
    al = ssw.ssw_align(q, r, P)
    assert al.sw_score == 0
    assert al.ref_end == -1
    # all-zero pvHmax trace: min striped index (verified vs oracle)
    assert al.query_end == 0
    assert al.ref_begin == -1
    assert al.query_begin == 0


def test_cigar_consumes_full_spans_random():
    rng = np.random.default_rng(7)
    for _ in range(8):
        m = int(rng.integers(20, 60))
        n = int(rng.integers(20, 60))
        q = rng.integers(0, 4, m).astype(np.uint8)
        r = rng.integers(0, 4, n).astype(np.uint8)
        al = ssw.ssw_align(q, r, P, report_cigar=True)
        if al.sw_score == 0 or al.cigar is None:
            continue
        q_span = sum(l for l, op in al.cigar if op in "MI")
        r_span = sum(l for l, op in al.cigar if op in "MD")
        assert q_span == al.query_end - al.query_begin + 1
        assert r_span == al.ref_end - al.ref_begin + 1


def test_cigar_rescore_consistency_random():
    """Re-scoring the traced path never exceeds the DP score, and for
    gap-free cigars equals it."""
    rng = np.random.default_rng(3)
    for _ in range(8):
        base = rng.integers(0, 4, 80).astype(np.uint8)
        q = base[10:70].copy()
        muts = rng.integers(0, 60, 4)
        q[muts] = (q[muts] + rng.integers(1, 4, 4)) % 4
        al = ssw.ssw_align(q, base, P, report_cigar=True)
        assert al.cigar is not None
        # walk the cigar and recompute the score
        qi, ri = al.query_begin, al.ref_begin
        score = 0
        for l, op in al.cigar:
            if op == "M":
                for _ in range(l):
                    score += P.match if q[qi] == base[ri] else -P.mismatch
                    qi += 1
                    ri += 1
            elif op == "I":
                score += -(P.gap_open + (l - 1) * P.gap_extend)
                qi += l
            else:
                score += -(P.gap_open + (l - 1) * P.gap_extend)
                ri += l
        assert score == al.sw_score


def test_slam_overlap_align_rc():
    # an RC overlap: read equals revcomp of a genome window
    genome = "TTTTTACGTACGTACGGGGGG"
    window = genome[5:17]  # ACGTACGTACGG
    read = encode.reverse_complement_str(window)
    g = codes(genome)
    q = codes(read)
    al = ssw.slam_overlap_align(q, g, relative_position=5, rev_comp=True, p=P,
                                report_cigar=True)
    assert al.sw_score == 2 * len(window)
    assert al.ref_begin == 5
    assert al.ref_end == 16
    assert al.cigar_string() == "12M"


def test_check_params_rejects_degenerate():
    with pytest.raises(ValueError):
        ssw.check_params(SWParams(match=10, mismatch=10, gap_open=5,
                                  gap_extend=6))
