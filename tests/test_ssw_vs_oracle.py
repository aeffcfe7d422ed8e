"""Differential tests: golden SSW model vs the reference ssw.c binary."""

import numpy as np
import pytest

from kslam_tpu.config import SWParams
from kslam_tpu.golden import ssw
from kslam_tpu.ops import encode

from .oracle import ssw_oracle

pytestmark = pytest.mark.skipif(
    not ssw_oracle.oracle_available(), reason="reference tree not mounted")

P = SWParams()
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _random_seq(rng, n):
    return rng.choice(BASES, n).tobytes().decode()


def _mutate(rng, seq, n_sub, n_indel):
    s = list(seq)
    for _ in range(n_sub):
        i = int(rng.integers(0, len(s)))
        s[i] = chr(int(rng.choice(BASES)))
    for _ in range(n_indel):
        i = int(rng.integers(0, len(s)))
        if rng.random() < 0.5:
            s.insert(i, chr(int(rng.choice(BASES))))
        else:
            del s[i]
    return "".join(s)


def _golden(query, ref, report_cigar):
    q = encode.sw_codes_np(encode.encode_seq(query))
    r = encode.sw_codes_np(encode.encode_seq(ref))
    al = ssw.ssw_align(q, r, P, report_cigar=report_cigar)
    return al


def _compare_case(query, ref, oracle_result, report_cigar):
    al = _golden(query, ref, report_cigar)
    got = {
        "score": al.sw_score, "ref_begin": al.ref_begin,
        "ref_end": al.ref_end, "query_begin": al.query_begin,
        "query_end": al.query_end,
        "cigar": al.cigar_string() if al.cigar else None,
    }
    assert got == oracle_result, f"\nquery={query}\nref={ref}"


def _run_block(cases, report_cigar):
    results = ssw_oracle.run_oracle(cases, P, report_cigar=report_cigar)
    for (query, ref), want in zip(cases, results):
        _compare_case(query, ref, want, report_cigar)


def test_oracle_random_pairs_score_and_positions():
    rng = np.random.default_rng(0)
    cases = []
    for _ in range(30):
        qlen = int(rng.integers(10, 160))
        rlen = int(rng.integers(10, 170))
        cases.append((_random_seq(rng, qlen), _random_seq(rng, rlen)))
    _run_block(cases, report_cigar=False)


def test_oracle_planted_reads_with_cigar():
    """Pipeline-shaped inputs: 150bp reads vs same-length windows with
    substitutions and indels (the hot-path configuration)."""
    rng = np.random.default_rng(1)
    cases = []
    for _ in range(30):
        ref = _random_seq(rng, 150)
        query = _mutate(rng, ref, int(rng.integers(0, 10)),
                        int(rng.integers(0, 4)))[:150]
        cases.append((query, ref))
    _run_block(cases, report_cigar=True)


def test_oracle_high_identity_saturating_scores():
    """Scores >= 252 exercise the byte->word escalation path in the
    reference (ssw.c:870-877); our int32 model must match the word kernel."""
    rng = np.random.default_rng(2)
    cases = []
    for _ in range(15):
        ref = _random_seq(rng, 150)
        query = _mutate(rng, ref, int(rng.integers(0, 2)), 0)[:150]
        cases.append((query, ref))
    _run_block(cases, report_cigar=True)


def test_oracle_short_and_edge_cases():
    cases = [
        ("A", "A"), ("A", "T"), ("ACGT", "ACGT"),
        ("AAAA", "TTTT"),                       # score 0
        ("ACGTACGT", "ACGTACGTACGTACGT"),       # repeat, tie-break
        ("ACGTNNNNACGT", "ACGTACGTACGTACGT"),   # Ns
        ("ACGTACGTACGT", "NNNNNNNNNNNN"),       # all-N ref
    ]
    _run_block(cases, report_cigar=True)


def test_oracle_rc_window_emulation():
    """slam_overlap_align applies the kernel to an RC'd window then flips
    coordinates (SmithWaterman.h:204-229).  Check the flip logic against an
    oracle run on the RC'd window directly."""
    rng = np.random.default_rng(3)
    for _ in range(8):
        entry = _random_seq(rng, 400)
        window_start = int(rng.integers(0, 200))
        window = entry[window_start:window_start + 150]
        read = encode.reverse_complement_str(_mutate(rng, window, 3, 1))[:150]
        rc_window = encode.reverse_complement_str(
            entry[window_start:window_start + len(read)])
        want = ssw_oracle.run_oracle([(read, rc_window)], P,
                                     report_cigar=True)[0]
        g = encode.sw_codes_np(encode.encode_seq(entry))
        q = encode.sw_codes_np(encode.encode_seq(read))
        al = ssw.slam_overlap_align(q, g, relative_position=window_start,
                                    rev_comp=True, p=P, report_cigar=True)
        rlen = len(rc_window)
        assert al.sw_score == want["score"]
        assert al.ref_begin == window_start + rlen - (want["ref_end"] + 1)
        assert al.ref_end == window_start + rlen - (want["ref_begin"] + 1)
        assert al.query_begin == len(read) - (want["query_end"] + 1)
        assert al.query_end == len(read) - (want["query_begin"] + 1)
