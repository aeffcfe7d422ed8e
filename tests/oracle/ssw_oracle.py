"""Builds and drives the reference-ssw oracle binary for differential tests.

The binary is compiled on demand from /root/reference/src/ssw.c (never copied
into the repo) plus tests/oracle/ssw_oracle_main.c.  Tests using the oracle
skip automatically when the reference tree or a compiler is unavailable.
"""

import os
import subprocess

REFERENCE_SSW = "/root/reference/src/ssw.c"
REFERENCE_INC = "/root/reference/src"
_HERE = os.path.dirname(os.path.abspath(__file__))
_BINARY = "/tmp/kslam_ssw_oracle"


def oracle_available() -> bool:
    return os.path.exists(REFERENCE_SSW)


def build_oracle() -> str:
    if os.path.exists(_BINARY) and (
            os.path.getmtime(_BINARY) >
            os.path.getmtime(os.path.join(_HERE, "ssw_oracle_main.c"))):
        return _BINARY
    cmd = [
        "gcc", "-O2", "-msse2", "-I", REFERENCE_INC,
        os.path.join(_HERE, "ssw_oracle_main.c"), REFERENCE_SSW,
        "-o", _BINARY, "-lm",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _BINARY


def run_oracle(cases, params, report_cigar=False, score_filter=0):
    """cases: list of (query_str, ref_str).  Returns list of dicts."""
    binary = build_oracle()
    lines = []
    for query, ref in cases:
        lines.append(f"{params.match} {params.mismatch} {params.gap_open} "
                     f"{params.gap_extend} {int(report_cigar)} {score_filter} "
                     f"{query} {ref if ref else '-'}")
    proc = subprocess.run([binary], input="\n".join(lines) + "\n",
                          capture_output=True, text=True, check=True,
                          timeout=300)
    out = []
    for line in proc.stdout.strip().split("\n"):
        score, rb, re_, qb, qe, cigar = line.split(" ")
        out.append({
            "score": int(score), "ref_begin": int(rb), "ref_end": int(re_),
            "query_begin": int(qb), "query_end": int(qe),
            "cigar": None if cigar == "-" else cigar,
        })
    return out
