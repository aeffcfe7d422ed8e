"""Differential tests: batched device SW (JAX) vs the golden scalar model."""

import numpy as np
import jax.numpy as jnp

from kslam_tpu.config import SWParams
from kslam_tpu.golden import ssw as golden
from kslam_tpu.ops import encode, sw

P = SWParams()
L = 160


def pad_codes(seqs, l=L):
    out = np.full((len(seqs), l), 4, dtype=np.int32)
    for i, s in enumerate(seqs):
        codes = encode.sw_codes_np(encode.encode_seq(s))
        out[i, :len(codes)] = codes
    return out


def run_batch(queries, refs):
    q = jnp.asarray(pad_codes(queries))
    r = jnp.asarray(pad_codes(refs))
    return sw.sw_align_batch(q, r, P.match, P.mismatch, P.gap_open,
                             P.gap_extend)


def check_against_golden(queries, refs):
    al = run_batch(queries, refs)
    for i, (qs, rs) in enumerate(zip(queries, refs)):
        qq = encode.sw_codes_np(encode.encode_seq(qs))
        rr = encode.sw_codes_np(encode.encode_seq(rs))
        want = golden.ssw_align(qq, rr, P)
        got = (int(al.score[i]), int(al.ref_begin[i]), int(al.ref_end[i]),
               int(al.query_begin[i]), int(al.query_end[i]))
        expect = (want.sw_score, want.ref_begin, want.ref_end,
                  want.query_begin, want.query_end)
        assert got == expect, f"row {i}: {got} != {expect}\nq={qs}\nr={rs}"


BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def rand_seq(rng, n):
    return rng.choice(BASES, n).tobytes().decode()


def mutate(rng, seq, subs, indels):
    s = list(seq)
    for _ in range(subs):
        s[int(rng.integers(0, len(s)))] = chr(int(rng.choice(BASES)))
    for _ in range(indels):
        i = int(rng.integers(0, len(s)))
        if rng.random() < 0.5:
            s.insert(i, chr(int(rng.choice(BASES))))
        else:
            del s[i]
    return "".join(s)


def test_batch_matches_golden_random():
    rng = np.random.default_rng(0)
    queries, refs = [], []
    for _ in range(24):
        queries.append(rand_seq(rng, int(rng.integers(20, 155))))
        refs.append(rand_seq(rng, int(rng.integers(20, 160))))
    check_against_golden(queries, refs)


def test_batch_matches_golden_planted():
    rng = np.random.default_rng(1)
    queries, refs = [], []
    for _ in range(24):
        ref = rand_seq(rng, 150)
        queries.append(mutate(rng, ref, int(rng.integers(0, 8)),
                              int(rng.integers(0, 3)))[:150])
        refs.append(ref)
    check_against_golden(queries, refs)


def test_batch_edge_cases():
    check_against_golden(
        ["AAAA", "ACGT", "ACGTNNNNACGT", "ACGTACGT"],
        ["TTTT", "ACGT", "ACGTACGTACGT", "AAACGTACGTTT"])


def test_align_overlaps_batch_matches_slam_semantics():
    """Windowed + RC + coordinate-flip path vs golden slam_overlap_align."""
    rng = np.random.default_rng(2)
    genomes = [rand_seq(rng, 500) for _ in range(3)]
    concat = "".join(genomes)
    g_codes = jnp.asarray(encode.sw_codes_np(encode.encode_seq(concat)))
    offsets = jnp.asarray(np.array([0, 500, 1000, 1500], dtype=np.int64))

    reads, overlaps = [], []
    for i in range(20):
        gid = int(rng.integers(0, 3))
        pos = int(rng.integers(0, 350))
        seq = mutate(rng, genomes[gid][pos:pos + 150], 4, 1)[:150]
        rc = bool(rng.random() < 0.5)
        if rc:
            seq = encode.reverse_complement_str(seq)
        reads.append(seq)
        # include negative and past-end relative positions
        rel = pos + int(rng.integers(-4, 5))
        overlaps.append((i, gid, rel, rc))
    # some pathological windows
    overlaps.append((0, 0, -140, False))
    overlaps.append((1, 1, 495, False))
    overlaps.append((2, 2, 499, True))

    read_codes = jnp.asarray(pad_codes(reads))
    lengths = jnp.asarray(np.array([len(r) for r in reads], dtype=np.int32))
    rid = jnp.asarray(np.array([o[0] for o in overlaps], dtype=np.int32))
    eid = jnp.asarray(np.array([o[1] for o in overlaps], dtype=np.int32))
    rel = jnp.asarray(np.array([o[2] for o in overlaps], dtype=np.int32))
    rc = jnp.asarray(np.array([o[3] for o in overlaps], dtype=bool))
    valid = jnp.ones(len(overlaps), dtype=bool)

    al = sw.align_overlaps_batch(rid, eid, rel, rc, valid, read_codes,
                                 lengths, g_codes, offsets,
                                 P.match, P.mismatch, P.gap_open,
                                 P.gap_extend, window_len=L)
    for k, (i, gid, rel_k, rc_k) in enumerate(overlaps):
        q = encode.sw_codes_np(encode.encode_seq(reads[i]))
        g = encode.sw_codes_np(encode.encode_seq(genomes[gid]))
        want = golden.slam_overlap_align(q, g, rel_k, rc_k, P)
        got = (int(al.score[k]), int(al.ref_begin[k]), int(al.ref_end[k]),
               int(al.query_begin[k]), int(al.query_end[k]))
        expect = (want.sw_score, want.ref_begin, want.ref_end,
                  want.query_begin, want.query_end)
        assert got == expect, (k, overlaps[k], got, expect)
