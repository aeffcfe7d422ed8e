"""Differential tests: device match engine vs golden scalar overlap model,
using the reference's planted-read property-test design (Tests.h:99-264)."""

import numpy as np
import jax.numpy as jnp
import pytest

from kslam_tpu.config import K
from kslam_tpu.db.genbank import GenbankIndex, GenbankEntry
from kslam_tpu.db.kmer_index import KmerIndex
from kslam_tpu.golden import overlaps as golden
from kslam_tpu.ops import encode, kmers, match

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_seq(rng, n):
    return rng.choice(BASES, n).tobytes().decode()


def make_batch(reads, pad=160, pad_rows=32):
    """Pads the batch to a fixed (rows, len) so every test reuses one
    compiled program."""
    rows = max(pad_rows, len(reads))
    bases = np.zeros((rows, pad), dtype=np.uint8)
    lengths = np.zeros(rows, dtype=np.int32)
    for i, r in enumerate(reads):
        arr = np.frombuffer(r.encode(), dtype=np.uint8)
        bases[i, :len(arr)] = arr
        lengths[i] = len(arr)
    return bases, lengths


def plant_reads(rng, genomes, num_reads, read_len=150):
    """Plant reads at known positions, 50% reverse complemented
    (Tests.h:118-160 style)."""
    reads, truth = [], []
    for _ in range(num_reads):
        gid = int(rng.integers(0, len(genomes)))
        g = genomes[gid]
        pos = int(rng.integers(0, len(g) - read_len))
        seq = g[pos:pos + read_len]
        rc = bool(rng.random() < 0.5)
        if rc:
            seq = encode.reverse_complement_str(seq)
        reads.append(seq)
        truth.append((gid, pos, rc))
    return reads, truth


def pad_index(kidx, size=4096):
    """Pads index columns to a fixed size with an unreachable sentinel
    k-mer (canonical k-mers are min(fwd, rc) and can never be all-ones)."""
    m = len(kidx.kmers)
    assert m <= size
    km = np.full(size, np.uint64(2**64 - 1), dtype=np.uint64)
    eid = np.zeros(size, np.int32)
    off = np.zeros(size, np.int32)
    rc = np.zeros(size, bool)
    km[:m] = kidx.kmers
    eid[:m] = kidx.entry_id
    off[:m] = kidx.offset
    rc[:m] = kidx.rc
    return km, eid, off, rc


def run_device_match(reads, genomes, **kw):
    index = GenbankIndex([GenbankEntry(bases=g) for g in genomes])
    kidx = KmerIndex.build(index)
    km_i, eid_i, off_i, rc_i = pad_index(kidx)
    bases, lengths = make_batch(reads)
    km, off, rc, valid = kmers.read_kmers_device(jnp.asarray(bases),
                                                 jnp.asarray(lengths))
    result = match.match_overlaps(
        km, off, rc, valid, jnp.asarray(lengths),
        jnp.asarray(km_i), jnp.asarray(eid_i),
        jnp.asarray(off_i), jnp.asarray(rc_i),
        capacity=1 << 14, **kw)
    keep = np.asarray(result.valid)
    rows = list(zip(np.asarray(result.read_id)[keep].tolist(),
                    np.asarray(result.entry_id)[keep].tolist(),
                    np.asarray(result.rel_pos)[keep].tolist(),
                    np.asarray(result.rc)[keep].tolist()))
    return rows, int(result.overflow)


def test_kmer_extraction_matches_scalar():
    rng = np.random.default_rng(0)
    reads = [random_seq(rng, int(rng.integers(K, 160))) for _ in range(20)]
    bases, lengths = make_batch(reads)
    km, off, rc, valid = kmers.read_kmers_device(jnp.asarray(bases),
                                                 jnp.asarray(lengths))
    km, off, rc, valid = map(np.asarray, (km, off, rc, valid))
    for i, read in enumerate(reads):
        gkm, goff, grc = golden.read_kmers_scalar(read)
        nv = valid[i].sum()
        assert nv == len(gkm)
        np.testing.assert_array_equal(km[i, :nv], gkm)
        np.testing.assert_array_equal(off[i, :nv], goff)
        np.testing.assert_array_equal(rc[i, :nv], grc)


def test_kmer_canonical_palindrome_takes_rc_branch():
    # a k=32 palindrome: fwd == rc; reference picks the RC branch
    half = "ACGTTGCACCGGTTAA"
    pal = half + encode.reverse_complement_str(half)
    assert len(pal) == K
    bases, lengths = make_batch([pal])
    km, off, rc, valid = kmers.read_kmers_device(jnp.asarray(bases),
                                                 jnp.asarray(lengths))
    assert bool(np.asarray(rc)[0, 0])


def test_planted_overlaps_match_golden():
    rng = np.random.default_rng(1)
    genomes = [random_seq(rng, 500) for _ in range(6)]
    reads, truth = plant_reads(rng, genomes, 25)
    got, overflow = run_device_match(reads, genomes)
    want = golden.find_overlaps_golden(reads, genomes)
    assert overflow == 0
    assert sorted(got) == sorted([(r, g, rel, rc) for r, g, rel, rc in want])


def test_planted_reads_are_found():
    """Every planted read must yield an overlap at its true position
    (Tests.h:161-264 invariant)."""
    rng = np.random.default_rng(2)
    genomes = [random_seq(rng, 800) for _ in range(4)]
    reads, truth = plant_reads(rng, genomes, 30)
    got, _ = run_device_match(reads, genomes)
    by_read = {}
    for r, g, rel, rc in got:
        by_read.setdefault(r, []).append((g, rel, rc))
    for rid, (gid, pos, rc) in enumerate(truth):
        hits = by_read.get(rid, [])
        assert any(g == gid and abs(rel - pos) < 3 and r == rc
                   for g, rel, r in hits), (rid, truth[rid], hits)


def test_mutated_reads_match_golden():
    """Reads with substitutions/indels exercise partial k-mer sharing."""
    rng = np.random.default_rng(3)
    genomes = [random_seq(rng, 600) for _ in range(3)]
    reads = []
    for _ in range(15):
        gid = int(rng.integers(0, len(genomes)))
        pos = int(rng.integers(0, 450))
        seq = list(genomes[gid][pos:pos + 150])
        for _ in range(int(rng.integers(0, 6))):
            seq[int(rng.integers(0, len(seq)))] = chr(int(rng.choice(BASES)))
        reads.append("".join(seq))
    got, overflow = run_device_match(reads, genomes)
    want = golden.find_overlaps_golden(reads, genomes)
    assert overflow == 0
    assert sorted(got) == sorted(want)


def test_repetitive_genome_dedup_chains():
    """Tandem repeats produce dedup clusters; the chained |delta|<3 rule
    must match the scalar std::unique semantics."""
    rng = np.random.default_rng(4)
    unit = random_seq(rng, 40)
    genome = unit * 12 + random_seq(rng, 100)
    reads = [genome[i:i + 150] for i in (0, 20, 40, 300)]
    got, overflow = run_device_match(reads, [genome])
    want = golden.find_overlaps_golden(reads, [genome])
    assert sorted(got) == sorted(want)


def test_all_a_kmers_skipped():
    # k-mer 0 (all A) pileups are skipped (Overlap.h:236-239)
    genome = "A" * 200 + "ACGTTGCA" * 40
    reads = ["A" * 150]
    got, _ = run_device_match(reads, [genome])
    assert got == []
    want = golden.find_overlaps_golden(reads, [genome])
    assert want == []


def test_fanout_cap_counts_overflow():
    genome = ("ACGTTGCATTGGCCAA" * 2) * 60  # heavily repeated 32-mer
    reads = [genome[:150]]
    got, overflow = run_device_match(reads, [genome], max_matches=2)
    assert overflow > 0


def test_index_shard_bounds_cover_everything():
    rng = np.random.default_rng(5)
    genomes = [random_seq(rng, 400) for _ in range(5)]
    index = GenbankIndex([GenbankEntry(bases=g) for g in genomes])
    kidx = KmerIndex.build(index)
    bounds = kidx.shard_bounds(4)
    assert bounds[0] == 0 and bounds[-1] == len(kidx)
    total = sum(len(kidx.shard(bounds, s)) for s in range(4))
    assert total == len(kidx)
    # no equal-k-mer run crosses a shard boundary
    for s in range(1, 4):
        b = int(bounds[s])
        if 0 < b < len(kidx):
            assert kidx.kmers[b] != kidx.kmers[b - 1]


def test_compact_overlaps():
    import jax.numpy as jnp
    from kslam_tpu.ops.match import Overlaps, compact_overlaps
    rng = np.random.default_rng(0)
    p = 64
    valid = rng.random(p) < 0.3
    count = int(valid.sum())
    ov = Overlaps(
        read_id=jnp.asarray(np.arange(p, dtype=np.int32)),
        entry_id=jnp.asarray(rng.integers(0, 5, p).astype(np.int32)),
        rel_pos=jnp.asarray(rng.integers(-10, 10, p).astype(np.int32)),
        rc=jnp.asarray(rng.random(p) < 0.5),
        valid=jnp.asarray(valid),
        count=jnp.asarray(np.int32(count)),
        overflow=jnp.asarray(np.int32(0)))
    out = compact_overlaps(ov, 16)
    got_valid = np.asarray(out.valid)
    kept = np.flatnonzero(valid)[:16]
    assert int(out.count) == min(count, 16)
    assert int(out.overflow) == max(count - 16, 0)
    # kept rows appear first, in original order
    np.testing.assert_array_equal(
        np.asarray(out.read_id)[got_valid], kept[:int(out.count)])
