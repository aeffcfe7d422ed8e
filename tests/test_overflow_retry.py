"""Emit-all overflow policy: the reference emits EVERY pileup pair
(Overlap.h:153-199); when the device match engine's fanout/capacity caps
would drop seeded pairs, both pipelines must retry with exact sizes and
produce results identical to an uncapped run -- never silently diverge.

Repetitive genomes are the trigger: a tandem repeat makes single k-mers
hit the index dozens of times, exceeding small max_matches_per_kmer caps.
"""

import dataclasses

import numpy as np
import pytest

from kslam_tpu.config import PipelineConfig
from kslam_tpu.db.genbank import GenbankEntry, GenbankIndex
from kslam_tpu.db.kmer_index import KmerIndex
from kslam_tpu.io.fastq import ReadBatch
from kslam_tpu.ops.encode import reverse_complement_str
from kslam_tpu.pipeline import align, run

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


@pytest.fixture(scope="module")
def repetitive():
    rng = np.random.default_rng(11)
    unit = rng.choice(BASES, 64).tobytes().decode()
    unique = rng.choice(BASES, 800).tobytes().decode()
    genome = unit * 40 + unique           # 40-copy tandem repeat + unique
    gindex = GenbankIndex([GenbankEntry(bases=genome)])
    kidx = KmerIndex.build(gindex)
    # reads: half from deep inside the repeat (hit ~40 positions each),
    # half from the unique tail
    reads = []
    for i in range(8):
        pos = 64 * (2 + i) + 7
        reads.append(genome[pos:pos + 150])
    for i in range(8):
        pos = 64 * 40 + 40 * i
        reads.append(genome[pos:pos + 150])
    reads = [reverse_complement_str(r) if i % 3 == 0 else r
             for i, r in enumerate(reads)]
    n = len(reads)
    bases = np.zeros((n, 160), np.uint8)
    lengths = np.zeros(n, np.int32)
    for i, r in enumerate(reads):
        arr = np.frombuffer(r.encode(), np.uint8)
        bases[i, :len(arr)] = arr
        lengths[i] = len(arr)
    batch = ReadBatch(names=[f"rd{i}" for i in range(n)], bases=bases,
                      lengths=lengths,
                      quality=np.full((n, 160), ord("I"), np.uint8),
                      paired=False)
    return gindex, kidx, batch


def _overlap_key(o):
    return (o.read_id, o.entry_id, o.rel_pos, o.rc, o.score,
            o.ref_begin, o.ref_end, o.query_begin, o.query_end)


def test_host_align_retry_matches_uncapped(repetitive):
    gindex, kidx, batch = repetitive
    db = align.DeviceDB.from_index(gindex, kidx)
    big = PipelineConfig(max_matches_per_kmer=1024,
                         max_pairs_per_batch=1 << 17)
    # tiny caps: fanout 4 < ~40-copy pileups, capacity far below emissions
    small = PipelineConfig(max_matches_per_kmer=4,
                           max_pairs_per_batch=1 << 10)
    # prove the scenario: the capped first attempt genuinely drops pairs
    import jax
    import jax.numpy as jnp
    from kslam_tpu.ops import kmers, match
    km, off, rc, valid = jax.jit(kmers.read_kmers_device)(
        jnp.asarray(batch.bases), jnp.asarray(batch.lengths))
    first = match.match_overlaps(
        km, off, rc, valid, jnp.asarray(batch.lengths),
        db.kmers, db.entry_id, db.offset, db.rc,
        max_matches=4, capacity=1 << 10)
    assert int(first.overflow) > 0

    ref = sorted(map(_overlap_key,
                     align.align_batch_to_database(batch, db, big)))
    got = sorted(map(_overlap_key,
                     align.align_batch_to_database(batch, db, small)))
    assert len(ref) > 300  # ~40 dedup-distinct repeat positions per read
    assert got == ref


def _pair_summary(reads_and_pairs):
    out = []
    for r in sorted(reads_and_pairs, key=lambda r: r.r1_pos):
        for p in sorted(r.pairs, key=lambda p: (p.entry_id, p.ref_start,
                                                p.ref_end,
                                                -p.combined_score)):
            out.append((r.r1_pos, p.entry_id, p.ref_start, p.ref_end,
                        round(p.combined_score, 6)))
    return out


def test_device_pipeline_retry_matches_uncapped(repetitive):
    gindex, kidx, batch = repetitive
    import jax.numpy as jnp
    from kslam_tpu.ops import lca as lca_ops
    from kslam_tpu.db.taxonomy import TaxonomyDB
    db = align.DeviceDB.from_index(gindex, kidx)
    taxdb = TaxonomyDB()
    taxdb.parent_of[1] = 1
    entry_taxids = jnp.asarray(gindex.taxonomy_ids.astype(np.int32))
    lca_tables = lca_ops.build_device_tables(taxdb)
    big = PipelineConfig(max_matches_per_kmer=1024,
                         max_pairs_per_batch=1 << 17, sw_batch=1 << 14)
    small = dataclasses.replace(big, max_matches_per_kmer=4,
                                max_pairs_per_batch=1 << 10,
                                sw_batch=1 << 8)
    ref = run.process_batch_device(batch, db, big, entry_taxids, lca_tables)
    got = run.process_batch_device(batch, db, small, entry_taxids,
                                   lca_tables)
    assert _pair_summary(got) == _pair_summary(ref)
    assert len(_pair_summary(ref)) > 0
