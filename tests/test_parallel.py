"""Multi-chip sharded alignment (parallel/dist.py) on an 8-device CPU mesh.

Checks that the Mesh("data","index") shard_map step is *exact* versus the
single-device pipeline: same surviving overlap set and identical per-read
best scores after the pmax reduction over the index axis.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kslam_tpu.config import PipelineConfig
from kslam_tpu.db.genbank import GenbankEntry, GenbankIndex
from kslam_tpu.db.kmer_index import KmerIndex
from kslam_tpu.ops import encode, kmers, match, sw
from kslam_tpu.parallel import dist


def _problem(num_genomes=4, genome_len=500, num_reads=16, read_len=100,
             pad_len=128, seed=3):
    rng = np.random.default_rng(seed)
    bases4 = np.frombuffer(b"ACGT", dtype=np.uint8)
    genomes = [rng.choice(bases4, genome_len).tobytes().decode()
               for _ in range(num_genomes)]
    comp = str.maketrans("ACGT", "TGCA")
    reads = []
    for i in range(num_reads):
        g = genomes[i % num_genomes]
        pos = int(rng.integers(0, genome_len - read_len))
        r = g[pos:pos + read_len]
        if i % 3 == 0:
            r = r.translate(comp)[::-1]
        reads.append(r)
    bases = np.zeros((num_reads, pad_len), dtype=np.uint8)
    for i, r in enumerate(reads):
        bases[i, :len(r)] = np.frombuffer(r.encode(), np.uint8)
    lengths = np.full(num_reads, read_len, np.int32)
    return genomes, bases, lengths


def _single_device_best(config, gindex, kidx, bases, lengths, capacity):
    """Reference result: full-index match + SW on one device."""
    m = len(kidx)
    cap = 1 << max((m - 1).bit_length(), 4)
    km = np.full(cap, np.uint64(2**64 - 1), np.uint64)
    km[:m] = kidx.kmers
    pad = lambda a, dt: np.concatenate([a, np.zeros(cap - m, dt)]).astype(dt)
    p = config.sw
    k, off, rc, valid = kmers.read_kmers_device(
        jnp.asarray(bases), jnp.asarray(lengths))
    res = match.match_overlaps(
        k, off, rc, valid, jnp.asarray(lengths),
        jnp.asarray(km), jnp.asarray(pad(kidx.entry_id, np.int32)),
        jnp.asarray(pad(kidx.offset, np.int32)),
        jnp.asarray(pad(kidx.rc, bool)),
        max_matches=config.max_matches_per_kmer, capacity=capacity,
        chain_iters=48)
    al = sw.align_overlaps_batch(
        res.read_id, res.entry_id, res.rel_pos, res.rc, res.valid,
        encode.sw_codes(jnp.asarray(bases)), jnp.asarray(lengths),
        jnp.asarray(encode.sw_codes_np(gindex.bases_concat)),
        jnp.asarray(gindex.entry_offsets),
        p.match, p.mismatch, p.gap_open, p.gap_extend,
        window_len=bases.shape[1])
    score = np.where(np.asarray(res.valid), np.asarray(al.score), 0)
    best = np.zeros(len(bases), np.int64)
    np.maximum.at(best, np.clip(np.asarray(res.read_id), 0, len(bases) - 1),
                  score)
    rows = set()
    v = np.asarray(res.valid)
    for i in np.nonzero(v)[0]:
        rows.add((int(np.asarray(res.read_id)[i]),
                  int(np.asarray(res.entry_id)[i]),
                  int(np.asarray(res.rel_pos)[i]),
                  bool(np.asarray(res.rc)[i]), int(score[i])))
    return best, rows


@pytest.mark.parametrize("data,index", [(2, 4), (1, 8), (4, 2)])
def test_sharded_step_matches_single_device(data, index):
    if len(jax.devices()) < data * index:
        pytest.skip("needs 8 virtual devices")
    config = PipelineConfig()
    genomes, bases, lengths = _problem(num_reads=4 * data)
    gindex = GenbankIndex([GenbankEntry(bases=g) for g in genomes])
    kidx = KmerIndex.build(gindex)
    capacity = 1 << 10

    best_ref, rows_ref = _single_device_best(
        config, gindex, kidx, bases, lengths, capacity)

    mesh = dist.build_mesh(jax.devices()[:data * index], data=data,
                           index=index)
    km, eid, off, rc = dist.shard_database(kidx, index)
    step = dist.make_sharded_align_step(mesh, config, capacity=capacity,
                                        window_len=bases.shape[1])
    out = step(jnp.asarray(bases), jnp.asarray(lengths), jnp.asarray(km),
               jnp.asarray(eid), jnp.asarray(off), jnp.asarray(rc),
               jnp.asarray(encode.sw_codes_np(gindex.bases_concat)),
               jnp.asarray(gindex.entry_offsets))

    np.testing.assert_array_equal(np.asarray(out.best_score), best_ref)

    valid = np.asarray(out.valid)
    rows = set()
    for d in range(valid.shape[0]):
        for s in range(valid.shape[1]):
            for i in np.nonzero(valid[d, s])[0]:
                rows.add((int(np.asarray(out.read_id)[d, s, i]),
                          int(np.asarray(out.entry_id)[d, s, i]),
                          int(np.asarray(out.rel_pos)[d, s, i]),
                          bool(np.asarray(out.rc)[d, s, i]),
                          int(np.asarray(out.score)[d, s, i])))
    assert rows == rows_ref


def test_shard_database_preserves_pileups():
    genomes, _, _ = _problem()
    gindex = GenbankIndex([GenbankEntry(bases=g) for g in genomes])
    kidx = KmerIndex.build(gindex)
    for s in (2, 4, 8):
        km, eid, off, rc = dist.shard_database(kidx, s)
        per = len(km) // s
        shards = km.reshape(s, per)
        sentinel = np.uint64(2**64 - 1)
        seen = {}
        for i in range(s):
            vals = shards[i][shards[i] != sentinel]
            # shard contents sorted, and each k-mer value on exactly 1 shard
            assert np.all(np.diff(vals.astype(np.uint64)) >= 0)
            for v in np.unique(vals):
                assert seen.setdefault(int(v), i) == i
        # nothing lost
        total = sum(int((shards[i] != sentinel).sum()) for i in range(s))
        assert total == len(kidx)


def test_build_mesh_shapes():
    mesh = dist.build_mesh(jax.devices())
    assert mesh.shape["data"] * mesh.shape["index"] == len(jax.devices())
