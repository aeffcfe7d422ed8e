"""End-to-end sharded pipeline (Mesh("data","index"), parallel/dist.py
make_sharded_phase_a) vs the single-device pipeline vs the host pipeline:
the surviving pair sets, insert sizes and per-read LCAs must agree EXACTLY
(VERDICT round-1 item 3: the mesh is a real pipeline, not a dryrun).

Runs on the 8-virtual-device CPU mesh from conftest.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kslam_tpu.config import PipelineConfig
from kslam_tpu.db.genbank import GenbankEntry, GenbankIndex
from kslam_tpu.db.kmer_index import KmerIndex
from kslam_tpu.db.taxonomy import TaxonomyDB
from kslam_tpu.io.fastq import ReadBatch
from kslam_tpu.ops import encode, lca as lca_ops
from kslam_tpu.parallel import dist
from kslam_tpu.pipeline import align, run


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(77)
    bases4 = "ACGT"
    taxdb = TaxonomyDB()
    taxdb.parent_of[1] = 1
    taxdb.parent_of[2] = 1
    for t in (10, 11, 12):
        taxdb.parent_of[t] = 2
    for t in taxdb.parent_of:
        taxdb.rank_of[t] = "no rank"
        taxdb.name_of[t] = f"n{t}"
    genomes = []
    for i in range(6):
        genomes.append(GenbankEntry(
            bases="".join(rng.choice(list(bases4), 800)),
            taxonomy_id=[10, 11, 12, 11, 10, 12][i], locus_tag=f"G{i}"))
    gindex = GenbankIndex(genomes)
    kidx = KmerIndex.build(gindex)
    db = align.DeviceDB.from_index(gindex, kidx)

    n_pairs = 40
    comp = str.maketrans("ACGT", "TGCA")
    names, b1, b2 = [], [], []
    for i in range(n_pairs):
        g = genomes[i % 6].bases
        pos = int(rng.integers(0, 800 - 320))
        r1 = list(g[pos:pos + 150])
        r2 = list(g[pos + 170:pos + 320].translate(comp)[::-1])
        for r in (r1, r2):
            for q in rng.integers(0, 150, 3):
                r[q] = bases4[int(rng.integers(0, 4))]
        names.append(f"p{i}")
        b1.append("".join(r1))
        b2.append("".join(r2))
    bases = np.zeros((2 * n_pairs, 160), np.uint8)
    for i, s in enumerate(b1 + b2):
        bases[i, :150] = np.frombuffer(s.encode(), np.uint8)
    batch = ReadBatch(names=names + names, bases=bases,
                      lengths=np.full(2 * n_pairs, 150, np.int32),
                      quality=np.full_like(bases, 73), paired=True)
    entry_taxids = jnp.asarray(gindex.taxonomy_ids.astype(np.int32))
    lca_tables = lca_ops.build_device_tables(taxdb)
    return taxdb, gindex, kidx, db, batch, entry_taxids, lca_tables


def _summarize(reads_and_pairs):
    out = {}
    for read in reads_and_pairs:
        out[read.r1_pos] = (
            [(p.r1 is not None, p.r2 is not None,
              p.combined_score & 0xFFFFFFFF, p.entry_id, p.ref_start,
              p.ref_end, p.insert_size,
              None if p.r1 is None else (p.r1.read_id, p.r1.rel_pos,
                                         p.r1.rc, p.r1.score),
              None if p.r2 is None else (p.r2.read_id, p.r2.rel_pos,
                                         p.r2.rc, p.r2.score))
             for p in read.pairs],
            getattr(read, "device_lca", None))
    return out


def _mesh_and_db(setup, data, index, genome_sharded=False):
    _, gindex, kidx, _, _, _, _ = setup
    mesh = dist.build_mesh(jax.devices()[:data * index],
                           data=data, index=index)
    sdb = dist.place_sharded_db(
        mesh, kidx, encode.sw_codes_np(gindex.bases_concat),
        gindex.entry_offsets, genome_sharded=genome_sharded)
    return mesh, sdb


@pytest.mark.parametrize("data,index,gshard", [
    (2, 4, False), (1, 8, False), (4, 2, False), (2, 4, True), (1, 8, True),
])
def test_sharded_equals_single_device(setup, data, index, gshard):
    taxdb, gindex, kidx, db, batch, entry_taxids, lca_tables = setup
    config = PipelineConfig(read_batch=32, max_matches_per_kmer=16,
                            max_pairs_per_batch=1 << 12, sw_batch=1 << 10,
                            genome_sharded=gshard)
    single = run.process_batch_device(batch, db, config, entry_taxids,
                                      lca_tables)
    mesh, sdb = _mesh_and_db(setup, data, index, genome_sharded=gshard)
    sharded = run.process_batch_device(batch, db, config, entry_taxids,
                                       lca_tables, mesh=mesh,
                                       sharded_db=sdb)
    assert _summarize(sharded) == _summarize(single)
    # and both match the pure-host reference pipeline
    host = run.process_batch(batch, db, config)
    h = {r.r1_pos: sorted(
        (p.r1 is not None, p.r2 is not None, p.combined_score & 0xFFFFFFFF,
         p.entry_id, p.ref_start, p.ref_end, p.insert_size)
        for p in r.pairs) for r in host}
    s = {g: sorted(t[:7] for t in rows)
         for g, (rows, _) in _summarize(sharded).items()}
    assert s == h


@pytest.mark.parametrize("gshard", [False, True])
def test_sharded_overflow_retry(setup, gshard):
    """Tiny caps force the emit-all retry on the mesh (including the
    entry-owner SW cap when genomes are sharded); results must still match
    the uncapped single-device run."""
    taxdb, gindex, kidx, db, batch, entry_taxids, lca_tables = setup
    config_big = PipelineConfig(read_batch=128, max_matches_per_kmer=64,
                                max_pairs_per_batch=1 << 14,
                                sw_batch=1 << 11)
    single = run.process_batch_device(batch, db, config_big, entry_taxids,
                                      lca_tables)
    mesh, sdb = _mesh_and_db(setup, 2, 4, genome_sharded=gshard)
    config_small = PipelineConfig(read_batch=128, max_matches_per_kmer=1,
                                  max_pairs_per_batch=1 << 6,
                                  sw_batch=1 << 6, genome_sharded=gshard)
    sharded = run.process_batch_device(batch, db, config_small,
                                       entry_taxids, lca_tables,
                                       mesh=mesh, sharded_db=sdb)
    assert _summarize(sharded) == _summarize(single)


def test_sharded_single_end(setup):
    taxdb, gindex, kidx, db, batch, entry_taxids, lca_tables = setup
    se = ReadBatch(names=batch.names[:40], bases=batch.bases[:40],
                   lengths=batch.lengths[:40], quality=batch.quality[:40],
                   paired=False)
    config = PipelineConfig(read_batch=16, max_matches_per_kmer=16,
                            max_pairs_per_batch=1 << 12, sw_batch=1 << 10)
    single = run.process_batch_device(se, db, config, entry_taxids,
                                      lca_tables)
    mesh, sdb = _mesh_and_db(setup, 2, 4)
    sharded = run.process_batch_device(se, db, config, entry_taxids,
                                       lca_tables, mesh=mesh,
                                       sharded_db=sdb)
    assert _summarize(sharded) == _summarize(single)
