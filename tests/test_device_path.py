"""Full-device batch pipeline (pipeline/device_path.py) vs the host
pipeline: surviving pair sets and per-read LCAs must agree exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from kslam_tpu.config import PipelineConfig
from kslam_tpu.db.genbank import GenbankEntry, GenbankIndex
from kslam_tpu.db.kmer_index import KmerIndex
from kslam_tpu.db.taxonomy import TaxonomyDB
from kslam_tpu.io.fastq import ReadBatch
from kslam_tpu.ops import lca as lca_ops
from kslam_tpu.pipeline import align, classify, device_path, pairing, run


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(31)
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
    for i in range(4):
        genomes.append(GenbankEntry(
            bases="".join(rng.choice(list(bases4), 700)),
            taxonomy_id=[10, 11, 12, 11][i], locus_tag=f"G{i}"))
    gindex = GenbankIndex(genomes)
    kidx = KmerIndex.build(gindex)
    db = align.DeviceDB.from_index(gindex, kidx)

    n_pairs = 24
    comp = str.maketrans("ACGT", "TGCA")
    names, b1, b2 = [], [], []
    for i in range(n_pairs):
        g = genomes[i % 4].bases
        pos = int(rng.integers(0, 700 - 320))
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
    return taxdb, gindex, kidx, db, batch


def _host_result(setup, config):
    taxdb, gindex, kidx, db, batch = setup
    reads_and_pairs = run.process_batch(batch, db, config)
    rows = {}
    lcas = {}
    for read in reads_and_pairs:
        rows[read.r1_pos] = [
            (p.r1 is not None, p.r2 is not None,
             p.combined_score & 0xFFFFFFFF, p.entry_id, p.ref_start,
             p.ref_end, p.insert_size) for p in read.pairs]
        res = classify.result_from_read_pair(read, gindex, batch.names,
                                             taxdb)
        lcas[read.r1_pos] = res.taxonomy_id
    return rows, lcas


def _device_result(setup, config):
    taxdb, gindex, kidx, db, batch = setup
    mid = batch.midpoint
    tables = lca_ops.build_device_tables(taxdb)
    entry_taxids = jnp.asarray(gindex.taxonomy_ids.astype(np.int32))
    a = device_path.phase_a(
        jnp.asarray(batch.bases), jnp.asarray(batch.lengths),
        np.int32(mid), db.kmers, db.entry_id, db.offset, db.rc,
        db.genome_chunks, db.entry_offsets,
        max_matches=config.max_matches_per_kmer, capacity=1 << 12,
        sw_batch=1 << 10, chain_iters=32, match_s=config.sw.match,
        mismatch=config.sw.mismatch, gap_open=config.sw.gap_open,
        gap_extend=config.sw.gap_extend, window_len=160,
        score_threshold=config.score_threshold)
    ins = np.asarray(a.pairs.insert_size)[:int(a.pairs.count)]
    ins = ins[ins != 0].astype(np.int64)
    ins = np.where(ins >= 2**31, ins - 2**32, ins)
    max_insert = pairing.max_allowed_insert_size_from_sizes(
        sorted(int(x) for x in ins))
    b = device_path.phase_b(
        a, np.int32(mid), np.uint32(min(max_insert, 2**32 - 1)),
        entry_taxids, tables,
        fraction=config.score_fraction_threshold,
        perform_pseudo_assembly=config.perform_pseudo_assembly)
    cols = b.cols
    v = np.asarray(cols.valid)
    rows = {}
    lcas = {}
    for i in np.nonzero(v)[0]:
        g = int(np.asarray(cols.group)[i])
        rows.setdefault(g, []).append(
            (int(np.asarray(cols.r1_idx)[i]) >= 0,
             int(np.asarray(cols.r2_idx)[i]) >= 0,
             int(np.asarray(cols.combined_score)[i]) & 0xFFFFFFFF,
             int(np.asarray(cols.entry_id)[i]),
             int(np.asarray(cols.ref_start)[i]),
             int(np.asarray(cols.ref_end)[i]),
             int(np.asarray(cols.insert_size)[i])))
        if np.asarray(b.group_last)[i]:
            lcas[g] = int(np.asarray(b.read_lca)[i])
    return rows, lcas


@pytest.mark.parametrize("pseudo", [True, False])
def test_device_pipeline_matches_host(setup, pseudo):
    config = PipelineConfig(perform_pseudo_assembly=pseudo)
    host_rows, host_lcas = _host_result(setup, config)
    dev_rows, dev_lcas = _device_result(setup, config)
    assert set(dev_rows) == set(host_rows)
    for g in host_rows:
        assert dev_rows[g] == host_rows[g], (g, dev_rows[g], host_rows[g])
    assert dev_lcas == host_lcas


def test_cli_device_vs_host_pipeline(tmp_path):
    """CLI outputs must be byte-identical between --device-pipeline on/off
    (paired metagenomics incl. XML/TSV, and single-end just-align SAM)."""
    import numpy as np
    from kslam_tpu import cli
    rng = np.random.default_rng(77)
    bases4 = "ACGT"
    genomes = {f"G{i}": "".join(rng.choice(list(bases4), 600))
               for i in range(3)}
    fa = tmp_path / "db.fasta"
    fa.write_text("".join(f">{n}\n{s}\n" for n, s in genomes.items()))
    names = ["names.dmp", "nodes.dmp"]
    (tmp_path / "names.dmp").write_text(
        "1\t|\troot\t|\t\t|\tscientific name\t|\n"
        "2\t|\tBacteria\t|\t\t|\tscientific name\t|\n")
    (tmp_path / "nodes.dmp").write_text(
        "1\t|\t1\t|\tno rank\t|\n2\t|\t1\t|\tsuperkingdom\t|\n")
    db = tmp_path / "DB"
    cli.main(["--parse-fasta", "--output-file", str(db), str(fa)])
    cli.main(["--parse-taxonomy", str(tmp_path / "names.dmp"),
              str(tmp_path / "nodes.dmp"),
              "--output-file", str(db / "taxDB")])
    comp = str.maketrans("ACGT", "TGCA")
    r1p, r2p = tmp_path / "r1.fq", tmp_path / "r2.fq"
    with open(r1p, "w") as f1, open(r2p, "w") as f2:
        gl = list(genomes.values())
        for i in range(18):
            g = gl[i % 3]
            pos = int(rng.integers(0, 600 - 300))
            f1.write(f"@q{i}\n{g[pos:pos+140]}\n+\n{'I'*140}\n")
            f2.write(f"@q{i}\n"
                     f"{g[pos+160:pos+300].translate(comp)[::-1]}\n"
                     f"+\n{'I'*140}\n")

    outputs = {}
    for mode in ("off", "on"):
        out = tmp_path / f"out_{mode}"
        sam = tmp_path / f"out_{mode}.sam"
        cli.main(["--db", str(db), "--output-file", str(out),
                  "--sam-file", str(sam), "--device-pipeline", mode,
                  str(r1p), str(r2p)])
        body = [l for l in open(sam) if not l.startswith("@")]
        outputs[mode] = (body, open(out).read(),
                         open(str(out) + "_PerRead").read(),
                         open(str(out) + "_abbreviated").read())
    assert outputs["on"] == outputs["off"]

    for mode in ("off", "on"):
        sam = tmp_path / f"se_{mode}.sam"
        cli.main(["--db", str(db), "--output-file",
                  str(tmp_path / f"se_{mode}"), "--sam-file", str(sam),
                  "--just-align", "--device-pipeline", mode, str(r1p)])
        outputs[f"se_{mode}"] = [l for l in open(sam)
                                 if not l.startswith("@")]
    assert outputs["se_on"] == outputs["se_off"]


@pytest.mark.parametrize("paired", [True, False])
def test_chunk_split_multi_batch_equals_single(setup, paired):
    """process_batch_device with a tiny read_batch (chunk split across
    several device batches, one chunk-wide insert model) must return the
    same pairs/LCAs as the single-batch path."""
    taxdb, gindex, kidx, db, batch = setup
    if not paired:
        mid = batch.midpoint
        batch = ReadBatch(names=batch.names[:mid],
                          bases=batch.bases[:mid],
                          lengths=batch.lengths[:mid],
                          quality=batch.quality[:mid], paired=False)
    tables = lca_ops.build_device_tables(taxdb)
    entry_taxids = jnp.asarray(gindex.taxonomy_ids.astype(np.int32))

    def snap(reads):
        return {r.r1_pos: (r.r2_pos, r.device_lca,
                           [(p.r1 is not None, p.r2 is not None,
                             p.combined_score & 0xFFFFFFFF, p.entry_id,
                             p.ref_start, p.ref_end, p.insert_size,
                             None if p.r1 is None else p.r1.read_id,
                             None if p.r2 is None else p.r2.read_id)
                            for p in r.pairs])
                for r in reads}

    big = PipelineConfig(read_batch=1 << 16, sw_batch=1 << 10,
                         max_pairs_per_batch=1 << 12)
    small = PipelineConfig(read_batch=16, sw_batch=1 << 10,
                           max_pairs_per_batch=1 << 12)
    single = snap(run.process_batch_device(batch, db, big,
                                           entry_taxids, tables))
    multi = snap(run.process_batch_device(batch, db, small,
                                          entry_taxids, tables))
    assert single and set(multi) == set(single)
    for g in single:
        assert multi[g] == single[g], (g, multi[g], single[g])
