"""End-to-end pipeline tests through the CLI (small synthetic data)."""

import json
import os

import numpy as np
import pytest

from kslam_tpu import cli
from kslam_tpu.db.genbank import Gene, GenbankIndex, index_from_fasta
from kslam_tpu.db.kmer_index import KmerIndex
from kslam_tpu.db.taxonomy import TaxonomyDB
from kslam_tpu.ops.encode import reverse_complement_str

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(7)

    def seq(n):
        return rng.choice(BASES, n).tobytes().decode()

    genomes = {"GEN_A.1": (562, seq(2000)), "GEN_B.1": (1280, seq(1800))}
    fasta = root / "db.fa"
    with open(fasta, "w") as fh:
        for name, (_, s) in genomes.items():
            fh.write(f">{name}\n{s}\n")

    taxid_of = {}
    truth = []
    r1s, r2s = [], []
    names = list(genomes)
    for i in range(20):
        gname = names[i % 2]
        taxid, g = genomes[gname]
        pos = int(rng.integers(0, len(g) - 500))
        insert = int(rng.integers(280, 420))
        fwd = list(g[pos:pos + 150])
        rev = list(g[pos + insert - 150:pos + insert])
        fwd[int(rng.integers(0, 150))] = chr(int(rng.choice(BASES)))
        r1s.append("".join(fwd))
        r2s.append(reverse_complement_str("".join(rev)))
        truth.append((gname, taxid, pos, insert))
    with open(root / "r1.fq", "w") as f1, open(root / "r2.fq", "w") as f2:
        for i, (a, b) in enumerate(zip(r1s, r2s)):
            f1.write(f"@rd{i}/1\n{a}\n+\n{'I' * 150}\n")
            f2.write(f"@rd{i}/2\n{b}\n+\n{'I' * 150}\n")

    # database with taxids + genes + taxonomy
    db_dir = root / "DB"
    index = index_from_fasta([str(fasta)])
    for e in index.entries:
        e.taxonomy_id = genomes[e.locus_tag][0]
        e.genes = [Gene(gene_name=f"gene_{e.locus_tag}",
                        protein_id=f"P_{e.locus_tag}",
                        product="synthetic", reference_sequence=e.locus_tag,
                        cds_start=0, cds_stop=len(e.bases))]
    index.save(str(db_dir))
    KmerIndex.build(index).save(str(db_dir))
    tax = TaxonomyDB()
    for t, (p, r, n) in {
            1: (1, "no rank", "root"),
            2: (1, "superkingdom", "Bacteria"),
            562: (2, "species", "Escherichia coli"),
            1280: (2, "species", "Staphylococcus aureus")}.items():
        tax.parent_of[t] = p
        tax.rank_of[t] = r
        tax.name_of[t] = n
    tax.write_index(str(db_dir / "taxDB"))
    return dict(root=root, db=str(db_dir), truth=truth)


def test_full_metagenomic_run(dataset):
    root = dataset["root"]
    out = str(root / "results")
    rc = cli.main(["--db", dataset["db"], "--output-file", out,
                   str(root / "r1.fq"), str(root / "r2.fq")])
    assert rc == 0
    per_read = dict(line.split("\t") for line in
                    open(out + "_PerRead").read().strip().split("\n"))
    # every pair classified to its true genome's taxid
    for i, (gname, taxid, _, _) in enumerate(dataset["truth"]):
        assert per_read[f"rd{i}"] == str(taxid), (i, gname)
    xml = open(out).read()
    assert "<taxonomyID>562</taxonomyID>" in xml
    assert "<taxonomyID>1280</taxonomyID>" in xml
    assert "gene_GEN_A.1" in xml
    abbrev = open(out + "_abbreviated").read().strip().split("\n")
    assert len(abbrev) == 2
    total = sum(float(line.split("\t")[1]) for line in abbrev)
    # one read lost to the mirrored combineTaxonomies first-row quirk
    assert 90.0 <= total <= 100.0


def test_just_align_sam_run(dataset):
    root = dataset["root"]
    sam_path = str(root / "out.sam")
    rc = cli.main(["--db", dataset["db"], "--just-align",
                   "--sam-file", sam_path,
                   str(root / "r1.fq"), str(root / "r2.fq")])
    assert rc == 0
    lines = open(sam_path).read().rstrip("\n").split("\n")
    header = [l for l in lines if l.startswith("@")]
    body = [l for l in lines if not l.startswith("@")]
    assert header[0].startswith("@HD")
    assert any("SN:GEN_A.1" in l for l in header)
    assert len(body) == 40  # 20 pairs x 2 lines
    for line in body:
        fields = line.split("\t")
        assert len(fields) >= 11
        flag = int(fields[1])
        assert flag & 0x1  # paired
        if not flag & 0x4:
            assert fields[5].endswith("M") or "S" in fields[5]
            assert int(fields[3]) >= 1
    # primary lines first per read, MAPQ sane
    primaries = [l for l in body if not int(l.split("\t")[1]) & 0x100]
    assert len(primaries) == 40  # single best hit per read here


def test_sam_positions_match_truth(dataset):
    root = dataset["root"]
    sam_path = str(root / "out.sam")
    body = [l for l in open(sam_path) if not l.startswith("@")]
    by_read = {}
    for line in body:
        f = line.split("\t")
        flag = int(f[1])
        if flag & 0x4 or flag & 0x100:
            continue
        which = "r1" if flag & 0x40 else "r2"
        by_read[(f[0], which)] = (f[2], int(f[3]))
    for i, (gname, _, pos, insert) in enumerate(dataset["truth"]):
        rname, p1 = by_read[(f"rd{i}", "r1")]
        assert rname == gname
        assert p1 == pos + 1
        rname2, p2 = by_read[(f"rd{i}", "r2")]
        assert rname2 == gname
        assert p2 == pos + insert - 150 + 1


def test_num_reads_limit(dataset):
    root = dataset["root"]
    out = str(root / "limited")
    rc = cli.main(["--db", dataset["db"], "--output-file", out,
                   "--num-reads", "5",
                   str(root / "r1.fq"), str(root / "r2.fq")])
    assert rc == 0
    per_read = open(out + "_PerRead").read().strip().split("\n")
    assert len(per_read) == 5
