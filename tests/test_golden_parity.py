"""Golden parity: byte-diff our outputs against the actual reference binary.

The reference k-SLAM binary is compiled from /root/reference (with minimal
boost stand-ins, golden_ref/boost_stub) and both tools are run on the same
flat fixtures:

  config[0]-shaped: --just-align, single-end reads vs a 5-genome FASTA DB,
    SAM byte-diffed modulo the @PG line (it embeds each tool's own argv).
  config[1]-shaped: paired-end reads vs a GBFF DB + taxdump, full pipeline;
    XML + PerRead + abbreviated outputs byte-diffed.

Skips when the reference tree or a C++ toolchain is unavailable.  Larger
BASELINE-scale runs live in golden_ref/run_parity.py which writes
golden_ref/PARITY_REPORT.md.
"""

import os

import pytest

from golden_ref import parity
from golden_ref.build import build_reference_binary


@pytest.fixture(scope="session")
def slam_ref():
    binary = build_reference_binary()
    if binary is None:
        pytest.skip("reference binary not buildable here")
    return binary


@pytest.fixture(scope="session")
def config0(tmp_path_factory, slam_ref):
    from kslam_tpu import cli
    root = tmp_path_factory.mktemp("golden_cfg0")
    fasta = str(root / "genomes.fa")
    reads = str(root / "reads.fq")
    genomes = parity.make_genomes(5, 20000, seed=11)
    parity.write_fasta(fasta, genomes, [f"SYN{i:03d}.1" for i in range(5)])
    parity.write_single_end_reads(reads, genomes, 800, seed=5)

    ref_cwd = str(root / "refrun")
    os.makedirs(ref_cwd)
    ref_db = str(root / "db_ref")
    parity.build_ref_db_from_fasta(slam_ref, fasta, ref_db, ref_cwd)
    ref_sam = str(root / "ref.sam")
    parity.run_ref(slam_ref, ["--db", ref_db, "--just-align",
                              "--sam-file", ref_sam, reads], ref_cwd)

    our_db = str(root / "db_tpu")
    parity.build_our_db_from_fasta(fasta, our_db)
    our_sam = str(root / "tpu.sam")
    rcode = cli.main(["--db", our_db, "--just-align",
                      "--sam-file", our_sam, reads])
    assert rcode == 0
    return dict(ref_sam=ref_sam, our_sam=our_sam)


def test_config0_sam_parity(config0):
    ref = parity.normalize_sam(config0["ref_sam"])
    ours = parity.normalize_sam(config0["our_sam"])
    diffs = parity.diff_lines(ref, ours)
    assert not diffs, "SAM mismatch vs reference binary:\n" + "\n".join(diffs)


@pytest.fixture(scope="session")
def config1(tmp_path_factory, slam_ref):
    from kslam_tpu import cli
    root = tmp_path_factory.mktemp("golden_cfg1")
    rng_genomes = parity.make_genomes(3, 12000, seed=21)
    entries = []
    taxa = {
        2: (1, "superkingdom", "Bacteria"),
        561: (2, "genus", "Escherichia"),
        562: (561, "species", "Escherichia coli"),
        1279: (2, "genus", "Staphylococcus"),
        1280: (1279, "species", "Staphylococcus aureus"),
        1311: (2, "species", "Streptococcus agalactiae"),
    }
    organisms = [(562, "Escherichia coli"),
                 (1280, "Staphylococcus aureus"),
                 (1311, "Streptococcus agalactiae")]
    for i, seq in enumerate(rng_genomes):
        taxid, organism = organisms[i]
        genes = [(j * 3000 + 101, j * 3000 + 1600, f"gene{i}{j}")
                 for j in range(3)]
        entries.append(dict(locus=f"GB{i:04d}.1", gi=10000 + i, taxid=taxid,
                            organism=organism, seq=seq, genes=genes))
    gbff = str(root / "db.gbff")
    parity.write_gbff(gbff, entries)
    names_dmp = str(root / "names.dmp")
    nodes_dmp = str(root / "nodes.dmp")
    parity.write_taxdump(names_dmp, nodes_dmp, taxa)
    r1 = str(root / "r1.fq")
    r2 = str(root / "r2.fq")
    parity.write_paired_reads(r1, r2, rng_genomes, 400, seed=6)

    ref_cwd = str(root / "refrun")
    os.makedirs(ref_cwd)
    ref_db = str(root / "db_ref")
    parity.build_ref_db_from_gbff(slam_ref, [gbff], names_dmp, nodes_dmp,
                                  ref_db, ref_cwd)
    ref_out = str(root / "ref_results")
    ref_sam = str(root / "ref.sam")
    parity.run_ref(slam_ref, ["--db", ref_db, "--output-file", ref_out,
                              "--sam-file", ref_sam, r1, r2], ref_cwd)

    our_db = str(root / "db_tpu")
    parity.build_our_db_from_gbff([gbff], names_dmp, nodes_dmp, our_db)
    our_out = str(root / "tpu_results")
    our_sam = str(root / "tpu.sam")
    rcode = cli.main(["--db", our_db, "--output-file", our_out,
                      "--sam-file", our_sam, r1, r2])
    assert rcode == 0
    return dict(ref_out=ref_out, our_out=our_out,
                ref_sam=ref_sam, our_sam=our_sam)


def test_config1_xml_parity(config1):
    ref = parity.read_lines(config1["ref_out"])
    ours = parity.read_lines(config1["our_out"])
    diffs = parity.diff_lines(ref, ours)
    assert not diffs, "XML mismatch vs reference binary:\n" + "\n".join(diffs)


def test_config1_per_read_parity(config1):
    ref = parity.read_lines(config1["ref_out"] + "_PerRead")
    ours = parity.read_lines(config1["our_out"] + "_PerRead")
    diffs = parity.diff_lines(ref, ours)
    assert not diffs, \
        "PerRead mismatch vs reference binary:\n" + "\n".join(diffs)


def test_config1_abbreviated_parity(config1):
    ref = parity.read_lines(config1["ref_out"] + "_abbreviated")
    ours = parity.read_lines(config1["our_out"] + "_abbreviated")
    diffs = parity.diff_lines(ref, ours)
    assert not diffs, \
        "abbreviated mismatch vs reference binary:\n" + "\n".join(diffs)


def test_config1_sam_parity(config1):
    ref = parity.normalize_sam(config1["ref_sam"])
    ours = parity.normalize_sam(config1["our_sam"])
    diffs = parity.diff_lines(ref, ours)
    assert not diffs, \
        "paired SAM mismatch vs reference binary:\n" + "\n".join(diffs)
