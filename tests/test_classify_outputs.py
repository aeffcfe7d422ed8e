"""Tests for taxon assignment, result combination, SAM and XML writers."""

import io

import numpy as np

from kslam_tpu.config import PipelineConfig
from kslam_tpu.db.genbank import Gene, GenbankEntry, GenbankIndex
from kslam_tpu.db.taxonomy import TaxonomyDB
from kslam_tpu.io import sam as sam_io
from kslam_tpu.io import xml_results
from kslam_tpu.io.fastq import ReadBatch
from kslam_tpu.pipeline import classify, pairing
from kslam_tpu.pipeline.pairing import AlignedOverlap, PairedOverlap, \
    ReadPairAlignments


def make_taxdb():
    db = TaxonomyDB()
    nodes = {1: (1, "no rank"), 131567: (1, "no rank"),
             2: (131567, "superkingdom"), 561: (2, "genus"),
             562: (561, "species"), 563: (561, "species")}
    names = {1: "root", 131567: "cellular organisms", 2: "Bacteria",
             561: "Escherichia", 562: "Escherichia coli",
             563: "Escherichia fergusonii"}
    for t, (p, r) in nodes.items():
        db.parent_of[t] = p
        db.rank_of[t] = r
        db.name_of[t] = names[t]
    return db


def make_index():
    return GenbankIndex([
        GenbankEntry(bases="ACGT" * 200, taxonomy_id=562, locus_tag="E1",
                     genes=[Gene(gene_name="gA", protein_id="PA.1",
                                 product="prod A", cds_start=0,
                                 cds_stop=400)]),
        GenbankEntry(bases="ACGT" * 200, taxonomy_id=563, locus_tag="E2"),
    ])


def half(read, entry, rb, score=300):
    o = AlignedOverlap(read, entry, rb, False, score, rb, rb + 149, 0, 149)
    return PairedOverlap(score, entry, rb, rb + 149, 0, o, None)


def test_result_lca_and_genes():
    index = make_index()
    taxdb = make_taxdb()
    rp = ReadPairAlignments(0, 10, [half(0, 0, 10), half(0, 1, 50)])
    res = classify.result_from_read_pair(rp, index, ["readA"], taxdb)
    assert res.taxonomy_id == 561  # LCA(562, 563)
    assert res.reads == ["readA"]
    assert [g.gene_name for g in res.genes] == ["gA"]


def test_combine_counts_and_zero_drop():
    r1 = classify.IdentifiedTaxonomy(0, ["unclassified"], [])
    g = Gene(gene_name="gA", protein_id="PA.1", product="prod A")
    r2 = classify.IdentifiedTaxonomy(562, ["a"], [Gene(**vars(g))])
    r3 = classify.IdentifiedTaxonomy(562, ["b"], [Gene(**vars(g))])
    r4 = classify.IdentifiedTaxonomy(563, ["c"], [])
    combined = classify.combine_taxonomies([r3, r1, r4, r2])
    by_tax = {c.taxonomy_id: c for c in combined}
    assert set(by_tax) == {562, 563}
    assert sorted(by_tax[562].reads) == ["a", "b"]
    assert by_tax[562].genes[0].count == 2


def test_combine_first_element_quirk():
    """No taxid-0 rows: the reference drops the first sorted row at the
    first transition (MetagenomicResults.h:159-170)."""
    rows = [classify.IdentifiedTaxonomy(5, [f"r{i}"], []) for i in range(2)]
    rows.append(classify.IdentifiedTaxonomy(7, ["r2"], []))
    combined = classify.combine_taxonomies(rows)
    by_tax = {c.taxonomy_id: len(c.reads) for c in combined}
    assert by_tax == {5: 1, 7: 1}  # one taxid-5 read lost, like the binary


def test_xml_output_format():
    taxdb = make_taxdb()
    entry = classify.IdentifiedTaxonomy(
        562, ["r<1>", "r&2"],
        [Gene(gene_name="gA", protein_id="PA.1", product='has "quotes"',
              locus_tag="L1", reference_sequence="E1", gene_id=7,
              cds_start=3, cds_stop=9, count=2)])
    xml = xml_results.taxon_xml(entry, 10, taxdb)
    assert '<abundance numReads="2">20.000000</abundance>' in xml
    assert "<taxonomyID>562</taxonomyID>" in xml
    assert "<name>Escherichia coli</name>" in xml
    assert 'product="has &quot;quotes&quot;"' in xml
    assert "<read>r&lt;1&gt;</read>" in xml
    assert "<read>r&amp;2</read>" in xml
    assert 'numReads="2" cdsStart="3" cdsEnd="9">gA</gene>' in xml


def test_sort_results_deterministic():
    rows = [classify.IdentifiedTaxonomy(9, ["b", "a"], []),
            classify.IdentifiedTaxonomy(3, ["z", "y"], []),
            classify.IdentifiedTaxonomy(5, ["c"], [])]
    xml_results.sort_results(rows)
    assert [r.taxonomy_id for r in rows] == [3, 9, 5]
    assert rows[0].reads == ["y", "z"]


def make_batch():
    names = ["r1a", "r2a"]
    bases = np.zeros((2, 160), np.uint8)
    qual = np.zeros((2, 160), np.uint8)
    seq = b"ACGT" * 38  # 152 -> use 150
    for i in range(2):
        bases[i, :150] = np.frombuffer(seq[:150], np.uint8)
        qual[i, :150] = ord("I")
    return ReadBatch(names, bases, np.array([150, 150], np.int32), qual,
                     paired=True)


def test_sam_md_nm_and_flags():
    config = PipelineConfig()
    config.report_cigar = True
    config.paired_data = True
    batch = make_batch()
    # entry bases equal the read except position 10 (mismatch)
    read = batch.base_string(0)
    entry_seq = read[:10] + ("A" if read[10] != "A" else "C") + read[11:]
    index = GenbankIndex([GenbankEntry(bases=entry_seq, taxonomy_id=562,
                                       locus_tag="E1")])
    o = AlignedOverlap(0, 0, 0, False, 295, 0, 149, 0, 149,
                       cigar=[(150, "M")])
    pair = PairedOverlap(295, 0, 0, 149, 0, o, None)
    rp = ReadPairAlignments(0, 1, [pair])
    out = io.StringIO()
    sam_io.write_sam_pairs(out, rp, batch, index, config)
    lines = out.getvalue().rstrip("\n").split("\n")
    assert len(lines) == 2  # R1 + unmapped R2 mirror
    f1 = lines[0].split("\t")
    assert f1[0] == "r1a"
    flag = int(f1[1])
    assert flag & 0x1 and flag & 0x40 and not (flag & 0x100)  # paired, first, primary
    assert flag & 0x8  # next segment unmapped
    assert f1[2] == "E1" and f1[3] == "1"
    assert f1[5] == "150M"
    assert "MD:Z:10A139" in lines[0]
    assert "NM:i:1" in lines[0]
    assert "AS:i:295" in lines[0]
    assert "XT:i:562" in lines[0]
    f2 = lines[1].split("\t")
    assert int(f2[1]) & 0x4  # unmapped
    assert len(f2) == 11  # unmapped line stops after qual column


def test_sam_rc_md_uses_revcomp_query():
    config = PipelineConfig()
    config.report_cigar = True
    config.paired_data = False
    batch = make_batch()
    from kslam_tpu.ops.encode import reverse_complement_str
    entry_seq = reverse_complement_str(batch.base_string(0))
    index = GenbankIndex([GenbankEntry(bases=entry_seq, locus_tag="E1")])
    o = AlignedOverlap(0, 0, 0, True, 300, 0, 149, 0, 149,
                       cigar=[(150, "M")])
    pair = PairedOverlap(300, 0, 0, 149, 0, o, None)
    rp = ReadPairAlignments(0, 0, [pair])
    out = io.StringIO()
    sam_io.write_sam_pairs(out, rp, batch, index, config)
    line = out.getvalue().rstrip("\n")
    assert "MD:Z:150" in line and "NM:i:0" in line
    flag = int(line.split("\t")[1])
    assert flag & 0x10          # reverse complemented
    assert not (flag & 0xC0)    # single end: neither first nor last


def test_sam_secondary_and_cap():
    config = PipelineConfig()
    config.paired_data = False
    config.num_sam_alignments = 2
    batch = make_batch()
    index = GenbankIndex([GenbankEntry(bases=batch.base_string(0),
                                       locus_tag=f"E{i}") for i in range(3)])
    pairs = []
    for i, score in enumerate((300, 290, 280)):
        o = AlignedOverlap(0, i, 0, False, score, 0, 149, 0, 149)
        pairs.append(PairedOverlap(score, i, 0, 149, 0, o, None))
    rp = ReadPairAlignments(0, 0, pairs)
    out = io.StringIO()
    sam_io.write_sam_pairs(out, rp, batch, index, config)
    lines = out.getvalue().rstrip("\n").split("\n")
    assert len(lines) == 2  # capped at num_sam_alignments
    assert not int(lines[0].split("\t")[1]) & 0x100
    assert int(lines[1].split("\t")[1]) & 0x100  # secondary
    assert "X0:i:2" in lines[0]  # hits counted among taken pairs


def test_sam_header():
    index = make_index()
    header = sam_io.sam_header(index, "SLAM --db X r.fq")
    lines = header.strip().split("\n")
    assert lines[0] == "@HD\tVN:1.0\tSO:unsorted"
    assert lines[1] == "@SQ\tSN:E1\tLN:800\tSP:562"
    assert lines[3] == '@PG\tID:SLAM\tPN:SLAM\tVN:1.0\tCL:"SLAM --db X r.fq"'


def test_sam_xs_truncates_to_uint16():
    """The reference stores XS in a uint16_t field (SAM.h:269), so a
    pseudo-assembly chain score past 65535 is truncated at emission
    (SAM.h:430-431).  Byte parity requires mirroring the wrap."""
    config = PipelineConfig()
    config.report_cigar = True
    config.paired_data = True
    batch = make_batch()
    entry_seq = batch.base_string(0)
    index = GenbankIndex([GenbankEntry(bases=entry_seq, taxonomy_id=562,
                                       locus_tag="E1")])
    o = AlignedOverlap(0, 0, 0, False, 295, 0, 149, 0, 149,
                       cigar=[(150, "M")])
    # chain-rescored combined score: 3 * 65536 + 4242
    pair = PairedOverlap(3 * 65536 + 4242, 0, 0, 149, 0, o, None)
    rp = ReadPairAlignments(0, 1, [pair])
    out = io.StringIO()
    sam_io.write_sam_pairs(out, rp, batch, index, config)
    line = out.getvalue().split("\n")[0]
    assert "XS:i:4242" in line, line
    assert "AS:i:295" in line
