import io

import numpy as np
import pytest

from kslam_tpu.io import fastq
from kslam_tpu.db import genbank, taxonomy

FASTQ1 = """@read1 extra stuff
ACGTACGT
+
IIIIIIII
@read2/1
ACGTACGTACGT
+
IIIIIIIIIIII
"""

FASTQ2 = """@read1 extra stuff
TTTTACGT
+
IIIIIIII
@read2/2
ACGTACGTACGT
+
IIIIIIIIIIII
"""


def test_identifier_cleanup():
    assert fastq._clean_identifier("@read1 extra") == "read1"
    assert fastq._clean_identifier("@read2/1") == "read2"
    assert fastq._clean_identifier("@r") == "r"
    assert fastq._clean_identifier("@") == ""


def test_single_end_batch():
    batch = fastq.read_batch_from_handles(io.StringIO(FASTQ1), None, 10)
    assert batch.names == ["read1", "read2"]
    assert not batch.paired
    assert batch.base_string(0) == "ACGTACGT"
    assert batch.base_string(1) == "ACGTACGTACGT"
    assert list(batch.lengths) == [8, 12]


def test_paired_batch_layout():
    batch = fastq.read_batch_from_handles(
        io.StringIO(FASTQ1), io.StringIO(FASTQ2), 10)
    assert batch.paired
    assert batch.num_reads == 4
    assert batch.midpoint == 2
    # R1 block then R2 block (FASTQsequence.h:110-123)
    assert batch.base_string(2) == "TTTTACGT"
    assert batch.names[2] == "read1"


def test_paired_mismatch_raises():
    short = "@only1\nACGT\n+\nIIII\n"
    with pytest.raises(RuntimeError):
        fastq.read_batch_from_handles(
            io.StringIO(FASTQ1), io.StringIO(short), 10)


def test_chunked_limit():
    batch = fastq.read_batch_from_handles(io.StringIO(FASTQ1), None, 1)
    assert batch.num_reads == 1


FASTA = """>chr1 some description
ACGTACGTAC
gtacgt
>chr2
TTTT
"""


def test_fasta_parser(tmp_path):
    path = tmp_path / "db.fa"
    path.write_text(FASTA)
    index = genbank.index_from_fasta([str(path)])
    assert len(index.entries) == 2
    assert index.entries[0].locus_tag == "chr1"
    assert index.entries[0].bases == "ACGTACGTACGTACGT"  # uppercased
    assert index.entries[1].locus_tag == "chr2"
    assert index.entries[1].taxonomy_id == 0


def test_genbank_index_roundtrip(tmp_path):
    index = genbank.GenbankIndex([
        genbank.GenbankEntry(bases="ACGTACGT", taxonomy_id=562,
                             locus_tag="E1",
                             genes=[genbank.Gene(gene_name="gA", cds_start=1,
                                                 cds_stop=6)]),
        genbank.GenbankEntry(bases="TTTTCCCC", taxonomy_id=100, locus_tag="E2"),
    ])
    index.save(str(tmp_path / "db"))
    loaded = genbank.GenbankIndex.load(str(tmp_path / "db"))
    assert [e.bases for e in loaded.entries] == ["ACGTACGT", "TTTTCCCC"]
    assert loaded.entries[0].genes[0].gene_name == "gA"
    assert loaded.entries[0].taxonomy_id == 562
    np.testing.assert_array_equal(loaded.entry_offsets, [0, 8, 16])


GBFF = """LOCUS       TEST001                 40 bp    DNA     linear   BCT
DEFINITION  Escherichia coli test entry.
VERSION     TEST001.1  GI:12345
FEATURES             Location/Qualifiers
     source          1..40
                     /organism="Escherichia coli"
                     /db_xref="taxon:562"
     gene            5..20
                     /gene="thrA"
                     /locus_tag="b0001"
     CDS             5..20
                     /gene="thrA"
                     /locus_tag="b0001"
                     /product="threonine synthase"
                     /protein_id="AAA111.1"
                     /db_xref="GeneID:944742"
ORIGIN
        1 acgtacgtac gtacgtacgt acgtacgtac gtacgtacgt
//
"""


def test_gbff_parser(tmp_path):
    path = tmp_path / "test.gbff"
    path.write_text(GBFF)
    index = genbank.index_from_gbff([str(path)])
    assert len(index.entries) == 1
    e = index.entries[0]
    assert e.locus_tag == "TEST001.1"
    assert e.genbank_id == 12345
    assert e.taxonomy_id == 562
    assert e.definition == "Escherichia coli test entry."
    assert e.bases == "ACGT" * 10
    # gene + CDS dedup at equal start keeps the longer protein_id (the CDS)
    assert len(e.genes) == 1
    g = e.genes[0]
    assert g.gene_name == "thrA"
    assert g.protein_id == "AAA111.1"
    assert g.product == "threonine synthase"
    assert g.gene_id == 944742
    assert g.cds_start == 5 and g.cds_stop == 20
    assert g.reference_sequence == "TEST001.1"


def test_get_gene_largest_overlap():
    e = genbank.GenbankEntry(genes=[
        genbank.Gene(gene_name="g1", cds_start=0, cds_stop=10),
        genbank.Gene(gene_name="g2", cds_start=8, cds_stop=30),
    ])
    assert e.get_gene(0, 9).gene_name == "g1"
    assert e.get_gene(9, 29).gene_name == "g2"
    assert e.get_gene(100, 120) is None


NODES = """1\t|\t1\t|\tno rank\t|
131567\t|\t1\t|\tno rank\t|
2\t|\t131567\t|\tsuperkingdom\t|
1224\t|\t2\t|\tphylum\t|
1236\t|\t1224\t|\tclass\t|
91347\t|\t1236\t|\torder\t|
543\t|\t91347\t|\tfamily\t|
561\t|\t543\t|\tgenus\t|
562\t|\t561\t|\tspecies\t|
83333\t|\t562\t|\tstrain\t|
620\t|\t543\t|\tgenus\t|
622\t|\t620\t|\tspecies\t|
"""

NAMES = """1\t|\troot\t|\t\t|\tscientific name\t|
131567\t|\tcellular organisms\t|\t\t|\tscientific name\t|
2\t|\tBacteria\t|\t\t|\tscientific name\t|
1224\t|\tProteobacteria\t|\t\t|\tscientific name\t|
1236\t|\tGammaproteobacteria\t|\t\t|\tscientific name\t|
91347\t|\tEnterobacterales\t|\t\t|\tscientific name\t|
543\t|\tEnterobacteriaceae\t|\t\t|\tscientific name\t|
561\t|\tEscherichia\t|\t\t|\tscientific name\t|
562\t|\tEscherichia coli\t|\t\t|\tscientific name\t|
83333\t|\tEscherichia coli K-12\t|\t\t|\tscientific name\t|
620\t|\tShigella\t|\t\t|\tscientific name\t|
622\t|\tShigella dysenteriae\t|\t\t|\tscientific name\t|
"""


@pytest.fixture
def taxdb(tmp_path):
    names = tmp_path / "names.dmp"
    nodes = tmp_path / "nodes.dmp"
    names.write_text(NAMES)
    nodes.write_text(NODES)
    return taxonomy.TaxonomyDB.from_dumps(str(names), str(nodes))


def test_taxonomy_parse_and_roundtrip(taxdb, tmp_path):
    assert taxdb.get_name(562) == "Escherichia coli"
    assert taxdb.get_rank(561) == "genus"
    path = tmp_path / "taxDB"
    taxdb.write_index(str(path))
    loaded = taxonomy.TaxonomyDB.read_index(str(path))
    assert loaded.get_name(562) == "Escherichia coli"
    assert loaded.get_parent(562) == 561


def test_parent_root_cut(taxdb):
    # TaxonomyDatabase.h:225-231: parent==1 -> 0
    assert taxdb.get_parent(131567) == 0
    assert taxdb.get_parent(2) == 131567
    assert taxdb.get_parent(99999) == 0  # unknown


def test_lca(taxdb):
    assert taxdb.lowest_common_ancestor([562]) == 562
    assert taxdb.lowest_common_ancestor([562, 83333]) == 562
    assert taxdb.lowest_common_ancestor([562, 622]) == 543
    assert taxdb.lowest_common_ancestor([562, 2]) == 2
    assert taxdb.lowest_common_ancestor([]) == 0
    # taxid 0 has an empty path -> consensus 0 (drops the read)
    assert taxdb.lowest_common_ancestor([562, 0]) == 0


def test_lineage(taxdb):
    # The reference clears the accumulated string whenever it passes a
    # species node (TaxonomyDatabase.h:256), so the reported lineage is the
    # above-species ancestry only, and skips 131567 "cellular organisms".
    above_species = ("Bacteria; Proteobacteria; Gammaproteobacteria; "
                     "Enterobacterales; Enterobacteriaceae; Escherichia.")
    assert taxdb.get_lineage(83333) == above_species
    assert taxdb.get_lineage(562) == above_species
    genus = taxdb.get_lineage(561)
    assert genus == above_species
    assert "cellular organisms" not in genus


def test_metaphlan_lineage(taxdb):
    line = taxdb.get_metaphlan_lineage(562)
    assert line == ("k__Bacteria|p__Proteobacteria|c__Gammaproteobacteria"
                    "|o__Enterobacterales|f__Enterobacteriaceae"
                    "|g__Escherichia|s__Escherichia_coli")


def test_rank_queries(taxdb):
    assert taxdb.get_taxid_at_rank(83333, "genus") == 561
    assert taxdb.is_sub_species(83333)
    assert not taxdb.is_sub_species(562)


def test_dense_tables(taxdb):
    taxids, parent_idx, depth = taxdb.build_tables()
    pos = {int(t): i for i, t in enumerate(taxids)}
    assert parent_idx[pos[562]] == pos[561]
    # 131567's parent is the cut root
    assert parent_idx[pos[131567]] == -1
    assert depth[pos[131567]] == 0
    assert depth[pos[562]] == depth[pos[561]] + 1
