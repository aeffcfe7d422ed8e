"""Result outputs: per-taxon XML, per-read TSV, abbreviated TSV.

Byte-parity mirror of MetagenomicResults.h:213-369:
  * deterministic result sort (reads desc, taxID asc; genes by count desc,
    then CDS start, then locus tag; reads lexicographic),
  * XML escaping of <>&'\" only,
  * abundance printed like C++ std::to_string(double) (fixed 6 decimals)
    in the XML and like operator<< (6 significant digits) in the
    abbreviated file.
"""

from __future__ import annotations

from typing import List

from ..db.taxonomy import TaxonomyDB
from ..pipeline.classify import ChunkTaxa, IdentifiedTaxonomy


def _escape(text: str) -> str:
    """correctXML (MetagenomicResults.h:276-301)."""
    out = []
    for c in text:
        if c == "<":
            out.append("&lt;")
        elif c == ">":
            out.append("&gt;")
        elif c == "&":
            out.append("&amp;")
        elif c == "'":
            out.append("&apos;")
        elif c == '"':
            out.append("&quot;")
        else:
            out.append(c)
    return "".join(out)


def _cpp_to_string(x: float) -> str:
    """std::to_string(double): fixed, 6 decimals."""
    return f"{x:.6f}"


def _cpp_stream_double(x: float) -> str:
    """ostream default formatting: 6 significant digits."""
    return f"{x:.6g}"


def sort_results(results: List[IdentifiedTaxonomy]) -> None:
    """sortResults (MetagenomicResults.h:254-275)."""
    results.sort(key=lambda r: (-len(r.reads), r.taxonomy_id))
    for result in results:
        result.reads.sort()
        result.genes.sort(key=lambda g: (-g.count, g.cds_start, g.locus_tag))


def gene_xml(gene) -> str:
    """getXML(Gene) (MetagenomicResults.h:302-324)."""
    return (
        '    <gene protein="' + _escape(gene.protein_id) +
        '" locus="' + _escape(gene.locus_tag) +
        '" product="' + _escape(gene.product) +
        '" GeneID="' + str(gene.gene_id) +
        '" reference="' + _escape(gene.reference_sequence) +
        '" numReads="' + str(gene.count) +
        '" cdsStart="' + str(gene.cds_start) +
        '" cdsEnd="' + str(gene.cds_stop) +
        '">' + _escape(gene.gene_name) + "</gene>"
    )


def taxon_xml(entry: IdentifiedTaxonomy, total_reads: int,
              taxdb: TaxonomyDB) -> str:
    """getXML(IdentifiedTaxonomy) (MetagenomicResults.h:326-369)."""
    num = len(entry.reads)
    parts = [
        "<taxon>\n",
        '  <abundance numReads="' + str(num) + '">' +
        _cpp_to_string(num * 100.0 / total_reads) + "</abundance>\n",
        "  <taxonomyID>" + str(entry.taxonomy_id) + "</taxonomyID>\n",
        "  <lineage>" + _escape(taxdb.get_lineage(entry.taxonomy_id)) +
        "</lineage>\n",
        "  <name>" + _escape(taxdb.get_name(entry.taxonomy_id)) +
        "</name>\n",
        "  <genes>\n",
    ]
    for gene in entry.genes:
        parts.append(gene_xml(gene) + "\n")
    parts.append("  </genes>\n")
    parts.append("  <reads>\n")
    for read in entry.reads:
        parts.append("    <read>" + _escape(read) + "</read>\n")
    parts.append("  </reads>\n")
    parts.append("</taxon>\n")
    return "".join(parts)


def write_results(results: List[IdentifiedTaxonomy], out,
                  taxdb: TaxonomyDB, num_reads: int) -> None:
    """writeResults (MetagenomicResults.h:213-226)."""
    sort_results(results)
    for result in results:
        out.write(taxon_xml(result, num_reads, taxdb))


def write_per_read_results(results, out) -> None:
    """writePerReadResults (ostream overload, MetagenomicResults.h:455-463):
    first read name of each per-read result + taxID.  Accepts a mix of
    IdentifiedTaxonomy objects and columnar ChunkTaxa blocks."""
    for result in results:
        if isinstance(result, ChunkTaxa):
            out.write("".join(
                f"{n}\t{t}\n" for n, t in zip(result.names,
                                              result.taxids.tolist())))
        elif result.reads:
            out.write(f"{result.reads[0]}\t{result.taxonomy_id}\n")


def write_abbreviated_results(results: List[IdentifiedTaxonomy], path: str,
                              taxdb: TaxonomyDB, num_reads: int) -> None:
    """writeAbbreviatedResultsFile (MetagenomicResults.h:237-249)."""
    with open(path, "w") as out:
        sort_results(results)
        for result in results:
            pct = _cpp_stream_double(len(result.reads) * 100.0 / num_reads)
            out.write(f"{taxdb.get_name(result.taxonomy_id)}\t{pct}\n")
