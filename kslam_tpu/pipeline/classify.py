"""Per-read taxon assignment + result combination (MetagenomicResults.h).

The per-read LCA over hit entries and the best-overlap gene query mirror
getResultFromPairedOverlaps (MetagenomicResults.h:88-111); combination per
taxonomyID mirrors combineTaxonomies (MetagenomicResults.h:117-176)
including the taxID-0 drop.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from ..db.genbank import Gene, GenbankIndex
from ..db.taxonomy import TaxonomyDB
from .pairing import ReadPairAlignments


@dataclasses.dataclass
class IdentifiedTaxonomy:
    """MetagenomicResults.h:32-42."""
    taxonomy_id: int = 0
    reads: List[str] = dataclasses.field(default_factory=list)
    genes: List[Gene] = dataclasses.field(default_factory=list)


def result_from_read_pair(read_pair: ReadPairAlignments,
                          index: GenbankIndex, read_names,
                          taxdb: TaxonomyDB) -> IdentifiedTaxonomy:
    """MetagenomicResults.h:88-111: collect hit-entry taxIDs + best genes,
    unique genes (fuzzy equality after geneSort), LCA the taxIDs."""
    result = IdentifiedTaxonomy()
    if not read_pair.pairs:
        return result
    entries = index.entries
    device_lca = getattr(read_pair, "device_lca", None)
    taxids = [] if device_lca is None else None
    for pair in read_pair.pairs:
        entry = entries[pair.entry_id]
        if taxids is not None:
            taxids.append(entry.taxonomy_id)
        if entry.genes:
            gene = entry.get_gene(pair.ref_start, pair.ref_end)
            if gene is not None:
                result.genes.append(dataclasses.replace(gene))
    if result.genes:
        result.genes.sort(key=lambda g: g.sort_key())
        unique: List[Gene] = []
        for gene in result.genes:  # std::unique: compare vs last kept
            if unique and unique[-1].same_gene(gene):
                continue
            unique.append(gene)
        result.genes = unique
    result.reads.append(read_names[read_pair.r1_pos])
    # the device pipeline already computed this read's LCA on chip
    # (ops/lca.py, proven equal to the host walk in tests); reuse it
    # instead of a second pointer-chase per read
    result.taxonomy_id = device_lca if device_lca is not None \
        else taxdb.lowest_common_ancestor(taxids)
    return result


def convert_alignments_to_taxonomies(
        reads_and_pairs: List[ReadPairAlignments], index: GenbankIndex,
        read_names, taxdb: TaxonomyDB) -> List[IdentifiedTaxonomy]:
    """MetagenomicResults.h:182-197 (the parallel transform, host-side)."""
    return [result_from_read_pair(rp, index, read_names, taxdb)
            for rp in reads_and_pairs]


def taxonomies_from_device(b, read_names, index: GenbankIndex
                           ) -> List[IdentifiedTaxonomy]:
    """Columnar taxonomy assignment straight from device phase-B columns.

    Replaces chunk_to_host_pairs + convert_alignments_to_taxonomies when
    no SAM output is requested: ONE device transfer of the surviving
    columns, one numpy group scan, and per-read work proportional to
    genes only -- no per-pair Python objects (those cost ~4x the device
    compute per chunk).  Identical results to the object path: rows
    arrive sorted by read group in the same within-group order the
    object path iterates, the per-read LCA is the device value the
    object path already uses, and gene lookup/fuzzy-unique runs the very
    same entry.get_gene / same_gene code per surviving row
    (MetagenomicResults.h:88-111 semantics; parity-tested end-to-end)."""
    import jax
    cols = b.cols
    valid, group, ent, rs, re_, lca = jax.device_get(
        (cols.valid, cols.group, cols.entry_id, cols.ref_start,
         cols.ref_end, b.read_lca))
    v = np.flatnonzero(valid)
    if not len(v):
        return []
    groups = group[v]
    ent, rs, re_, lca_v = ent[v], rs[v], re_[v], lca[v]
    starts = np.flatnonzero(
        np.concatenate([[True], groups[1:] != groups[:-1]]))
    ends = np.append(starts[1:], len(v))
    entries = index.entries
    entry_has_genes = np.fromiter((bool(e.genes) for e in entries),
                                  bool, len(entries))
    row_gene = entry_has_genes[np.clip(ent, 0, len(entries) - 1)]
    out = []
    for s, e in zip(starts, ends):
        result = IdentifiedTaxonomy()
        result.taxonomy_id = int(lca_v[s])
        if row_gene[s:e].any():
            for k in range(s, e):
                if row_gene[k]:
                    gene = entries[int(ent[k])].get_gene(int(rs[k]),
                                                         int(re_[k]))
                    if gene is not None:
                        result.genes.append(dataclasses.replace(gene))
            result.genes.sort(key=lambda g: g.sort_key())
            unique: List[Gene] = []
            for gene in result.genes:
                if unique and unique[-1].same_gene(gene):
                    continue
                unique.append(gene)
            result.genes = unique
        result.reads.append(read_names[int(groups[s])])
        out.append(result)
    return out


def _combine_range(group: List[IdentifiedTaxonomy]) -> IdentifiedTaxonomy:
    """combineRangeOfIdentifiedTaxonomy (MetagenomicResults.h:117-143):
    concatenate, sort genes, manual unique incrementing count by one per
    duplicate element."""
    combined = IdentifiedTaxonomy(group[0].taxonomy_id,
                                  list(group[0].reads),
                                  [dataclasses.replace(g)
                                   for g in group[0].genes])
    for tax in group[1:]:
        combined.genes.extend(dataclasses.replace(g) for g in tax.genes)
        combined.reads.extend(tax.reads)
    combined.genes.sort(key=lambda g: g.sort_key())
    out: List[Gene] = []
    for gene in combined.genes:
        if out and out[-1].same_gene(gene):
            out[-1].count += 1
        else:
            out.append(gene)
    combined.genes = out
    return combined


def combine_taxonomies(
        results: List[IdentifiedTaxonomy]) -> List[IdentifiedTaxonomy]:
    """combineTaxonomies (MetagenomicResults.h:149-176), mirrored exactly:
    taxID-0 groups (reads with no LCA) are dropped, and -- a reference quirk
    we preserve for parity -- when the sorted results do NOT start with a
    taxID-0 run, the very first row is lost at the first group transition
    (testTaxID starts at 0 and `start` is advanced without flushing,
    MetagenomicResults.h:159-170).

    The reference sort is __gnu_parallel::sort, which is UNSTABLE: which
    row among the smallest-taxID ties lands first (and is lost) depends on
    libstdc++ internals.  When the native helper (csrc/ref_sort.cc) is
    available we replay the exact permutation; otherwise a stable sort is
    used, which can differ from the reference binary in the single lost
    row (only its reads/genes vanish from the XML; PerRead/abbreviated
    outputs are unaffected because they are written pre-combine or count
    at taxon granularity)."""
    from ..io import native
    perm = native.ref_sort_perm(
        np.asarray([r.taxonomy_id for r in results], dtype=np.uint32)) \
        if results else None
    if perm is not None:
        results = [results[i] for i in perm]
    else:
        results = sorted(results, key=lambda r: r.taxonomy_id)
    combined: List[IdentifiedTaxonomy] = []
    if not results:
        return combined
    test_taxid = 0
    start = 0
    for i in range(1, len(results)):
        if results[i].taxonomy_id != test_taxid:
            if test_taxid != 0:
                combined.append(_combine_range(results[start:i]))
            test_taxid = results[i].taxonomy_id
            start = i
    if start < len(results) and results[start].taxonomy_id != 0:
        combined.append(_combine_range(results[start:]))
    return combined
