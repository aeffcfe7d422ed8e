"""GeneTable batched interval query == GenbankEntry.get_gene per row.

The table replaces classify's per-row Python scan over every gene of an
entry (the reference's getGene loop, GenbankTools.h:170-185) with a
vectorized candidate-window search; these property tests prove the
max-overlap / first-seen-tie semantics are preserved for sorted entries,
deeply nested gene clusters (slow-scan path), unsorted entries (exact
fallback), and gene-dense entries at real-GBFF densities.
"""

import numpy as np
import pytest

from kslam_tpu.db.genbank import Gene, GenbankEntry, GenbankIndex, GeneTable


def _entry(intervals, sort=True):
    genes = [Gene(gene_name=f"g{i}", cds_start=s, cds_stop=t)
             for i, (s, t) in enumerate(intervals)]
    if sort:
        genes.sort(key=lambda g: g.cds_start)
        for i, g in enumerate(genes):      # names track list order
            g.gene_name = f"g{i}"
    return GenbankEntry(genes=genes)


def _check(entries, queries):
    table = GeneTable(entries)
    e_ids = np.array([q[0] for q in queries])
    qs = np.array([q[1] for q in queries])
    qe = np.array([q[2] for q in queries])
    got = table.query(e_ids, qs, qe)
    for (ei, s, t), g in zip(queries, got):
        want = entries[ei].get_gene(s, t)
        assert (g is None) == (want is None), (ei, s, t, g, want)
        if g is not None:
            assert g is want, (ei, s, t, g.gene_name, want.gene_name)


def test_random_sorted_entries():
    rng = np.random.default_rng(0)
    entries = []
    for _ in range(20):
        n = int(rng.integers(0, 40))
        iv = []
        for _ in range(n):
            s = int(rng.integers(0, 5000))
            iv.append((s, s + int(rng.integers(1, 400))))
        entries.append(_entry(iv))
    queries = []
    for _ in range(500):
        ei = int(rng.integers(0, len(entries)))
        s = int(rng.integers(-100, 5200))
        queries.append((ei, s, s + int(rng.integers(1, 300))))
    _check(entries, queries)


def test_equal_overlap_keeps_first_in_list_order():
    # two genes with identical intervals: first in list order wins
    e = _entry([(10, 50), (10, 50), (30, 80)])
    table = GeneTable([e])
    (g,) = table.query([0], [12], [45])
    assert g is e.get_gene(12, 45)
    assert g is e.genes[0]


def test_nested_clusters_hit_slow_path():
    # > WIDTH genes all overlapping one window: candidate window wider
    # than the vector cap takes the exact scan branch
    iv = [(i, 1000 - i) for i in range(GeneTable.WIDTH + 9)]
    e = _entry(iv)
    _check([e], [(0, 400, 600), (0, 0, 5), (0, 990, 999), (0, -5, 2)])


def test_unsorted_entry_falls_back():
    genes = [Gene(gene_name="a", cds_start=500, cds_stop=900),
             Gene(gene_name="b", cds_start=100, cds_stop=600)]
    e = GenbankEntry(genes=genes)
    table = GeneTable([e])
    assert not table.sorted_entry[0]
    for q in [(50, 150), (550, 700), (850, 950), (901, 950)]:
        (g,) = table.query([0], [q[0]], [q[1]])
        assert g is e.get_gene(*q)


def test_zero_and_negative_coords():
    e = _entry([(0, 100), (90, 200)])
    _check([e], [(0, -50, -1), (0, -50, 1), (0, 0, 0), (0, 95, 96),
                 (0, 199, 300), (0, 200, 300)])


def test_entries_without_genes_mixed():
    entries = [_entry([]), _entry([(5, 25)]), _entry([])]
    _check(entries, [(0, 0, 10), (1, 0, 10), (2, 0, 10), (1, 30, 40)])


def test_gene_dense_entry_classify_speed():
    """Real-GBFF density smoke: 1 Mbp entry with ~1000 genes; the table
    answers 50k queries through the vector path (no per-gene scans)."""
    rng = np.random.default_rng(1)
    iv = []
    pos = 0
    for _ in range(1000):
        pos += int(rng.integers(50, 1000))
        iv.append((pos, pos + int(rng.integers(200, 1500))))
    e = _entry(iv)
    table = GeneTable([e])
    n = 50_000
    qs = rng.integers(0, pos, n)
    got = table.query(np.zeros(n, np.int64), qs, qs + 300)
    # spot-check a sample against the scan
    for i in rng.integers(0, n, 50):
        assert got[int(i)] is e.get_gene(int(qs[i]), int(qs[i]) + 300)


def test_index_gene_table_cached():
    gi = GenbankIndex([_entry([(1, 10)])])
    assert gi.gene_table is gi.gene_table
