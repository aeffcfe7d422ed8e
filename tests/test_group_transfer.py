"""Per-read (group-last) classification transfer on gene-less databases.

Gene-less DBs take the compacted (group, lca) transfer
(pipeline/device_path.classify_transfer_last) instead of the row-level
columns; results must equal both the sequential device path and the host
object pipeline on every output file.  Chunks are small so the pipelined
run crosses several adaptive-cap observations (first chunk = full-fetch
fallback, later chunks = compacted transfers).
"""

from golden_ref import parity
from kslam_tpu import cli


def test_geneless_columnar_equals_host(tmp_path):
    genomes = parity.make_genomes(4, 30_000, seed=5)
    taxa = {2: (1, "superkingdom", "Bacteria"),
            561: (2, "genus", "Escherichia"),
            562: (561, "species", "Escherichia coli"),
            563: (561, "species", "Escherichia fergusonii")}
    orgs = [(562, "Escherichia coli"), (563, "Escherichia fergusonii"),
            (562, "Escherichia coli"), (561, "Escherichia")]
    entries = [dict(locus=f"GL{i:04d}.1", gi=100 + i, taxid=orgs[i][0],
                    organism=orgs[i][1], seq=seq, genes=[])
               for i, seq in enumerate(genomes)]
    gbff = str(tmp_path / "db.gbff")
    parity.write_gbff(gbff, entries)
    names, nodes = str(tmp_path / "names.dmp"), str(tmp_path / "nodes.dmp")
    parity.write_taxdump(names, nodes, taxa)
    r1, r2 = str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq")
    parity.write_paired_reads(r1, r2, genomes, 600, seed=6)
    db = str(tmp_path / "DB")
    parity.build_our_db_from_gbff([gbff], names, nodes, db)

    outs = {}
    for tag, dev, extra in (("col", "on", []),
                            ("seq", "on", ["--no-chunk-overlap"]),
                            ("host", "off", [])):
        out = str(tmp_path / f"res_{tag}")
        assert cli.main(["--db", db, "--output-file", out,
                         "--num-reads-at-once", "256",
                         "--device-pipeline", dev, *extra, r1, r2]) == 0
        outs[tag] = out
    for suffix in ("", "_PerRead", "_abbreviated"):
        a = open(outs["col"] + suffix).read()
        assert a == open(outs["seq"] + suffix).read(), suffix
        assert a == open(outs["host"] + suffix).read(), suffix
