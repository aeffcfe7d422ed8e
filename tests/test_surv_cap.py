"""Adaptive survivor-cap compaction of the phase-B columns.

enqueue_chunk_phase_b compacts the post-screen columns to the running
survivor cap before the chain labeling / finish sorts (the raw
chunk_cap width is sized off 2x the pairing emissions, most of which
the insert + score screens kill).  Exactness is guarded: the true valid
count crosses with the rescore fetch and a miss redoes the chains on
the retained full-width columns (_resolve_surv_cap).

These tests FORCE the cap to pathological values through a frozen hint
dict -- a tiny cap (every chunk misses -> full-width fallback) and a
mid cap (hit path) -- and require byte-identical outputs vs the
sequential unpipelined run.
"""

import pytest

from golden_ref import parity
from kslam_tpu import cli
from kslam_tpu.pipeline import run as run_mod


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("surv_cap")
    genomes = parity.make_genomes(4, 30_000, seed=15)
    taxa = {2: (1, "superkingdom", "Bacteria"),
            561: (2, "genus", "Escherichia"),
            562: (561, "species", "Escherichia coli"),
            563: (561, "species", "Escherichia fergusonii")}
    orgs = [(562, "Escherichia coli"), (563, "Escherichia fergusonii"),
            (562, "Escherichia coli"), (561, "Escherichia")]
    entries = [dict(locus=f"SC{i:04d}.1", gi=500 + i, taxid=orgs[i][0],
                    organism=orgs[i][1], seq=seq,
                    genes=[(j * 5000 + 101, j * 5000 + 2200,
                            f"gene{i}_{j}") for j in range(4)])
               for i, seq in enumerate(genomes)]
    gbff = str(root / "db.gbff")
    parity.write_gbff(gbff, entries)
    names, nodes = str(root / "names.dmp"), str(root / "nodes.dmp")
    parity.write_taxdump(names, nodes, taxa)
    r1, r2 = str(root / "r1.fq"), str(root / "r2.fq")
    parity.write_paired_reads(r1, r2, genomes, 600, seed=16)
    db = str(root / "DB")
    parity.build_our_db_from_gbff([gbff], names, nodes, db)
    return dict(db=db, r1=r1, r2=r2, root=str(root))


def _run(dataset, tag, extra=()):
    out = f"{dataset['root']}/res_{tag}"
    assert cli.main(["--db", dataset["db"], "--output-file", out,
                     "--num-reads-at-once", "256",
                     "--device-pipeline", "on", *extra,
                     dataset["r1"], dataset["r2"]]) == 0
    return out


def _forced_pipeline(forced_hints):
    class ForcedPipeline(run_mod.ChunkPipeline):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.hints.update(forced_hints)
    return ForcedPipeline


@pytest.mark.parametrize("cap", [64, 2048])
def test_forced_surv_cap_equals_sequential(dataset, monkeypatch, cap):
    base = _run(dataset, "seq", ["--no-chunk-overlap"])
    monkeypatch.setattr(
        run_mod, "ChunkPipeline",
        _forced_pipeline({"surv_cap": cap, "frozen": True}))
    forced = _run(dataset, f"cap{cap}")
    for suffix in ("", "_PerRead", "_abbreviated"):
        assert open(forced + suffix).read() == \
            open(base + suffix).read(), (cap, suffix)
