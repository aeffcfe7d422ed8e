"""Realistic-sequence fixture: adversarial statistics end-to-end.

Live NCBI data is unreachable here (zero egress), so kslam_tpu.eval.
realistic generates genomes reproducing real GenBank failure modes --
shared rRNA operons, IS-element families, low-complexity tracts, shared
plasmids, dense genes (VERDICT r3 missing #1).  These tests prove:

  * the k-mer pileup distribution is actually skewed (the fixture works),
  * the prefix table still addresses the skewed index, and the
    pathological-fallback path WARNS instead of silently degrading,
  * device pipeline == host pipeline on this data, including when tiny
    caps force the emit-all overflow retry,
  * golden byte-parity vs the compiled reference binary on a realistic
    gene-dense GBFF database,
  * classification gene assignment stays correct at real gene density.
"""

import os

import numpy as np
import pytest

from golden_ref import parity
from kslam_tpu.db.kmer_index import KmerIndex
from kslam_tpu.db.genbank import GenbankIndex, index_from_gbff
from kslam_tpu.eval import realistic


@pytest.fixture(scope="module")
def entries():
    # small but repeat-rich: 3 chromosomes + 2 plasmid entries
    return realistic.make_realistic_entries(n_genomes=3, bp_each=120_000,
                                            seed=7, plasmid_bp=12_000)


@pytest.fixture(scope="module")
def gindex(entries):
    gi = GenbankIndex()
    from kslam_tpu.db.genbank import GenbankEntry
    for e in entries:
        gi.entries.append(GenbankEntry(bases=e.seq.tobytes().decode(),
                                       taxonomy_id=e.taxid,
                                       locus_tag=e.locus))
    return gi


@pytest.fixture(scope="module")
def kidx(gindex):
    return KmerIndex.build(gindex)


def test_pileup_skew_present(kidx):
    st = realistic.pileup_stats(np.asarray(kidx.kmers))
    # uniform-random data has pileup_max ~= 2; shared operons + IS
    # elements across 3 genomes + plasmids must push far beyond that
    assert st["pileup_max"] >= 8, st
    assert st["pileup_mean"] < 2.0, st  # background still dominates
    assert st["prefix_run_max"] >= st["pileup_max"]


def test_prefix_table_handles_skew(kidx):
    """Heavy-tail runs no longer disable the table: the partial table
    covers >= 99.9% of runs; the tail goes through the exact retry."""
    pstart, bits, window = kidx.prefix_table()
    assert bits > 0 and pstart is not None
    runs = np.diff(pstart.astype(np.int64))
    occ = runs[runs > 0]
    assert float(np.mean(occ <= window)) >= 0.999
    # the tail genuinely exceeds the window on this fixture (else this
    # test is not exercising the partial path at all)
    st = realistic.pileup_stats(np.asarray(kidx.kmers), prefix_bits=bits)
    assert st["prefix_run_max"] > window


def test_prefix_table_pathological_warns(kidx, capsys):
    pstart, bits, window = kidx.prefix_table(max_window=1, max_bits=10)
    assert pstart is None and bits == 0
    err = capsys.readouterr().err
    assert "WARNING: longest k-mer prefix run exceeds" in err


def _plant_reads(entries, n_pairs, seed, from_repeats=False):
    """Paired 120bp reads; from_repeats=True draws half from the first
    entry's densest repeat (positions shared across genomes)."""
    rng = np.random.default_rng(seed)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    r1l, r2l = [], []
    for i in range(n_pairs):
        e = entries[int(rng.integers(0, len(entries)))]
        s = e.seq.tobytes().decode()
        pos = int(rng.integers(0, len(s) - 400))
        frag = s[pos:pos + int(rng.integers(260, 400))]
        r1 = frag[:120]
        r2 = frag[-120:].encode().translate(comp)[::-1].decode()
        r1l.append(f"@p{i}\n{r1}\n+\n{'I' * 120}\n")
        r2l.append(f"@p{i}\n{r2}\n+\n{'I' * 120}\n")
    return "".join(r1l), "".join(r2l)


@pytest.fixture(scope="module")
def db_dir(tmp_path_factory, entries):
    root = tmp_path_factory.mktemp("realistic")
    gbff = str(root / "db.gbff")
    parity.write_gbff(gbff, realistic.entries_to_gbff_dicts(entries))
    names = str(root / "names.dmp")
    nodes = str(root / "nodes.dmp")
    parity.write_taxdump(names, nodes, realistic.realistic_taxa(entries))
    db = str(root / "DB")
    parity.build_our_db_from_gbff([gbff], names, nodes, db)
    return dict(root=str(root), gbff=gbff, names=names, nodes=nodes, db=db)


def test_gbff_gene_density(db_dir):
    gi = GenbankIndex.load(db_dir["db"])
    per_kbp = [len(e.genes) / (len(e.bases) / 1000.0) for e in gi.entries]
    assert all(0.3 < d < 2.0 for d in per_kbp), per_kbp


def test_device_equals_host_on_realistic(db_dir, tmp_path):
    from kslam_tpu import cli
    root = db_dir["root"]
    gi = GenbankIndex.load(db_dir["db"])

    class E:
        pass

    ents = []
    for e in gi.entries:
        x = E()
        x.seq = np.frombuffer(e.bases.encode(), np.uint8)
        ents.append(x)
    r1, r2 = _plant_reads(ents, 160, seed=3)
    r1p, r2p = str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq")
    open(r1p, "w").write(r1)
    open(r2p, "w").write(r2)
    outs = {}
    for mode in ("on", "off"):
        out = str(tmp_path / f"out_{mode}")
        rc = cli.main(["--db", db_dir["db"], "--output-file", out,
                       "--device-pipeline", mode, r1p, r2p])
        assert rc == 0
        outs[mode] = (open(out).read(), open(out + "_PerRead").read())
    assert outs["on"] == outs["off"]


def test_overflow_retry_on_repeats(db_dir, tmp_path, capsys):
    """Tiny caps force the emit-all retry on repeat-dense reads; results
    must equal the default-caps run (the reference emits every pileup
    pair, Overlap.h:153-199)."""
    from kslam_tpu.config import PipelineConfig
    from kslam_tpu.pipeline.run import metagenomic_analysis
    gi = GenbankIndex.load(db_dir["db"])

    class E:
        pass

    ents = []
    for e in gi.entries:
        x = E()
        x.seq = np.frombuffer(e.bases.encode(), np.uint8)
        ents.append(x)
    r1, r2 = _plant_reads(ents, 96, seed=4)
    r1p, r2p = str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq")
    open(r1p, "w").write(r1)
    open(r2p, "w").write(r2)

    def run(tag, **kw):
        cfg = PipelineConfig(**kw)
        cfg.device_pipeline = "on"
        out = str(tmp_path / f"o_{tag}")
        metagenomic_analysis(r1p, r2p, db_dir["db"], out, "", cfg)
        return open(out).read(), open(out + "_PerRead").read()

    base = run("base")
    capsys.readouterr()
    tiny = run("tiny", max_matches_per_kmer=2, max_pairs_per_batch=4096)
    err = capsys.readouterr().err
    assert "match overflow" in err, "tiny caps did not trigger the retry"
    assert tiny == base


@pytest.fixture(scope="session")
def slam_ref():
    from golden_ref.build import build_reference_binary
    binary = build_reference_binary()
    if binary is None:
        pytest.skip("reference binary not buildable here")
    return binary


def test_golden_parity_realistic(db_dir, slam_ref, tmp_path):
    """Full-output byte parity vs the reference binary on the realistic
    gene-dense GBFF database."""
    from kslam_tpu import cli
    gi = GenbankIndex.load(db_dir["db"])

    class E:
        pass

    ents = []
    for e in gi.entries:
        x = E()
        x.seq = np.frombuffer(e.bases.encode(), np.uint8)
        ents.append(x)
    r1, r2 = _plant_reads(ents, 120, seed=9)
    r1p, r2p = str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq")
    open(r1p, "w").write(r1)
    open(r2p, "w").write(r2)

    ref_cwd = str(tmp_path / "refrun")
    os.makedirs(ref_cwd)
    ref_db = str(tmp_path / "db_ref")
    parity.build_ref_db_from_gbff(slam_ref, [db_dir["gbff"]],
                                  db_dir["names"], db_dir["nodes"],
                                  ref_db, ref_cwd)
    ref_out = str(tmp_path / "ref_results")
    ref_sam = str(tmp_path / "ref.sam")
    parity.run_ref(slam_ref, ["--db", ref_db, "--output-file", ref_out,
                              "--sam-file", ref_sam, r1p, r2p], ref_cwd)

    our_out = str(tmp_path / "tpu_results")
    our_sam = str(tmp_path / "tpu.sam")
    rc = cli.main(["--db", db_dir["db"], "--output-file", our_out,
                   "--sam-file", our_sam, r1p, r2p])
    assert rc == 0
    for suffix in ("", "_PerRead", "_abbreviated"):
        diffs = parity.diff_lines(parity.read_lines(ref_out + suffix),
                                  parity.read_lines(our_out + suffix))
        assert not diffs, f"{suffix or 'XML'} mismatch:\n" + \
            "\n".join(diffs[:40])
    # SAM: byte-exact for reads with a unique best placement.  Reads tied
    # across MANY equal-scoring repeat placements (X0 > 1 on a tandem
    # array) are compared structurally (line count, flags, AS values):
    # which tied copy the reference emits -- and the pseudo-assembly
    # chain composition scoring it -- falls out of THREE chained UNSTABLE
    # std::sorts on equal keys (PairedOverlap.h:404/372/522), i.e.
    # libstdc++ internals, not algorithm semantics.  The classification
    # outputs above are byte-exact either way.
    ref_lines = parity.normalize_sam(ref_sam)
    our_lines = parity.normalize_sam(our_sam)

    def by_read(lines):
        out = {}
        for ln in lines:
            out.setdefault(ln.split("\t", 1)[0], []).append(ln)
        return out

    ref_by, our_by = by_read(ref_lines), by_read(our_lines)
    assert set(ref_by) == set(our_by), "aligned read sets differ"
    exact = structural = 0
    for name, rl in ref_by.items():
        ol = our_by[name]
        if "X0:i:1\t" in rl[0] or rl[0].rstrip().endswith("X0:i:1"):
            assert rl == ol, f"unique-hit SAM mismatch for {name}:\n" + \
                "\n".join(rl[:4] + ["---"] + ol[:4])
            exact += 1
        else:
            assert len(rl) == len(ol), name
            get = lambda ln, tag: next(
                (f for f in ln.split("\t") if f.startswith(tag)), "")
            assert sorted(get(l, "AS:i:") for l in rl) == \
                sorted(get(l, "AS:i:") for l in ol), name
            structural += 1
    # the fixture must exercise BOTH regimes
    assert exact >= 50 and structural >= 1, (exact, structural)
