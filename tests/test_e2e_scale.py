"""Config[1]-shaped end-to-end test at scale (VERDICT round-1 item 8).

10k paired reads vs an 8-genome GBFF DB, run in multiple chunks
(--num-reads-at-once) so the per-chunk insert-size model, device-batch
boundaries, and pseudo-assembly chains spanning device batches are all
exercised; host screening on (planted host-contaminant pairs must vanish
from every output).  Asserts:

  * device pipeline == host pipeline on every output file (XML, PerRead,
    abbreviated, SAM), and
  * both == the compiled reference binary (host-screen off; the reference's
    screen is dormant, KMerLookupTable.h / SLAM.h:270-325) when the
    toolchain can build it.
"""

import os

import numpy as np
import pytest

from golden_ref import parity
from golden_ref.build import build_reference_binary
from kslam_tpu import cli
from kslam_tpu.db.host_table import HostTable
from kslam_tpu.db.genbank import GenbankEntry, GenbankIndex

N_PAIRS = 10_000
N_HOST_PAIRS = 400
CHUNK = 3_000   # pairs per chunk -> 4 chunks of the 10.4k-pair stream


def _interleave_host_pairs(r1_path, r2_path, host_genome, n, seed):
    """Append host-contaminant pairs (exact slices -> long 16-mer chains)."""
    rng = np.random.default_rng(seed)
    read_len = 150
    with open(r1_path, "a") as f1, open(r2_path, "a") as f2:
        for i in range(n):
            insert = int(rng.integers(300, 480))
            pos = int(rng.integers(0, len(host_genome) - insert))
            r1 = host_genome[pos:pos + read_len]
            r2 = parity.rc(host_genome[pos + insert - read_len:pos + insert])
            q = "I" * read_len
            f1.write(f"@host{i}/1\n{r1}\n+\n{q}\n")
            f2.write(f"@host{i}/2\n{r2}\n+\n{q}\n")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e_scale")
    genomes = parity.make_genomes(8, 40_000, seed=301)
    taxa = {
        2: (1, "superkingdom", "Bacteria"),
        561: (2, "genus", "Escherichia"),
        562: (561, "species", "Escherichia coli"),
        563: (561, "species", "Escherichia fergusonii"),
        1279: (2, "genus", "Staphylococcus"),
        1280: (1279, "species", "Staphylococcus aureus"),
        1281: (1279, "species", "Staphylococcus carnosus"),
        1301: (2, "genus", "Streptococcus"),
        1311: (1301, "species", "Streptococcus agalactiae"),
        1313: (1301, "species", "Streptococcus pneumoniae"),
        590: (2, "genus", "Salmonella"),
        28901: (590, "species", "Salmonella enterica"),
    }
    organisms = [(562, "Escherichia coli"), (563, "Escherichia fergusonii"),
                 (1280, "Staphylococcus aureus"),
                 (1281, "Staphylococcus carnosus"),
                 (1311, "Streptococcus agalactiae"),
                 (1313, "Streptococcus pneumoniae"),
                 (28901, "Salmonella enterica"), (561, "Escherichia")]
    entries = []
    for i, seq in enumerate(genomes):
        taxid, organism = organisms[i]
        genes = [(j * 5000 + 101, j * 5000 + 2200, f"gene{i}_{j}")
                 for j in range(6)]
        entries.append(dict(locus=f"GB{i:04d}.1", gi=30000 + i, taxid=taxid,
                            organism=organism, seq=seq, genes=genes))
    gbff = str(root / "db.gbff")
    parity.write_gbff(gbff, entries)
    names_dmp = str(root / "names.dmp")
    nodes_dmp = str(root / "nodes.dmp")
    parity.write_taxdump(names_dmp, nodes_dmp, taxa)

    r1 = str(root / "r1.fq")
    r2 = str(root / "r2.fq")
    parity.write_paired_reads(r1, r2, genomes, N_PAIRS, seed=77)

    # host contaminants from an unrelated genome + its screen table
    host_genome = parity.make_genomes(1, 30_000, seed=999)[0]
    r1h = str(root / "r1_host.fq")
    r2h = str(root / "r2_host.fq")
    for src, dst in ((r1, r1h), (r2, r2h)):
        with open(src) as s, open(dst, "w") as d:
            d.write(s.read())
    _interleave_host_pairs(r1h, r2h, host_genome, N_HOST_PAIRS, seed=88)
    host_dir = str(root / "hostdb")
    HostTable.build(GenbankIndex([GenbankEntry(bases=host_genome)])) \
        .save(host_dir)

    db_dir = str(root / "DB")
    parity.build_our_db_from_gbff([gbff], names_dmp, nodes_dmp, db_dir)
    return dict(root=str(root), db=db_dir, r1=r1, r2=r2, r1h=r1h, r2h=r2h,
                host_dir=host_dir, gbff=gbff, names=names_dmp,
                nodes=nodes_dmp)


def _run(dataset, tag, device, host_screen=False):
    out = os.path.join(dataset["root"], f"res_{tag}")
    sam = os.path.join(dataset["root"], f"{tag}.sam")
    args = ["--db", dataset["db"], "--output-file", out, "--sam-file", sam,
            "--num-reads-at-once", str(CHUNK), "--device-pipeline", device]
    if host_screen:
        args += ["--host-screen", dataset["host_dir"],
                 dataset["r1h"], dataset["r2h"]]
    else:
        args += [dataset["r1"], dataset["r2"]]
    assert cli.main(args) == 0
    return out, sam


@pytest.fixture(scope="module")
def outputs(dataset):
    res = {}
    for tag, device in (("host", "off"), ("device", "on")):
        res[tag] = _run(dataset, tag, device, host_screen=True)
    return res


def test_device_equals_host_all_outputs(outputs):
    out_h, sam_h = outputs["host"]
    out_d, sam_d = outputs["device"]
    for suffix in ("", "_PerRead", "_abbreviated"):
        diffs = parity.diff_lines(parity.read_lines(out_h + suffix),
                                  parity.read_lines(out_d + suffix),
                                  "host", "device")
        assert not diffs, f"{suffix or 'XML'} mismatch:\n" + "\n".join(diffs)
    diffs = parity.diff_lines(parity.normalize_sam(sam_h),
                              parity.normalize_sam(sam_d), "host", "device")
    assert not diffs, "SAM mismatch:\n" + "\n".join(diffs)


def test_chunking_and_host_screen_effective(outputs, dataset):
    out_d, sam_d = outputs["device"]
    per_read = parity.read_lines(out_d + "_PerRead")
    # host-contaminant reads were dropped before alignment: none may appear
    assert not any(l.startswith("host") for l in per_read)
    assert not any(l.startswith("host")
                   for l in parity.normalize_sam(sam_d)
                   if not l.startswith("@"))
    # the planted (mappable) reads still classify at scale
    assert len(per_read) > N_PAIRS * 0.8
    # multi-chunk actually happened: reads from the last chunk are present
    assert any(l.startswith(f"pr{N_PAIRS - 1}\t") or
               l.startswith(f"pr{N_PAIRS - 1} ") for l in per_read)


def test_scaled_vs_reference_binary(dataset):
    binary = build_reference_binary()
    if binary is None:
        pytest.skip("reference binary not buildable here")
    root = dataset["root"]
    ref_cwd = os.path.join(root, "refrun")
    os.makedirs(ref_cwd, exist_ok=True)
    ref_db = os.path.join(root, "db_ref")
    parity.build_ref_db_from_gbff(binary, [dataset["gbff"]],
                                  dataset["names"], dataset["nodes"],
                                  ref_db, ref_cwd)
    ref_out = os.path.join(root, "ref_results")
    ref_sam = os.path.join(root, "ref.sam")
    parity.run_ref(binary, ["--db", ref_db, "--output-file", ref_out,
                            "--sam-file", ref_sam, "--num-reads-at-once",
                            str(CHUNK), dataset["r1"], dataset["r2"]],
                   ref_cwd)
    our_out, our_sam = _run(dataset, "noscreen_device", "on",
                            host_screen=False)
    for suffix in ("", "_PerRead", "_abbreviated"):
        diffs = parity.diff_lines(parity.read_lines(ref_out + suffix),
                                  parity.read_lines(our_out + suffix))
        assert not diffs, f"{suffix or 'XML'} mismatch:\n" + "\n".join(diffs)
    diffs = parity.diff_lines(parity.normalize_sam(ref_sam),
                              parity.normalize_sam(our_sam))
    assert not diffs, "SAM mismatch:\n" + "\n".join(diffs)
