"""BASELINE-scale golden parity run vs the compiled reference binary.

Scaled-up version of tests/test_golden_parity.py (VERDICT round-1 item 1/8):

  config[0]: --just-align, 10k single-end 150bp reads (indels, RC, 5%
    unmappable) vs a 5-genome x 100kb FASTA DB -> SAM byte-diff (modulo the
    @PG line, which embeds each tool's own argv).
  config[1]: 10k paired reads vs an 8-genome GBFF DB + taxdump, run in
    MULTIPLE chunks (--num-reads-at-once splits the stream so the per-chunk
    insert-size model and pseudo-assembly batching are exercised at scale)
    -> XML + PerRead + abbreviated + SAM byte-diffs.

Writes golden_ref/PARITY_REPORT.md.  Skips a config (with a note in the
report) if the reference binary cannot be built here.

Usage: python -m golden_ref.run_parity [--pairs 10000] [--singles 10000]
       [--device-pipeline auto|on|off]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from golden_ref import parity
from golden_ref.build import build_reference_binary

REPORT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "PARITY_REPORT.md")


def _our_cli(args):
    from kslam_tpu import cli
    rcode = cli.main(args)
    assert rcode == 0, f"kslam_tpu cli failed: {args}"


def run_config0(root: str, binary: str, n_reads: int, device: str) -> dict:
    os.makedirs(root, exist_ok=True)
    fasta = os.path.join(root, "genomes.fa")
    reads = os.path.join(root, "reads.fq")
    genomes = parity.make_genomes(5, 100_000, seed=101)
    parity.write_fasta(fasta, genomes, [f"SYN{i:03d}.1" for i in range(5)])
    parity.write_single_end_reads(reads, genomes, n_reads, seed=55)

    ref_cwd = os.path.join(root, "refrun")
    os.makedirs(ref_cwd, exist_ok=True)
    ref_db = os.path.join(root, "db_ref")
    parity.build_ref_db_from_fasta(binary, fasta, ref_db, ref_cwd)
    ref_sam = os.path.join(root, "ref.sam")
    t0 = time.perf_counter()
    parity.run_ref(binary, ["--db", ref_db, "--just-align",
                            "--sam-file", ref_sam, reads], ref_cwd)
    ref_s = time.perf_counter() - t0

    our_db = os.path.join(root, "db_tpu")
    parity.build_our_db_from_fasta(fasta, our_db)
    our_sam = os.path.join(root, "tpu.sam")
    t0 = time.perf_counter()
    _our_cli(["--db", our_db, "--just-align", "--sam-file", our_sam,
              "--device-pipeline", device, reads])
    our_s = time.perf_counter() - t0

    ref = parity.normalize_sam(ref_sam)
    ours = parity.normalize_sam(our_sam)
    diffs = parity.diff_lines(ref, ours)
    return dict(name="config0 (--just-align, 10k single-end, FASTA DB)",
                lines=len(ref), files={"SAM": diffs},
                ref_s=ref_s, our_s=our_s)


def run_config1(root: str, binary: str, n_pairs: int, chunk_reads: int,
                device: str) -> dict:
    os.makedirs(root, exist_ok=True)
    genomes = parity.make_genomes(8, 60_000, seed=201)
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
                 for j in range(8)]
        entries.append(dict(locus=f"GB{i:04d}.1", gi=20000 + i, taxid=taxid,
                            organism=organism, seq=seq, genes=genes))
    gbff = os.path.join(root, "db.gbff")
    parity.write_gbff(gbff, entries)
    names_dmp = os.path.join(root, "names.dmp")
    nodes_dmp = os.path.join(root, "nodes.dmp")
    parity.write_taxdump(names_dmp, nodes_dmp, taxa)
    r1 = os.path.join(root, "r1.fq")
    r2 = os.path.join(root, "r2.fq")
    parity.write_paired_reads(r1, r2, genomes, n_pairs, seed=66)

    ref_cwd = os.path.join(root, "refrun")
    os.makedirs(ref_cwd, exist_ok=True)
    ref_db = os.path.join(root, "db_ref")
    parity.build_ref_db_from_gbff(binary, [gbff], names_dmp, nodes_dmp,
                                  ref_db, ref_cwd)
    ref_out = os.path.join(root, "ref_results")
    ref_sam = os.path.join(root, "ref.sam")
    chunk_flag = ["--num-reads-at-once", str(chunk_reads)]
    t0 = time.perf_counter()
    parity.run_ref(binary, ["--db", ref_db, "--output-file", ref_out,
                            "--sam-file", ref_sam, *chunk_flag, r1, r2],
                   ref_cwd)
    ref_s = time.perf_counter() - t0

    our_db = os.path.join(root, "db_tpu")
    parity.build_our_db_from_gbff([gbff], names_dmp, nodes_dmp, our_db)
    our_out = os.path.join(root, "tpu_results")
    our_sam = os.path.join(root, "tpu.sam")
    t0 = time.perf_counter()
    _our_cli(["--db", our_db, "--output-file", our_out, "--sam-file",
              our_sam, "--device-pipeline", device, *chunk_flag, r1, r2])
    our_s = time.perf_counter() - t0

    files = {}
    files["XML"] = parity.diff_lines(parity.read_lines(ref_out),
                                     parity.read_lines(our_out))
    files["PerRead"] = parity.diff_lines(
        parity.read_lines(ref_out + "_PerRead"),
        parity.read_lines(our_out + "_PerRead"))
    files["abbreviated"] = parity.diff_lines(
        parity.read_lines(ref_out + "_abbreviated"),
        parity.read_lines(our_out + "_abbreviated"))
    files["SAM"] = parity.diff_lines(parity.normalize_sam(ref_sam),
                                     parity.normalize_sam(our_sam))
    return dict(name=f"config1 (full pipeline, {n_pairs} pairs, "
                     f"chunked at {chunk_reads} reads, GBFF DB)",
                lines=len(parity.normalize_sam(ref_sam)),
                files=files, ref_s=ref_s, our_s=our_s)


def run_config2(root: str, binary: str, n_pairs: int, device: str) -> dict:
    """Realistic-sequence config: repeat-rich genomes (shared rRNA
    operons, IS families, low-complexity tracts, shared plasmids) with
    ~1 gene/kbp GBFF annotation (kslam_tpu.eval.realistic).  XML /
    PerRead / abbreviated are byte-diffed; SAM is byte-diffed for
    unique-best-placement reads only, with repeat-tie reads (X0 > 1 on
    equal scores) counted separately: their emitted copy + chain XS fall
    out of the reference's three chained UNSTABLE std::sorts
    (PairedOverlap.h:404/372/522), i.e. libstdc++ tie internals."""
    from kslam_tpu.eval import realistic
    import numpy as np
    os.makedirs(root, exist_ok=True)
    entries = realistic.make_realistic_entries(n_genomes=4,
                                               bp_each=200_000, seed=17,
                                               plasmid_bp=15_000)
    gbff = os.path.join(root, "db.gbff")
    parity.write_gbff(gbff, realistic.entries_to_gbff_dicts(entries))
    names_dmp = os.path.join(root, "names.dmp")
    nodes_dmp = os.path.join(root, "nodes.dmp")
    parity.write_taxdump(names_dmp, nodes_dmp,
                         realistic.realistic_taxa(entries))
    r1 = os.path.join(root, "r1.fq")
    r2 = os.path.join(root, "r2.fq")
    rng = np.random.default_rng(23)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    with open(r1, "w") as f1, open(r2, "w") as f2:
        for i in range(n_pairs):
            e = entries[int(rng.integers(0, len(entries)))]
            s = e.seq.tobytes().decode()
            pos = int(rng.integers(0, len(s) - 420))
            frag = s[pos:pos + int(rng.integers(280, 420))]
            f1.write(f"@p{i}\n{frag[:150]}\n+\n{'I' * 150}\n")
            r2s = frag[-150:].encode().translate(comp)[::-1].decode()
            f2.write(f"@p{i}\n{r2s}\n+\n{'I' * 150}\n")

    ref_cwd = os.path.join(root, "refrun")
    os.makedirs(ref_cwd, exist_ok=True)
    ref_db = os.path.join(root, "db_ref")
    parity.build_ref_db_from_gbff(binary, [gbff], names_dmp, nodes_dmp,
                                  ref_db, ref_cwd)
    ref_out = os.path.join(root, "ref_results")
    ref_sam = os.path.join(root, "ref.sam")
    # chunk the stream on BOTH sides (identical configs): repeat-dense
    # reads against the realistic DB trip the emit-all retry (the
    # low-complexity tracts fan single k-mers out ~1000 ways), and the
    # per-batch retry capacity scales with reads/batch -- at 2048-read
    # chunks it still reached 2^23 rows, which the remote TPU compile
    # helper cannot build (measured SIGKILL; large-iota constant folding
    # blows up compile memory).  512-read chunks bound it to ~2^21.
    chunk_flag = ["--num-reads-at-once", "512"]
    t0 = time.perf_counter()
    parity.run_ref(binary, ["--db", ref_db, "--output-file", ref_out,
                            "--sam-file", ref_sam, *chunk_flag, r1, r2],
                   ref_cwd)
    ref_s = time.perf_counter() - t0

    our_db = os.path.join(root, "db_tpu")
    parity.build_our_db_from_gbff([gbff], names_dmp, nodes_dmp, our_db)
    our_out = os.path.join(root, "tpu_results")
    our_sam = os.path.join(root, "tpu.sam")
    t0 = time.perf_counter()
    _our_cli(["--db", our_db, "--output-file", our_out, "--sam-file",
              our_sam, "--device-pipeline", device, *chunk_flag, r1, r2])
    our_s = time.perf_counter() - t0

    files = {}
    files["XML"] = parity.diff_lines(parity.read_lines(ref_out),
                                     parity.read_lines(our_out))
    files["PerRead"] = parity.diff_lines(
        parity.read_lines(ref_out + "_PerRead"),
        parity.read_lines(our_out + "_PerRead"))
    files["abbreviated"] = parity.diff_lines(
        parity.read_lines(ref_out + "_abbreviated"),
        parity.read_lines(our_out + "_abbreviated"))
    ref_lines = parity.normalize_sam(ref_sam)
    our_lines = parity.normalize_sam(our_sam)

    def by_read(lines):
        out = {}
        for ln in lines:
            out.setdefault(ln.split("\t", 1)[0], []).append(ln)
        return out

    ref_by, our_by = by_read(ref_lines), by_read(our_lines)
    sam_diffs = []
    tie_reads = exact_reads = 0
    if set(ref_by) != set(our_by):
        sam_diffs.append(f"aligned read sets differ: "
                         f"{len(ref_by)} vs {len(our_by)}")
    else:
        for name, rl in ref_by.items():
            ol = our_by[name]
            unique = any(f == "X0:i:1" for f in rl[0].split("\t"))
            if unique:
                exact_reads += 1
                if rl != ol:
                    sam_diffs.append(f"unique-hit read {name} differs")
            else:
                tie_reads += 1
                if len(rl) != len(ol):
                    sam_diffs.append(f"tie read {name}: line count "
                                     f"{len(rl)} vs {len(ol)}")
    files[f"SAM ({exact_reads} unique-hit reads byte-diffed; "
          f"{tie_reads} repeat-tie reads structural)"] = sam_diffs
    return dict(name=f"config2 (realistic repeat-rich genomes, {n_pairs} "
                     f"pairs, gene-dense GBFF DB)",
                lines=len(ref_lines), files=files, ref_s=ref_s,
                our_s=our_s)


def write_report(results, note: str = "") -> None:
    lines = ["# Golden parity report — BASELINE-scale runs", ""]
    lines.append("Byte-diffs of this repo's outputs against the compiled "
                 "reference binary")
    lines.append("(`/root/reference`, built with golden_ref/boost_stub) on "
                 "identical fixtures.")
    lines.append("Generated by `python -m golden_ref.run_parity`.")
    lines.append("")
    if note:
        lines.append(f"> {note}")
        lines.append("")
    ok = True
    for r in results:
        lines.append(f"## {r['name']}")
        lines.append("")
        lines.append(f"- reference run: {r['ref_s']:.1f}s, "
                     f"this repo: {r['our_s']:.1f}s "
                     f"({r['lines']} SAM lines)")
        for fname, diffs in r["files"].items():
            if diffs:
                ok = False
                lines.append(f"- **{fname}: {len(diffs)} differing lines**")
                lines.extend("  " + d.replace("\n", "\n  ")
                             for d in diffs[:10])
            else:
                lines.append(f"- {fname}: byte-identical")
        lines.append("")
    if not results:
        ok = False
        lines.append("**Overall: SKIPPED — nothing compared "
                     "(reference binary unavailable)**")
    else:
        lines.append(f"**Overall: {'PASS — all outputs byte-identical' if ok else 'DIFFS FOUND'}**")
    lines.append("")
    with open(REPORT, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {REPORT}", file=sys.stderr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=10_000)
    ap.add_argument("--pairs2", type=int, default=10_000,
                    help="pairs for the realistic config2 (10k samples "
                         "the repeat-tie SAM regime with hundreds of "
                         "structural reads, VERDICT r4 item 7)")
    ap.add_argument("--singles", type=int, default=10_000)
    ap.add_argument("--chunk-reads", type=int, default=8_192)
    ap.add_argument("--device-pipeline", default="auto")
    ap.add_argument("--workdir", default="/tmp/kslam_parity")
    args = ap.parse_args()

    binary = build_reference_binary()
    if binary is None:
        write_report([], note="reference binary not buildable here "
                              "(no toolchain); nothing was compared")
        return 1
    # write the report after every config so a crash in a later config
    # (e.g. an uncompilable retry program) keeps the finished results
    results = []
    for runner in (
            lambda: run_config0(os.path.join(args.workdir, "cfg0"), binary,
                                args.singles, args.device_pipeline),
            lambda: run_config1(os.path.join(args.workdir, "cfg1"), binary,
                                args.pairs, args.chunk_reads,
                                args.device_pipeline),
            lambda: run_config2(os.path.join(args.workdir, "cfg2"), binary,
                                args.pairs2, args.device_pipeline)):
        results.append(runner())
        write_report(results)
    bad = sum(1 for r in results for d in r["files"].values() if d)
    return 0 if bad == 0 else 2


if __name__ == "__main__":
    sys.exit(main())
