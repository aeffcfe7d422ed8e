"""Fixture generation + run/diff helpers for the golden parity harness.

Both tools consume the SAME flat files (FASTA / GBFF / taxdump / FASTQ) and
build their own database artifacts from them (the reference via
--parse-fasta/--parse-genbank/--parse-taxonomy, main.cpp:110-132; this repo
via kslam_tpu.cli --parse-*), then run the analysis and the outputs are
byte-diffed (SAM modulo the @PG line, which embeds each tool's own command
line, SAM.h:529).
"""

from __future__ import annotations

import os
import subprocess
from typing import Dict, List, Sequence, Tuple

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
_RC = str.maketrans("ACGT", "TGCA")


def rc(s: str) -> str:
    return s.translate(_RC)[::-1]


# ----------------------------------------------------------------- fixtures


def make_genomes(n: int, length: int, seed: int) -> List[str]:
    rng = np.random.default_rng(seed)
    return [rng.choice(BASES, length).tobytes().decode() for _ in range(n)]


def write_fasta(path: str, genomes: Sequence[str],
                names: Sequence[str]) -> None:
    # headers carry a space + description: the reference FASTA parser only
    # sets locusTag when the header contains a space (GenbankTools.h:247-249)
    with open(path, "w") as fh:
        for name, g in zip(names, genomes):
            fh.write(f">{name} synthetic genome\n")
            for i in range(0, len(g), 80):
                fh.write(g[i:i + 80] + "\n")


def _mutate(rng, read: str, p_sub: float, p_indel: float) -> str:
    out = list(read)
    for i in range(len(out)):
        r = rng.random()
        if r < p_sub:
            out[i] = chr(int(rng.choice(BASES)))
    if rng.random() < p_indel and len(out) > 20:
        pos = int(rng.integers(5, len(out) - 5))
        if rng.random() < 0.5:
            del out[pos]          # deletion from the read
        else:
            out.insert(pos, chr(int(rng.choice(BASES))))
    return "".join(out)


def _qual(rng, n: int) -> str:
    return "".join(chr(33 + int(q)) for q in rng.integers(20, 41, n))


def write_single_end_reads(path: str, genomes: Sequence[str], n_reads: int,
                           read_len: int = 150, seed: int = 5,
                           p_sub: float = 0.01, p_indel: float = 0.15,
                           p_random: float = 0.05) -> None:
    """Plant reads from random genome positions; some RC'd, mutated, or
    entirely random (unmappable)."""
    rng = np.random.default_rng(seed)
    with open(path, "w") as fh:
        for i in range(n_reads):
            if rng.random() < p_random:
                read = rng.choice(BASES, read_len).tobytes().decode()
            else:
                g = genomes[int(rng.integers(len(genomes)))]
                pos = int(rng.integers(0, len(g) - read_len))
                read = _mutate(rng, g[pos:pos + read_len], p_sub, p_indel)
                if rng.random() < 0.5:
                    read = rc(read)
            fh.write(f"@sr{i} extra stuff\n{read}\n+\n"
                     f"{_qual(rng, len(read))}\n")


def write_paired_reads(r1_path: str, r2_path: str, genomes: Sequence[str],
                       n_pairs: int, read_len: int = 150, seed: int = 6,
                       p_sub: float = 0.01, p_indel: float = 0.1,
                       p_random: float = 0.04,
                       p_single_side: float = 0.06) -> None:
    rng = np.random.default_rng(seed)
    with open(r1_path, "w") as f1, open(r2_path, "w") as f2:
        for i in range(n_pairs):
            if rng.random() < p_random:
                r1 = rng.choice(BASES, read_len).tobytes().decode()
                r2 = rng.choice(BASES, read_len).tobytes().decode()
            else:
                g = genomes[int(rng.integers(len(genomes)))]
                insert = int(rng.integers(int(read_len * 1.7), 500))
                pos = int(rng.integers(0, len(g) - insert))
                r1 = _mutate(rng, g[pos:pos + read_len], p_sub, p_indel)
                r2 = rc(_mutate(rng, g[pos + insert - read_len:pos + insert],
                                p_sub, p_indel))
                if rng.random() < p_single_side:
                    # one side unmappable: half-pair behavior
                    r2 = rng.choice(BASES, read_len).tobytes().decode()
                if rng.random() < 0.5:
                    r1, r2 = rc(r2), rc(r1)
            f1.write(f"@pr{i}/1\n{r1}\n+\n{_qual(rng, len(r1))}\n")
            f2.write(f"@pr{i}/2\n{r2}\n+\n{_qual(rng, len(r2))}\n")


_GBFF_TEMPLATE = """LOCUS       {locus}             {length} bp    DNA     linear   BCT
DEFINITION  {definition}.
VERSION     {locus}  GI:{gi}
FEATURES             Location/Qualifiers
     source          1..{length}
                     /organism="{organism}"
                     /db_xref="taxon:{taxid}"
{genes}ORIGIN
{origin}//
"""

_GENE_TEMPLATE = """     gene            {start}..{stop}
                     /gene="{gene}"
                     /locus_tag="{ltag}"
     CDS             {start}..{stop}
                     /gene="{gene}"
                     /locus_tag="{ltag}"
                     /product="{product}"
                     /protein_id="{protein}"
                     /db_xref="GeneID:{geneid}"
"""


def _origin_block(seq: str) -> str:
    out = []
    for i in range(0, len(seq), 60):
        chunk = seq[i:i + 60].lower()
        groups = " ".join(chunk[j:j + 10] for j in range(0, len(chunk), 10))
        out.append(f"{i + 1:>9} {groups}\n")
    return "".join(out)


def write_gbff(path: str, entries: List[dict]) -> None:
    """entries: [{locus, gi, taxid, organism, seq, genes:[(start,stop,name)]}]
    starts/stops are 1-based inclusive like real GBFF."""
    with open(path, "w") as fh:
        for k, e in enumerate(entries):
            genes = "".join(
                _GENE_TEMPLATE.format(
                    start=s, stop=t, gene=n, ltag=f"LT{e['gi']}_{j}",
                    product=f"{n} product", protein=f"P{e['gi']}_{j}.1",
                    geneid=e["gi"] * 100 + j)
                for j, (s, t, n) in enumerate(e["genes"]))
            fh.write(_GBFF_TEMPLATE.format(
                locus=e["locus"], length=len(e["seq"]), gi=e["gi"],
                definition=e.get("definition", f"{e['organism']} genome"),
                organism=e["organism"], taxid=e["taxid"], genes=genes,
                origin=_origin_block(e["seq"])))


def write_taxdump(names_path: str, nodes_path: str,
                  taxa: Dict[int, Tuple[int, str, str]]) -> None:
    """taxa: taxid -> (parent, rank, scientific name); root (1) implied."""
    with open(nodes_path, "w") as fh:
        fh.write("1\t|\t1\t|\tno rank\t|\n")
        for tid, (parent, rank, _) in sorted(taxa.items()):
            fh.write(f"{tid}\t|\t{parent}\t|\t{rank}\t|\n")
    with open(names_path, "w") as fh:
        fh.write("1\t|\troot\t|\t\t|\tscientific name\t|\n")
        for tid, (_, _, name) in sorted(taxa.items()):
            fh.write(f"{tid}\t|\t{name}\t|\t\t|\tscientific name\t|\n")


# ------------------------------------------------------------------ running


def run_ref(binary: str, args: Sequence[str], cwd: str,
            timeout: int = 1800) -> subprocess.CompletedProcess:
    """Run the reference binary; cwd matters (it writes log.txt there and
    --parse-genbank reads a cwd-relative `taxDB`, GenbankTools.h:483)."""
    return subprocess.run([binary, *args], cwd=cwd, capture_output=True,
                          text=True, timeout=timeout, check=True)


def build_ref_db_from_fasta(binary: str, fasta: str, db_dir: str,
                            cwd: str) -> None:
    os.makedirs(db_dir, exist_ok=True)
    run_ref(binary, ["--parse-fasta", fasta, "--output-file",
                     os.path.join(db_dir, "database")], cwd)


def build_ref_db_from_gbff(binary: str, gbff_paths: Sequence[str],
                           names_dmp: str, nodes_dmp: str, db_dir: str,
                           cwd: str) -> None:
    os.makedirs(db_dir, exist_ok=True)
    run_ref(binary, ["--parse-taxonomy", names_dmp, nodes_dmp,
                     "--output-file", os.path.join(db_dir, "taxDB")], cwd)
    # createIndexFromGBFF reads `taxDB` relative to the cwd
    run_ref(binary, ["--parse-taxonomy", names_dmp, nodes_dmp,
                     "--output-file", os.path.join(cwd, "taxDB")], cwd)
    run_ref(binary, ["--parse-genbank", *gbff_paths, "--output-file",
                     os.path.join(db_dir, "database")], cwd)


def build_our_db_from_fasta(fasta: str, db_dir: str) -> None:
    from kslam_tpu import cli
    rcode = cli.main(["--parse-fasta", fasta, "--output-file", db_dir])
    assert rcode == 0


def build_our_db_from_gbff(gbff_paths: Sequence[str], names_dmp: str,
                           nodes_dmp: str, db_dir: str) -> None:
    from kslam_tpu import cli
    rcode = cli.main(["--parse-taxonomy", names_dmp, nodes_dmp,
                      "--output-file", os.path.join(db_dir, "taxDB")])
    assert rcode == 0
    rcode = cli.main(["--parse-genbank", *gbff_paths,
                      "--output-file", db_dir])
    assert rcode == 0


# ------------------------------------------------------------------ diffing


def normalize_sam(path: str) -> List[str]:
    """SAM lines with the @PG line (embeds each tool's command line)
    dropped."""
    with open(path) as fh:
        return [l.rstrip("\n") for l in fh if not l.startswith("@PG")]


def diff_lines(a: List[str], b: List[str], label_a: str = "ref",
               label_b: str = "tpu", limit: int = 40) -> List[str]:
    """Line-by-line diff report; empty list means byte-identical."""
    out = []
    for i, (x, y) in enumerate(zip(a, b)):
        if x != y:
            out.append(f"line {i + 1}:\n  {label_a}: {x}\n  {label_b}: {y}")
            if len(out) >= limit:
                out.append("... (diff truncated)")
                return out
    if len(a) != len(b):
        out.append(f"line count: {label_a}={len(a)} {label_b}={len(b)}")
    return out


def read_lines(path: str) -> List[str]:
    with open(path) as fh:
        return [l.rstrip("\n") for l in fh]
