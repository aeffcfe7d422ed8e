"""Profile SAM emission throughput vs the rest of the pipeline
(VERDICT round-1 item 9: batch or move to csrc if sam_output exceeds
~10% of wall clock at a 5M-reads/min stream).

Builds a synthetic paired dataset + FASTA DB, runs the real CLI with
--sam-file, and reports per-stage timings from the metrics registry.

Usage: python benches/profile_sam.py [n_pairs] [n_genomes] [genome_len]
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

N_PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
NUM_GENOMES = int(sys.argv[2]) if len(sys.argv) > 2 else 8
GENOME_LEN = int(sys.argv[3]) if len(sys.argv) > 3 else 125_000
READ_LEN = 150
MUT_RATE = 0.01


def main():
    from kslam_tpu import cli
    from kslam_tpu.db.genbank import index_from_fasta
    from kslam_tpu.db.kmer_index import KmerIndex
    from kslam_tpu.db.taxonomy import TaxonomyDB
    from kslam_tpu.ops.encode import reverse_complement_str
    from kslam_tpu.utils import metrics

    rng = np.random.default_rng(0)
    bases4 = np.frombuffer(b"ACGT", dtype=np.uint8)
    root = tempfile.mkdtemp(prefix="profile_sam_")
    genomes = [rng.choice(bases4, GENOME_LEN) for _ in range(NUM_GENOMES)]
    fasta = os.path.join(root, "db.fa")
    with open(fasta, "w") as fh:
        for i, g in enumerate(genomes):
            fh.write(f">GEN_{i}.1\n{g.tobytes().decode()}\n")

    comp = np.zeros(256, np.uint8)
    comp[ord("A")], comp[ord("C")] = ord("T"), ord("G")
    comp[ord("G")], comp[ord("T")] = ord("C"), ord("A")
    qual = "I" * READ_LEN
    t0 = time.perf_counter()
    gsel = rng.integers(0, NUM_GENOMES, N_PAIRS)
    pos = rng.integers(0, GENOME_LEN - 2 * READ_LEN - 200, N_PAIRS)
    ins = rng.integers(2 * READ_LEN, 2 * READ_LEN + 200, N_PAIRS)
    with open(os.path.join(root, "r1.fq"), "w") as f1, \
            open(os.path.join(root, "r2.fq"), "w") as f2:
        for i in range(N_PAIRS):
            g = genomes[gsel[i]]
            r1 = g[pos[i]:pos[i] + READ_LEN].copy()
            r2 = comp[g[pos[i] + ins[i] - READ_LEN:pos[i] + ins[i]]][::-1] \
                .copy()
            for r in (r1, r2):
                m = rng.random(READ_LEN) < MUT_RATE
                r[m] = bases4[rng.integers(0, 4, int(m.sum()))]
            f1.write(f"@rd{i}/1\n{r1.tobytes().decode()}\n+\n{qual}\n")
            f2.write(f"@rd{i}/2\n{r2.tobytes().decode()}\n+\n{qual}\n")
    print(f"fastq gen: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    db_dir = os.path.join(root, "DB")
    os.makedirs(db_dir)
    index = index_from_fasta([fasta])
    index.save(db_dir)
    KmerIndex.build(index).save(db_dir)
    TaxonomyDB().write_index(os.path.join(db_dir, "taxDB"))

    metrics.reset()
    t0 = time.perf_counter()
    cli.main(["--db", db_dir, "--sam-file", os.path.join(root, "out.sam"),
              "--just-align", "--no-pseudo-assembly",
              os.path.join(root, "r1.fq"), os.path.join(root, "r2.fq")])
    total = time.perf_counter() - t0
    print(f"total run: {total:.2f}s for {N_PAIRS} pairs "
          f"({2*N_PAIRS/total*60/1e6:.2f}M reads/min)", file=sys.stderr)
    for name, entry in metrics.summary().items():
        print(f"  {name}: {entry}", file=sys.stderr)
    sam_s = metrics.summary().get("sam_output", {}).get("seconds", 0)
    print(f"sam_output share: {100*sam_s/total:.1f}%", file=sys.stderr)
    nlines = sum(1 for _ in open(os.path.join(root, "out.sam")))
    print(f"sam lines: {nlines} ({nlines/sam_s if sam_s else 0:,.0f} "
          f"lines/s)", file=sys.stderr)


if __name__ == "__main__":
    main()
