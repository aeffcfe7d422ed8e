"""Out-of-core index build at BASELINE config[3] scale (record keeping).

Builds a ~7.0e8-k-mer index (11.2 Gbp of synthetic genomes at stride 16,
the size class of the NCBI bacteria DB the reference's install scripts
target, install_slam_new_db.sh:120-136) via KmerIndex.build_streamed and
reports wall time + peak RSS.  Genomes are generated one at a time by the
entries iterator, so host RAM holds one genome + one prefix bucket at a
time -- the in-RAM build would need ~26 GB for the unsorted columns +
lexsort scratch alone.

Usage: python benches/build_bigindex.py [total_gbp] [out_dir]
"""

import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOTAL_GBP = float(sys.argv[1]) if len(sys.argv) > 1 else 11.2
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/kslam_bigindex"
NUM_GENOMES = 56


def main():
    from kslam_tpu.db.kmer_index import KmerIndex

    glen = int(TOTAL_GBP * 1e9 / NUM_GENOMES)

    def entries():
        rng = np.random.default_rng(0)
        bases4 = np.frombuffer(b"ACGT", dtype=np.uint8)
        for i in range(NUM_GENOMES):
            t0 = time.perf_counter()
            g = bases4[rng.integers(0, 4, glen, dtype=np.uint8)]
            print(f"  genome {i}: {glen / 1e6:.0f} Mbp "
                  f"({time.perf_counter() - t0:.1f}s gen)",
                  file=sys.stderr, flush=True)
            yield i, g

    t0 = time.perf_counter()
    kidx = KmerIndex.build_streamed(entries(), out_dir=OUT)
    dt = time.perf_counter() - t0
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20
    print(f"built {len(kidx) / 1e6:.1f}M k-mers from {TOTAL_GBP} Gbp in "
          f"{dt / 60:.1f} min, peak RSS {peak_gb:.1f} GiB, "
          f"output {sum(os.path.getsize(os.path.join(OUT, f)) for f in os.listdir(OUT)) / 2**30:.1f} GiB -> {OUT}")


if __name__ == "__main__":
    main()
