"""Probe: realistic-scale index on the real chip (VERDICT round-1 item 4).

Builds an N-Gbp synthetic genome set (~10^8 index k-mers at stride 16),
loads it onto the device, and times phase A + the chunk tail at the bench
batch shape.  Reports host build time, HBM footprint estimate, ms/batch.

Usage: python benches/probe_bigdb.py [genome_Mbp_total] [num_genomes]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

TOTAL_MBP = int(sys.argv[1]) if len(sys.argv) > 1 else 1600
NUM_GENOMES = int(sys.argv[2]) if len(sys.argv) > 2 else 16
READ_LEN, PAD_LEN = 150, 160
READS_PER_BATCH = 16384
MUT_RATE = 0.01


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from kslam_tpu.config import PipelineConfig
    from kslam_tpu.db.genbank import GenbankEntry, GenbankIndex
    from kslam_tpu.db.kmer_index import KmerIndex
    from kslam_tpu.ops import encode, sw as sw_ops
    from kslam_tpu.pipeline import device_path

    glen = TOTAL_MBP * 1_000_000 // NUM_GENOMES
    rng = np.random.default_rng(0)
    bases4 = np.frombuffer(b"ACGT", dtype=np.uint8)
    t0 = time.perf_counter()
    genomes = [bases4[rng.integers(0, 4, glen, dtype=np.uint8)]
               for _ in range(NUM_GENOMES)]
    log(f"genomes: {NUM_GENOMES} x {glen/1e6:.0f} Mbp "
        f"({time.perf_counter()-t0:.1f}s)")

    t0 = time.perf_counter()
    gindex = GenbankIndex(
        [GenbankEntry(bases=g.tobytes().decode()) for g in genomes])
    kidx = KmerIndex.build(gindex)
    log(f"index build: {len(kidx)/1e6:.1f}M k-mers "
        f"({time.perf_counter()-t0:.1f}s host)")

    t0 = time.perf_counter()
    *d_idx, d_pstart, p_bits, p_window = kidx.device_arrays()
    genome_scodes = jnp.asarray(sw_ops.genome_chunks_from_scodes(
        encode.sw_codes_np(gindex.bases_concat)))
    entry_offsets = jnp.asarray(gindex.entry_offsets)
    jax.block_until_ready((d_idx, genome_scodes))
    idx_bytes = sum(int(np.prod(x.shape)) * x.dtype.itemsize for x in d_idx)
    log(f"device put: {time.perf_counter()-t0:.1f}s; index {idx_bytes/2**30:.2f} GiB"
        f" + genome {genome_scodes.size/2**30:.2f} GiB; prefix bits={p_bits}"
        f" window={p_window}")

    # one batch of paired reads
    n_pairs = READS_PER_BATCH // 2
    reads = np.zeros((READS_PER_BATCH, PAD_LEN), np.uint8)
    comp = np.zeros(256, np.uint8)
    comp[ord("A")], comp[ord("C")] = ord("T"), ord("G")
    comp[ord("G")], comp[ord("T")] = ord("C"), ord("A")
    gsel = rng.integers(0, NUM_GENOMES, n_pairs)
    pos = rng.integers(0, glen - 2 * READ_LEN - 200, n_pairs)
    ins = rng.integers(2 * READ_LEN, 2 * READ_LEN + 200, n_pairs)
    for i in range(n_pairs):
        g = genomes[gsel[i]]
        r1 = g[pos[i]:pos[i] + READ_LEN].copy()
        r2 = comp[g[pos[i] + ins[i] - READ_LEN:pos[i] + ins[i]]][::-1].copy()
        for r in (r1, r2):
            m = rng.random(READ_LEN) < MUT_RATE
            r[m] = bases4[rng.integers(0, 4, int(m.sum()))]
        reads[i, :READ_LEN] = r1
        reads[n_pairs + i, :READ_LEN] = r2
    lengths = np.full(READS_PER_BATCH, READ_LEN, np.int32)
    d_bases, d_lens = jnp.asarray(reads), jnp.asarray(lengths)

    config = PipelineConfig()
    p = config.sw

    def run():
        return device_path.phase_a(
            d_bases, d_lens, np.int32(n_pairs), *d_idx, genome_scodes,
            entry_offsets, max_matches=16, capacity=1 << 18,
            sw_batch=1 << 15, chain_iters=16, match_s=p.match,
            mismatch=p.mismatch, gap_open=p.gap_open,
            gap_extend=p.gap_extend, window_len=PAD_LEN, score_threshold=0,
            idx_pstart=d_pstart, prefix_bits=p_bits,
            prefix_window=p_window)

    t0 = time.perf_counter()
    a = run()
    jax.block_until_ready(a.pairs.combined_score)
    log(f"compile+first: {time.perf_counter()-t0:.1f}s; "
        f"count={int(a.overlaps.count)} pairs={int(a.pairs.count)} "
        f"overflow={int(a.overlaps.overflow)}")

    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        a = run()
    jax.block_until_ready(a.pairs.combined_score)
    dt = (time.perf_counter() - t0) / n
    log(f"phase A: {dt*1e3:.1f} ms/batch -> "
        f"{READS_PER_BATCH/dt*60/1e6:.2f}M reads/min (phase A only)")


if __name__ == "__main__":
    main()
