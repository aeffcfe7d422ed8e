"""Headline benchmark: paired-read alignment throughput on one chip.

Measures the device alignment core (k-merization -> presorted-index join ->
batched Smith-Waterman validation) on a synthetic bacterial-scale problem:
150bp paired reads with ~1% mutations planted in random genomes, stride-16
genome index (SLAM.h:65 semantics).  The reference binary's headline number
is 5M paired 150bp reads/min on a >=8-core CPU host (README.md:12), which
is the vs_baseline denominator.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "reads/min", "vs_baseline": N}
Secondary stage timings go to stderr.
"""

import json
import sys
import time

import numpy as np

READ_LEN = 150
PAD_LEN = 160
NUM_GENOMES = 8
GENOME_LEN = 125_000
READS_PER_BATCH = 4096        # individual reads (2048 pairs)
MUT_RATE = 0.01
TIMED_ITERS = 5


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_problem(seed=0):
    rng = np.random.default_rng(seed)
    bases4 = np.frombuffer(b"ACGT", dtype=np.uint8)
    genomes = [rng.choice(bases4, GENOME_LEN) for _ in range(NUM_GENOMES)]

    comp = np.zeros(256, np.uint8)
    comp[ord("A")], comp[ord("C")] = ord("T"), ord("G")
    comp[ord("G")], comp[ord("T")] = ord("C"), ord("A")

    reads = np.zeros((READS_PER_BATCH, PAD_LEN), dtype=np.uint8)
    n_pairs = READS_PER_BATCH // 2
    g_idx = rng.integers(0, NUM_GENOMES, n_pairs)
    pos = rng.integers(0, GENOME_LEN - 2 * READ_LEN - 200, n_pairs)
    insert = rng.integers(2 * READ_LEN, 2 * READ_LEN + 200, n_pairs)
    for i in range(n_pairs):
        g = genomes[g_idx[i]]
        r1 = g[pos[i]:pos[i] + READ_LEN].copy()
        r2e = pos[i] + insert[i]
        r2 = comp[g[r2e - READ_LEN:r2e]][::-1].copy()
        for r in (r1, r2):
            m = rng.random(READ_LEN) < MUT_RATE
            r[m] = bases4[rng.integers(0, 4, int(m.sum()))]
        reads[2 * i, :READ_LEN] = r1
        reads[2 * i + 1, :READ_LEN] = r2
    lengths = np.full(READS_PER_BATCH, READ_LEN, dtype=np.int32)
    return genomes, reads, lengths


def main():
    import jax
    import jax.numpy as jnp
    from kslam_tpu.config import PipelineConfig
    from kslam_tpu.db.genbank import GenbankEntry, GenbankIndex
    from kslam_tpu.db.kmer_index import KmerIndex
    from kslam_tpu.ops import encode, kmers, match, sw

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    t0 = time.perf_counter()
    genomes, reads, lengths = build_problem()
    gindex = GenbankIndex(
        [GenbankEntry(bases=g.tobytes().decode()) for g in genomes])
    kidx = KmerIndex.build(gindex)
    m = len(kidx)
    cap = 1 << (m - 1).bit_length()
    km = np.full(cap, np.uint64(2**64 - 1), dtype=np.uint64)
    km[:m] = kidx.kmers
    pad = lambda a, dt: np.concatenate([a, np.zeros(cap - m, dt)]).astype(dt)
    d_idx = (jnp.asarray(km), jnp.asarray(pad(kidx.entry_id, np.int32)),
             jnp.asarray(pad(kidx.offset, np.int32)),
             jnp.asarray(pad(kidx.rc, bool)))
    genome_scodes = jnp.asarray(encode.sw_codes_np(gindex.bases_concat))
    entry_offsets = jnp.asarray(gindex.entry_offsets)
    log(f"index: {m} k-mers over {NUM_GENOMES}x{GENOME_LEN}bp "
        f"({time.perf_counter() - t0:.1f}s host build)")

    p = PipelineConfig().sw
    capacity = 1 << 16
    sw_batch = 1 << 13          # dense post-compaction SW set

    # DB arrays are explicit jit arguments: closure-captured device arrays
    # become embedded executable constants, which the axon runtime
    # re-materializes per call (~290ms/call regression measured)
    @jax.jit
    def step(bases, lens, ikm, ient, ioff, irc, gsc, eoff):
        km_, off, rc, valid = kmers.read_kmers_device(bases, lens)
        res = match.match_overlaps(km_, off, rc, valid, lens,
                                   ikm, ient, ioff, irc,
                                   max_matches=16, capacity=capacity,
                                   chain_iters=16)
        res = match.compact_overlaps(res, sw_batch)
        read_scodes = encode.sw_codes(bases)
        al = sw.align_overlaps_batch(
            res.read_id, res.entry_id, res.rel_pos, res.rc, res.valid,
            read_scodes, lens, gsc, eoff,
            p.match, p.mismatch, p.gap_open, p.gap_extend,
            window_len=PAD_LEN)
        score = jnp.where(res.valid, al.score, 0)
        return res.count, jnp.sum(score)

    d_reads = jnp.asarray(reads)
    d_lens = jnp.asarray(lengths)
    d_args = (d_reads, d_lens, *d_idx, genome_scodes, entry_offsets)
    step_ = step
    step = lambda r, l: step_(r, l, *d_idx, genome_scodes, entry_offsets)

    t0 = time.perf_counter()
    count, total = jax.block_until_ready(step(d_reads, d_lens))
    log(f"compile+first-run: {time.perf_counter() - t0:.1f}s "
        f"({int(count)} overlaps, total score {int(total)})")
    assert int(count) > 0, "benchmark found no overlaps"

    t0 = time.perf_counter()
    for _ in range(TIMED_ITERS):
        out = step(d_reads, d_lens)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0

    reads_per_min = READS_PER_BATCH * TIMED_ITERS / elapsed * 60.0
    # SW cell-updates actually performed (forward+reverse pass over the
    # compacted batch, full padded window) for a GCUPS side-metric
    gcups = (2 * sw_batch * PAD_LEN * PAD_LEN * TIMED_ITERS) / elapsed / 1e9
    log(f"{elapsed / TIMED_ITERS * 1e3:.1f} ms/batch, "
        f"{reads_per_min:,.0f} reads/min, {gcups:.1f} GCUPS(padded)")

    print(json.dumps({
        "metric": "paired_150bp_reads_per_min_1chip",
        "value": round(reads_per_min, 1),
        "unit": "reads/min",
        "vs_baseline": round(reads_per_min / 5_000_000, 4),
    }))


if __name__ == "__main__":
    main()
