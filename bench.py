"""Headline benchmark: full-pipeline paired-read throughput on one chip.

Measures the complete device classification pipeline exactly as the CLI
runs it (pipeline/run.py chunk flow): a chunk of paired 150bp reads split
into fixed-shape device batches, phase A (k-merization -> presorted-index
join -> compaction -> batched Smith-Waterman -> pairing sweep) enqueued
for every batch back-to-back, ONE chunk-wide insert-size model on host
(SLAM.h:221 semantics), per-batch insert/score screens, then the
chunk-global pseudo-assembly with exact double-precision host rescoring
and the per-read LCA finish.  The timed result is the per-read taxon
assignment materialized on host (the PerRead output of the reference).

Problem: 150bp paired reads with ~1% mutations planted in random genomes,
stride-16 genome index (SLAM.h:65).  The reference binary's headline
number is 5M paired 150bp reads/min on a >=8-core CPU host
(README.md:12), which is the vs_baseline denominator.

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
READS_PER_BATCH = 16384       # reads per device batch (8192 pairs)
NUM_BATCHES = 32              # device batches per chunk (amortizes the
                              # per-chunk host syncs like a real 10M chunk)
MUT_RATE = 0.01
TIMED_CHUNKS = 3


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_problem(seed=0, num_reads=READS_PER_BATCH):
    rng = np.random.default_rng(seed)
    bases4 = np.frombuffer(b"ACGT", dtype=np.uint8)
    genomes = [rng.choice(bases4, GENOME_LEN) for _ in range(NUM_GENOMES)]

    comp = np.zeros(256, np.uint8)
    comp[ord("A")], comp[ord("C")] = ord("T"), ord("G")
    comp[ord("G")], comp[ord("T")] = ord("C"), ord("A")

    reads = np.zeros((num_reads, PAD_LEN), dtype=np.uint8)
    n_pairs = num_reads // 2
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
        # R1 block first, then R2 block (reference paired layout)
        reads[i, :READ_LEN] = r1
        reads[n_pairs + i, :READ_LEN] = r2
    lengths = np.full(num_reads, READ_LEN, dtype=np.int32)
    return genomes, reads, lengths


def main():
    import jax
    import jax.numpy as jnp
    from kslam_tpu.config import PipelineConfig
    from kslam_tpu.db.genbank import GenbankEntry, GenbankIndex
    from kslam_tpu.db.kmer_index import KmerIndex
    from kslam_tpu.db.taxonomy import TaxonomyDB
    from kslam_tpu.ops import encode, lca as lca_ops
    from kslam_tpu.ops import sw as sw_ops
    from kslam_tpu.pipeline import device_path, pairing

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    t0 = time.perf_counter()
    chunk_reads = READS_PER_BATCH * NUM_BATCHES
    genomes, reads, lengths = build_problem(num_reads=chunk_reads)
    gindex = GenbankIndex(
        [GenbankEntry(bases=g.tobytes().decode()) for g in genomes])
    kidx = KmerIndex.build(gindex)
    m = len(kidx)
    *d_idx, d_pstart, p_bits, p_window = kidx.device_arrays()
    genome_scodes = jnp.asarray(sw_ops.genome_chunks_from_scodes(
        encode.sw_codes_np(gindex.bases_concat)))
    entry_offsets = jnp.asarray(gindex.entry_offsets)
    log(f"index: {m} k-mers over {NUM_GENOMES}x{GENOME_LEN}bp "
        f"({time.perf_counter() - t0:.1f}s host build)")

    config = PipelineConfig()
    p = config.sw
    capacity = 1 << 18
    sw_batch = 1 << 15          # dense post-compaction SW set
    pair_cap = 1 << 16
    chunk_mid = chunk_reads // 2
    unit = READS_PER_BATCH // 2          # pairs per device batch
    mid_local = READS_PER_BATCH // 2

    # tiny synthetic taxonomy: every genome its own taxon under one parent
    taxdb = TaxonomyDB()
    taxdb.parent_of[1] = 1
    taxdb.parent_of[2] = 1
    for i in range(NUM_GENOMES):
        taxdb.parent_of[10 + i] = 2
        gindex.entries[i].taxonomy_id = 10 + i
    for t in taxdb.parent_of:
        taxdb.rank_of[t] = "no rank"
        taxdb.name_of[t] = f"n{t}"
    tables = lca_ops.build_device_tables(taxdb)
    entry_taxids = jnp.asarray(gindex.taxonomy_ids.astype(np.int32))

    # per-device-batch read slabs (R1 block + R2 block, local midpoint)
    d_batches = []
    for i in range(NUM_BATCHES):
        lo = i * unit
        slab = np.concatenate([reads[lo:lo + unit],
                               reads[chunk_mid + lo:chunk_mid + lo + unit]])
        d_batches.append((jnp.asarray(slab),
                          jnp.asarray(lengths[:READS_PER_BATCH])))

    def enqueue_phase_a():
        a_list = []
        for bases, lens in d_batches:
            a_list.append(device_path.phase_a(
                bases, lens, np.int32(mid_local), *d_idx, genome_scodes,
                entry_offsets, max_matches=16, capacity=capacity,
                sw_batch=sw_batch, chain_iters=16, match_s=p.match,
                mismatch=p.mismatch, gap_open=p.gap_open,
                gap_extend=p.gap_extend, window_len=PAD_LEN,
                score_threshold=0))
        return a_list

    def finish_chunk(a_list):
        """Chunk tail exactly like pipeline/run.process_batch_device."""
        counts_and_inserts = jax.device_get(
            [(a.pairs.count, a.pairs.insert_size) for a in a_list])
        parts = []
        for c, ins in counts_and_inserts:
            ins = ins[:int(c)]
            ins = ins[ins != 0].astype(np.int64)
            parts.append(np.where(ins >= 2**31, ins - 2**32, ins))
        allins = np.concatenate(parts)
        max_insert = pairing.max_allowed_insert_size_from_sizes(
            sorted(int(x) for x in allins))
        counts = [int(c) for c, _ in counts_and_inserts]
        total = sum(counts)
        pow2 = lambda x: 1 << max(0, (x - 1)).bit_length()
        cap = min(pair_cap, pow2(2 * max(counts) + 1))
        b, _ = device_path.run_chunk_phase_b_exact(
            a_list, mid_local, chunk_mid, unit,
            np.uint32(min(max_insert, 2**32 - 1)), entry_taxids, tables,
            fraction=config.score_fraction_threshold,
            perform_pseudo_assembly=True, pair_cap=cap, batch_cap=cap,
            chunk_cap=min(pow2(2 * total + 1), NUM_BATCHES * 2 * cap))
        # per-read classification materialized on host = the timed output
        lca, valid = jax.device_get((b.read_lca, b.cols.valid))
        return total, lca, valid

    t0 = time.perf_counter()
    count, lca_host, valid_host = finish_chunk(enqueue_phase_a())
    log(f"compile+first-run: {time.perf_counter() - t0:.1f}s "
        f"({count} pair emissions, "
        f"{int((lca_host[valid_host] > 0).sum())} classified rows)")
    assert count > 0, "benchmark found no pairs"

    # steady-state: chunk k+1's phase A is enqueued before chunk k's host
    # mid-sections, so model/rescore/transfer latencies hide behind device
    # compute (the CLI streaming loop pipelines chunks the same way)
    t0 = time.perf_counter()
    a_next = enqueue_phase_a()
    for i in range(TIMED_CHUNKS):
        a_cur, a_next = a_next, (enqueue_phase_a()
                                 if i + 1 < TIMED_CHUNKS else None)
        count, lca_host, valid_host = finish_chunk(a_cur)
    elapsed = time.perf_counter() - t0

    total_reads = chunk_reads * TIMED_CHUNKS
    reads_per_min = total_reads / elapsed * 60.0
    # SW cell-updates actually performed (forward+reverse pass over the
    # compacted batch, full padded window) for a GCUPS side-metric
    gcups = (2 * sw_batch * PAD_LEN * PAD_LEN * NUM_BATCHES *
             TIMED_CHUNKS) / elapsed / 1e9
    log(f"{elapsed / (TIMED_CHUNKS * NUM_BATCHES) * 1e3:.1f} ms/batch, "
        f"{reads_per_min:,.0f} reads/min, {gcups:.1f} GCUPS(padded)")

    print(json.dumps({
        "metric": "paired_150bp_reads_per_min_1chip",
        "value": round(reads_per_min, 1),
        "unit": "reads/min",
        "vs_baseline": round(reads_per_min / 5_000_000, 4),
    }))


if __name__ == "__main__":
    main()
