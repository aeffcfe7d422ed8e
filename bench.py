"""Headline benchmark: full-pipeline paired-read throughput on one chip.

Measures the complete device classification pipeline (k-merization ->
presorted-index join -> compaction -> batched Smith-Waterman -> pairing
sweep -> insert/score screens -> pseudo-assembly -> per-read LCA, with the
host insert-size model in the loop) on a synthetic bacterial-scale
problem: 150bp paired reads with ~1% mutations planted in random genomes,
stride-16 genome index (SLAM.h:65 semantics).  The reference binary's
headline number is 5M paired 150bp reads/min on a >=8-core CPU host
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
READS_PER_BATCH = 16384       # individual reads (8192 pairs)
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
    from kslam_tpu.db.taxonomy import TaxonomyDB
    from kslam_tpu.ops import encode, lca as lca_ops
    from kslam_tpu.pipeline import device_path, pairing

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    t0 = time.perf_counter()
    genomes, reads, lengths = build_problem()
    gindex = GenbankIndex(
        [GenbankEntry(bases=g.tobytes().decode()) for g in genomes])
    kidx = KmerIndex.build(gindex)
    m = len(kidx)
    *d_idx, d_pstart, p_bits, p_window = kidx.device_arrays()
    from kslam_tpu.ops import sw as sw_ops
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
    mid = READS_PER_BATCH // 2

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

    # Full pipeline step: phase A (kmerize..pairing) + host insert-size
    # model + phase B (screens, pseudo-assembly, per-read LCA).  DB arrays
    # are explicit jit args: closure-captured device arrays become embedded
    # executable constants, which the runtime re-materializes per call
    # (~290ms/call regression measured).
    def step(bases, lens):
        a = device_path.phase_a(
            bases, lens, np.int32(mid), *d_idx, genome_scodes,
            entry_offsets, max_matches=16, capacity=capacity,
            sw_batch=sw_batch, chain_iters=16, match_s=p.match,
            mismatch=p.mismatch, gap_open=p.gap_open,
            gap_extend=p.gap_extend, window_len=PAD_LEN,
            score_threshold=0)
        ins = np.asarray(a.pairs.insert_size)[:int(a.pairs.count)]
        ins = ins[ins != 0].astype(np.int64)
        ins = np.where(ins >= 2**31, ins - 2**32, ins)
        max_insert = pairing.max_allowed_insert_size_from_sizes(
            sorted(int(x) for x in ins))
        b = device_path.run_phase_b_exact(
            a, np.int32(mid), np.uint32(min(max_insert, 2**32 - 1)),
            entry_taxids, tables,
            fraction=config.score_fraction_threshold,
            perform_pseudo_assembly=True, pair_cap=pair_cap)
        return a.pairs.count, b.read_lca

    d_reads = jnp.asarray(reads)
    d_lens = jnp.asarray(lengths)

    t0 = time.perf_counter()
    count, lca_out = step(d_reads, d_lens)
    lca_host = np.asarray(lca_out)
    log(f"compile+first-run: {time.perf_counter() - t0:.1f}s "
        f"({int(count)} pair emissions, "
        f"{int((lca_host > 0).sum())} classified rows)")
    assert int(count) > 0, "benchmark found no pairs"

    t0 = time.perf_counter()
    for _ in range(TIMED_ITERS):
        count, lca_out = step(d_reads, d_lens)
        np.asarray(lca_out)  # host materialization: honest per-iter sync
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
