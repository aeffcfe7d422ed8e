"""Measure pipelined (cross-batch overlapped) throughput of the full step.

Compares:
  A. serial: per batch, full host sync in the middle (bench.py today)
  B. pipelined: enqueue phase_a for batch i+1 before the host mid-section
     of batch i; device_get calls overlap device compute of other batches.
  C. device-only ceiling: phase_a+phase_b with a FIXED max_insert (no host
     mid-section), k batches enqueued then one sync.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402


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

    genomes, reads, lengths = bench.build_problem()
    gindex = GenbankIndex(
        [GenbankEntry(bases=g.tobytes().decode()) for g in genomes])
    kidx = KmerIndex.build(gindex)
    *d_idx, d_pstart, p_bits, p_window = kidx.device_arrays()
    genome_scodes = jnp.asarray(sw_ops.genome_chunks_from_scodes(
        encode.sw_codes_np(gindex.bases_concat)))
    entry_offsets = jnp.asarray(gindex.entry_offsets)

    config = PipelineConfig()
    p = config.sw
    capacity = 1 << 18
    sw_batch = 1 << 15
    pair_cap = 1 << 16
    mid = bench.READS_PER_BATCH // 2

    taxdb = TaxonomyDB()
    taxdb.parent_of[1] = 1
    taxdb.parent_of[2] = 1
    for i in range(bench.NUM_GENOMES):
        taxdb.parent_of[10 + i] = 2
        gindex.entries[i].taxonomy_id = 10 + i
    for t in taxdb.parent_of:
        taxdb.rank_of[t] = "no rank"
        taxdb.name_of[t] = f"n{t}"
    tables = lca_ops.build_device_tables(taxdb)
    entry_taxids = jnp.asarray(gindex.taxonomy_ids.astype(np.int32))

    d_reads = jnp.asarray(reads)
    d_lens = jnp.asarray(lengths)

    def run_a():
        return device_path.phase_a(
            d_reads, d_lens, np.int32(mid), *d_idx, genome_scodes,
            entry_offsets, max_matches=16, capacity=capacity,
            sw_batch=sw_batch, chain_iters=16, match_s=p.match,
            mismatch=p.mismatch, gap_open=p.gap_open,
            gap_extend=p.gap_extend, window_len=bench.PAD_LEN,
            score_threshold=0)

    def host_mid(a):
        ins = np.asarray(a.pairs.insert_size)[:int(a.pairs.count)]
        ins = ins[ins != 0].astype(np.int64)
        ins = np.where(ins >= 2**31, ins - 2**32, ins)
        return pairing.max_allowed_insert_size_from_sizes(
            sorted(int(x) for x in ins))

    def run_b(a, max_insert):
        return device_path.run_phase_b_exact(
            a, np.int32(mid), np.uint32(min(max_insert, 2**32 - 1)),
            entry_taxids, tables,
            fraction=config.score_fraction_threshold,
            perform_pseudo_assembly=True, pair_cap=pair_cap)

    # warm/compile
    a = run_a()
    mi = host_mid(a)
    b = run_b(a, mi)
    np.asarray(b.read_lca)
    print("warm done", file=sys.stderr)

    N = 5
    # A: serial
    t0 = time.perf_counter()
    for _ in range(N):
        a = run_a()
        mi = host_mid(a)
        b = run_b(a, mi)
        np.asarray(b.read_lca)
    tA = (time.perf_counter() - t0) / N
    print(f"A serial: {tA*1e3:.1f} ms/batch "
          f"({bench.READS_PER_BATCH/tA*60/1e6:.2f}M reads/min)",
          file=sys.stderr)

    # B: pipelined with one batch in flight
    t0 = time.perf_counter()
    a_next = run_a()
    results = []
    for i in range(N):
        a_cur, a_next = a_next, (run_a() if i + 1 < N else None)
        mi = host_mid(a_cur)
        b = run_b(a_cur, mi)
        results.append(b.read_lca)
    for r in results:
        np.asarray(r)
    tB = (time.perf_counter() - t0) / N
    print(f"B pipelined: {tB*1e3:.1f} ms/batch "
          f"({bench.READS_PER_BATCH/tB*60/1e6:.2f}M reads/min)",
          file=sys.stderr)

    # C: device ceiling, fixed insert cutoff, no host mid-section
    fixed_mi = np.uint32(min(mi, 2**32 - 1))

    def dev_only():
        a = run_a()
        return device_path.phase_b(
            a, np.int32(mid), fixed_mi, entry_taxids, tables,
            fraction=config.score_fraction_threshold,
            perform_pseudo_assembly=True)

    r = dev_only()
    np.asarray(r.read_lca)
    t0 = time.perf_counter()
    rs = [dev_only() for _ in range(N)]
    for r in rs:
        np.asarray(r.read_lca)
    tC = (time.perf_counter() - t0) / N
    print(f"C device-only ceiling: {tC*1e3:.1f} ms/batch "
          f"({bench.READS_PER_BATCH/tC*60/1e6:.2f}M reads/min)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
