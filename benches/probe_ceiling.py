"""True device-compute ceiling: enqueue many full steps, sync once."""

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
    from kslam_tpu.pipeline import device_path

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
    fixed_mi = np.uint32(700)

    @jax.jit
    def full_step(bases, lens):
        a = device_path.phase_a(
            bases, lens, np.int32(mid), *d_idx, genome_scodes,
            entry_offsets, max_matches=16, capacity=capacity,
            sw_batch=sw_batch, chain_iters=16, match_s=p.match,
            mismatch=p.mismatch, gap_open=p.gap_open,
            gap_extend=p.gap_extend, window_len=bench.PAD_LEN,
            score_threshold=0)
        b = device_path.phase_b(
            a, np.int32(mid), fixed_mi, entry_taxids, tables,
            fraction=config.score_fraction_threshold,
            perform_pseudo_assembly=True)
        # tiny summary so the final sync transfers 2 words, not arrays
        return jnp.sum(b.read_lca.astype(jnp.int64)), a.pairs.count

    t0 = time.perf_counter()
    s, c = full_step(d_reads, d_lens)
    sh, ch = jax.device_get((s, c))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s "
          f"(sum={sh}, count={ch})", file=sys.stderr)

    for N in (10, 30):
        t0 = time.perf_counter()
        for _ in range(N):
            s, c = full_step(d_reads, d_lens)
        sh = jax.device_get(s)
        dt = (time.perf_counter() - t0) / N
        print(f"N={N}: {dt*1e3:.1f} ms/batch "
              f"({bench.READS_PER_BATCH/dt*60/1e6:.2f}M reads/min)",
              file=sys.stderr)

    # same but a device_get of the full read_lca every batch (transfer cost)
    @jax.jit
    def full_step_arr(bases, lens):
        a = device_path.phase_a(
            bases, lens, np.int32(mid), *d_idx, genome_scodes,
            entry_offsets, max_matches=16, capacity=capacity,
            sw_batch=sw_batch, chain_iters=16, match_s=p.match,
            mismatch=p.mismatch, gap_open=p.gap_open,
            gap_extend=p.gap_extend, window_len=bench.PAD_LEN,
            score_threshold=0)
        b = device_path.phase_b(
            a, np.int32(mid), fixed_mi, entry_taxids, tables,
            fraction=config.score_fraction_threshold,
            perform_pseudo_assembly=True)
        return b.read_lca

    r = full_step_arr(d_reads, d_lens)
    np.asarray(r)
    N = 10
    t0 = time.perf_counter()
    for _ in range(N):
        r = full_step_arr(d_reads, d_lens)
        np.asarray(r)
    dt = (time.perf_counter() - t0) / N
    print(f"with per-batch array get: {dt*1e3:.1f} ms/batch "
          f"({bench.READS_PER_BATCH/dt*60/1e6:.2f}M reads/min)",
          file=sys.stderr)

    # per-batch get, but K batches in flight (async pipelined gets)
    N = 20
    t0 = time.perf_counter()
    pend = []
    for _ in range(N):
        pend.append(full_step_arr(d_reads, d_lens))
        if len(pend) > 3:
            np.asarray(pend.pop(0))
    for r in pend:
        np.asarray(r)
    dt = (time.perf_counter() - t0) / N
    print(f"pipelined gets (depth 4): {dt*1e3:.1f} ms/batch "
          f"({bench.READS_PER_BATCH/dt*60/1e6:.2f}M reads/min)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
