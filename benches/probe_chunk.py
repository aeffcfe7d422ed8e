"""Chunk-flow section timing: phase A enqueue, inserts get, model,
phase B screens/chains, rescore transfer+host, finish, final get."""

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

    chunk_reads = bench.READS_PER_BATCH * bench.NUM_BATCHES
    genomes, reads, lengths = bench.build_problem(num_reads=chunk_reads)
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
    chunk_mid = chunk_reads // 2
    unit = bench.READS_PER_BATCH // 2
    mid_local = unit
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
    d_batches = []
    for i in range(bench.NUM_BATCHES):
        lo = i * unit
        slab = np.concatenate([reads[lo:lo + unit],
                               reads[chunk_mid + lo:chunk_mid + lo + unit]])
        d_batches.append((jnp.asarray(slab),
                          jnp.asarray(lengths[:bench.READS_PER_BATCH])))

    def run_chunk(timers):
        t = time.perf_counter
        t0 = t()
        a_list = []
        for bases, lens in d_batches:
            a_list.append(device_path.phase_a(
                bases, lens, np.int32(mid_local), *d_idx, genome_scodes,
                entry_offsets, max_matches=16, capacity=capacity,
                sw_batch=sw_batch, chain_iters=16, match_s=p.match,
                mismatch=p.mismatch, gap_open=p.gap_open,
                gap_extend=p.gap_extend, window_len=bench.PAD_LEN,
                score_threshold=0))
        timers["a_enqueue"] += t() - t0; t0 = t()
        counts_and_inserts = jax.device_get(
            [(a.pairs.count, a.pairs.insert_size) for a in a_list])
        timers["inserts_get"] += t() - t0; t0 = t()
        parts = []
        for c, ins in counts_and_inserts:
            ins = ins[:int(c)]
            ins = ins[ins != 0].astype(np.int64)
            parts.append(np.where(ins >= 2**31, ins - 2**32, ins))
        allins = np.concatenate(parts)
        max_insert = pairing.max_allowed_insert_size_from_sizes(
            sorted(int(x) for x in allins))
        timers["model"] += t() - t0; t0 = t()
        counts = [int(c) for c, _ in counts_and_inserts]
        total = sum(counts)
        pow2 = lambda x: 1 << max(0, (x - 1)).bit_length()
        cap = min(pair_cap, pow2(2 * max(counts) + 1))
        b, _ = device_path.run_chunk_phase_b_exact(
            a_list, mid_local, chunk_mid, unit,
            np.uint32(min(max_insert, 2**32 - 1)), entry_taxids, tables,
            fraction=config.score_fraction_threshold,
            perform_pseudo_assembly=True, pair_cap=cap, batch_cap=cap,
            chunk_cap=min(pow2(2 * total + 1),
                          bench.NUM_BATCHES * 2 * cap))
        timers["phase_b"] += t() - t0; t0 = t()
        lca, valid = jax.device_get((b.read_lca, b.cols.valid))
        timers["final_get"] += t() - t0
        return total, lca, valid

    timers = {k: 0.0 for k in ("a_enqueue", "inserts_get", "model",
                               "phase_b", "final_get")}
    run_chunk(timers)  # warm
    timers = {k: 0.0 for k in timers}
    N = 3
    t0 = time.perf_counter()
    for _ in range(N):
        run_chunk(timers)
    tot = time.perf_counter() - t0
    for k, v in timers.items():
        print(f"{k}: {v/N*1e3:.1f} ms/chunk "
              f"({v/N/bench.NUM_BATCHES*1e3:.1f} ms/batch)",
              file=sys.stderr)
    print(f"total: {tot/N*1e3:.1f} ms/chunk = "
          f"{chunk_reads/(tot/N)*60/1e6:.2f}M reads/min", file=sys.stderr)


if __name__ == "__main__":
    main()
