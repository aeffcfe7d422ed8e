"""Quick probe: chunked SW cost (fwd+rev) on the bench shapes."""

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
    from kslam_tpu.ops import encode, kmers, match
    from kslam_tpu.ops import sw as sw_ops

    genomes, reads, lengths = bench.build_problem(
        num_reads=bench.READS_PER_BATCH)
    gindex = GenbankIndex(
        [GenbankEntry(bases=g.tobytes().decode()) for g in genomes])
    kidx = KmerIndex.build(gindex)
    *d_idx, d_pstart, p_bits, p_window = kidx.device_arrays()
    genome_scodes = jnp.asarray(sw_ops.genome_chunks_from_scodes(
        encode.sw_codes_np(gindex.bases_concat)))
    entry_offsets = jnp.asarray(gindex.entry_offsets)
    d_reads = jnp.asarray(reads)
    d_lens = jnp.asarray(lengths)
    kmv, off, rc, valid = jax.jit(kmers.read_kmers_device)(d_reads, d_lens)
    p = PipelineConfig().sw

    @jax.jit
    def matchfn(kmv, off, rc, valid):
        res = match.match_overlaps(kmv, off, rc, valid, d_lens, *d_idx,
                                   max_matches=16, capacity=1 << 18,
                                   chain_iters=16)
        return match.compact_overlaps(res, 1 << 15)

    res = matchfn(kmv, off, rc, valid)
    read_scodes = jax.jit(encode.sw_codes)(d_reads)

    @jax.jit
    def swfn(res):
        return sw_ops.align_overlaps_batch_chunked(
            res.read_id, res.entry_id, res.rel_pos, res.rc, res.valid,
            read_scodes, d_lens, genome_scodes, entry_offsets,
            p.match, p.mismatch, p.gap_open, p.gap_extend,
            window_len=bench.PAD_LEN)

    al = swfn(res)
    jax.device_get(al.score[0])
    N = 20
    t0 = time.perf_counter()
    for _ in range(N):
        al = swfn(res)
    jax.device_get(al.score[0])
    dt = (time.perf_counter() - t0) / N
    cells = 2 * (1 << 15) * bench.PAD_LEN * bench.PAD_LEN
    print(f"SW fwd+rev: {dt*1e3:.1f} ms  "
          f"({cells/dt/1e9:.1f} GCUPS over true window)", file=sys.stderr)


if __name__ == "__main__":
    main()
