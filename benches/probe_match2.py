"""Quick probe: match+compact cost after gather packing."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from kslam_tpu.db.genbank import GenbankEntry, GenbankIndex
    from kslam_tpu.db.kmer_index import KmerIndex
    from kslam_tpu.ops import kmers, match

    genomes, reads, lengths = bench.build_problem(
        num_reads=bench.READS_PER_BATCH)
    gindex = GenbankIndex(
        [GenbankEntry(bases=g.tobytes().decode()) for g in genomes])
    kidx = KmerIndex.build(gindex)
    *d_idx, d_pstart, p_bits, p_window = kidx.device_arrays()
    d_reads = jnp.asarray(reads)
    d_lens = jnp.asarray(lengths)
    kmv, off, rc, valid = jax.jit(kmers.read_kmers_device)(d_reads, d_lens)

    @jax.jit
    def matchfn(kmv, off, rc, valid):
        res = match.match_overlaps(kmv, off, rc, valid, d_lens, *d_idx,
                                   max_matches=16, capacity=1 << 18,
                                   chain_iters=16)
        return match.compact_overlaps(res, 1 << 15)

    r = matchfn(kmv, off, rc, valid)
    jax.device_get(r.count)
    N = 20
    t0 = time.perf_counter()
    for _ in range(N):
        r = matchfn(kmv, off, rc, valid)
    jax.device_get(r.count)
    print(f"match+compact: {(time.perf_counter()-t0)/N*1e3:.1f} ms "
          f"(count={int(r.count)})", file=sys.stderr)


if __name__ == "__main__":
    main()
