"""Stage-level timing of the bench.py pipeline on the real chip.

Times (a) phase_a total, (b) its sub-stages run standalone, (c) host
insert-size model + transfer, (d) phase_b. Stderr-only diagnostics.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402


def timeit(fn, iters=5):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    return (time.perf_counter() - t0) / iters, r


def main():
    import jax
    import jax.numpy as jnp
    from kslam_tpu.config import PipelineConfig
    from kslam_tpu.db.genbank import GenbankEntry, GenbankIndex
    from kslam_tpu.db.kmer_index import KmerIndex
    from kslam_tpu.db.taxonomy import TaxonomyDB
    from kslam_tpu.ops import encode, kmers, match, lca as lca_ops
    from kslam_tpu.ops import sw as sw_ops
    from kslam_tpu.pipeline import device_path, pairing

    genomes, reads, lengths = bench.build_problem()
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

    def pa():
        a = device_path.phase_a(
            d_reads, d_lens, np.int32(mid), *d_idx, genome_scodes,
            entry_offsets, max_matches=16, capacity=capacity,
            sw_batch=sw_batch, chain_iters=16, match_s=p.match,
            mismatch=p.mismatch, gap_open=p.gap_open,
            gap_extend=p.gap_extend, window_len=bench.PAD_LEN,
            score_threshold=0)
        jax.block_until_ready(a.pairs.count)
        return a

    t, a = timeit(pa)
    print(f"phase_a total: {t*1e3:.1f} ms", file=sys.stderr)

    # sub-stages
    kmfn = jax.jit(kmers.read_kmers_device)
    t, km_out = timeit(lambda: jax.block_until_ready(
        kmfn(d_reads, d_lens)))
    print(f"  kmerize: {t*1e3:.1f} ms", file=sys.stderr)

    kmv, off, rc, valid = km_out

    @jax.jit
    def matchfn(kmv, off, rc, valid):
        res = match.match_overlaps(kmv, off, rc, valid, d_lens, *d_idx,
                                   max_matches=16, capacity=capacity,
                                   chain_iters=16)
        return match.compact_overlaps(res, sw_batch)

    t, res = timeit(lambda: jax.block_until_ready(
        matchfn(kmv, off, rc, valid)))
    print(f"  match+compact: {t*1e3:.1f} ms", file=sys.stderr)

    read_scodes = jax.jit(encode.sw_codes)(d_reads)

    @jax.jit
    def swfn(res):
        return sw_ops.align_overlaps_batch_chunked(
            res.read_id, res.entry_id, res.rel_pos, res.rc, res.valid,
            read_scodes, d_lens, genome_scodes, entry_offsets,
            p.match, p.mismatch, p.gap_open, p.gap_extend,
            window_len=bench.PAD_LEN)

    t, al = timeit(lambda: jax.block_until_ready(swfn(res)))
    print(f"  SW (align_overlaps_batch_chunked): {t*1e3:.1f} ms",
          file=sys.stderr)

    from kslam_tpu.ops import pairing_dev

    @jax.jit
    def pairfn(res, score, rb, re):
        return pairing_dev.pair_overlaps_device(
            res.read_id, res.entry_id, res.rel_pos, res.rc, res.valid,
            score, rb, re, d_lens, np.int32(mid))

    score = jnp.where(res.valid, al.score, 0)
    t, prs = timeit(lambda: jax.block_until_ready(
        pairfn(res, score, al.ref_begin, al.ref_end)))
    print(f"  pairing: {t*1e3:.1f} ms", file=sys.stderr)

    # host mid-section
    a = pa()

    def host_mid():
        ins = np.asarray(a.pairs.insert_size)[:int(a.pairs.count)]
        ins = ins[ins != 0].astype(np.int64)
        ins = np.where(ins >= 2**31, ins - 2**32, ins)
        return pairing.max_allowed_insert_size_from_sizes(
            sorted(int(x) for x in ins))

    t, max_insert = timeit(host_mid)
    print(f"host insert model (+transfer): {t*1e3:.1f} ms", file=sys.stderr)

    def pb():
        b = device_path.run_phase_b_exact(
            a, np.int32(mid), np.uint32(min(max_insert, 2**32 - 1)),
            entry_taxids, tables,
            fraction=config.score_fraction_threshold,
            perform_pseudo_assembly=True, pair_cap=pair_cap)
        jax.block_until_ready(b.read_lca)
        return b

    t, b = timeit(pb)
    print(f"phase_b (exact, incl host rescore): {t*1e3:.1f} ms",
          file=sys.stderr)

    # phase_b device parts separately
    def pbs():
        out = device_path.phase_b_screens(
            a, np.int32(mid), np.uint32(min(max_insert, 2**32 - 1)),
            fraction=config.score_fraction_threshold, paired=True,
            pair_cap=pair_cap, chains=True)
        jax.block_until_ready(out[0].valid)
        return out

    t, (cols, perm, cseg) = timeit(pbs)
    print(f"  phase_b_screens+chains: {t*1e3:.1f} ms", file=sys.stderr)

    t, ns = timeit(lambda: device_path.rescore_chains_host(cols, perm, cseg))
    print(f"  rescore_chains_host: {t*1e3:.1f} ms", file=sys.stderr)

    cols2 = cols._replace(combined_score=jnp.asarray(ns))

    def pbf():
        out = device_path.phase_b_finish(
            cols2, entry_taxids, tables,
            fraction=config.score_fraction_threshold, rescreen=True)
        jax.block_until_ready(out.read_lca)
        return out

    t, _ = timeit(pbf)
    print(f"  phase_b_finish: {t*1e3:.1f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
