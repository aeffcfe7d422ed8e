"""Honest per-stage device timing: enqueue N iterations, sync one scalar."""

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
    from kslam_tpu.ops import encode, kmers, match, lca as lca_ops, \
        pairing_dev, screens_dev
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
    fixed_mi = np.uint32(700)

    def measure(name, fn, out_scalar, N=20):
        jax.device_get(out_scalar(fn()))
        t0 = time.perf_counter()
        for _ in range(N):
            r = fn()
        jax.device_get(out_scalar(r))
        print(f"{name}: {(time.perf_counter()-t0)/N*1e3:.1f} ms",
              file=sys.stderr)
        return r

    # stage 1: kmerize
    kmfn = jax.jit(kmers.read_kmers_device)
    km_out = measure("kmerize", lambda: kmfn(d_reads, d_lens),
                     lambda r: r[0][0, 0])
    kmv, off, rc, valid = km_out

    # stage 2a: searchsorted joins only
    @jax.jit
    def joinonly(kmv, valid):
        from kslam_tpu.ops import join
        q = kmv.reshape(-1)
        lo = join.searchsorted_blocked(d_idx[0], q, side="left")
        hi = join.searchsorted_blocked(d_idx[0], q, side="right")
        return jnp.sum(hi - lo)

    measure("  searchsorted x2", lambda: joinonly(kmv, valid), lambda r: r)

    # stage 2: match + compact
    @jax.jit
    def matchfn(kmv, off, rc, valid):
        res = match.match_overlaps(kmv, off, rc, valid, d_lens, *d_idx,
                                   max_matches=16, capacity=capacity,
                                   chain_iters=16)
        return match.compact_overlaps(res, sw_batch)

    res = measure("match+compact", lambda: matchfn(kmv, off, rc, valid),
                  lambda r: r.count)

    read_scodes = jax.jit(encode.sw_codes)(d_reads)

    @jax.jit
    def swfn(res):
        return sw_ops.align_overlaps_batch_chunked(
            res.read_id, res.entry_id, res.rel_pos, res.rc, res.valid,
            read_scodes, d_lens, genome_scodes, entry_offsets,
            p.match, p.mismatch, p.gap_open, p.gap_extend,
            window_len=bench.PAD_LEN)

    al = measure("SW fwd+rev", lambda: swfn(res), lambda r: r.score[0])

    score = jnp.where(res.valid, al.score, 0)

    @jax.jit
    def pairfn(res, score, rb, re):
        return pairing_dev.pair_overlaps_device(
            res.read_id, res.entry_id, res.rel_pos, res.rc, res.valid,
            score, rb, re, d_lens, np.int32(mid))

    prs = measure("pairing", lambda: pairfn(res, score, al.ref_begin,
                                            al.ref_end),
                  lambda r: r.count)

    a = device_path.PhaseAOut(res, score, al.ref_begin, al.ref_end,
                              al.query_begin, al.query_end, prs)

    @jax.jit
    def pbfn(a):
        return device_path.phase_b(
            a, np.int32(mid), fixed_mi, entry_taxids, tables,
            fraction=config.score_fraction_threshold,
            perform_pseudo_assembly=True)

    measure("phase_b (device pa)", lambda: pbfn(a), lambda r: r.read_lca[0])

    # phase_b sub-stages
    @jax.jit
    def pbs(a):
        return device_path.phase_b_screens(
            a, np.int32(mid), fixed_mi,
            fraction=config.score_fraction_threshold, paired=True,
            pair_cap=pair_cap, chains=True)

    cols, perm, cseg = measure("  b_screens+chains", lambda: pbs(a),
                               lambda r: r[0].group[0])

    @jax.jit
    def pbf(cols):
        return device_path.phase_b_finish(
            cols, entry_taxids, tables,
            fraction=config.score_fraction_threshold, rescreen=True)

    measure("  b_finish", lambda: pbf(cols), lambda r: r.read_lca[0])


if __name__ == "__main__":
    main()
