"""Per-stage device timing of the production pipeline (bench.py problem).

Builds (or loads from cache) the same DB bench.py uses, plants one chunk
of reads, then times each device stage standalone with the enqueue-N /
sync-one-scalar method: the first call compiles + warms, then N
dispatches are enqueued back-to-back and one output scalar is fetched,
so the axon tunnel's ~7ms/dispatch enqueue latency amortizes out.

Usage: python benches/profile_stages.py [total_mbp] [num_genomes]
       (defaults are bench.py's 1600 16; "10 8" is a quick run)
Args flow through to bench.py's module-level size globals.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402  (parses sys.argv for TOTAL_MBP/NUM_GENOMES)


def main():
    import jax
    import jax.numpy as jnp
    from kslam_tpu.config import PipelineConfig
    from kslam_tpu.db.taxonomy import TaxonomyDB
    from kslam_tpu.ops import encode, kmers, match, lca as lca_ops, \
        pairing_dev
    from kslam_tpu.ops import sw as sw_ops
    from kslam_tpu.pipeline import align, device_path

    gindex, kidx = bench.build_or_load_db()
    db = align.DeviceDB.from_index(gindex, kidx, flat_scodes=False)
    config = PipelineConfig()
    p = config.sw
    mid = bench.READS_PER_BATCH // 2

    taxdb = TaxonomyDB()
    taxdb.parent_of[1] = 1
    taxdb.parent_of[2] = 1
    for i in range(bench.NUM_GENOMES):
        taxdb.parent_of[10 + i] = 2
    for t in taxdb.parent_of:
        taxdb.rank_of[t] = "no rank"
        taxdb.name_of[t] = f"n{t}"
    tables = lca_ops.build_device_tables(taxdb)
    entry_taxids = jnp.asarray(gindex.taxonomy_ids.astype(np.int32))

    rng = np.random.default_rng(7)
    reads, lengths = bench.plant_chunk(gindex, rng, bench.READS_PER_BATCH)
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

    capacity = config.max_pairs_per_batch
    sw_batch = config.sw_batch
    print(f"caps: max_matches={config.max_matches_per_kmer} "
          f"capacity={capacity} sw_batch={sw_batch}", file=sys.stderr)

    # stage 1: kmerize
    kmfn = jax.jit(kmers.read_kmers_device)
    km_out = measure("kmerize", lambda: kmfn(d_reads, d_lens),
                     lambda r: r[0][0, 0])
    kmv, off, rc, valid = km_out

    # stage 2: match (prefix direct-addressed join) + compact.
    # NB: the DB columns are jit ARGUMENTS, not closure captures -- a
    # captured 2.5 GiB index becomes a lowered constant shipped through
    # the remote-compile pipe (and breaks it)
    @functools.partial(jax.jit, static_argnames=("pb", "pw"))
    def matchfn(kmv, off, rc, valid, lens, ik, ie, io, ir, ip, pb, pw):
        res = match.match_overlaps(
            kmv, off, rc, valid, lens, ik, ie, io, ir,
            max_matches=config.max_matches_per_kmer, capacity=capacity,
            chain_iters=min(config.dedup_group_cap, 48),
            idx_pstart=ip, prefix_bits=pb, window=pw)
        return match.compact_overlaps(res, sw_batch)

    res = measure("match+compact",
                  lambda: matchfn(kmv, off, rc, valid, d_lens, db.kmers,
                                  db.entry_id, db.offset, db.rc, db.pstart,
                                  db.prefix_bits, db.prefix_window),
                  lambda r: r.count)

    # join-only sub-stage (prefix table lookups alone)
    @functools.partial(jax.jit, static_argnames=("pb", "pw"))
    def joinfn(kmv, valid, ik, ip, pb, pw):
        from kslam_tpu.ops import join
        q = kmv.reshape(-1)
        lo, hi = join.lookup_prefix_window(ik, ip, q, pb, pw)
        return jnp.sum(jnp.where(valid.reshape(-1), hi - lo, 0))

    try:
        measure("  join only",
                lambda: joinfn(kmv, valid, db.kmers, db.pstart,
                               db.prefix_bits, db.prefix_window),
                lambda r: r)
    except Exception as e:  # keep the profile going if the API shifts
        print(f"  join only: skipped ({type(e).__name__})",
              file=sys.stderr)
    print(f"  candidates: {int(jax.device_get(res.count))}",
          file=sys.stderr)

    read_scodes = jax.jit(encode.sw_codes)(d_reads)

    @jax.jit
    def swfn(res, gchunks, eoff):
        return sw_ops.align_overlaps_batch_chunked(
            res.read_id, res.entry_id, res.rel_pos, res.rc, res.valid,
            read_scodes, d_lens, gchunks, eoff,
            p.match, p.mismatch, p.gap_open, p.gap_extend,
            window_len=bench.PAD_LEN)

    al = measure("SW fwd+rev",
                 lambda: swfn(res, db.genome_chunks, db.entry_offsets),
                 lambda r: r.score[0])

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
    n_pairs = int(jax.device_get(prs.count))
    pair_cap = device_path.cap_rung(2 * n_pairs + 1)
    print(f"  pair emissions: {n_pairs} (cap rung {pair_cap})",
          file=sys.stderr)

    @jax.jit
    def pbs(a):
        return device_path.phase_b_screens(
            a, np.int32(mid), fixed_mi,
            fraction=config.score_fraction_threshold, paired=True,
            pair_cap=pair_cap, chains=True)

    cols, perm, cseg = measure("b_screens+chains", lambda: pbs(a),
                               lambda r: r[0].group[0])

    def rescore():
        return device_path.rescore_chains_host(cols, perm, cseg)

    t0 = time.perf_counter()
    for _ in range(5):
        rescore()
    print(f"host rescore (transfer+C++): "
          f"{(time.perf_counter()-t0)/5*1e3:.1f} ms", file=sys.stderr)

    @jax.jit
    def pbf(cols):
        return device_path.phase_b_finish(
            cols, entry_taxids, tables,
            fraction=config.score_fraction_threshold, rescreen=True)

    measure("b_finish", lambda: pbf(cols), lambda r: r.read_lca[0])


if __name__ == "__main__":
    main()
