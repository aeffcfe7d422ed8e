"""Per-stage device timing of the production pipeline (bench.py problem).

Builds (or loads from cache) the same DB bench.py uses, plants K distinct
chunks of reads, then times each device stage standalone.

Axon-tunnel measurement rules (NOTES.md):
  * jax.block_until_ready is a NO-OP on tunnel futures -- execution must
    be forced with jax.device_get of a result leaf;
  * an eager out-of-jit slice (r[0]) compiles a tiny program through the
    remote-compile queue (minutes of latency) -- every stage fn therefore
    returns an IN-JIT scalar checksum, and the forcing fetch is one
    device_get of K 8-byte scalars;
  * identical repeated dispatches can be deduplicated server-side --
    every timed dispatch gets its own input batch.

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

K_DISPATCH = 8   # distinct batches per timed stage


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
    batches = []
    for _ in range(K_DISPATCH):
        reads, lengths = bench.plant_chunk(gindex, rng,
                                           bench.READS_PER_BATCH)
        batches.append((jnp.asarray(reads), jnp.asarray(lengths)))

    def measure(name, fn, args_list):
        """fn returns (full_result, scalar_checksum); each timed dispatch
        gets distinct args; ONE device_get of the K checksums forces."""
        outs0 = fn(*args_list[0])
        jax.device_get(outs0[1])           # compile + warm
        t0 = time.perf_counter()
        outs = [fn(*a) for a in args_list]
        jax.device_get([o[1] for o in outs])
        dt = (time.perf_counter() - t0) / len(args_list)
        print(f"{name}: {dt * 1e3:.1f} ms", file=sys.stderr)
        return [o[0] for o in outs]

    capacity = config.max_pairs_per_batch
    sw_batch = config.sw_batch
    print(f"caps: max_matches={config.max_matches_per_kmer} "
          f"capacity={capacity} sw_batch={sw_batch}", file=sys.stderr)

    # stage 1: kmerize
    @jax.jit
    def kmfn(bases, lens):
        out = kmers.read_kmers_device(bases, lens)
        return out, out[0].sum()

    km_outs = measure("kmerize", kmfn,
                      [(b, le) for b, le in batches])

    # stage 2: match (one-gather bucket join + tier 2) + compact.
    # NB: the DB columns are jit ARGUMENTS, not closure captures -- a
    # captured 2.5 GiB index becomes a lowered constant shipped through
    # the remote-compile pipe (and breaks it)
    @functools.partial(jax.jit, static_argnames=("bb", "t2"))
    def matchfn(kmv, off, rc, valid, lens, ik, ie, io, ir, bkt, bb, t2,
                ipk):
        res = match.match_overlaps(
            kmv, off, rc, valid, lens, ik, ie, io, ir,
            max_matches=config.max_matches_per_kmer, capacity=capacity,
            chain_iters=min(config.dedup_group_cap, 48),
            idx_bucket=bkt, bucket_bits=bb, tier2_cap=t2, idx_pack=ipk)
        res = match.compact_overlaps(res, min(sw_batch, capacity))
        return res, res.count

    t2_cap = max(capacity // 16, 4096)
    match_args = [(km + (le, db.kmers, db.entry_id, db.offset, db.rc,
                         db.bucket, db.bucket_bits, t2_cap, db.idx_pack))
                  for km, (b, le) in zip(km_outs, batches)]
    results = measure("match+compact", matchfn, match_args)

    # join-only sub-stage (bucket row lookups alone)
    @functools.partial(jax.jit, static_argnames=("bb",))
    def joinfn(kmv, valid, bkt, bb):
        from kslam_tpu.ops import join
        q = kmv.reshape(-1)
        lo, hi, unc = join.lookup_bucket(bkt, q, bb)
        s = jnp.sum(jnp.where(valid.reshape(-1), hi - lo, 0)) + \
            jnp.sum(unc)
        return s, s

    measure("  join only", joinfn,
            [(km[0], km[3], db.bucket, db.bucket_bits)
             for km in km_outs])
    print(f"  candidates: {int(jax.device_get(results[0].count))}",
          file=sys.stderr)

    # stage 3: SW forward+reverse on the compacted candidates
    @jax.jit
    def swfn(res, bases, lens, gchunks, eoff):
        al = sw_ops.align_overlaps_batch_chunked(
            res.read_id, res.entry_id, res.rel_pos, res.rc, res.valid,
            encode.sw_codes(bases), lens, gchunks, eoff,
            p.match, p.mismatch, p.gap_open, p.gap_extend,
            window_len=bench.PAD_LEN)
        return al, al.score.sum()

    als = measure("SW fwd+rev", swfn,
                  [(r, b, le, db.genome_chunks, db.entry_offsets)
                   for r, (b, le) in zip(results, batches)])

    # stage 4: pairing sweep
    @jax.jit
    def pairfn(res, al, lens):
        score = jnp.where(res.valid, al.score, 0)
        prs = pairing_dev.pair_overlaps_device(
            res.read_id, res.entry_id, res.rel_pos, res.rc, res.valid,
            score, al.ref_begin, al.ref_end, lens, np.int32(mid))
        return prs, prs.count

    prss = measure("pairing", pairfn,
                   [(r, a, le) for r, a, (b, le)
                    in zip(results, als, batches)])

    a_outs = []
    for r, al, prs in zip(results, als, prss):
        score = jnp.where(r.valid, al.score, 0)
        a_outs.append(device_path.PhaseAOut(
            r, score, al.ref_begin, al.ref_end,
            al.query_begin, al.query_end, prs))
    n_pairs = int(jax.device_get(prss[0].count))
    pair_cap = device_path.cap_rung(2 * n_pairs + 1)
    print(f"  pair emissions: {n_pairs} (cap rung {pair_cap})",
          file=sys.stderr)

    # stage 5: phase-B screens + chain labelling
    fixed_mi = np.uint32(700)

    @jax.jit
    def pbs(a):
        out = device_path.phase_b_screens(
            a, np.int32(mid), fixed_mi,
            fraction=config.score_fraction_threshold, paired=True,
            pair_cap=pair_cap, chains=True)
        return out, out[0].group.sum()

    screen_outs = measure("b_screens+chains", pbs,
                          [(a,) for a in a_outs])

    # stage 6: host rescore (device->host transfer + native C++)
    t0 = time.perf_counter()
    for cols, perm, cseg in screen_outs[:5]:
        device_path.rescore_chains_host(cols, perm, cseg)
    print(f"host rescore (transfer+C++): "
          f"{(time.perf_counter() - t0) / 5 * 1e3:.1f} ms",
          file=sys.stderr)

    # stage 7: finish (rescreen + LCA)
    @jax.jit
    def pbf(cols):
        out = device_path.phase_b_finish(
            cols, entry_taxids, tables,
            fraction=config.score_fraction_threshold, rescreen=True)
        return out, out.read_lca.sum()

    measure("b_finish", pbf, [(cols,) for cols, _, _ in screen_outs])


if __name__ == "__main__":
    main()
