"""Probe: realistic-scale index on the real chip (VERDICT round-1 item 4).

Builds an N-Gbp synthetic genome set (~10^8 index k-mers at stride 16),
loads it onto the device, and times phase A plus a sub-stage breakdown
(match join only / SW only) at the bench batch shape.

Timing is forced with jax.device_get of a result leaf: on the axon tunnel
platform jax.block_until_ready is a no-op on futures, so naive timing
measures dispatch, not execution.  Enqueuing K batches and fetching all
their counts in one device_get amortizes the ~20ms tunnel round-trip.

The genome set + sorted index are cached in --cache (default
/tmp/bigdb_cache_<Mbp>_<n>.npz) so re-probes skip the ~4min host build.

Usage: python benches/probe_bigdb.py [genome_Mbp_total] [num_genomes]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOTAL_MBP = int(sys.argv[1]) if len(sys.argv) > 1 else 1600
NUM_GENOMES = int(sys.argv[2]) if len(sys.argv) > 2 else 16
READ_LEN, PAD_LEN = 150, 160
READS_PER_BATCH = 16384
MUT_RATE = 0.01
K_BATCH = 8   # dispatches per timing fetch


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_or_load_db():
    from kslam_tpu.db.genbank import GenbankEntry, GenbankIndex
    from kslam_tpu.db.kmer_index import KmerIndex

    from kslam_tpu.config import K, GENOME_KMER_GAP
    glen = TOTAL_MBP * 1_000_000 // NUM_GENOMES
    # cache key includes K/gap/format version so build-logic changes never
    # silently reuse a stale index (advisor r2)
    cache = (f"/tmp/bigdb_cache_v2_{TOTAL_MBP}_{NUM_GENOMES}_"
             f"{K}_{GENOME_KMER_GAP}.npz")
    rng = np.random.default_rng(0)
    bases4 = np.frombuffer(b"ACGT", dtype=np.uint8)
    t0 = time.perf_counter()
    genomes = [bases4[rng.integers(0, 4, glen, dtype=np.uint8)]
               for _ in range(NUM_GENOMES)]
    log(f"genomes: {NUM_GENOMES} x {glen/1e6:.0f} Mbp "
        f"({time.perf_counter()-t0:.1f}s)")
    if os.path.exists(cache):
        t0 = time.perf_counter()
        d = np.load(cache)
        kidx = KmerIndex(d["kmers"], d["entry_id"], d["offset"],
                         d["rc"].astype(bool))
        log(f"index cache load: {len(kidx)/1e6:.1f}M k-mers "
            f"({time.perf_counter()-t0:.1f}s)")
    else:
        t0 = time.perf_counter()
        gindex = GenbankIndex(
            [GenbankEntry(bases=g.tobytes().decode()) for g in genomes])
        kidx = KmerIndex.build(gindex)
        log(f"index build: {len(kidx)/1e6:.1f}M k-mers "
            f"({time.perf_counter()-t0:.1f}s host)")
        np.savez(cache, kmers=kidx.kmers, entry_id=kidx.entry_id,
                 offset=kidx.offset, rc=kidx.rc)
    entry_offsets = np.zeros(NUM_GENOMES + 1, np.int64)
    entry_offsets[1:] = np.cumsum([len(g) for g in genomes])
    return genomes, kidx, entry_offsets


def make_reads(genomes, rng):
    glen = len(genomes[0])
    n_pairs = READS_PER_BATCH // 2
    reads = np.zeros((READS_PER_BATCH, PAD_LEN), np.uint8)
    bases4 = np.frombuffer(b"ACGT", dtype=np.uint8)
    comp = np.zeros(256, np.uint8)
    comp[ord("A")], comp[ord("C")] = ord("T"), ord("G")
    comp[ord("G")], comp[ord("T")] = ord("C"), ord("A")
    gsel = rng.integers(0, NUM_GENOMES, n_pairs)
    pos = rng.integers(0, glen - 2 * READ_LEN - 200, n_pairs)
    ins = rng.integers(2 * READ_LEN, 2 * READ_LEN + 200, n_pairs)
    for i in range(n_pairs):
        g = genomes[gsel[i]]
        r1 = g[pos[i]:pos[i] + READ_LEN].copy()
        r2 = comp[g[pos[i] + ins[i] - READ_LEN:pos[i] + ins[i]]][::-1].copy()
        for r in (r1, r2):
            m = rng.random(READ_LEN) < MUT_RATE
            r[m] = bases4[rng.integers(0, 4, int(m.sum()))]
        reads[i, :READ_LEN] = r1
        reads[n_pairs + i, :READ_LEN] = r2
    return reads, np.full(READS_PER_BATCH, READ_LEN, np.int32)


def main():
    import functools
    import jax
    import jax.numpy as jnp
    from kslam_tpu.config import PipelineConfig
    from kslam_tpu.ops import encode, kmers, match, sw as sw_ops
    from kslam_tpu.pipeline import device_path

    genomes, kidx, entry_offsets_np = build_or_load_db()
    rng = np.random.default_rng(7)

    t0 = time.perf_counter()
    *d_idx, d_pstart, p_bits, p_window = kidx.device_arrays()
    bases_concat = np.concatenate(genomes)
    genome_scodes = jnp.asarray(sw_ops.genome_chunks_from_scodes(
        encode.sw_codes_np(bases_concat)))
    entry_offsets = jnp.asarray(entry_offsets_np)
    _ = jax.device_get(d_idx[0][0])
    idx_bytes = sum(int(np.prod(x.shape)) * x.dtype.itemsize for x in d_idx)
    log(f"device put: {time.perf_counter()-t0:.1f}s; "
        f"index {idx_bytes/2**30:.2f} GiB + genome "
        f"{genome_scodes.size/2**30:.2f} GiB; prefix bits={p_bits} "
        f"window={p_window}")

    config = PipelineConfig()
    p = config.sw
    n_pairs = READS_PER_BATCH // 2
    batches = [tuple(map(jnp.asarray, make_reads(genomes, rng)))
               for _ in range(K_BATCH)]

    phase_a = functools.partial(
        device_path.phase_a, midpoint=np.int32(n_pairs),
        idx_kmers=d_idx[0], idx_entry=d_idx[1], idx_off=d_idx[2],
        idx_rc=d_idx[3], genome_scodes=genome_scodes,
        entry_offsets=entry_offsets, max_matches=16, capacity=1 << 18,
        sw_batch=1 << 15, chain_iters=16, match_s=p.match,
        mismatch=p.mismatch, gap_open=p.gap_open, gap_extend=p.gap_extend,
        window_len=PAD_LEN, score_threshold=0, idx_pstart=d_pstart,
        prefix_bits=p_bits, prefix_window=p_window)

    # ---- full phase A
    t0 = time.perf_counter()
    a = phase_a(*batches[0])
    cnt = int(jax.device_get(a.pairs.count))
    log(f"phase A compile+first: {time.perf_counter()-t0:.1f}s; "
        f"overlaps={int(jax.device_get(a.overlaps.count))} pairs={cnt} "
        f"overflow={int(jax.device_get(a.overlaps.overflow))}")
    t0 = time.perf_counter()
    outs = [phase_a(*b) for b in batches]
    counts = jax.device_get([o.pairs.count for o in outs])
    dt = (time.perf_counter() - t0) / K_BATCH
    log(f"phase A: {dt*1e3:.1f} ms/batch -> "
        f"{READS_PER_BATCH/dt*60/1e6:.2f}M reads/min (phase A only); "
        f"pair counts {sorted(int(c) for c in counts)[:3]}...")

    # ---- sub-stage: k-merize + join + compact only
    @functools.partial(jax.jit, static_argnames=())
    def match_only(bases, lengths):
        km, off, rc, valid = kmers.read_kmers_device(bases, lengths)
        res = match.match_overlaps(
            km, off, rc, valid, lengths, *d_idx, max_matches=16,
            capacity=1 << 18, chain_iters=16, idx_pstart=d_pstart,
            prefix_bits=p_bits, window=p_window)
        return match.compact_overlaps(res, 1 << 15)

    r0 = match_only(*batches[0])
    _ = jax.device_get(r0.count)
    t0 = time.perf_counter()
    outs = [match_only(*b) for b in batches]
    _ = jax.device_get([o.count for o in outs])
    dt_m = (time.perf_counter() - t0) / K_BATCH
    log(f"  match stage (kmers+join+compact): {dt_m*1e3:.1f} ms/batch")

    # ---- sub-stage: SW only -- one DISTINCT candidate set per timed
    # dispatch (each batch's own match output) so no dispatch can be
    # deduplicated/cached (advisor r2)
    @jax.jit
    def sw_only(read_id, entry_id, rel_pos, rc, valid, bases, lengths):
        return sw_ops.align_overlaps_batch_chunked(
            read_id, entry_id, rel_pos, rc, valid, encode.sw_codes(bases),
            lengths, genome_scodes, entry_offsets, p.match, p.mismatch,
            p.gap_open, p.gap_extend, window_len=PAD_LEN)

    rs = [match_only(*b) for b in batches]
    sw_args = [(r.read_id, r.entry_id, r.rel_pos, r.rc, r.valid, b[0], b[1])
               for r, b in zip(rs, batches)]
    al = sw_only(*sw_args[0])
    _ = jax.device_get(al.score[0])
    t0 = time.perf_counter()
    outs = [sw_only(*a) for a in sw_args]
    _ = jax.device_get([o.score[0] for o in outs])
    dt_sw = (time.perf_counter() - t0) / K_BATCH
    ncand = int(jax.device_get(rs[0].count))
    cells = 2 * (1 << 15) * PAD_LEN * PAD_LEN
    log(f"  SW stage ({ncand} cands in {1<<15} slots, fwd+rev): "
        f"{dt_sw*1e3:.1f} ms/batch = {cells/dt_sw/1e9:.1f} GCUPS(padded)")
    log(f"  residual (pairing sweep etc): "
        f"{(dt - dt_m - dt_sw)*1e3:.1f} ms/batch")


if __name__ == "__main__":
    main()
