"""Device alignment stage: batch -> seeded + SW-validated overlaps.

This is `alignToDatabase` (SLAM.h:59-79) rebuilt TPU-first: k-merize the
read batch on device, merge-join against the presorted k-mer index, dedup,
then validate every candidate with the batched SW kernel.  Output returns
to the host as columnar arrays, from which the (tiny, post-screen) Python
objects for the pairing/taxonomy stages are built.

Cigars are NOT computed here: the reference computes a banded traceback for
every overlap when --sam-file is set (SmithWaterman.h:193-196); we defer
cigar generation to SAM-write time (io/sam.py callers), where only the top
numSAMAlignments survivors per read need one -- identical output, far less
work.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import PipelineConfig
from ..db.genbank import GenbankIndex
from ..db.kmer_index import KmerIndex
from ..golden import ssw as golden_ssw
from ..io.fastq import ReadBatch
from ..ops import encode, kmers, match, sw
from .pairing import AlignedOverlap

_SENTINEL_KMER = np.uint64(2 ** 64 - 1)  # canonical k-mers are min(fwd, rc)


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1)).bit_length()


@dataclasses.dataclass
class DeviceDB:
    """Device-resident database arrays."""
    kmers: jnp.ndarray
    entry_id: jnp.ndarray
    offset: jnp.ndarray
    rc: jnp.ndarray
    genome_scodes: jnp.ndarray
    entry_offsets: jnp.ndarray
    genome_chunks: jnp.ndarray = None  # [G/64, 64] rows (gather-free SW)
    pstart: jnp.ndarray = None         # prefix direct-addressing table
    prefix_bits: int = 0               # (db/kmer_index.prefix_table);
    prefix_window: int = 0             # 0 bits = blocked-search fallback
    kmer_rows: jnp.ndarray = None      # legacy prefix-rows layout (unused
    pstart2: jnp.ndarray = None        # when the bucket table is present)
    bucket: jnp.ndarray = None         # [2^b, 16] i32 one-gather join rows
    bucket_bits: int = 0               # (db/kmer_index.bucket_table)
    idx_pack: jnp.ndarray = None       # u64 [M] entry|offset|rc sidecar

    @classmethod
    def from_index(cls, gindex: GenbankIndex, kidx: KmerIndex,
                   flat_scodes: bool = True,
                   prefix_rows: bool = True) -> "DeviceDB":
        """flat_scodes=False skips the flat [G] genome copy (used only by
        the host-pipeline SW window gather); the device pipeline reads the
        [G/64, 64] chunk rows, so callers that only run it save the HBM.
        prefix_rows=False skips the one-gather bucket table (~64B per
        2^bits prefixes of HBM; memory-tight databases fall back to
        lookup_prefix_window on the pstart table)."""
        from ..ops import sw as sw_ops
        km, eid, off, rc, pstart, bits, window = kidx.device_arrays()
        bucket = None
        bucket_bits = 0
        if prefix_rows and len(kidx):
            tbl, bucket_bits = kidx.bucket_table()
            bucket = jnp.asarray(tbl)
        # precomputed per-slot sidecar word: one u64 gather per expanded
        # pair instead of three narrow ones + a per-batch repack pass
        m = len(kidx)
        pk = np.zeros(km.shape[0], np.uint64)
        pk[:m] = ((kidx.entry_id.astype(np.uint64) << np.uint64(33)) |
                  (kidx.offset.astype(np.uint64) << np.uint64(1)) |
                  kidx.rc.astype(np.uint64))
        scodes = encode.sw_codes_np(gindex.bases_concat)
        chunks = sw_ops.genome_chunks_from_scodes(scodes)
        return cls(km, eid, off, rc,
                   jnp.asarray(scodes) if flat_scodes else None,
                   jnp.asarray(gindex.entry_offsets),
                   jnp.asarray(chunks), pstart, bits, window,
                   None, None, bucket, bucket_bits, jnp.asarray(pk))


def align_batch_to_database(batch: ReadBatch, db: DeviceDB,
                            config: PipelineConfig,
                            sw_chunk: int = 1 << 15) -> List[AlignedOverlap]:
    """Returns score-screened AlignedOverlaps (cigar=None) in sorted order.

    Applies screenOverlapsByScoreThreshold (Overlap.h:329-341): drops
    alignments with sw_score < scoreThreshold (score 0 survives the default
    threshold 0 exactly like the reference)."""
    n = batch.num_reads
    n_pad = max(_next_pow2(n), 16)
    l = config.max_read_len
    bases = np.zeros((n_pad, l), dtype=np.uint8)
    lengths = np.zeros(n_pad, dtype=np.int32)
    bl = min(batch.bases.shape[1], l)
    bases[:n, :bl] = batch.bases[:, :bl]
    lengths[:n] = batch.lengths
    d_bases = jnp.asarray(bases)
    d_lengths = jnp.asarray(lengths)

    km, off, rc, valid = jax.jit(kmers.read_kmers_device)(d_bases,
                                                          d_lengths)
    mm = config.max_matches_per_kmer
    cap = config.max_pairs_per_batch
    use_prefix = True
    tail_cap = 1 << 16
    while True:
        result = match.match_overlaps(
            km, off, rc, valid, d_lengths,
            db.kmers, db.entry_id, db.offset, db.rc,
            max_matches=mm, capacity=cap,
            chain_iters=min(config.dedup_group_cap, 48),
            idx_pstart=db.pstart if use_prefix else None,
            prefix_bits=db.prefix_bits if use_prefix else 0,
            window=db.prefix_window if use_prefix else 0,
            idx_rows=db.kmer_rows if use_prefix else None,
            idx_pstart2=db.pstart2 if use_prefix else None,
            dedup_tail_cap=tail_cap,
            idx_bucket=db.bucket if use_prefix else None,
            bucket_bits=db.bucket_bits if use_prefix else 0,
            tier2_cap=max(cap // 16, 4096) if use_prefix else 0,
            idx_pack=db.idx_pack)
        # the reference emits every pileup pair (Overlap.h:153-199):
        # on any capacity drop, retry with exact sizes instead of
        # silently changing results
        if int(result.overflow) == 0:
            break
        mm = _next_pow2(int(result.max_fanout))
        cap = _next_pow2(int(result.needed_capacity))
        use_prefix = False   # exact blocked join on the emit-all retry
        tail_cap = cap       # oversized-cluster rows always fit then
        from ..utils.logging import log
        log(f"match overflow: retrying with max_matches={mm} "
            f"capacity={cap}")

    # device compaction: only the dense kept set crosses to the host
    # (the raw capacity can be millions of sentinel rows)
    count = int(result.count)
    compact_size = max(_next_pow2(count), 16)
    result = jax.jit(match.compact_overlaps,
                     static_argnames="out_size")(result, compact_size)
    keep = np.asarray(result.valid)
    read_id = np.asarray(result.read_id)
    entry_id = np.asarray(result.entry_id)
    rel_pos = np.asarray(result.rel_pos)
    rc_arr = np.asarray(result.rc)
    idx = np.flatnonzero(keep)
    assert len(idx) == count
    p = config.sw
    read_scodes = jax.jit(encode.sw_codes)(d_bases)

    scores = np.zeros(count, np.int32)
    ref_begin = np.zeros(count, np.int32)
    ref_end = np.zeros(count, np.int32)
    query_begin = np.zeros(count, np.int32)
    query_end = np.zeros(count, np.int32)
    for start in range(0, count, sw_chunk):
        stop = min(start + sw_chunk, count)
        pad = _next_pow2(max(stop - start, 16))
        sel = np.zeros(pad, np.int64)
        sel[:stop - start] = idx[start:stop]
        al = sw.align_overlaps_batch(
            jnp.asarray(read_id[sel]), jnp.asarray(entry_id[sel]),
            jnp.asarray(rel_pos[sel]), jnp.asarray(rc_arr[sel]),
            jnp.asarray(np.ones(pad, bool)),
            read_scodes, d_lengths, db.genome_scodes, db.entry_offsets,
            p.match, p.mismatch, p.gap_open, p.gap_extend, window_len=l)
        scores[start:stop] = np.asarray(al.score)[:stop - start]
        ref_begin[start:stop] = np.asarray(al.ref_begin)[:stop - start]
        ref_end[start:stop] = np.asarray(al.ref_end)[:stop - start]
        query_begin[start:stop] = np.asarray(al.query_begin)[:stop - start]
        query_end[start:stop] = np.asarray(al.query_end)[:stop - start]

    survivors = scores >= config.score_threshold
    out: List[AlignedOverlap] = []
    for k in np.flatnonzero(survivors):
        i = idx[k]
        out.append(AlignedOverlap(
            read_id=int(read_id[i]), entry_id=int(entry_id[i]),
            rel_pos=int(rel_pos[i]), rc=bool(rc_arr[i]),
            score=int(scores[k]), ref_begin=int(ref_begin[k]),
            ref_end=int(ref_end[k]), query_begin=int(query_begin[k]),
            query_end=int(query_end[k])))
    return out


def compute_cigars_batch(overlaps: List[AlignedOverlap], batch: ReadBatch,
                         gindex: GenbankIndex,
                         config: PipelineConfig) -> bool:
    """Fills .cigar on every overlap via ONE native batched SSW+traceback
    call (csrc/ssw_batch.cc, OpenMP over overlaps) -- the device-era
    replacement for the reference's per-overlap banded_sw (ssw.c:594-792).
    Returns False when the native library is unavailable (callers fall back
    to the per-overlap golden path)."""
    from ..io import native
    todo = [o for o in overlaps if o.cigar is None]
    if not todo:
        return True
    n = len(todo)
    cols = {
        "read_id": np.fromiter((o.read_id for o in todo), np.int32, n),
        "entry_id": np.fromiter((o.entry_id for o in todo), np.int32, n),
        "rel_pos": np.fromiter((o.rel_pos for o in todo), np.int32, n),
        "rc": np.fromiter((o.rc for o in todo), np.uint8, n),
    }
    out = native.ssw_cigar_batch(
        batch.bases, batch.lengths, gindex.bases_concat,
        gindex.entry_offsets.astype(np.int64), cols["read_id"],
        cols["entry_id"], cols["rel_pos"], cols["rc"], config.sw,
        score_filter=config.score_threshold)
    if out is None:
        return False
    for k, o in enumerate(todo):
        c = native.unpack_cigar(out["cigar_buf"][k], out["cigar_len"][k])
        o.cigar = c if c is not None else []
    return True


def compute_overlap_cigar(overlap: AlignedOverlap, read_bases: str,
                          entry_bases: str, config: PipelineConfig) -> None:
    """Fills overlap.cigar lazily (deferred banded traceback; see module
    docstring).  Mirrors the reference's per-overlap cigar exactly by
    rerunning the golden scalar alignment with report_cigar."""
    if overlap.cigar is not None:
        return
    q = encode.sw_codes_np(encode.encode_seq(read_bases))
    g = encode.sw_codes_np(encode.encode_seq(entry_bases))
    al = golden_ssw.slam_overlap_align(
        q, g, overlap.rel_pos, overlap.rc, config.sw, report_cigar=True,
        score_filter=config.score_threshold)
    overlap.cigar = al.cigar if al.cigar is not None else []
