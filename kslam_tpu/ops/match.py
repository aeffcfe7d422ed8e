"""Device match engine: read k-mers vs presorted index, no runtime mega-sort.

Replaces the reference's union-sort + pileup scan (SLAM.h:63-66,
Overlap.h:153-295) with:

  1. searchsorted of every read k-mer against the sorted index
     (an O(log M) vectorized binary search instead of an O((R+M) log(R+M))
     sort whose working set is the RAM peak of the reference),
  2. capacity-bounded pair expansion (read k-mer x index slot),
  3. a multi-key device sort by (read, entry, relPos),
  4. exact chained dedup of |delta relPos| < 3 (Overlap.h:79-85) via a
     bounded anchor-propagation scan: exact for dedup clusters up to
     `chain_iters` elements, conservative (keeps extras, never drops a true
     overlap) beyond.

All steps are jit-compatible with static shapes; invalid/overflow slots are
parked at int32 max so they sort to the tail.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

from ..config import K
from . import join

INT32_MAX = np.int32(2**31 - 1)


class Overlaps(NamedTuple):
    """Columnar overlap set; rows beyond `count` are padding."""
    read_id: jnp.ndarray   # int32 [P]
    entry_id: jnp.ndarray  # int32 [P]
    rel_pos: jnp.ndarray   # int32 [P]
    rc: jnp.ndarray        # bool  [P]
    valid: jnp.ndarray     # bool  [P]
    count: jnp.ndarray     # int32 [] number of valid rows
    overflow: jnp.ndarray  # int64 [] pairs dropped by capacity caps
    # exact retry sizing (the reference emits every pileup pair,
    # Overlap.h:153-199; when overflow != 0 rerun with max_matches >=
    # max_fanout and capacity >= needed_capacity to drop nothing)
    needed_capacity: jnp.ndarray = None  # int64 [] total unclipped pairs
    max_fanout: jnp.ndarray = None       # int32 [] max per-k-mer matches
    # rows in oversized dedup clusters beyond the exact-tail buffer; > 0
    # means the conservative mask shipped and a retry with dedup_tail_cap
    # >= this value is required for reference-exact results
    needed_dedup: jnp.ndarray = None     # int64 []


def _emit_pairs(lo, clipped, q_pack, idx_pack, n_index: int,
                capacity: int):
    """Capacity-bounded pair expansion: query q emits `clipped[q]` pairs
    against index slots [lo[q], lo[q]+clipped[q]), packed into the
    (key1, key2) sort words.  Returns (key1, key2, cap_overflow i64,
    total64 i64)."""
    # exclusive prefix sum in int64 (sum(clipped) can pass 2^31 when
    # max_matches is raised by the overflow-retry path), then clipped to
    # `capacity`: for every pair slot p < capacity the predicate
    # starts[q] <= p is unchanged by the clip, so the expansion below is
    # exact while the packed uint32 field stays in range
    starts64 = jnp.cumsum(clipped.astype(jnp.int64)) - clipped
    total64 = starts64[-1] + clipped[-1]
    cap_overflow = jnp.maximum(total64 - capacity, 0)
    total = jnp.minimum(total64, capacity).astype(jnp.int32)
    starts = jnp.minimum(starts64, capacity).astype(jnp.int32)

    # lo and starts ride one u64; interleaving it with q_pack into [Q, 2]
    # rows makes the per-pair query metadata ONE row gather instead of
    # two element gathers (u64 element gathers pay two int32 planes each,
    # benches/probe_gather.py)
    ls_pack = ((lo.astype(jnp.uint64) << np.uint64(32)) |
               starts.astype(jnp.uint32).astype(jnp.uint64))
    qls = jnp.concatenate([q_pack[:, None], ls_pack[:, None]], axis=1)

    # expansion: pair p belongs to query q = last q with starts[q] <= p
    p = jnp.arange(capacity, dtype=jnp.int32)
    q_idx = join.searchsorted_blocked(starts, p, side="right") - 1
    q_idx = jnp.clip(q_idx, 0, len(q_pack) - 1)
    in_range = p < total
    qrows = qls[q_idx]
    qp = qrows[:, 0]
    lsp = qrows[:, 1]
    slot = ((lsp >> np.uint64(32)).astype(jnp.int32) +
            (p - (lsp & np.uint64(0xFFFFFFFF)).astype(jnp.int32)))
    slot = jnp.clip(slot, 0, n_index - 1)
    ip = idx_pack[slot]

    e_id = (ip >> np.uint64(33)).astype(jnp.int32)
    gb_off = ((ip >> np.uint64(1)) &
              np.uint64(0xFFFFFFFF)).astype(jnp.int32)
    gb_rc = (ip & np.uint64(1)).astype(bool)
    r_id = (qp >> np.uint64(21)).astype(jnp.int32)
    r_off = ((qp >> np.uint64(11)) & np.uint64(0x3FF)).astype(jnp.int32)
    r_off_rcspace = ((qp >> np.uint64(1)) &
                     np.uint64(0x3FF)).astype(jnp.int32)
    r_rc = (qp & np.uint64(1)).astype(bool)

    # relativePosition and rc flags (Overlap.h:182-192)
    offset = jnp.where(gb_rc, r_off_rcspace, r_off)
    rel = (gb_off - offset).astype(jnp.int32)
    rc = gb_rc != r_rc

    # overlapSort (Overlap.h:87-98) + rc as a determinism-only last key.
    # Keys are bit-packed into two uint64 words: a variadic multi-key sort
    # comparator is brutally expensive to compile, two packed words are not.
    key1 = ((r_id.astype(jnp.uint64) << np.uint64(32)) |
            e_id.astype(jnp.uint64))
    key1 = jnp.where(in_range, key1, np.uint64(2**64 - 1))
    key2 = (((rel.astype(jnp.int64) + 2**31).astype(jnp.uint64)
             << np.uint64(1)) | rc.astype(jnp.uint64))
    return key1, key2, cap_overflow, total64


def expand_seeds(read_kmer, read_off, read_rc, read_valid, read_lengths,
                 index_kmers, index_entry, index_off, index_rc,
                 max_matches: int, capacity: int, idx_pstart=None,
                 prefix_bits: int = 0, window: int = 0,
                 idx_rows=None, idx_pstart2=None,
                 idx_bucket=None, bucket_bits: int = 0,
                 tier2_cap: int = 0, idx_pack=None):
    """Join + pair expansion only (the per-index-shard half of
    match_overlaps): every read k-mer is searched in the sorted index and
    expanded into packed (key1, key2) sort words, WITHOUT the final
    sort/dedup.  The sharded pipeline (parallel/dist.py) runs this per
    index range shard, all_gathers the packed words over the "index" mesh
    axis, and finishes with finish_overlaps on the merged set -- exactly
    the unsharded result because range shards never split a pileup.

    Join backends (fastest first):
      * idx_bucket/bucket_bits: ONE [Q, 16] int32 row gather
        (db/kmer_index.bucket_table); escaped heavy-tail buckets resolve
        through the in-program tier 2 below,
      * idx_rows/idx_pstart2: two row gathers (build_prefix_rows),
      * idx_pstart: two aligned row + two element gathers,
      * none: blocked binary search (exact for anything).

    tier2_cap > 0 (bucket backend): queries the fast path could not cover
    are compacted to [tier2_cap] slots, resolved EXACTLY by the blocked
    search, and their pairs expanded into an extra capacity//4 block of
    sort words -- so repeat-heavy reads stay in ONE dispatch instead of
    tripping the whole-batch retry.  Only uncovered queries beyond
    tier2_cap (or expansion capacity) count into `overflow`.

    Returns (key1 u64[cap'], key2 u64[cap'], overflow i64[],
    needed_capacity i64[], max_fanout i32[]) where cap' = capacity
    (+ capacity//4 with tier 2)."""
    n, w = read_kmer.shape
    # the u64 q_pack below gives q_off and off_rcspace 10-bit fields —
    # guard statically so longer reads fail loudly instead of silently
    # corrupting ids
    if w > 1024:
        raise ValueError(
            f"read window w={w} (max_read_len={w + K - 1}) exceeds the "
            f"10-bit offset field of the packed expansion (w <= 1024); "
            f"raise the field widths in ops/match.py to go longer")
    if not 0 < capacity < 2**31:
        raise ValueError(f"capacity {capacity} must fit int32")
    q_kmer = read_kmer.reshape(-1)
    q_off = read_off.reshape(-1).astype(jnp.int32)
    q_rc = read_rc.reshape(-1)
    q_read = jnp.repeat(jnp.arange(n, dtype=jnp.int32), w)
    # pileups with k-mer == 0 are skipped entirely (Overlap.h:236-239)
    q_ok = read_valid.reshape(-1) & (q_kmer != np.uint64(0))

    uncovered = None
    if idx_bucket is not None and bucket_bits:
        lo, hi, uncovered = join.lookup_bucket(idx_bucket, q_kmer,
                                               bucket_bits)
    elif idx_rows is not None and prefix_bits:
        lo, hi, uncovered = join.lookup_prefix_rows(
            idx_rows, idx_pstart2, q_kmer, prefix_bits, window)
    elif idx_pstart is not None and prefix_bits:
        lo, hi, uncovered = join.lookup_prefix_window(
            index_kmers, idx_pstart, q_kmer, prefix_bits, window)
    else:
        lo, hi = join.searchsorted_blocked_both(index_kmers, q_kmer)
    matches = jnp.where(q_ok, hi - lo, 0)
    clipped = jnp.minimum(matches, max_matches).astype(jnp.int32)
    cell_overflow = jnp.sum(matches.astype(jnp.int64) -
                            clipped.astype(jnp.int64))

    # q side: read id | fwd offset | rc-space offset | rc  (both offset
    # variants precomputed so read_lengths needs no per-pair gather)
    q_lens = jnp.broadcast_to(read_lengths[:, None], (n, w)).reshape(-1)
    off_rcspace = jnp.clip(q_lens - q_off - K, 0, None)
    q_pack = ((q_read.astype(jnp.uint64) << np.uint64(21)) |
              (q_off.astype(jnp.uint64) << np.uint64(11)) |
              (off_rcspace.astype(jnp.uint64) << np.uint64(1)) |
              q_rc.astype(jnp.uint64))
    if idx_pack is None:
        # index side: entry | forward offset | rc (offsets < 2^31);
        # DeviceDB precomputes this column once -- building it per batch
        # costs a full elementwise pass over the 1e8-row index
        idx_pack = ((index_entry.astype(jnp.uint64) << np.uint64(33)) |
                    (index_off.astype(jnp.uint64) << np.uint64(1)) |
                    index_rc.astype(jnp.uint64))
    n_index = idx_pack.shape[0]

    key1, key2, cap_overflow, total64 = _emit_pairs(
        lo, clipped, q_pack, idx_pack, n_index, capacity)
    needed = jnp.sum(matches.astype(jnp.int64))
    fanout = jnp.max(matches)

    if uncovered is not None and tier2_cap:
        # --- in-program exact tier 2 for uncovered (escaped) queries ---
        unc_q = q_ok & (uncovered > 0)
        csum = jnp.cumsum(unc_q.astype(jnp.int32))
        n_unc = csum[-1]
        # positions of the first tier2_cap uncovered queries
        tpos = join.searchsorted_blocked(
            csum, jnp.arange(1, tier2_cap + 1, dtype=jnp.int32),
            side="left")
        tpos = jnp.clip(tpos, 0, len(q_kmer) - 1)
        sel_ok = jnp.arange(tier2_cap, dtype=jnp.int32) < n_unc
        q2 = jnp.where(sel_ok, q_kmer[tpos], np.uint64(2**64 - 1))
        lo2, hi2 = join.searchsorted_blocked_both(index_kmers, q2)
        matches2 = jnp.where(sel_ok, hi2 - lo2, 0)
        clipped2 = jnp.minimum(matches2, max_matches).astype(jnp.int32)
        cell_overflow2 = jnp.sum(matches2.astype(jnp.int64) -
                                 clipped2.astype(jnp.int64))
        cap2 = max(capacity // 4, 1024)
        k1b, k2b, cap_overflow2, _ = _emit_pairs(
            lo2, clipped2, q_pack[tpos], idx_pack, n_index, cap2)
        key1 = jnp.concatenate([key1, k1b])
        key2 = jnp.concatenate([key2, k2b])
        # uncovered queries beyond tier2_cap: their (unknown) matches are
        # bounded by the bucket run length; count them as overflow and
        # into the retry sizing
        missed = jnp.where(unc_q & (csum > tier2_cap), uncovered, 0)
        cell_overflow = (cell_overflow + cell_overflow2 +
                         jnp.sum(missed.astype(jnp.int64)))
        cap_overflow = cap_overflow + cap_overflow2
        needed = needed + jnp.sum(matches2.astype(jnp.int64)) + \
            jnp.sum(missed.astype(jnp.int64))
        fanout = jnp.maximum(jnp.maximum(fanout, jnp.max(matches2)),
                             jnp.max(missed))
    elif uncovered is not None:
        # no tier 2 (prefix-window backends): heavy-tail runs count as
        # overflow so the emit-all retry re-joins them exactly with the
        # prefix table disabled (pipeline/run.py)
        unc = jnp.where(q_ok, uncovered, 0)
        cell_overflow = cell_overflow + jnp.sum(unc.astype(jnp.int64))
        needed = needed + jnp.sum(unc.astype(jnp.int64))
        fanout = jnp.maximum(fanout, jnp.max(unc))

    return (key1, key2, cell_overflow + cap_overflow, needed,
            fanout.astype(jnp.int32))


def finish_overlaps(key1, key2, overflow, needed_capacity, max_fanout,
                    chain_iters: int = 48,
                    dedup_tail_cap: int = 1 << 16) -> Overlaps:
    """Sort + chained dedup over packed seed words from expand_seeds
    (possibly concatenated across index shards); the second half of
    match_overlaps."""
    key1, key2 = jax.lax.sort((key1, key2), num_keys=2)
    in_range = key1 != np.uint64(2**64 - 1)
    big = INT32_MAX
    r_id = jnp.where(in_range, (key1 >> np.uint64(32)).astype(jnp.int32), big)
    e_id = jnp.where(in_range,
                     (key1 & np.uint64(0xFFFFFFFF)).astype(jnp.int32), big)
    rel = jnp.where(
        in_range,
        ((key2 >> np.uint64(1)).astype(jnp.int64) - 2**31).astype(jnp.int32),
        big)
    rc = (key2 & np.uint64(1)).astype(bool)

    keep, count, needed_dedup = chained_dedup_device(
        r_id, e_id, rel, in_range, chain_iters, tail_cap=dedup_tail_cap)
    # an overflowing dedup tail ships a conservative (too-large) keep set;
    # fold it into `overflow` so the emit-all retry machinery reruns with
    # dedup_tail_cap >= needed_dedup
    overflow = overflow + needed_dedup
    return Overlaps(r_id, e_id, rel, rc, keep, count, overflow,
                    needed_capacity=needed_capacity, max_fanout=max_fanout,
                    needed_dedup=needed_dedup)


@functools.partial(jax.jit, static_argnames=("max_matches", "capacity",
                                             "chain_iters", "prefix_bits",
                                             "window", "dedup_tail_cap",
                                             "bucket_bits", "tier2_cap"))
def match_overlaps(read_kmer, read_off, read_rc, read_valid, read_lengths,
                   index_kmers, index_entry, index_off, index_rc,
                   max_matches: int = 64, capacity: int = 1 << 20,
                   chain_iters: int = 48, idx_pstart=None,
                   prefix_bits: int = 0, window: int = 0,
                   idx_rows=None, idx_pstart2=None,
                   dedup_tail_cap: int = 1 << 16,
                   idx_bucket=None, bucket_bits: int = 0,
                   tier2_cap: int = 0, idx_pack=None) -> Overlaps:
    """Full seeding stage on device: expand_seeds + finish_overlaps.

    Args:
      read_kmer/off/rc/valid: [N, W] from ops.kmers.read_kmers_device.
      read_lengths: int32 [N].
      index_*: sorted index columns (device arrays).
      max_matches: per-read-k-mer fanout cap (the reference emits all pairs;
        overflow is counted and reported).
      capacity: static size of the expanded pair set.
      chain_iters: dedup scan depth (exact up to this cluster size).
      idx_pstart/prefix_bits/window: optional prefix direct-addressing
        table (KmerIndex.prefix_table / device_arrays); replaces the
        blocked binary search with one [Q, window] gather.
    Returns: Overlaps sorted by (read, entry, relPos, rc), deduped.
    """
    seeds = expand_seeds(read_kmer, read_off, read_rc, read_valid,
                         read_lengths, index_kmers, index_entry, index_off,
                         index_rc, max_matches, capacity,
                         idx_pstart=idx_pstart, prefix_bits=prefix_bits,
                         window=window, idx_rows=idx_rows,
                         idx_pstart2=idx_pstart2, idx_bucket=idx_bucket,
                         bucket_bits=bucket_bits, tier2_cap=tier2_cap,
                         idx_pack=idx_pack)
    return finish_overlaps(*seeds, chain_iters=chain_iters,
                           dedup_tail_cap=dedup_tail_cap)


def chained_dedup_device(read_id, entry_id, rel, valid, chain_iters: int,
                         tail_cap: int = 1 << 16):
    """Exact chained |delta rel| < 3 dedup (Overlap.h:79-85) on sorted rows.

    Stages, all vectorized:
      1. drop exact (read, entry, rel) duplicates (prev-equality is exact
         because equality is transitive),
      2. cluster heads: first row of a (read, entry) group or rel-gap >= 3
         from the previous distinct row -- always kept,
      3. within a cluster, propagate the greedy anchor: A[i] = rel[i] if
         rel[i] >= A[i-1] + 3 else A[i-1]; `chain_iters` shifted updates
         converge for clusters up to that many rows,
      4. clusters LONGER than chain_iters (repeat/low-complexity pileups:
         one microsatellite read x a repeat tract makes 10^4-row clusters
         on real genomes) are re-deduped EXACTLY by _exact_dedup_tail:
         their distinct rows are compacted into a [tail_cap] side buffer
         and the greedy chain is walked by successor binary-lifting.  The
         whole tail runs under lax.cond, so clean batches skip it.

    Returns (keep mask, kept count, needed_tail i64 [] -- number of rows
    in oversized clusters; > tail_cap means the tail could not run and the
    conservative mask was returned, caller must retry with a bigger cap).
    """
    n = len(rel)
    prev_read = jnp.roll(read_id, 1).at[0].set(INT32_MAX)
    prev_entry = jnp.roll(entry_id, 1).at[0].set(INT32_MAX)
    prev_rel = jnp.roll(rel, 1).at[0].set(INT32_MAX)
    same_group = (read_id == prev_read) & (entry_id == prev_entry)
    dup = same_group & (rel == prev_rel) & valid

    # distinct rows only: for head/anchor logic, map each row to the previous
    # *distinct* row's rel via a prefix "last distinct value" trick: since
    # duplicates are contiguous and equal, prev-distinct rel == prev rel of
    # the first row of the duplicate run; anchors ignore duplicates, and a
    # duplicate row is kept iff impossible (it always matches the last kept
    # anchor at distance 0 < 3), so dedup duplicates unconditionally.
    is_head = valid & ~dup & (~same_group | (rel - prev_rel >= 3))

    # anchor propagation over distinct rows; duplicates inherit and forward
    # their run's rel (harmless: gap tests involving them replicate the
    # first instance)
    neg = np.int32(-(2**30))
    anchor = jnp.where(is_head, rel, neg)
    for _ in range(chain_iters):
        prev_anchor = jnp.roll(anchor, 1).at[0].set(neg)
        candidate = jnp.where(rel >= prev_anchor + 3, rel, prev_anchor)
        anchor = jnp.where(is_head, rel, candidate)
    # Jacobi iteration: after t sweeps rows at cluster rank <= t hold the
    # exact greedy anchor; beyond that the cluster is handed to the exact
    # tail below.
    converged_kept = (anchor == rel) & ~dup & valid

    idx = jnp.arange(n, dtype=jnp.int32)
    head_pos = jnp.where(is_head, idx, -1)
    cluster_start = jax.lax.associative_scan(jnp.maximum, head_pos)
    rank = idx - cluster_start
    keep0 = jnp.where(rank >= chain_iters, valid & ~dup, converged_kept)

    # --- exact tail for oversized clusters ---
    # a cluster is "big" when any of its rows has rank >= chain_iters;
    # propagate that flag back to every row of the cluster with a reversed
    # segmented max over cluster_start segments
    big_row = valid & (rank >= chain_iters)
    seg_rev = jnp.flip(cluster_start)

    def seg_op(a, b):
        sa, va = a
        sb, vb = b
        return sb, jnp.where(sa == sb, va | vb, vb)

    _, rmax = jax.lax.associative_scan(
        seg_op, (seg_rev, jnp.flip(big_row)))
    cluster_big = jnp.flip(rmax)
    in_big = valid & ~dup & cluster_big
    nbig = jnp.sum(in_big.astype(jnp.int64))
    tail_cap = min(tail_cap, n)     # a tail wider than the row set is moot
    if tail_cap <= 0:
        keep = keep0
        needed = nbig          # caller retries with a real cap
    else:
        fits = (nbig > 0) & (nbig <= tail_cap)
        keep = jax.lax.cond(
            fits,
            lambda: _exact_dedup_tail(rel, is_head, in_big, keep0,
                                      tail_cap),
            lambda: keep0)
        needed = jnp.where(nbig > tail_cap, nbig, 0)
    return keep, jnp.sum(keep.astype(jnp.int32)), needed


def _exact_dedup_tail(rel, is_head, in_big, keep0, tail_cap: int):
    """Exact greedy |delta rel| < 3 chain for oversized clusters.

    Compacts the distinct rows of big clusters into a [tail_cap] buffer
    (order-preserving), computes each row's successor (first row of the
    same chain with rel >= own rel + 3) with one blocked search, then
    marks the orbit of every chain head under `succ` by pointer-doubling
    reachability: a row is kept iff the greedy chain from its head lands
    on it (the vectorized form of std::unique's serial anchor chain,
    Overlap.h:79-85 + findOverlaps_parallel).

    Memory note (ADVICE r4 #3): reachability doubles ONE successor table
    in place (reach |= reach@succ; succ = succ[succ]) instead of
    retaining all log2(tail_cap) binary-lifting levels, so the live
    transient is O(tail_cap), not O(tail_cap log tail_cap) -- the
    emit-all retry can size tail_cap = capacity (2^24-2^26 on
    pathological inputs) without multi-GB lifting tables."""
    n = len(rel)
    idx = jnp.arange(n, dtype=jnp.int32)
    # stable compaction of big-cluster rows: key = idx with a high bit for
    # non-big rows; ids = original rows ascending, sentinel-padded
    keyc = jnp.where(in_big, idx.astype(jnp.uint64),
                     idx.astype(jnp.uint64) | np.uint64(1 << 63))
    skey, sidx = jax.lax.sort((keyc, idx), num_keys=1)
    ids = sidx[:tail_cap]
    ok = skey[:tail_cap] < np.uint64(1 << 63)
    ids2 = jnp.where(ok, ids, INT32_MAX)     # ascending + sentinel tail

    crel = rel[ids]
    chead = is_head[ids] & ok
    cidx = jnp.arange(tail_cap, dtype=jnp.int32)
    # dense chain ids (compacted space)
    cid = jnp.cumsum(chead.astype(jnp.int32)) - 1

    # successor: first row of the same chain with rel >= rel[i] + 3
    # (compacted cluster rows have strictly increasing rel -- exact
    # duplicates were excluded -- so this IS the greedy next-kept row)
    bias = np.int64(2**31)
    rkey = ((cid.astype(jnp.int64) << np.int64(33)) +
            (crel.astype(jnp.int64) + bias)).astype(jnp.uint64)
    rkey = jnp.where(ok, rkey, np.uint64(2**64 - 1))
    qkey = ((cid.astype(jnp.int64) << np.int64(33)) +
            (crel.astype(jnp.int64) + 3 + bias)).astype(jnp.uint64)
    succ = join.searchsorted_blocked(rkey, qkey, side="left")
    # out-of-chain successors park at the sentinel slot tail_cap (self-loop)
    s_ok = (succ < tail_cap) & (cid[jnp.clip(succ, 0, tail_cap - 1)] == cid)
    succ = jnp.where(s_ok & ok, succ, tail_cap).astype(jnp.int32)

    # pointer-doubling reachability from chain heads: after k rounds
    # `reach` holds every succ^j(head) with j <= 2^k - 1, and `nxt` is
    # succ^(2^k); one live table, no retained lifting levels
    steps = max(1, (tail_cap - 1).bit_length())
    reach = jnp.concatenate([chead, jnp.zeros(1, bool)])
    nxt = jnp.concatenate([succ, jnp.full(1, tail_cap, jnp.int32)])
    for _ in range(steps):
        tgt = jnp.where(reach[:tail_cap], nxt[:tail_cap], tail_cap)
        reach = reach.at[tgt].set(True)      # sentinel slot absorbs parks
        nxt = nxt[nxt]                       # sentinel self-loop preserved
    kept_c = reach[:tail_cap] & ok

    # merge back: original row i (big) is kept iff its compacted slot is
    p = join.searchsorted_blocked(ids2, idx, side="left")
    pc = jnp.clip(p, 0, tail_cap - 1)
    found = (p < tail_cap) & (ids2[pc] == idx)
    kept_back = found & kept_c[pc]
    return jnp.where(in_big, kept_back, keep0)


def compact_overlaps(overlaps: Overlaps, out_size: int) -> Overlaps:
    """Device-side compaction: move kept rows to the front (stable) and
    slice to a static `out_size`, so downstream SW aligns a dense batch
    instead of the full sentinel-padded capacity.  Rows beyond out_size
    are counted into `overflow`."""
    p = overlaps.read_id.shape[0]
    idx = jnp.arange(p, dtype=jnp.uint64)
    key = (jnp.where(overlaps.valid, np.uint64(0), np.uint64(1))
           << np.uint64(63)) | idx
    key, perm = jax.lax.sort((key, jnp.arange(p, dtype=jnp.int32)),
                             num_keys=1)
    sel = perm[:out_size]
    valid = overlaps.valid[sel] & \
        (jnp.arange(out_size, dtype=jnp.int32) < overlaps.count)
    dropped = jnp.maximum(overlaps.count - out_size, 0)
    return Overlaps(
        read_id=overlaps.read_id[sel], entry_id=overlaps.entry_id[sel],
        rel_pos=overlaps.rel_pos[sel], rc=overlaps.rc[sel], valid=valid,
        count=jnp.minimum(overlaps.count, out_size),
        overflow=overlaps.overflow + dropped.astype(jnp.int64),
        needed_capacity=overlaps.needed_capacity,
        max_fanout=overlaps.max_fanout,
        needed_dedup=overlaps.needed_dedup)
