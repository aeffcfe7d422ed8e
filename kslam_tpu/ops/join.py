"""Blocked searchsorted: dense-compare join for sorted arrays on TPU.

jnp.searchsorted lowers to a binary search whose per-iteration gathers are
scalar-unit work on TPU (~17 gathers per query); for the match stage's
~10^6 queries that dominates the whole pipeline.  This module computes the
same insertion points with two dense passes that map onto the VPU:

  1. bucket: compare every query against the last element of each
     length-`block` slice of the sorted array (a [Q, S] broadcast-compare
     + row-sum the XLA fuser never materializes),
  2. refine: row-gather the owning block ([Q, block] coarse, contiguous
     rows -- DMA-friendly, unlike scalar binary-search probes) and count
     elements below the query.

Exact for duplicates of any run length: with side='left' the bucket scan
uses `last < q` (first block whose last element >= q holds the insertion
point), with side='right' `last <= q`.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def searchsorted_blocked(sorted_arr, queries, side: str = "left",
                         block: int = 128, force: bool = False):
    """Drop-in for jnp.searchsorted(sorted_arr, queries, side).

    sorted_arr's length must be a multiple of `block` (pad with the
    maximum value of the dtype; the index arrays are sentinel-padded
    already).  Returns int32 insertion points.
    """
    assert side in ("left", "right")
    m = sorted_arr.shape[0]
    if m == 0:
        return jnp.zeros(queries.shape, jnp.int32)
    import jax
    if not force and jax.default_backend() != "tpu":
        # CPU/GPU binary search is fine (cached, branchy scalar work is
        # cheap there); the dense formulation only wins on TPU
        return jnp.searchsorted(sorted_arr, queries, side=side) \
            .astype(jnp.int32)
    lo, hi = searchsorted_blocked_both(sorted_arr, queries, block=block,
                                       force=force)
    return lo if side == "left" else hi


def searchsorted_blocked_both(sorted_arr, queries, block: int = 128,
                              force: bool = False, chunk: int = 32768):
    """(left, right) insertion points in ONE pass.

    The expensive step of the blocked search is the [Q, block] owning-row
    gather; both side='left' (`< q`) and side='right' (`<= q`) counts come
    from the same gathered rows, so computing the pair costs ~half of two
    separate calls.  The match stage always needs both bounds
    (hi - lo = pileup size, Overlap.h:153-199).

    Large query sets against large arrays are processed in `chunk`-sized
    lax.map slices: the two-level bucket stage's [Q, S/128] compare is NOT
    reliably fused away at scale (XLA materialized a 69 GB
    [2.1M, 8192] temp on a 1e8-element array), so temps are bounded to
    [chunk, S/128] per slice.
    """
    m = sorted_arr.shape[0]
    if m == 0:
        z = jnp.zeros(queries.shape, jnp.int32)
        return z, z
    import jax
    if not force and jax.default_backend() != "tpu":
        return (jnp.searchsorted(sorted_arr, queries, side="left")
                .astype(jnp.int32),
                jnp.searchsorted(sorted_arr, queries, side="right")
                .astype(jnp.int32))
    q_flat = queries.reshape(-1)
    nq = q_flat.shape[0]
    if nq > chunk and m > (1 << 21):
        pad_q = (-nq) % chunk
        qp = jnp.concatenate(
            [q_flat, jnp.zeros(pad_q, q_flat.dtype)]) if pad_q else q_flat

        def body(qc):
            return searchsorted_blocked_both(sorted_arr, qc, block=block,
                                             force=force, chunk=nq)

        lo, hi = jax.lax.map(body, qp.reshape(-1, chunk))
        return (lo.reshape(-1)[:nq].reshape(queries.shape),
                hi.reshape(-1)[:nq].reshape(queries.shape))
    block = min(block, 1 << (m - 1).bit_length())
    pad = (-m) % block
    fill = jnp.iinfo(sorted_arr.dtype).max
    if pad:
        # tail-pad with the dtype maximum: positions of real elements are
        # unchanged (pads sort last); only queries equal to the sentinel
        # value with side='right' see pad positions, and callers filter
        # sentinel queries
        sorted_arr = jnp.concatenate(
            [sorted_arr, jnp.full((pad,), fill, sorted_arr.dtype)])
        m += pad
    s = m // block
    blocks = sorted_arr.reshape(s, block)
    last = blocks[:, block - 1]
    q = queries.reshape(-1)

    def count_lt(arr2d, v):
        return jnp.sum(arr2d < v[:, None], axis=1)

    def count_le(arr2d, v):
        return jnp.sum(arr2d <= v[:, None], axis=1)

    def bucket(count_below):
        # owning-block index: number of blocks strictly before the block
        # that contains the insertion point (lt for left, le for right)
        if s > 1024:
            # two-level hierarchy: bucket by superblock lasts first, then
            # by the owning superblock's block lasts (a coarse row gather)
            # -- turns the [Q, S] dense compare into [Q, S2] + [Q, sb]
            sb = -(-s // 128)                  # blocks per superblock
            spad = (-s) % sb
            last_p = jnp.concatenate(
                [last, jnp.full((spad,), fill, last.dtype)]) \
                if spad else last
            super_lasts = last_p.reshape(-1, sb)   # [S2, sb]
            s2 = count_below(
                jnp.broadcast_to(super_lasts[:, sb - 1][None, :],
                                 (q.shape[0], super_lasts.shape[0])), q)
            s2 = jnp.minimum(s2, super_lasts.shape[0] - 1).astype(jnp.int32)
            within_s = count_below(super_lasts[s2], q)
            b = s2 * sb + within_s
        else:
            b = count_below(jnp.broadcast_to(last[None, :],
                                             (q.shape[0], s)), q)
        return jnp.minimum(b, s - 1).astype(jnp.int32)

    b_lo = bucket(count_lt)
    b_hi = bucket(count_le)
    rows_lo = blocks[b_lo]                # [Q, block] row gather
    lo = (b_lo * block + count_lt(rows_lo, q)).astype(jnp.int32)
    # the right bound needs the block at b_hi (a duplicate run of q can
    # cross block boundaries, so counting <= q inside b_lo's block is not
    # exact); the bucket stages above are shared, the row gather is not
    hi = (b_hi * block + count_le(blocks[b_hi], q)).astype(jnp.int32)
    return lo.reshape(queries.shape), hi.reshape(queries.shape)


def lookup_bucket(tbl, queries, bits: int):
    """(lo, hi, uncovered) insertion bounds via the ONE-gather bucket
    table (db/kmer_index.bucket_table): one [Q, 16] int32 row gather +
    pure vector unpack/compare.  Cost-model rationale and the CDF bucket
    addressing are documented on the builder.

    Escaped buckets (count > 8 slots or a t-delta overflow -- heavy-tail
    prefix runs) return lo == hi == start with their run length in
    `uncovered`; ops/match.expand_seeds resolves those queries exactly in
    a compacted tier-2 blocked search."""
    from ..db.kmer_index import KmerIndex
    S = KmerIndex.BUCKET_SLOTS
    DB = KmerIndex.BUCKET_DELTA_BITS
    q = queries.reshape(-1)
    t = q >> np.uint64(32)
    v = (t << np.uint64(1)) - ((t * t) >> np.uint64(32))
    # same map as the builder (kmer_index.bucket_table): v <= 2^32, shift
    # 32 - bits, clamp the v == 2^32 edge into the last bucket
    p = jnp.minimum(v >> np.uint64(32 - bits),
                    np.uint64((1 << bits) - 1)).astype(jnp.int32)
    r = tbl[p]                               # [Q, 16] i32, ONE gather
    start = r[:, 0]
    cntf = r[:, 1]
    covered = cntf < (1 << 30)
    cnt = cntf & np.int32((1 << 30) - 1)
    t_base = r[:, 2].astype(jnp.uint32)
    qt = t.astype(jnp.uint32)
    qlo = (q & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    lt = jnp.zeros_like(start)
    eq = jnp.zeros_like(start)
    mask = np.int32((1 << DB) - 1)
    for s in range(S):
        w = r[:, 3 + s // 2]
        d = ((w >> np.int32(DB * (s % 2))) & mask).astype(jnp.uint32)
        st = t_base + d
        lo32 = r[:, 7 + s].astype(jnp.uint32)
        in_run = s < cnt
        slot_lt = ((st < qt) | ((st == qt) & (lo32 < qlo))) & in_run
        slot_eq = (st == qt) & (lo32 == qlo) & in_run
        lt = lt + slot_lt.astype(jnp.int32)
        eq = eq + slot_eq.astype(jnp.int32)
    lo = start + jnp.where(covered, lt, 0)
    hi = lo + jnp.where(covered, eq, 0)
    uncovered = jnp.where(covered, 0, cnt)
    return (lo.reshape(queries.shape), hi.reshape(queries.shape),
            uncovered.reshape(queries.shape))


def build_prefix_rows(index_kmers, pstart, window: int):
    """Device-side one-time prep for lookup_prefix_rows: overlapping
    [M/w, 2w] k-mer rows (row r covers slots [r*w, r*w + 2w)) and a
    [2^bits, 2] (start, end) table, so the per-query join needs TWO row
    gathers total instead of four (two pstart element gathers + two
    aligned k-mer rows).  The join is gather-ISSUE-bound on TPU (~282 ms
    per 2.1M queries measured at 1e8 index k-mers), so halving the issues
    halves the stage.  Costs one extra index copy in HBM."""
    w = window
    rows = index_kmers.reshape(-1, w)
    rows2w = jnp.concatenate([rows, jnp.roll(rows, -1, axis=0)], axis=1)
    pstart2 = jnp.stack([pstart[:-1], pstart[1:]], axis=1)
    return rows2w, pstart2


def lookup_prefix_rows(rows2w, pstart2, queries, prefix_bits: int,
                       window: int):
    """lookup_prefix_window on the build_prefix_rows layout: exact
    (left, right) bounds from ONE [Q, 2] (start, end) row gather + ONE
    [Q, 2w] k-mer row gather.  The wrap row introduced by jnp.roll is
    never addressed with in_run true: r*w + 2w <= true_m + 2w <= padded
    length (device_arrays pads by >= 2w sentinels).

    Returns (lo, hi, uncovered): runs longer than the two gathered rows
    (prefix runs > ~window, the heavy tail of repeat-rich genomes) cannot
    be answered exactly -- those queries get lo == hi == start and their
    full run length in `uncovered`, so the caller counts them as overflow
    and the emit-all retry re-joins them exactly (pipeline/run.py).
    Uniform databases have window >= longest run and `uncovered` is
    identically 0."""
    q = queries.reshape(-1)
    p = (q >> np.uint64(64 - prefix_bits)).astype(jnp.int32)
    se = pstart2[p]                         # [Q, 2] row gather
    start, end = se[:, 0], se[:, 1]
    r = start // window
    g = rows2w[r]                           # [Q, 2w] row gather
    pos = (r * window)[:, None] + jnp.arange(2 * window,
                                             dtype=jnp.int32)[None, :]
    in_run = (pos >= start[:, None]) & (pos < end[:, None])
    qq = q[:, None]
    lo = start + jnp.sum((g < qq) & in_run, axis=1).astype(jnp.int32)
    hi = start + jnp.sum((g <= qq) & in_run, axis=1).astype(jnp.int32)
    covered = end <= (r + 2) * window
    lo = jnp.where(covered, lo, start)
    hi = jnp.where(covered, hi, start)
    uncovered = jnp.where(covered, 0, end - start).astype(jnp.int32)
    return (lo.reshape(queries.shape), hi.reshape(queries.shape),
            uncovered.reshape(queries.shape))


def lookup_prefix_window(index_kmers, pstart, queries, prefix_bits: int,
                         window: int):
    """(left, right) insertion bounds via prefix direct addressing.

    TPU-first replacement for searchsorted when the sorted array carries a
    host-built prefix table (db/kmer_index.py:prefix_table): the top
    `prefix_bits` of a query address `pstart` directly, giving the
    [start, end) slice holding every key with that prefix; one [Q, window]
    row gather + two masked counts produce exact left/right bounds.  No
    log-depth search, no dense bucket compares.

    The fetch is two ALIGNED row gathers, not an arbitrary-offset window:
    XLA lowers `arr[start + iota]` as a per-element gather (measured 12x
    slower), while `arr2d[r]` row gathers are DMA-friendly.  A run of
    <= window elements starting anywhere inside aligned row r ends before
    row r+2, so rows r and r+1 always cover it.

    Preconditions (enforced by the table builder):
      * window is a power of two sized to cover ~all prefix runs (heavy
        tails are reported via `uncovered`, see lookup_prefix_rows),
      * index_kmers' padded length is a multiple of window and exceeds the
        true length by >= 2*window sentinel (max-uint64) entries so the
        r+1 row read never goes OOB.
    pstart: int32 [2^prefix_bits + 1] insertion points of each prefix.
    Returns (lo, hi, uncovered) -- see lookup_prefix_rows.
    """
    q = queries.reshape(-1)
    p = (q >> np.uint64(64 - prefix_bits)).astype(jnp.int32)
    start = pstart[p]                       # [Q]
    end = pstart[p + 1]                     # [Q]
    rows2d = index_kmers.reshape(-1, window)
    r = start // window
    g = jnp.concatenate([rows2d[r], rows2d[r + 1]], axis=1)  # [Q, 2w]
    pos = (r * window)[:, None] + jnp.arange(2 * window,
                                             dtype=jnp.int32)[None, :]
    in_run = (pos >= start[:, None]) & (pos < end[:, None])
    qq = q[:, None]
    lo = start + jnp.sum((g < qq) & in_run, axis=1).astype(jnp.int32)
    hi = start + jnp.sum((g <= qq) & in_run, axis=1).astype(jnp.int32)
    covered = end <= (r + 2) * window
    lo = jnp.where(covered, lo, start)
    hi = jnp.where(covered, hi, start)
    uncovered = jnp.where(covered, 0, end - start).astype(jnp.int32)
    return (lo.reshape(queries.shape), hi.reshape(queries.shape),
            uncovered.reshape(queries.shape))
