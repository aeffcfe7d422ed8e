"""Full-device batch pipeline: alignment through taxonomy without host
loops.

Composes the parity-tested device stages into two jitted phases split by
the insert-size model (a tiny, data-dependent percentile computation the
reference runs per chunk on sorted host data -- PairedOverlap.h:300-360 --
kept exact on host):

  phase A: k-merize -> index join -> compact -> batched SW -> pairing
           sweep; returns columnar pairs + the nonzero insert sizes.
  host:    max_allowed_insert_size over the (small) insert list.
  phase B: insert screen (replace) -> score screen -> pseudo-assembly ->
           score screen -> per-read LCA over hit taxids.

Outputs stay columnar; the host converts only the surviving rows (SAM
emission, gene assignment) -- identical results to the host pipeline
(tests/test_device_path.py), at device speed for the heavy stages.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

from ..config import PipelineConfig
from ..ops import encode, kmers, lca as lca_ops, match, pairing_dev, \
    screens_dev, sw


class PhaseAOut(NamedTuple):
    overlaps: match.Overlaps          # compacted, SW-validated
    ov_score: jnp.ndarray             # int32 [N]
    ov_begin: jnp.ndarray
    ov_end: jnp.ndarray
    ov_qbegin: jnp.ndarray
    ov_qend: jnp.ndarray
    pairs: pairing_dev.DevicePairs    # emission-ordered


class PhaseBOut(NamedTuple):
    cols: screens_dev.PairCols        # surviving pairs (group-sorted)
    read_lca: jnp.ndarray             # int32 [P] segment-running LCA
    group_last: jnp.ndarray           # bool [P] last valid row of group


@functools.partial(jax.jit, static_argnames=(
    "max_matches", "capacity", "sw_batch", "chain_iters", "match_s",
    "mismatch", "gap_open", "gap_extend", "window_len", "score_threshold"))
def phase_a(bases, lengths, midpoint,
            idx_kmers, idx_entry, idx_off, idx_rc,
            genome_scodes, entry_offsets,
            max_matches: int, capacity: int, sw_batch: int,
            chain_iters: int, match_s: int, mismatch: int, gap_open: int,
            gap_extend: int, window_len: int,
            score_threshold: int = 0) -> PhaseAOut:
    km, off, rc, valid = kmers.read_kmers_device(bases, lengths)
    res = match.match_overlaps(km, off, rc, valid, lengths,
                               idx_kmers, idx_entry, idx_off, idx_rc,
                               max_matches=max_matches, capacity=capacity,
                               chain_iters=chain_iters)
    res = match.compact_overlaps(res, sw_batch)
    read_scodes = encode.sw_codes(bases)
    al = sw.align_overlaps_batch(
        res.read_id, res.entry_id, res.rel_pos, res.rc, res.valid,
        read_scodes, lengths, genome_scodes, entry_offsets,
        match_s, mismatch, gap_open, gap_extend, window_len=window_len)
    score = jnp.where(res.valid, al.score, 0)
    # screenOverlapsByScoreThreshold (Overlap.h:329-341); the default
    # threshold 0 keeps score-0 alignments exactly like the reference
    keep = res.valid & (score >= score_threshold)
    res = res._replace(valid=keep,
                       count=jnp.sum(keep.astype(jnp.int32)))
    pairs = pairing_dev.pair_overlaps_device(
        res.read_id, res.entry_id, res.rel_pos, res.rc, res.valid,
        score, al.ref_begin, al.ref_end, lengths, midpoint)
    return PhaseAOut(res, score, al.ref_begin, al.ref_end,
                     al.query_begin, al.query_end, pairs)


def _group_of(pairs: pairing_dev.DevicePairs, read_id, midpoint):
    """Read-pair position of each emission (r1 read when present, else
    r2 read - midpoint; group_pairs_per_read semantics)."""
    has_r1 = pairs.r1_idx >= 0
    r1 = read_id[jnp.clip(pairs.r1_idx, 0, None)]
    r2 = read_id[jnp.clip(pairs.r2_idx, 0, None)]
    return jnp.where(has_r1, r1, r2 - jnp.asarray(midpoint, jnp.int32))


@functools.partial(jax.jit, static_argnames=("fraction",
                                             "perform_pseudo_assembly"))
def phase_b(a: PhaseAOut, midpoint, max_insert, entry_taxids, lca_tables,
            fraction: float, perform_pseudo_assembly: bool) -> PhaseBOut:
    p = a.pairs.r1_idx.shape[0]
    valid = jnp.arange(p, dtype=jnp.int32) < a.pairs.count
    group = _group_of(a.pairs, a.overlaps.read_id, midpoint)
    cols = screens_dev.PairCols(
        group=jnp.where(valid, group, 0),
        r1_idx=a.pairs.r1_idx, r2_idx=a.pairs.r2_idx,
        combined_score=a.pairs.combined_score, entry_id=a.pairs.entry_id,
        ref_start=a.pairs.ref_start, ref_end=a.pairs.ref_end,
        insert_size=a.pairs.insert_size, valid=valid)
    cols = screens_dev.screen_by_insert_device(
        cols, max_insert, a.ov_score, a.ov_begin, a.ov_end)
    cols = screens_dev.screen_by_score_device(cols, fraction)
    if perform_pseudo_assembly:
        cols = screens_dev.pseudo_assembly_device(cols)
        cols = screens_dev.screen_by_score_device(cols, fraction)
    # normalize: screened-out rows can sit interleaved inside groups
    # (screens only flip `valid`); compact valid rows to the front, stable
    pp = cols.group.shape[0]
    perm = screens_dev._sort_perm(cols.valid,
                                  cols.group.astype(jnp.uint32),
                                  jnp.arange(pp, dtype=jnp.uint32))
    cols = screens_dev._permute(cols, perm)
    # per-read LCA over hit entry taxids (getResultFromPairedOverlaps)
    taxids = entry_taxids[jnp.clip(cols.entry_id, 0, None)]
    first = (jnp.roll(cols.group, 1).at[0].set(-1) != cols.group) | \
        (jnp.roll(cols.valid, 1).at[0].set(True) != cols.valid)
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    read_lca = lca_ops.lca_segments(taxids, seg, cols.valid, lca_tables)
    nxt_seg = jnp.roll(seg, -1).at[pp - 1].set(-1)
    group_last = cols.valid & (nxt_seg != seg)
    return PhaseBOut(cols, read_lca, group_last)
