"""Batched Smith-Waterman on device (JAX reference implementation).

A column-scan formulation of the reference's striped SSE2 kernel
(ssw.c:143-592) with identical observable behavior (see golden/ssw.py for
the tie-break contract, which this module reproduces batched):

  * the query dimension is vectorized (the striped segments of ssw.c become
    plain vector lanes); the vertical F dependency is resolved by an exact
    prefix-max ("lazy-F" as a log-depth scan), valid because
    gap_open >= gap_extend (enforced by golden.ssw.check_params),
  * scores in int32: the byte->word escalation (ssw.c:870-877) is
    score-exact and needs no emulation,
  * begin positions from a second pass over reversed prefixes
    (ssw.c:905-923), batched with masked gathers,
  * N (code 4) scores 0 and doubles as padding: padded rows/columns can
    never introduce a new column maximum, so fixed-shape DP over the padded
    batch reproduces variable-length results exactly.

This is the correctness baseline and the CPU-mesh path; ops/sw_pallas.py
holds the TPU Pallas kernel with the same contract.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

NEG = np.int32(-(2 ** 30))


class SWEnds(NamedTuple):
    score: jnp.ndarray     # int32 [B]
    ref_end: jnp.ndarray   # int32 [B], -1 when score == 0
    read_end: jnp.ndarray  # int32 [B], 0 when score == 0


class SWAlignments(NamedTuple):
    score: jnp.ndarray
    ref_begin: jnp.ndarray
    ref_end: jnp.ndarray
    query_begin: jnp.ndarray
    query_end: jnp.ndarray


def _pair_score(q_col, r_val, match, mismatch):
    """Score of code pair; N (4) scores 0 (ssw_cpp.cpp:25-49)."""
    is_n = (q_col == 4) | (r_val == 4)
    return jnp.where(is_n, 0, jnp.where(q_col == r_val, match, -mismatch))


def _exclusive_prefix_max(a):
    """Exclusive running max along the last axis, log-depth."""
    shifted = jnp.concatenate(
        [jnp.full(a.shape[:-1] + (1,), NEG, a.dtype), a[..., :-1]], axis=-1)
    return jax.lax.associative_scan(jnp.maximum, shifted, axis=-1)


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "gap_open",
                                             "gap_extend"))
def sw_forward_batch(q, r, match: int, mismatch: int, gap_open: int,
                     gap_extend: int, n_valid=None) -> SWEnds:
    """Forward pass over a [B, L] batch of code-5 sequences.

    Returns per-row (score, ref_end, read_end) with the reference
    tie-breaks: first column whose max strictly improves, then the smallest
    query index equal to the max within that column.
    n_valid is accepted for API parity with the Pallas kernel (which skips
    whole padding blocks); the scan computes all rows -- padding rows are
    all-N and score 0 either way.
    """
    q = q.astype(jnp.int32)
    r = r.astype(jnp.int32)
    b, l = q.shape
    go = np.int32(gap_open)
    ge = np.int32(gap_extend)
    idx = jnp.arange(l, dtype=jnp.int32)[None, :]

    def column(carry, rj):
        h_prev, e_prev, best, best_col, best_h, j = carry
        s = _pair_score(q, rj[:, None], match, mismatch)
        diag = jnp.concatenate(
            [jnp.zeros((b, 1), jnp.int32), h_prev[:, :-1]], axis=1)
        h = jnp.maximum(diag + s, 0)
        h = jnp.maximum(h, e_prev)
        # exact lazy-F: F[i] = max_{k<i}(h[k] - go + k*ge) - (i-1)*ge
        a = h - go + idx * ge
        f = _exclusive_prefix_max(a) - (idx - 1) * ge
        h = jnp.maximum(h, f)
        e_next = jnp.maximum(jnp.maximum(h - go, e_prev - ge), 0)
        colmax = jnp.max(h, axis=1)
        improved = colmax > best
        best = jnp.where(improved, colmax, best)
        best_col = jnp.where(improved, j, best_col)
        best_h = jnp.where(improved[:, None], h, best_h)
        return (h, e_next, best, best_col, best_h, j + 1), None

    init = (jnp.zeros((b, l), jnp.int32), jnp.zeros((b, l), jnp.int32),
            jnp.zeros(b, jnp.int32), jnp.full(b, -1, jnp.int32),
            jnp.zeros((b, l), jnp.int32), np.int32(0))
    (h, e, best, best_col, best_h, _), _ = jax.lax.scan(
        column, init, r.T)
    read_end = jnp.argmax(best_h == best[:, None], axis=1).astype(jnp.int32)
    zero = best == 0
    return SWEnds(best, jnp.where(zero, -1, best_col),
                  jnp.where(zero, 0, read_end))


def _reverse_gather(x, end):
    """x: [B, L]; per-row reversed prefix x[end], x[end-1], ..., x[0],
    padded with N (4)."""
    b, l = x.shape
    j = jnp.arange(l, dtype=jnp.int32)[None, :]
    src = end[:, None] - j
    vals = jnp.take_along_axis(x, jnp.clip(src, 0, l - 1), axis=1)
    return jnp.where(src >= 0, vals, 4)


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "gap_open",
                                             "gap_extend"))
def sw_align_batch(q, r, match: int, mismatch: int, gap_open: int,
                   gap_extend: int) -> SWAlignments:
    """Forward + reverse pass: scores, end AND begin positions, batched.
    Mirrors ssw_align with flag>=0x08 (SmithWaterman.h:191-211 usage)."""
    fwd = sw_forward_batch(q, r, match, mismatch, gap_open, gap_extend)
    q_rev = _reverse_gather(q, fwd.read_end)
    r_rev = _reverse_gather(r, fwd.ref_end)
    rev = sw_forward_batch(q_rev, r_rev, match, mismatch, gap_open,
                           gap_extend)
    zero = fwd.score == 0
    # score==0: ref slice is empty, reverse kernel defaults apply
    # (ref_begin=-1, read_begin=read_end-0; golden/ssw.py contract)
    ref_begin = jnp.where(zero, -1, fwd.ref_end - rev.ref_end)
    query_begin = jnp.where(zero, 0, fwd.read_end - rev.read_end)
    return SWAlignments(fwd.score, ref_begin, fwd.ref_end, query_begin,
                        fwd.read_end)


def _sw_align_impl(backend: str):
    """Resolve the SW backend at trace time: the Pallas kernel on TPU, the
    XLA scan elsewhere (identical contract, tests/test_sw_pallas.py)."""
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        from . import sw_pallas
        return sw_pallas.sw_align_batch
    return sw_align_batch


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "gap_open",
                                             "gap_extend", "window_len",
                                             "backend"))
def align_overlaps_batch(read_id, entry_id, rel_pos, rc, valid,
                         read_scodes, read_lengths,
                         genome_scodes, entry_offsets,
                         match: int, mismatch: int, gap_open: int,
                         gap_extend: int,
                         window_len: int,
                         backend: str = "auto") -> SWAlignments:
    """performSmithWatermanOnRange2 (SmithWaterman.h:184-233), batched:
    slice the ref window at max(rel,0) of query length (clipped at the entry
    end), reverse-complement the window for RC overlaps, align, flip RC
    coordinates back to forward-ref space, then add the window start.

    Args are device arrays; window_len is the static padded length (>= the
    longest read).  Invalid rows produce arbitrary results; callers filter.
    """
    p = read_id.shape[0]
    l = window_len
    safe_read = jnp.clip(read_id, 0, read_scodes.shape[0] - 1)
    safe_entry = jnp.clip(entry_id, 0, entry_offsets.shape[0] - 2)
    qlen = read_lengths[safe_read]
    ref_start = jnp.maximum(rel_pos, 0)
    e_off = entry_offsets[safe_entry]
    e_len = (entry_offsets[safe_entry + 1] - e_off).astype(jnp.int32)
    wlen = jnp.clip(e_len - ref_start, 0, qlen)

    j = jnp.arange(l, dtype=jnp.int32)[None, :]
    # forward window positions; RC rows read the window reversed
    pos_fwd = j
    pos_rc = wlen[:, None] - 1 - j
    pos = jnp.where(rc[:, None], pos_rc, pos_fwd)
    in_window = (pos >= 0) & (pos < wlen[:, None])
    g_idx = e_off[:, None] + ref_start[:, None].astype(jnp.int64) + pos
    g_idx = jnp.clip(g_idx, 0, genome_scodes.shape[0] - 1)
    window = genome_scodes[g_idx].astype(jnp.int32)
    window = jnp.where(rc[:, None] & (window < 4), window ^ 2, window)
    window = jnp.where(in_window, window, 4)

    q = read_scodes[safe_read].astype(jnp.int32)
    q = jnp.where(j < qlen[:, None], q, 4)

    al = sw_align_batch(q, window, match, mismatch, gap_open, gap_extend)

    # RC coordinate flip (SmithWaterman.h:212-227), applied unconditionally
    # for RC rows exactly like the reference (including score==0 rows)
    rb = jnp.where(rc, wlen - 1 - al.ref_end, al.ref_begin)
    re = jnp.where(rc, wlen - 1 - al.ref_begin, al.ref_end)
    qb = jnp.where(rc, qlen - 1 - al.query_end, al.query_begin)
    qe = jnp.where(rc, qlen - 1 - al.query_begin, al.query_end)
    return SWAlignments(al.score, rb + ref_start, re + ref_start, qb, qe)


CHUNK = 32  # genome chunk width for the gather-free window builder: smaller
            # chunks add coarse row-gather passes (cheap at SW-batch size)
            # but shrink the padded kernel width nch*CHUNK -- at 32 a 160
            # window scans 192 ref columns instead of 256


def genome_chunks_from_scodes(scodes: "np.ndarray"):
    """Host: pad SW codes to a CHUNK multiple (with N) and reshape to
    [G/CHUNK, CHUNK] rows for coarse row-gathers."""
    g = len(scodes)
    padded = np.full(((g + CHUNK - 1) // CHUNK) * CHUNK, 4, np.uint8)
    padded[:g] = scodes
    return padded.reshape(-1, CHUNK)


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "gap_open",
                                             "gap_extend", "window_len",
                                             "backend"))
def align_overlaps_batch_chunked(read_id, entry_id, rel_pos, rc, valid,
                                 read_scodes, read_lengths,
                                 genome_chunks, entry_offsets,
                                 match: int, mismatch: int, gap_open: int,
                                 gap_extend: int, window_len: int,
                                 backend: str = "auto",
                                 n_valid=None) -> SWAlignments:
    """Gather-free variant of align_overlaps_batch: the reference window
    is assembled from CHUNK-aligned genome rows (coarse row-gathers, DMA
    friendly) with per-row mask arithmetic instead of a [B, L] elementwise
    gather, and the begin-position reverse pass runs on fixed flips with
    per-row masked regions instead of reversed gathers.

    Masking correctness: leading N rows/columns stay identically zero in
    the DP (nothing above/left of them is nonzero), and trailing-N
    phantom cells tie real maxima at later columns/rows, which the
    (score desc, column asc, row asc) tie-break always rejects -- so the
    masked wide scan reproduces the compact window results exactly
    (differentially tested against align_overlaps_batch)."""
    lq = window_len
    nch = (window_len + CHUNK - 1) // CHUNK + 1
    w = nch * CHUNK
    safe_read = jnp.clip(read_id, 0, read_scodes.shape[0] - 1)
    safe_entry = jnp.clip(entry_id, 0, entry_offsets.shape[0] - 2)
    qlen = read_lengths[safe_read]
    ref_start = jnp.maximum(rel_pos, 0)
    e_off = entry_offsets[safe_entry]
    e_len = (entry_offsets[safe_entry + 1] - e_off).astype(jnp.int32)
    wlen = jnp.clip(e_len - ref_start, 0, qlen)

    g0 = e_off + ref_start.astype(jnp.int64)
    base = (g0 // CHUNK).astype(jnp.int32)
    d = (g0 % CHUNK).astype(jnp.int32)
    nblocks = genome_chunks.shape[0]
    rows = [genome_chunks[jnp.clip(base + t, 0, max(nblocks - 1, 0))]
            for t in range(nch)]
    buf = jnp.concatenate(rows, axis=1).astype(jnp.int32)   # [B, W]

    j = jnp.arange(w, dtype=jnp.int32)[None, :]
    in_fwd = (j >= d[:, None]) & (j < (d + wlen)[:, None])
    fwd_r = jnp.where(in_fwd, buf, 4)
    flip = buf[:, ::-1]
    d2 = w - d - wlen
    in_rc = (j >= d2[:, None]) & (j < (d2 + wlen)[:, None])
    rc_r = jnp.where(in_rc, jnp.where(flip < 4, flip ^ 2, flip), 4)
    r = jnp.where(rc[:, None], rc_r, fwd_r)
    dstart = jnp.where(rc, d2, d)

    q = read_scodes[safe_read].astype(jnp.int32)
    jq = jnp.arange(lq, dtype=jnp.int32)[None, :]
    qm = jnp.where(jq < qlen[:, None], q, 4)

    fwd_fn = _sw_fwd_impl(backend)
    fwd = fwd_fn(qm, r, match, mismatch, gap_open, gap_extend,
                 n_valid=n_valid)
    zero = fwd.score == 0

    # reverse pass on fixed flips with per-row valid regions
    sq = lq - 1 - fwd.read_end
    sr = w - 1 - fwd.ref_end
    rev_q = jnp.where(jq >= sq[:, None], qm[:, ::-1], 4)
    rev_r = jnp.where(j >= sr[:, None], r[:, ::-1], 4)
    rev = fwd_fn(rev_q, rev_r, match, mismatch, gap_open, gap_extend,
                 n_valid=n_valid)

    k_end = jnp.where(zero, -1, fwd.ref_end - dstart)
    ref_begin_w = jnp.where(zero, -1, k_end - (rev.ref_end - sr))
    query_begin = jnp.where(zero, 0, fwd.read_end - (rev.read_end - sq))

    rb = jnp.where(rc, wlen - 1 - k_end, ref_begin_w)
    re = jnp.where(rc, wlen - 1 - ref_begin_w, k_end)
    qb = jnp.where(rc, qlen - 1 - fwd.read_end, query_begin)
    qe = jnp.where(rc, qlen - 1 - query_begin, fwd.read_end)
    return SWAlignments(fwd.score, rb + ref_start, re + ref_start, qb, qe)


def _sw_fwd_impl(backend: str):
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        from . import sw_pallas
        return sw_pallas.sw_forward_batch
    return sw_forward_batch
