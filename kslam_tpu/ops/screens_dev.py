"""Device pair screens + pseudo-assembly (PairedOverlap.h:361-436,471-576).

Operates on columnar pair sets (from ops/pairing_dev) plus a group id =
read-pair position.  All three stages are segmented-scan formulations of
the reference's per-read/per-entry loops:

  * score screen: stable score-descending order per group, keep
    combinedScore >= fraction * (per-group top),
  * insert screen (replace=True): per group, stable sort by insertSize
    ascending; oversize FULL pairs mutate into R2-only halves in place and
    append an R1 half-pair at the group tail (PairedOverlap.h:416-430),
  * pseudo-assembly: per entry over ref_start-sorted pairs, chains break
    where ref_start > runningMax(ref_end) - 20.  The reference resets the
    running max per chain; with starts sorted this is provably equivalent
    to the NON-resetting prefix max (a new chain's start already exceeds
    every older chain's end - 20 because its chain-start did), which turns
    chain labeling into one exclusive segmented prefix-max + cumsum.
    Chains of length > 1 rescore every member
    coverage * avgScorePerBase * length with the reference's
    nan/inf-to-0 truncation; scores mutate IN PLACE (input order kept).

Precision note: the reference rescoring uses C++ doubles; device math is
float32 (TPU has no f64 vectors).  Integer-valued intermediates are exact
below 2^24, which covers realistic chain scores.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import numpy as np
import jax.numpy as jnp

NONE = np.int32(-1)
U32_MASK = np.int64(0xFFFFFFFF)


class PairCols(NamedTuple):
    """Columnar pair state threaded through the screens."""
    group: jnp.ndarray           # int32 [P] read-pair position
    r1_idx: jnp.ndarray          # int32 [P] overlap row (-1 = absent)
    r2_idx: jnp.ndarray          # int32 [P]
    combined_score: jnp.ndarray  # int32 [P] (uint32 semantics via bits)
    entry_id: jnp.ndarray        # int32 [P]
    ref_start: jnp.ndarray       # int32 [P]
    ref_end: jnp.ndarray         # int32 [P]
    insert_size: jnp.ndarray     # uint32 [P]
    valid: jnp.ndarray           # bool [P]


def _sort_perm(valid, key_hi, key_lo):
    """Stable permutation ordering by (valid desc, key_hi, key_lo)."""
    p = valid.shape[0]
    k1 = jnp.where(valid, key_hi.astype(jnp.uint64), np.uint64(2**64 - 1))
    idx = jnp.arange(p, dtype=jnp.uint64)
    k2 = (key_lo.astype(jnp.uint64) << np.uint64(32)) | idx
    _, _, perm = jax.lax.sort(
        (k1, k2, jnp.arange(p, dtype=jnp.int32)), num_keys=2)
    return perm


def _permute(cols: PairCols, perm) -> PairCols:
    return PairCols(*(c[perm] for c in cols))


def _segment_first_broadcast(first, value_i64):
    """Broadcast each segment's first-row value (int64, >= 0, < 2^33-1)
    to the whole segment (segments = runs delimited by `first`)."""
    seg = jnp.cumsum(first.astype(jnp.int64)) - 1
    code = seg * (2**33) + jnp.where(first, value_i64 + 1, 0)
    scan = jax.lax.associative_scan(jnp.maximum, code)
    return scan - seg * (2**33) - 1


def _fraction_mantissa(fraction: float):
    """Static (M, S) with fraction == M * 2**-S exactly and
    M in [2^52, 2^53) (the double's normalized mantissa)."""
    num, den = float(fraction).as_integer_ratio()
    s = den.bit_length() - 1
    m = num
    while m < 2**52:
        m <<= 1
        s += 1
    while m >= 2**53:
        m >>= 1
        s -= 1
    return m, s


def _bitlen_u32(x):
    """Bit length of int64 values in [1, 2^32)."""
    bl = jnp.zeros_like(x)
    for k in (16, 8, 4, 2, 1):
        c = x >= (np.int64(1) << np.int64(k))
        bl = bl + jnp.where(c, k, 0)
        x = jnp.where(c, x >> k, x)
    return bl + 1


def exact_score_threshold(top, fraction: float):
    """Smallest uint32 score that survives `score >= top * fraction` under
    the reference's C++ double semantics (PairedOverlap.h:376-380): both
    uint32 -> double conversions are exact, the product rounds ONCE to
    double (round-half-even), and an integer score passes iff
    score >= ceil(product).  float32 cannot reproduce this above ~2^24
    (pseudo-assembly chain scores reach 2^32), so the product's 85-bit
    integer numerator is computed in two int64 limbs and rounded to the
    53-bit double mantissa exactly.

    top: int64 [N] (uint32 values).  Returns int64 [N] thresholds."""
    if not (fraction > 0):
        return jnp.zeros_like(top)
    m_full, s_exp = _fraction_mantissa(fraction)
    mhi, mlo = m_full >> 27, m_full & (2**27 - 1)
    t = top
    a = t * np.int64(mhi)                    # < 2^58
    b = t * np.int64(mlo)                    # < 2^59
    hi = a + (b >> np.int64(27))             # P = hi*2^27 + lo, lo < 2^27
    lo = b & np.int64(2**27 - 1)
    bl = _bitlen_u32(jnp.maximum(t, 1))
    # P has bl+52 or bl+53 significant bits (M is normalized)
    carry = (hi >= (np.int64(1) << (bl + 25))).astype(jnp.int64)
    sh = bl - 1 + carry                      # drop sh bits: 53 remain
    sh_lo = jnp.minimum(sh, 27)
    sh_hi = jnp.maximum(sh - 27, 0)
    q = jnp.where(sh <= 27,
                  (hi << (27 - sh_lo)) | (lo >> sh_lo),
                  hi >> sh_hi)
    r = jnp.where(sh <= 27,
                  lo & ((np.int64(1) << sh_lo) - 1),
                  ((hi & ((np.int64(1) << sh_hi) - 1)) << np.int64(27)) | lo)
    half = jnp.where(sh > 0, np.int64(1) << jnp.maximum(sh - 1, 0),
                     np.int64(0))
    q = q + jnp.where(r > half, 1,
                      jnp.where((r == half) & (sh > 0), q & 1, 0))
    # threshold = ceil(q * 2^(sh - S)); q < 2^54
    d = np.int64(s_exp) - sh
    d_c = jnp.clip(d, 0, 54)
    t_div = (q + (np.int64(1) << d_c) - 1) >> d_c
    neg = jnp.clip(-d, 0, 33)
    big = np.int64(1) << np.int64(33)        # > any uint32 score
    sat = (-d > 33) | (q > ((np.int64(1) << np.int64(62)) >> neg))
    t_mul = jnp.where(sat, big, q << neg)
    thr = jnp.where(d >= 0, t_div, t_mul)
    return jnp.where(t <= 0, 0, thr)


def screen_by_score_device(cols: PairCols, fraction: float) -> PairCols:
    """screenPairedAlignmentsByScore (PairedOverlap.h:361-390)."""
    score_u = cols.combined_score.astype(jnp.uint32)
    perm = _sort_perm(cols.valid, cols.group.astype(jnp.uint32),
                      jnp.asarray(0xFFFFFFFF, jnp.uint32) - score_u)
    out = _permute(cols, perm)
    first = jnp.roll(out.group, 1).at[0].set(-1) != out.group
    top = _segment_first_broadcast(
        first, out.combined_score.astype(jnp.uint32).astype(jnp.int64))
    thr = exact_score_threshold(top, fraction)
    keep = out.valid & \
        (out.combined_score.astype(jnp.uint32).astype(jnp.int64) >= thr)
    return out._replace(valid=keep)


def screen_by_insert_device(cols: PairCols, max_insert,
                            ov_score, ov_begin, ov_end,
                            replace: bool = True) -> PairCols:
    """screenPairedAlignmentsByInsertSize (PairedOverlap.h:396-436).

    ov_score/begin/end: per-overlap columns indexed by r1_idx/r2_idx.
    With replace=True the output has 2x capacity (appended R1 halves)."""
    perm = _sort_perm(cols.valid, cols.group.astype(jnp.uint32),
                      cols.insert_size)
    out = _permute(cols, perm)
    over = out.valid & (out.insert_size > jnp.asarray(max_insert,
                                                      jnp.uint32))
    if not replace:
        return out._replace(valid=out.valid & ~over)
    r2 = jnp.clip(out.r2_idx, 0, None)
    r1 = jnp.clip(out.r1_idx, 0, None)
    mutated = out._replace(
        r1_idx=jnp.where(over, NONE, out.r1_idx),
        combined_score=jnp.where(over, ov_score[r2], out.combined_score),
        ref_start=jnp.where(over, ov_begin[r2], out.ref_start),
        ref_end=jnp.where(over, ov_end[r2], out.ref_end),
        insert_size=jnp.where(over, 0, out.insert_size))
    app = out._replace(
        r2_idx=jnp.full_like(out.r2_idx, NONE),
        combined_score=ov_score[r1], ref_start=ov_begin[r1],
        ref_end=ov_end[r1],
        insert_size=jnp.zeros_like(out.insert_size),
        valid=over & (out.r1_idx != NONE))
    both = PairCols(*(jnp.concatenate([a, b])
                      for a, b in zip(mutated, app)))
    p = out.group.shape[0]
    tail = jnp.concatenate([jnp.zeros(p, jnp.uint32),
                            jnp.ones(p, jnp.uint32)])
    order = jnp.concatenate([jnp.arange(p, dtype=jnp.uint32)] * 2)
    perm2 = _sort_perm(both.valid, both.group.astype(jnp.uint32),
                       (tail << np.uint32(31)) | order)
    return _permute(both, perm2)


def pseudo_assembly_chains(cols: PairCols):
    """Device half of pseudoAssembly: entry-sort + chain labeling.
    Returns (perm, cseg): the stable entity/ref_start sort permutation and
    per-sorted-row chain ids.  The caller either finishes on device
    (pseudo_assembly_device, float32) or rescoring happens on host with
    exact C++-double semantics (pipeline/device_path.rescore_chains_host).
    """
    perm = _sort_perm(cols.valid, cols.entry_id.astype(jnp.uint32),
                      (cols.ref_start.astype(jnp.int64) + 2**31)
                      .astype(jnp.uint32))
    out = _permute(cols, perm)
    first_e = (jnp.roll(out.entry_id, 1).at[0].set(-1) != out.entry_id) | \
        (jnp.roll(out.valid, 1).at[0].set(True) != out.valid)
    first_e = first_e.at[0].set(True)
    eseg = jnp.cumsum(first_e.astype(jnp.int32)) - 1
    code = eseg.astype(jnp.int64) * (2**33) + \
        (out.ref_end.astype(jnp.int64) + 2**31)
    scan = jax.lax.associative_scan(jnp.maximum, code)
    shifted = jnp.roll(scan, 1).at[0].set(np.int64(-2**62))
    same = jnp.roll(eseg, 1).at[0].set(-1) == eseg
    prevmax = jnp.where(same,
                        shifted - eseg.astype(jnp.int64) * (2**33) - 2**31,
                        np.int64(-1000000))
    brk = (out.ref_start.astype(jnp.int64) > prevmax - 20) | first_e
    cseg = jnp.cumsum(brk.astype(jnp.int32)) - 1
    return perm, cseg


def pseudo_assembly_device(cols: PairCols) -> PairCols:
    """pseudoAssembly (PairedOverlap.h:471-576): rescores in place, input
    order preserved.  float32 rescoring (see module precision note); the
    CLI pipeline uses the exact host-rescoring split instead."""
    p = cols.group.shape[0]
    perm = _sort_perm(cols.valid, cols.entry_id.astype(jnp.uint32),
                      (cols.ref_start.astype(jnp.int64) + 2**31)
                      .astype(jnp.uint32))
    out = _permute(cols, perm)
    first_e = (jnp.roll(out.entry_id, 1).at[0].set(-1) != out.entry_id) | \
        (jnp.roll(out.valid, 1).at[0].set(True) != out.valid)
    first_e = first_e.at[0].set(True)
    eseg = jnp.cumsum(first_e.astype(jnp.int32)) - 1
    # exclusive segmented prefix max of ref_end within the entry
    code = eseg.astype(jnp.int64) * (2**33) + \
        (out.ref_end.astype(jnp.int64) + 2**31)
    scan = jax.lax.associative_scan(jnp.maximum, code)
    shifted = jnp.roll(scan, 1).at[0].set(np.int64(-2**62))
    same = jnp.roll(eseg, 1).at[0].set(-1) == eseg
    prevmax = jnp.where(same,
                        shifted - eseg.astype(jnp.int64) * (2**33) - 2**31,
                        np.int64(-1000000))
    brk = (out.ref_start.astype(jnp.int64) > prevmax - 20) | first_e
    cseg = jnp.cumsum(brk.astype(jnp.int32)) - 1

    span = jnp.abs(out.ref_end - out.ref_start).astype(jnp.float32)
    score_f = out.combined_score.astype(jnp.uint32).astype(jnp.float32)
    pb = jnp.where(span != 0, score_f / span, jnp.float32(np.inf))

    ones = jnp.where(out.valid, 1, 0)
    cnt = jax.ops.segment_sum(ones, cseg, num_segments=p)
    nb = jax.ops.segment_sum(jnp.where(out.valid, span, 0.), cseg,
                             num_segments=p)
    pbs = jax.ops.segment_sum(jnp.where(out.valid, pb, 0.), cseg,
                              num_segments=p)
    hi = jax.ops.segment_max(
        jnp.where(out.valid, out.ref_end, -2**31), cseg, num_segments=p)
    start0 = jax.ops.segment_min(
        jnp.where(out.valid, out.ref_start, 2**31 - 1), cseg,
        num_segments=p)

    length = (hi - start0).astype(jnp.float32)
    cov = nb / length                    # 0/0 -> nan, x/0 -> inf (IEEE)
    avg = pbs / cnt.astype(jnp.float32)
    new_score_f = cov * avg * length
    finite = jnp.isfinite(new_score_f)
    tr = jnp.where(finite, new_score_f, 0.)   # non-finite -> 0 (host rule)
    new_score = (jnp.trunc(tr).astype(jnp.int64) & U32_MASK) \
        .astype(jnp.int32)
    rescored = (cnt[cseg] > 1) & out.valid
    score_sorted = jnp.where(rescored, new_score[cseg],
                             out.combined_score)
    # scatter scores back to the input order
    score_final = jnp.zeros(p, jnp.int32).at[perm].set(score_sorted)
    return cols._replace(combined_score=score_final)
