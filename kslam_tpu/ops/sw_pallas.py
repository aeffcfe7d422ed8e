"""Pallas TPU kernel for batched striped Smith-Waterman (score + end pos).

TPU-native replacement for the reference's SSE2 kernel (ssw.c:143-592): the
16 uint8 SSE lanes become the VPU's 8x128 vector shape -- the *batch* of
alignment problems lives on the 128-lane axis, the query dimension on the
sublane axis, and the whole DP state (H, E, running best) stays in VMEM for
the entire column scan, so HBM traffic is just the input codes and three
output words per pair (the XLA fallback in ops/sw.py spills [B, L] state to
HBM every scan step).

Recurrence and tie-breaks are copied from ops/sw.py verbatim (which is
oracle-tested against ssw.c):
  * lazy-F as an exact exclusive prefix-max over the query axis
    (log2(L) shifted maxima, valid for gap_open >= gap_extend),
  * result cell = lexicographic max of (score desc, ref column asc,
    query row asc), packed into one int32 key per cell:
       key = (score << 20) + ((1023 - j) << 10) + (1023 - i) - (2^20 - 1)
    so score==0 cells never beat the zero init (ssw.c:333-342 semantics).

Query and reference lengths are independent (q [B, Lq] vs r [B, Lr]) so
callers can scan wide aligned reference windows.
Constraints: Lq, Lr <= 1024 (key packing); match * Lq <= 2047 (score must
fit 11 bits above the 20 key bits).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sw import SWEnds, SWAlignments, _reverse_gather

NEG = -(2 ** 30)


def _sw_kernel(nv_ref, qT_ref, rT_ref, out_ref, *, LQ, LR, BT, match,
               mismatch, go, ge):
    # whole-block skip: the SW batch is front-compacted (match.
    # compact_overlaps), so blocks past n_valid are pure padding -- write
    # the score-0 default and skip the column scan (the static sw_batch
    # cap is typically 2x the real candidate count).  np.int32(BT): a
    # bare Python int would promote the product to int64 under x64,
    # which Mosaic cannot lower (module docstring).
    blk_live = pl.program_id(0) * np.int32(BT) < nv_ref[0]

    @pl.when(jnp.logical_not(blk_live))
    def _():
        out_ref[0, :] = jnp.zeros((BT,), jnp.int32)
        out_ref[1, :] = jnp.full((BT,), -1, jnp.int32)
        out_ref[2, :] = jnp.zeros((BT,), jnp.int32)

    @pl.when(blk_live)
    def _():
        _sw_kernel_body(qT_ref, rT_ref, out_ref, LQ=LQ, LR=LR, BT=BT,
                        match=match, mismatch=mismatch, go=go, ge=ge)


def _sw_kernel_body(qT_ref, rT_ref, out_ref, *, LQ, LR, BT, match,
                    mismatch, go, ge):
    q = qT_ref[...].astype(jnp.int32)            # [LQ, BT]
    row = jax.lax.broadcasted_iota(jnp.int32, (LQ, BT), 0)
    q_is_n = q == 4
    # one-hot scoring: qbit & rbit != 0 <=> match of non-N codes (N maps
    # to 0, so N never matches); q_nn carries the -mismatch value with N
    # rows pre-zeroed, so the mismatch/N case is one multiply by the
    # per-column non-N flag instead of the 3-op eq/not_n arithmetic
    qbit = jnp.where(q_is_n, np.int32(0), np.int32(1) << q)
    q_nn = jnp.where(q_is_n, np.int32(0), np.int32(-mismatch))
    c_up = row * ge - go                          # a = h + c_up
    c_dn = ge - row * ge                          # f = prefmax(a) + c_dn
    ki = (1023 - row) - (2 ** 20 - 1)             # query-row part of the key
    negs = jnp.full((LQ, BT), NEG, jnp.int32)
    zeros = jnp.zeros((LQ, BT), jnp.int32)
    row0 = row == 0

    # np.int32 scalars are strong-typed: every literal that becomes a traced
    # operand (roll shifts, loop bounds, where branches) must avoid the weak
    # Python-int -> int64 default under x64, which Mosaic cannot lower.
    # The row >= k wrap masks are loop-invariant: build them once here
    # instead of re-deriving a compare inside every ref-column iteration.
    # k=1 is always present: shift_down(x, 1) is used unconditionally in
    # the column body even when LQ == 1 (where the loop below is empty).
    shift_masks = {1: row >= 1}
    k = 2
    while k < LQ:
        shift_masks[k] = row >= k
        k *= 2

    def shift_down(x, k):
        return jnp.where(shift_masks[k], pltpu.roll(x, np.int32(k), axis=0),
                         negs)

    def body(state):
        j, h, e, best = state
        rj = rT_ref[pl.ds(j, 1), :].astype(jnp.int32)      # [1, BT]
        # [1, BT] per-column precomputes (cheap: one vreg row)
        rbit = jnp.where(rj == 4, np.int32(0), np.int32(1) << rj)
        r_nn = (rj != 4).astype(jnp.int32)
        s = jnp.where((qbit & rbit) != np.int32(0), np.int32(match),
                      q_nn * r_nn)
        diag = jnp.where(row0, zeros, pltpu.roll(h, np.int32(1), axis=0))
        h2 = jnp.maximum(diag + s, 0)
        h2 = jnp.maximum(h2, e)
        a = h2 + c_up
        pm = shift_down(a, 1)                     # exclusive base
        k = 1
        while k < LQ - 1:
            pm = jnp.maximum(pm, shift_down(pm, k))
            k *= 2
        h2 = jnp.maximum(h2, pm + c_dn)
        # no zero clamp on E: a negative E never wins in h2 = max(h2, E)
        # (h2 >= 0 already), and E is bounded below by -go - LR*ge, so
        # dropping the reference byte-kernel's unsigned saturation is
        # score-exact with 1 fewer op per cell
        e2 = jnp.maximum(h2 - go, e - ge)
        key = (h2 << 20) + (ki + ((1023 - j) << 10))
        return j + np.int32(1), h2, e2, jnp.maximum(best, key)

    # while_loop with an explicit int32 counter: fori_loop's internal
    # counter is int64 under x64 and Mosaic cannot lower int64 scalars
    _, _, _, best = jax.lax.while_loop(
        lambda s: s[0] < np.int32(LR), body,
        (jnp.zeros((), jnp.int32), zeros, zeros, zeros))
    k2 = jnp.max(best, axis=0) + (2 ** 20 - 1)    # [BT]
    score = k2 >> 20
    pos = score > 0
    out_ref[0, :] = score
    out_ref[1, :] = jnp.where(pos, 1023 - ((k2 >> 10) & 1023),
                              jnp.full_like(k2, -1))
    out_ref[2, :] = jnp.where(pos, 1023 - (k2 & 1023), jnp.zeros_like(k2))


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "gap_open",
                                             "gap_extend", "block",
                                             "interpret"))
def sw_forward_batch(q, r, match: int, mismatch: int, gap_open: int,
                     gap_extend: int, block: int = 512,
                     interpret: bool = False, n_valid=None) -> SWEnds:
    """Drop-in for ops.sw.sw_forward_batch on TPU.

    q: [B, Lq] query codes; r: [B, Lr] reference codes (Lr may exceed Lq
    for wide aligned windows).  n_valid (device scalar): rows >= n_valid
    are padding; whole padding blocks skip the DP and write the score-0
    default (their outputs are masked by callers)."""
    b, lq = q.shape
    _, lr = r.shape
    if max(lq, lr) > 1024 or match * lq > 2047:
        raise ValueError(f"kernel limits exceeded: Lq={lq}, Lr={lr}, "
                         f"match={match}")
    bt = min(block, max(128, b))
    pad = (-b) % bt
    if pad:
        q = jnp.concatenate([q, jnp.full((pad, lq), 4, q.dtype)])
        r = jnp.concatenate([r, jnp.full((pad, lr), 4, r.dtype)])
    n = q.shape[0]
    nv = jnp.full((1,), np.int32(b), jnp.int32) if n_valid is None \
        else jnp.asarray(n_valid, jnp.int32).reshape(1)
    out = pl.pallas_call(
        functools.partial(_sw_kernel, LQ=lq, LR=lr, BT=bt, match=match,
                          mismatch=mismatch, go=gap_open, ge=gap_extend),
        grid=(n // bt,),
        in_specs=[
            # explicit int32 index map: the default one returns a Python
            # int that lowers to i64 under x64, which Mosaic rejects
            pl.BlockSpec((1,), lambda i: (np.int32(0),),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((lq, bt), lambda i: (np.int32(0), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lr, bt), lambda i: (np.int32(0), i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, bt), lambda i: (np.int32(0), i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, n), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=50 * n * lq * lr, bytes_accessed=n * (lq + lr) * 4 + 12 * n,
            transcendentals=0),
        interpret=interpret,
    )(nv, q.T.astype(jnp.int32), r.T.astype(jnp.int32))
    return SWEnds(out[0, :b], out[1, :b], out[2, :b])


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "gap_open",
                                             "gap_extend", "block",
                                             "interpret"))
def sw_align_batch(q, r, match: int, mismatch: int, gap_open: int,
                   gap_extend: int, block: int = 512,
                   interpret: bool = False) -> SWAlignments:
    """Forward + reverse pass (begin positions), Pallas-backed."""
    fwd = sw_forward_batch(q, r, match, mismatch, gap_open, gap_extend,
                           block=block, interpret=interpret)
    q_rev = _reverse_gather(q, fwd.read_end)
    r_rev = _reverse_gather(r, fwd.ref_end)
    rev = sw_forward_batch(q_rev, r_rev, match, mismatch, gap_open,
                           gap_extend, block=block, interpret=interpret)
    zero = fwd.score == 0
    ref_begin = jnp.where(zero, -1, fwd.ref_end - rev.ref_end)
    query_begin = jnp.where(zero, 0, fwd.read_end - rev.read_end)
    return SWAlignments(fwd.score, ref_begin, fwd.ref_end, query_begin,
                        fwd.read_end)
