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

    def count_below(arr2d, v):
        if side == "left":
            return jnp.sum(arr2d < v[:, None], axis=1)
        return jnp.sum(arr2d <= v[:, None], axis=1)

    if s > 128:
        # two-level hierarchy: bucket by superblock lasts first, then by
        # the owning superblock's block lasts (a coarse row gather) --
        # turns the [Q, S] dense compare into [Q, S2] + [Q, sb]
        sb = -(-s // 128)                      # blocks per superblock
        spad = (-s) % sb
        last_p = jnp.concatenate(
            [last, jnp.full((spad,), fill, last.dtype)]) if spad else last
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
    b = jnp.minimum(b, s - 1).astype(jnp.int32)
    rows = blocks[b]                      # [Q, block] row gather
    within = count_below(rows, q)
    out = (b * block + within).astype(jnp.int32)
    return out.reshape(queries.shape)
