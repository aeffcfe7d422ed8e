"""Vectorized LCA over the NCBI taxonomy (device).

Replaces the reference's per-read pointer-chasing root-path walk
(TaxonomyDatabase.h:185-223) with binary lifting over dense int32 tables:
up[j][v] is the 2^j-th ancestor (roots lift to themselves after the
reference's parent==1 root cut).

Set semantics mirrored exactly (see db/taxonomy.lowest_common_ancestor):
  * taxid 0 anywhere -> 0 (its root path is empty),
  * two equal taxids agree even when absent from the taxonomy,
  * an unknown taxid against any different taxid -> 0 (its single-node
    path shares nothing),
  * nodes under different post-cut roots -> 0.

The segment reduction folds a pairwise LCA (associative, commutative,
0-absorbing) with log-stride doubling, so a batch of per-read hit groups
resolves in O(log M) passes with no host loops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

NONE = np.int32(-1)


class LcaTables(NamedTuple):
    taxids: jnp.ndarray   # int32 [V] sorted
    up: jnp.ndarray       # int32 [J, V] 2^j-th ancestors (self at roots)
    depth: jnp.ndarray    # int32 [V]
    preorder: jnp.ndarray  # int32 [V] global DFS preorder number


def build_device_tables(taxdb) -> LcaTables:
    """Dense lifting tables + DFS preorder from a TaxonomyDB (host
    precompute).  The preorder numbering enables the min/max-extreme trick:
    the LCA of a node set equals the LCA of its two preorder extremes."""
    taxids, parent_idx, depth = taxdb.build_tables()
    v = len(taxids)
    if v == 0:
        z = jnp.zeros(0, jnp.int32)
        return LcaTables(z, jnp.zeros((1, 0), jnp.int32), z, z)
    max_depth = int(depth.max())
    j_levels = max(1, int(np.ceil(np.log2(max_depth + 1))) + 1)
    up = np.zeros((j_levels, v), np.int32)
    self_idx = np.arange(v, dtype=np.int32)
    up[0] = np.where(parent_idx < 0, self_idx, parent_idx)
    for j in range(1, j_levels):
        up[j] = up[j - 1][up[j - 1]]
    # preorder: sort nodes by their root path (lexicographic ancestor
    # chain).  Equivalent to DFS order and vectorizable: iteratively build
    # a sort key from the ancestor at each depth level (top-down).
    order = np.lexsort(tuple(
        _ancestor_at_depth(up, depth, d) for d in range(max_depth, -1, -1)))
    preorder = np.empty(v, np.int32)
    preorder[order] = np.arange(v, dtype=np.int32)
    return LcaTables(jnp.asarray(taxids.astype(np.int32)), jnp.asarray(up),
                     jnp.asarray(depth), jnp.asarray(preorder))


def _ancestor_at_depth(up: np.ndarray, depth: np.ndarray,
                       d: int) -> np.ndarray:
    """Host: ancestor of every node at depth d (self when depth < d --
    harmless for the lexsort: shallower nodes sort before their
    descendants by the shallower key columns)."""
    v = up.shape[1]
    node = np.arange(v, dtype=np.int32)
    delta = np.maximum(depth - d, 0)
    for j in range(up.shape[0] - 1, -1, -1):
        take = (delta & (1 << j)) != 0
        node = np.where(take, up[j][node], node)
    return node


def node_of_taxid(taxid, tables: LcaTables):
    """taxid int32 [M] -> dense node index, NONE when unknown."""
    v = tables.taxids.shape[0]
    if v == 0:
        return jnp.full(taxid.shape, NONE, jnp.int32)
    i = jnp.clip(jnp.searchsorted(tables.taxids, taxid), 0, v - 1) \
        .astype(jnp.int32)
    return jnp.where(tables.taxids[i] == taxid, i, NONE)


def _lift_to_depth(node, target_depth, tables: LcaTables):
    d = tables.depth[jnp.clip(node, 0, None)]
    delta = jnp.maximum(d - target_depth, 0)
    for j in range(tables.up.shape[0] - 1, -1, -1):
        take = (delta & np.int32(1 << j)) != 0
        node = jnp.where(take, tables.up[j][jnp.clip(node, 0, None)], node)
    return node


def _lca_nodes(a, b, tables: LcaTables):
    """Pairwise LCA of dense node indices (both must be >= 0); NONE when
    the nodes live under different post-cut roots."""
    da = tables.depth[jnp.clip(a, 0, None)]
    db = tables.depth[jnp.clip(b, 0, None)]
    target = jnp.minimum(da, db)
    a2 = _lift_to_depth(a, target, tables)
    b2 = _lift_to_depth(b, target, tables)
    equal_now = a2 == b2
    x, y = a2, b2
    for j in range(tables.up.shape[0] - 1, -1, -1):
        ux = tables.up[j][jnp.clip(x, 0, None)]
        uy = tables.up[j][jnp.clip(y, 0, None)]
        step = ux != uy
        x = jnp.where(step, ux, x)
        y = jnp.where(step, uy, y)
    parent = tables.up[0][jnp.clip(x, 0, None)]
    same_root = parent == tables.up[0][jnp.clip(y, 0, None)]
    cand = jnp.where(same_root & (x != y), parent, NONE)
    return jnp.where(equal_now, a2, cand)


def _combine(tax_a, node_a, tax_b, node_b, tables: LcaTables):
    """Pairwise set-LCA fold step.  tax==NONE marks the fold identity;
    tax==0 is absorbing (the reference's empty root path)."""
    # identity handling
    out_tax = jnp.where(tax_a == NONE, tax_b,
                        jnp.where(tax_b == NONE, tax_a, np.int32(0)))
    out_node = jnp.where(tax_a == NONE, node_b,
                         jnp.where(tax_b == NONE, node_a, NONE))
    both = (tax_a != NONE) & (tax_b != NONE)
    equal = both & (tax_a == tax_b)
    out_tax = jnp.where(equal, tax_a, out_tax)
    out_node = jnp.where(equal, node_a, out_node)
    zero = both & ~equal & ((tax_a == 0) | (tax_b == 0) |
                            (node_a == NONE) | (node_b == NONE))
    if tables.taxids.shape[0] == 0:
        # empty taxonomy (e.g. --just-align): every node is unknown, the
        # zero rule covers all non-equal combinations
        return out_tax, out_node
    need_tree = both & ~equal & ~zero
    n = _lca_nodes(jnp.where(need_tree, node_a, 0),
                   jnp.where(need_tree, node_b, 0), tables)
    tree_tax = jnp.where(n == NONE, 0,
                         tables.taxids[jnp.clip(n, 0, None)])
    out_tax = jnp.where(need_tree, tree_tax, out_tax)
    out_node = jnp.where(need_tree, n, out_node)
    return out_tax, out_node


def lca_pairwise(tax_a, tax_b, tables: LcaTables):
    """Vectorized LCA of two taxid arrays (0/unknown semantics above)."""
    return _combine(tax_a, node_of_taxid(tax_a, tables),
                    tax_b, node_of_taxid(tax_b, tables), tables)[0]


def lca_segments(taxids, seg_id, valid, tables: LcaTables):
    """Per-element running LCA of its segment prefix; the LAST valid
    element of each segment holds the segment's full LCA.

    taxids int32 [M]; seg_id int32 [M] (nondecreasing); valid bool [M].
    Returns int32 [M].
    """
    m = taxids.shape[0]
    tax = jnp.where(valid, taxids, NONE)
    node = node_of_taxid(tax, tables)
    seg = seg_id
    shift = 1
    while shift < m:
        p_tax = jnp.roll(tax, shift).at[:shift].set(NONE)
        p_node = jnp.roll(node, shift).at[:shift].set(NONE)
        p_seg = jnp.roll(seg_id, shift).at[:shift].set(-1)
        same = p_seg == seg
        ca, cb = _combine(jnp.where(same, p_tax, NONE),
                          jnp.where(same, p_node, NONE), tax, node, tables)
        tax, node = ca, cb
        shift *= 2
    return jnp.where(valid, tax, 0)


def lca_segments_reduce(taxids, seg_id, valid, tables: LcaTables,
                        num_segments: int):
    """Per-segment set-LCA via the preorder-extreme reduction: the LCA of
    a node set equals the LCA of its minimum- and maximum-preorder
    members (subtrees are contiguous intervals in the numbering).  Two
    native segment reductions + ONE pairwise tree-LCA, versus the
    O(log P) lifting passes of lca_segments -- use this on TPU.

    Returns int32 [num_segments] per-segment LCAs (0 for segments with no
    valid rows, matching the empty-set contract)."""
    tax = jnp.where(valid, taxids, NONE)
    node = node_of_taxid(tax, tables)
    known = valid & (tax != 0) & (node != NONE)
    is_zero = valid & (tax == 0)
    is_unknown = valid & (tax != 0) & (node == NONE)

    seg_any_zero = jax.ops.segment_max(
        is_zero.astype(jnp.int32), seg_id, num_segments=num_segments) > 0
    seg_any_unknown = jax.ops.segment_max(
        is_unknown.astype(jnp.int32), seg_id,
        num_segments=num_segments) > 0
    big = np.int32(2**31 - 1)
    tmax = jax.ops.segment_max(jnp.where(valid, tax, -1), seg_id,
                               num_segments=num_segments)
    tmin = jax.ops.segment_min(jnp.where(valid, tax, big), seg_id,
                               num_segments=num_segments)
    any_valid = jax.ops.segment_max(valid.astype(jnp.int32), seg_id,
                                    num_segments=num_segments) > 0
    all_same = any_valid & (tmax == tmin)

    if tables.taxids.shape[0] == 0:
        return jnp.where(all_same, tmax, 0)

    pre = tables.preorder[jnp.clip(node, 0, None)]
    code = (pre.astype(jnp.int64) << 32) | node.astype(jnp.int64)
    cmin = jax.ops.segment_min(
        jnp.where(known, code, np.int64(2**62)), seg_id,
        num_segments=num_segments)
    cmax = jax.ops.segment_max(jnp.where(known, code, np.int64(-1)),
                               seg_id, num_segments=num_segments)
    node_min = (cmin & np.int64(0xFFFFFFFF)).astype(jnp.int32)
    node_max = (cmax & np.int64(0xFFFFFFFF)).astype(jnp.int32)
    has_known = cmax >= 0
    n = _lca_nodes(jnp.where(has_known, node_min, 0),
                   jnp.where(has_known, node_max, 0), tables)
    tree_tax = jnp.where(n == NONE, 0,
                         tables.taxids[jnp.clip(n, 0, None)])
    out = jnp.where(all_same, tmax,
                    jnp.where(seg_any_zero | seg_any_unknown, 0, tree_tax))
    return jnp.where(any_valid, out, 0)
