"""Device LCA (ops/lca.py) parity vs the host root-path walk."""

import numpy as np
import jax.numpy as jnp
import pytest

from kslam_tpu.db.taxonomy import TaxonomyDB
from kslam_tpu.ops import lca as lca_ops


@pytest.fixture(scope="module")
def taxdb():
    rng = np.random.default_rng(4)
    db = TaxonomyDB()
    db.parent_of[1] = 1
    db.rank_of[1] = "no rank"
    db.name_of[1] = "root"
    # two post-cut subtrees under taxids 2 and 3 (parents == 1 -> cut)
    next_id = 4
    for top in (2, 3):
        db.parent_of[top] = 1
        nodes = [top]
        for _ in range(40):
            parent = int(rng.choice(nodes))
            db.parent_of[next_id] = parent
            nodes.append(next_id)
            next_id += 1
    for t in db.parent_of:
        db.rank_of.setdefault(t, "no rank")
        db.name_of.setdefault(t, f"n{t}")
    return db


def test_pairwise_parity(taxdb):
    tables = lca_ops.build_device_tables(taxdb)
    known = sorted(taxdb.parent_of.keys())
    rng = np.random.default_rng(7)
    a = rng.choice(known, 300).astype(np.int32)
    b = rng.choice(known, 300).astype(np.int32)
    # sprinkle unknowns and zeros
    a[rng.random(300) < 0.1] = 999_999
    b[rng.random(300) < 0.1] = 0
    got = np.asarray(lca_ops.lca_pairwise(jnp.asarray(a), jnp.asarray(b),
                                          tables))
    for i in range(300):
        want = taxdb.lowest_common_ancestor([int(a[i]), int(b[i])])
        assert got[i] == want, (a[i], b[i], got[i], want)


def test_segment_parity(taxdb):
    tables = lca_ops.build_device_tables(taxdb)
    known = sorted(taxdb.parent_of.keys())
    rng = np.random.default_rng(11)
    m = 256
    seg_sizes = rng.integers(1, 9, 40)
    seg_id = np.repeat(np.arange(len(seg_sizes)), seg_sizes)[:m]
    m = len(seg_id)
    taxids = rng.choice(known, m).astype(np.int32)
    taxids[rng.random(m) < 0.05] = 777_777
    valid = rng.random(m) < 0.9
    got = np.asarray(lca_ops.lca_segments(
        jnp.asarray(taxids), jnp.asarray(seg_id.astype(np.int32)),
        jnp.asarray(valid), tables))
    for s in np.unique(seg_id):
        rows = np.nonzero((seg_id == s) & valid)[0]
        if len(rows) == 0:
            continue
        want = taxdb.lowest_common_ancestor([int(taxids[r]) for r in rows])
        assert got[rows[-1]] == want, (s, taxids[rows], want,
                                       got[rows[-1]])


def test_identity_and_zero(taxdb):
    tables = lca_ops.build_device_tables(taxdb)
    a = jnp.asarray(np.array([5, 5, 0], np.int32))
    b = jnp.asarray(np.array([5, 0, 0], np.int32))
    got = np.asarray(lca_ops.lca_pairwise(a, b, tables))
    assert got[0] == 5 and got[1] == 0 and got[2] == 0


def test_segment_reduce_parity(taxdb):
    tables = lca_ops.build_device_tables(taxdb)
    known = sorted(taxdb.parent_of.keys())
    rng = np.random.default_rng(23)
    m = 256
    seg_sizes = rng.integers(1, 9, 48)
    seg_id = np.repeat(np.arange(len(seg_sizes)), seg_sizes)[:m]
    m = len(seg_id)
    taxids = rng.choice(known, m).astype(np.int32)
    taxids[rng.random(m) < 0.05] = 777_777
    taxids[rng.random(m) < 0.05] = 0
    valid = rng.random(m) < 0.85
    got = np.asarray(lca_ops.lca_segments_reduce(
        jnp.asarray(taxids), jnp.asarray(seg_id.astype(np.int32)),
        jnp.asarray(valid), tables, num_segments=m))
    for s in np.unique(seg_id):
        rows = np.nonzero((seg_id == s) & valid)[0]
        want = taxdb.lowest_common_ancestor(
            [int(taxids[r]) for r in rows]) if len(rows) else 0
        assert got[s] == want, (s, taxids[rows], want, got[s])


def test_preorder_subtree_contiguity(taxdb):
    """Every node's subtree must be a contiguous preorder interval (the
    property the extreme-reduction relies on)."""
    tables = lca_ops.build_device_tables(taxdb)
    taxids, parent_idx, depth = taxdb.build_tables()
    pre = np.asarray(tables.preorder)
    v = len(taxids)
    # subtree membership via repeated parent hops
    anc = np.arange(v)
    members = [set([i]) for i in range(v)]
    cur = parent_idx.copy()
    for _ in range(int(depth.max()) + 1):
        for i in range(v):
            if cur[i] >= 0:
                members[cur[i]].add(i)
        cur = np.where(cur >= 0, parent_idx[np.clip(cur, 0, None)], -1)
    for i in range(v):
        nums = sorted(pre[list(members[i])])
        assert nums == list(range(nums[0], nums[0] + len(nums))), \
            f"subtree of node {i} not contiguous"
