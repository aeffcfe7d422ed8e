"""Blocked searchsorted (ops/join.py) parity vs numpy searchsorted."""

import numpy as np
import jax.numpy as jnp
import pytest

from kslam_tpu.ops import join


@pytest.mark.parametrize("m,q,block", [(16, 7, 128), (128, 1000, 128),
                                       (1000, 513, 64), (4096, 4096, 128)])
@pytest.mark.parametrize("side", ["left", "right"])
def test_parity_random_uint64(m, q, block, side):
    rng = np.random.default_rng(m * q)
    arr = np.sort(rng.integers(0, 50, m, dtype=np.uint64))  # many dups
    queries = rng.integers(0, 55, q, dtype=np.uint64)
    want = np.searchsorted(arr, queries, side=side)
    got = np.asarray(join.searchsorted_blocked(
        jnp.asarray(arr), jnp.asarray(queries), side=side, block=block, force=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("side", ["left", "right"])
def test_parity_int64_cumsum(side):
    rng = np.random.default_rng(0)
    counts = rng.integers(0, 5, 2064).astype(np.int64)
    starts = np.cumsum(counts) - counts        # the expansion-join shape
    p = np.arange(1024, dtype=np.int64)
    want = np.searchsorted(starts, p, side=side)
    got = np.asarray(join.searchsorted_blocked(
        jnp.asarray(starts), jnp.asarray(p), side=side, force=True))
    np.testing.assert_array_equal(got, want)


def test_sentinel_padded_index():
    # the real index layout: sorted values then uint64-max sentinels
    arr = np.concatenate([np.sort(np.arange(10, 50, dtype=np.uint64)),
                          np.full(24, np.uint64(2**64 - 1))])
    queries = np.array([9, 10, 30, 49, 50], dtype=np.uint64)
    for side in ("left", "right"):
        want = np.searchsorted(arr, queries, side=side)
        got = np.asarray(join.searchsorted_blocked(
            jnp.asarray(arr), jnp.asarray(queries), side=side, block=16, force=True))
        np.testing.assert_array_equal(got, want)


def test_2d_queries():
    arr = np.sort(np.random.default_rng(1).integers(
        0, 100, 256, dtype=np.uint64))
    q = np.random.default_rng(2).integers(0, 100, (8, 17), dtype=np.uint64)
    want = np.searchsorted(arr, q.reshape(-1)).reshape(q.shape)
    got = np.asarray(join.searchsorted_blocked(jnp.asarray(arr),
                                               jnp.asarray(q), force=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("side", ["left", "right"])
@pytest.mark.parametrize("block", [16, 64])
def test_two_level_big(side, block):
    # block=16 -> 4096 blocks engages the superblock hierarchy (S > 1024)
    rng = np.random.default_rng(3)
    arr = np.sort(rng.integers(0, 10_000, 65536, dtype=np.uint64))
    queries = rng.integers(0, 10_100, 5000, dtype=np.uint64)
    want = np.searchsorted(arr, queries, side=side)
    got = np.asarray(join.searchsorted_blocked(
        jnp.asarray(arr), jnp.asarray(queries), side=side, block=block,
        force=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("block", [16, 128])
def test_both_sides_duplicate_runs(block):
    # duplicate runs crossing block boundaries exercise the separate
    # b_hi row gather in searchsorted_blocked_both
    rng = np.random.default_rng(7)
    arr = np.sort(rng.integers(0, 40, 4096, dtype=np.uint64))  # runs ~100
    queries = rng.integers(0, 45, 3000, dtype=np.uint64)
    lo, hi = join.searchsorted_blocked_both(
        jnp.asarray(arr), jnp.asarray(queries), block=block, force=True)
    np.testing.assert_array_equal(np.asarray(lo),
                                  np.searchsorted(arr, queries, "left"))
    np.testing.assert_array_equal(np.asarray(hi),
                                  np.searchsorted(arr, queries, "right"))


@pytest.mark.parametrize("bits,window", [(8, 64), (10, 32), (12, 16)])
def test_prefix_window_lookup(bits, window):
    rng = np.random.default_rng(11)
    m = 3000
    # values concentrated in the top bits so prefixes collide (runs)
    arr = np.sort((rng.integers(0, 1 << bits, m, dtype=np.uint64)
                   << np.uint64(64 - bits))
                  | rng.integers(0, 4, m, dtype=np.uint64))
    # cap runs at the window by construction check
    tops = (arr >> np.uint64(64 - bits)).astype(np.int64)
    counts = np.bincount(tops, minlength=1 << bits)
    if counts.max() > window:
        pytest.skip("run exceeds window for this seed")
    pstart = np.zeros((1 << bits) + 1, np.int32)
    np.cumsum(counts, out=pstart[1:])
    npad = 2 * window + (-(m + 2 * window)) % window
    padded = np.concatenate([arr, np.full(npad, np.uint64(2**64 - 1))])
    queries = np.concatenate([
        rng.choice(arr, 500),                       # exact hits
        rng.integers(0, 2**63, 500, dtype=np.uint64)])  # misses
    lo, hi, unc = join.lookup_prefix_window(
        jnp.asarray(padded), jnp.asarray(pstart), jnp.asarray(queries),
        bits, window)
    assert int(np.asarray(unc).sum()) == 0
    np.testing.assert_array_equal(np.asarray(lo),
                                  np.searchsorted(arr, queries, "left"))
    np.testing.assert_array_equal(np.asarray(hi),
                                  np.searchsorted(arr, queries, "right"))


def test_kmer_index_prefix_table_and_device_arrays():
    from kslam_tpu.db.genbank import GenbankEntry, GenbankIndex
    from kslam_tpu.db.kmer_index import KmerIndex
    rng = np.random.default_rng(5)
    genomes = ["".join(rng.choice(list("ACGT"), 500)) for _ in range(3)]
    gindex = GenbankIndex([GenbankEntry(bases=g) for g in genomes])
    kidx = KmerIndex.build(gindex)
    pstart, bits, window = kidx.prefix_table()
    assert bits >= 8 and window >= 8
    # pstart is the exact insertion-point table
    tops = (kidx.kmers >> np.uint64(64 - bits)).astype(np.int64)
    for p in [0, 1, (1 << bits) // 2, (1 << bits) - 1]:
        assert pstart[p] == np.searchsorted(tops, p, side="left")
    assert pstart[-1] == len(kidx)
    km, eid, off, rc, d_pstart, bits2, window2 = kidx.device_arrays()
    assert bits2 == bits and window2 == window
    m = len(kidx)
    assert km.shape[0] >= m + 2 * window
    assert km.shape[0] % window == 0
    np.testing.assert_array_equal(np.asarray(km)[:m], kidx.kmers)
    assert (np.asarray(km)[m:] == np.uint64(2**64 - 1)).all()


def test_match_overlaps_prefix_path_equals_blocked():
    import jax
    from kslam_tpu.db.genbank import GenbankEntry, GenbankIndex
    from kslam_tpu.db.kmer_index import KmerIndex
    from kslam_tpu.ops import kmers as kmer_ops, match
    rng = np.random.default_rng(9)
    genomes = ["".join(rng.choice(list("ACGT"), 400)) for _ in range(4)]
    gindex = GenbankIndex([GenbankEntry(bases=g) for g in genomes])
    kidx = KmerIndex.build(gindex)
    km, eid, off, rc, pstart, bits, window = kidx.device_arrays()
    reads = np.zeros((8, 160), np.uint8)
    lengths = np.full(8, 150, np.int32)
    for i in range(8):
        g = genomes[i % 4]
        p = int(rng.integers(0, 250))
        r = g[p:p + 150]
        reads[i, :150] = np.frombuffer(r.encode(), np.uint8)
    rk, ro, rrc, rv = kmer_ops.read_kmers_device(
        jnp.asarray(reads), jnp.asarray(lengths))
    kwargs = dict(max_matches=8, capacity=1 << 10, chain_iters=8)
    a = match.match_overlaps(rk, ro, rrc, rv, jnp.asarray(lengths),
                             km, eid, off, rc, **kwargs)
    b = match.match_overlaps(rk, ro, rrc, rv, jnp.asarray(lengths),
                             km, eid, off, rc, idx_pstart=pstart,
                             prefix_bits=bits, window=window, **kwargs)
    assert int(a.count) == int(b.count) and int(a.count) > 0
    for fa, fb in zip(a[:5], b[:5]):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
    # the overlapping-rows join layout (build_prefix_rows) is exact too
    from kslam_tpu.ops import join
    rows2w, pstart2 = jax.jit(
        join.build_prefix_rows, static_argnames="window")(
            km, pstart, window=window)
    c = match.match_overlaps(rk, ro, rrc, rv, jnp.asarray(lengths),
                             km, eid, off, rc, idx_pstart=pstart,
                             prefix_bits=bits, window=window,
                             idx_rows=rows2w, idx_pstart2=pstart2,
                             **kwargs)
    assert int(a.count) == int(c.count)
    for fa, fc in zip(a[:5], c[:5]):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fc))


def test_lookup_prefix_rows_exact_bounds():
    """Randomized exactness of the rows join vs np.searchsorted,
    including duplicate runs and sentinel-region safety."""
    import jax
    from kslam_tpu.ops import join
    rng = np.random.default_rng(3)
    # small universe so prefixes collide and runs straddle row bounds
    kmers = np.sort(rng.integers(0, 1 << 12, 3000).astype(np.uint64)
                    << np.uint64(52))
    bits, window = 8, 32
    m = len(kmers)
    cap = 1 << (m + 2 * window - 1).bit_length()
    km = np.full(cap, np.uint64(2**64 - 1))
    km[:m] = kmers
    tops = (kmers >> np.uint64(64 - bits)).astype(np.int64)
    counts = np.bincount(tops, minlength=1 << bits)
    assert counts.max() <= window, "test setup: run exceeds window"
    pstart = np.zeros((1 << bits) + 1, np.int32)
    np.cumsum(counts, out=pstart[1:])
    rows2w, pstart2 = jax.jit(
        join.build_prefix_rows, static_argnames="window")(
            jnp.asarray(km), jnp.asarray(pstart), window=window)
    q = np.concatenate([
        rng.choice(kmers, 500),                       # present
        rng.integers(0, 1 << 12, 500).astype(np.uint64) << np.uint64(52),
    ])
    lo, hi, unc = jax.jit(join.lookup_prefix_rows,
                          static_argnames=("prefix_bits", "window"))(
        rows2w, pstart2, jnp.asarray(q), prefix_bits=bits, window=window)
    assert int(np.asarray(unc).sum()) == 0
    np.testing.assert_array_equal(np.asarray(lo),
                                  np.searchsorted(kmers, q, side="left"))
    np.testing.assert_array_equal(np.asarray(hi),
                                  np.searchsorted(kmers, q, side="right"))


def test_lookup_bucket_exact_bounds():
    """One-gather bucket join == np.searchsorted on random + skewed data,
    with escaped (heavy-run) buckets reported via `uncovered`."""
    import jax
    from kslam_tpu.ops import join
    rng = np.random.default_rng(11)
    km = np.sort(rng.integers(0, 2**63, 5000, dtype=np.uint64)
                 .astype(np.uint64))
    # inject a heavy run (same k-mer 300x) to force an escaped bucket
    km = np.sort(np.concatenate([km, np.full(300, km[100])]))
    from kslam_tpu.db.kmer_index import KmerIndex
    kidx = KmerIndex(km, np.zeros(len(km), np.int32),
                     np.zeros(len(km), np.int32), np.zeros(len(km), bool))
    tbl, bits = kidx.bucket_table()
    q = np.concatenate([rng.choice(km, 400),
                        rng.integers(0, 2**63, 400, dtype=np.uint64)
                        .astype(np.uint64), [km[100]]])
    lo, hi, unc = jax.jit(join.lookup_bucket, static_argnames="bits")(
        jnp.asarray(tbl), jnp.asarray(q), bits=bits)
    lo, hi, unc = np.asarray(lo), np.asarray(hi), np.asarray(unc)
    want_lo = np.searchsorted(km, q, "left")
    want_hi = np.searchsorted(km, q, "right")
    covered = unc == 0
    np.testing.assert_array_equal(lo[covered], want_lo[covered])
    np.testing.assert_array_equal(hi[covered], want_hi[covered])
    # the heavy-run query must be escaped with its run length reported
    assert unc[-1] >= 300
    assert covered.mean() > 0.8   # most queries stay on the fast path


def test_match_overlaps_bucket_path_equals_blocked():
    """Bucket join + in-program tier 2 == blocked search, on a genome
    with a repeat tract (escaped buckets exercised)."""
    from kslam_tpu.db.genbank import GenbankEntry, GenbankIndex
    from kslam_tpu.db.kmer_index import KmerIndex
    from kslam_tpu.ops import kmers as kmer_ops, match
    rng = np.random.default_rng(13)
    unit = "".join(rng.choice(list("ACGT"), 40))
    genomes = ["".join(rng.choice(list("ACGT"), 400)) + unit * 30
               for _ in range(4)]
    gindex = GenbankIndex([GenbankEntry(bases=g) for g in genomes])
    kidx = KmerIndex.build(gindex)
    km, eid, off, rc, pstart, bits, window = kidx.device_arrays()
    tbl, bbits = kidx.bucket_table()
    m = len(kidx)
    pk = np.zeros(km.shape[0], np.uint64)
    pk[:m] = ((kidx.entry_id.astype(np.uint64) << np.uint64(33)) |
              (kidx.offset.astype(np.uint64) << np.uint64(1)) |
              kidx.rc.astype(np.uint64))
    reads = np.zeros((8, 160), np.uint8)
    lengths = np.full(8, 150, np.int32)
    for i in range(8):
        g = genomes[i % 4]
        p = int(rng.integers(0, len(g) - 150))
        reads[i, :150] = np.frombuffer(g[p:p + 150].encode(), np.uint8)
    rk, ro, rrc, rv = kmer_ops.read_kmers_device(
        jnp.asarray(reads), jnp.asarray(lengths))
    # capacity//4 (the tier-2 expansion block) must hold the repeat
    # tract's matches here; an undersized run would simply count overflow
    # and retry in the pipeline
    kwargs = dict(max_matches=64, capacity=1 << 16, chain_iters=8)
    a = match.match_overlaps(rk, ro, rrc, rv, jnp.asarray(lengths),
                             km, eid, off, rc, **kwargs)
    b = match.match_overlaps(rk, ro, rrc, rv, jnp.asarray(lengths),
                             km, eid, off, rc,
                             idx_bucket=jnp.asarray(tbl),
                             bucket_bits=bbits, tier2_cap=1024,
                             idx_pack=jnp.asarray(pk), **kwargs)
    assert int(a.count) == int(b.count) and int(a.count) > 0
    assert int(a.overflow) == int(b.overflow)
    ka = np.flatnonzero(np.asarray(a.valid))
    kb = np.flatnonzero(np.asarray(b.valid))
    for fa, fb in zip(a[:4], b[:4]):
        np.testing.assert_array_equal(np.asarray(fa)[ka], np.asarray(fb)[kb])
