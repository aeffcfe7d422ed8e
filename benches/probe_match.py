"""Match-stage internals: prefix join vs blocked, expansion, sort, dedup."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402


def measure(name, fn, scalar, N=20):
    import jax
    jax.device_get(scalar(fn()))
    t0 = time.perf_counter()
    for _ in range(N):
        r = fn()
    jax.device_get(scalar(r))
    print(f"{name}: {(time.perf_counter()-t0)/N*1e3:.2f} ms",
          file=sys.stderr)
    return r


def main():
    import jax
    import jax.numpy as jnp
    from kslam_tpu.db.genbank import GenbankEntry, GenbankIndex
    from kslam_tpu.db.kmer_index import KmerIndex
    from kslam_tpu.ops import kmers, join

    genomes, reads, lengths = bench.build_problem()
    gindex = GenbankIndex(
        [GenbankEntry(bases=g.tobytes().decode()) for g in genomes])
    kidx = KmerIndex.build(gindex)
    (km_d, eid_d, off_d, rc_d), d_pstart, p_bits, p_window = \
        kidx.device_arrays()[:4], *kidx.device_arrays()[4:]
    print(f"bits={p_bits} window={p_window} cap={km_d.shape[0]}",
          file=sys.stderr)

    d_reads = jnp.asarray(reads)
    d_lens = jnp.asarray(lengths)
    kmv, off, rc, valid = jax.jit(kmers.read_kmers_device)(d_reads, d_lens)
    q = kmv.reshape(-1)

    pf = jax.jit(lambda q: join.lookup_prefix_window(
        km_d, d_pstart, q, p_bits, p_window))
    measure("prefix join both", lambda: pf(q), lambda r: r[0][0])

    bl = jax.jit(lambda q: join.searchsorted_blocked_both(km_d, q))
    measure("blocked join both", lambda: bl(q), lambda r: r[0][0])

    # prefix-join pieces
    pstart_pairs = jnp.stack([d_pstart[:-1], d_pstart[1:]], axis=1)

    @jax.jit
    def pstart_gathers(q):
        p = (q >> np.uint64(64 - p_bits)).astype(jnp.int32)
        return d_pstart[p] + d_pstart[p + 1]

    measure("  pstart two gathers", lambda: pstart_gathers(q),
            lambda r: r[0])

    @jax.jit
    def pstart_paired(q):
        p = (q >> np.uint64(64 - p_bits)).astype(jnp.int32)
        se = pstart_pairs[p]
        return se[:, 0] + se[:, 1]

    measure("  pstart one row gather", lambda: pstart_paired(q),
            lambda r: r[0])

    rows2d = km_d.reshape(-1, p_window)

    @jax.jit
    def row_gathers(q):
        p = (q >> np.uint64(64 - p_bits)).astype(jnp.int32)
        start = d_pstart[p]
        r = start // p_window
        return rows2d[r][:, 0].astype(jnp.int32) + \
            rows2d[r + 1][:, 0].astype(jnp.int32)

    measure("  two row gathers [Q,8]", lambda: row_gathers(q),
            lambda r: r[0])

    # sort cost at capacity with real u64 keys (x64 on)
    rng = np.random.default_rng(0)
    k1 = jnp.asarray(rng.integers(0, 2**63, 1 << 18).astype(np.uint64))
    k2 = jnp.asarray(rng.integers(0, 2**63, 1 << 18).astype(np.uint64))
    f2 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2))
    measure("sort 262k 2xu64 keys", lambda: f2(k1, k2), lambda r: r[0][0])
    f1 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1))
    measure("sort 262k u64 + u64 passenger", lambda: f1(k1, k2),
            lambda r: r[0][0])
    i32 = jnp.arange(1 << 18, dtype=jnp.int32)
    f3 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1))
    measure("sort 262k u64 + i32 passenger", lambda: f3(k1, i32),
            lambda r: r[0][0])

    # expansion search: starts int32 [2.1M], p arange 262k
    counts = rng.integers(0, 3, q.shape[0]).astype(np.int32)
    starts = np.cumsum(counts, dtype=np.int32) - counts
    d_st = jnp.asarray(starts)
    p_arr = jnp.arange(1 << 18, dtype=jnp.int32)
    g = jax.jit(lambda a, x: join.searchsorted_blocked(
        a, x, side="right"))
    measure("expansion searchsorted", lambda: g(d_st, p_arr),
            lambda r: r[0])

    # scatter+cummax alternative
    @jax.jit
    def scatter_expand(starts, counts):
        qn = starts.shape[0]
        cap = 1 << 18
        qi = jnp.arange(qn, dtype=jnp.int32)
        tgt = jnp.where(counts > 0, jnp.minimum(starts, cap), cap)
        seed = jnp.full(cap + 1, -1, jnp.int32).at[tgt].max(
            qi, mode="drop")[:cap]
        return jax.lax.associative_scan(jnp.maximum, seed)

    d_counts = jnp.asarray(counts)
    got = measure("expansion scatter+cummax",
                  lambda: scatter_expand(d_st, d_counts), lambda r: r[0])
    want = np.asarray(g(d_st, p_arr)) - 1
    have = np.asarray(got)
    # compare where both valid (total may be < cap)
    total = int(counts.sum())
    n = min(total, 1 << 18)
    # scatter variant yields last qi with starts<=p AND count>0 -- compare
    # slots below total only
    bad = (have[:n] != want[:n])
    print(f"  scatter-expand mismatches below total: {bad.sum()}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
