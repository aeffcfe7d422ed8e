"""Validation probe for the one-gather bucket join design (phase A).

probe_gather.py established the cost model on the v5e:
  * random row gathers cost ~[24 ms + ~? per 64B chunk] per 2.1M queries
    regardless of table size; u64 gathers pay 2x (x64 = two i32 planes),
  * lax.sort of 2.1M rows is ~9-14 ms (cheap),
  * the current 2-gather prefix-rows join costs ~191 ms.

Proposed design (ops/join.bucket_*): [2^25, 16] int32 rows packing
(start, count, hi-bit words, 8 x suffix-lo32) so the whole join for runs
<= 8 is ONE [Q, 16] i32 row gather + vector unpack/compare; prefixes
with longer runs are flagged, their queries compacted by one sort, and
joined exactly by the blocked search at a tiny static cap (tier 2).

This probe measures each piece at production shapes BEFORE the
implementation: the [Q,16] i32 gather, the full tier-1 prototype with
unpacking, the 3-operand compaction sort, and the tier-2 blocked search
at 65536 queries.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402

K_DISPATCH = 8
Q = 16384 * 129
BITS = 25
CAPB = 8            # bucket capacity (suffix slots per row)
T2 = 65536          # tier-2 compacted query cap


def main():
    import jax
    import jax.numpy as jnp

    gindex, kidx = bench.build_or_load_db()
    M = len(kidx.kmers)
    print(f"index: {M / 1e6:.1f}M; Q={Q}; bits={BITS}", file=sys.stderr)

    rng = np.random.default_rng(0)
    q_sets = [jnp.asarray(rng.integers(0, 2**63, Q, dtype=np.uint64)
                          .astype(np.uint64)) for _ in range(K_DISPATCH)]

    def measure(name, fn, args_list):
        jax.device_get(fn(*args_list[0]))
        t0 = time.perf_counter()
        outs = [fn(*a) for a in args_list]
        jax.device_get(outs)
        dt = (time.perf_counter() - t0) / len(args_list)
        print(f"{name}: {dt * 1e3:.1f} ms", file=sys.stderr, flush=True)
        return dt

    # --- build the real bucket table on host (numpy, one-time) ---
    t0 = time.perf_counter()
    km = kidx.kmers
    tops = (km >> np.uint64(64 - BITS)).astype(np.int64)
    counts = np.bincount(tops, minlength=1 << BITS)
    pstart = np.zeros((1 << BITS) + 1, np.int64)
    np.cumsum(counts, out=pstart[1:])
    nb = 1 << BITS
    tbl = np.zeros((nb, 16), np.int32)
    tbl[:, 0] = pstart[:-1].astype(np.int32)
    tbl[:, 1] = counts.astype(np.int32)
    # suffix = low (64-BITS) bits; lo32 into slots 8..15, hi bits packed
    # into slots 2..3 (CAPB x (64-BITS-32) = 8x7 = 56 bits)
    suf = km & np.uint64((1 << (64 - BITS)) - 1)
    lo32 = (suf & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (suf >> np.uint64(32)).astype(np.uint32)        # 7 bits
    slot = np.arange(M, dtype=np.int64) - pstart[tops]
    ok = slot < CAPB
    rows = tops[ok]
    s = slot[ok]
    tbl[rows, 8 + s] = lo32[ok].astype(np.int32)
    hw = np.zeros((nb, 2), np.uint32)
    four = s < 4
    np.bitwise_or.at(hw[:, 0], rows[four],
                     hi[ok][four] << (8 * s[four]).astype(np.uint32))
    np.bitwise_or.at(hw[:, 1], rows[~four],
                     hi[ok][~four] << (8 * (s[~four] - 4)).astype(np.uint32))
    tbl[:, 2] = hw[:, 0].astype(np.int32)
    tbl[:, 3] = hw[:, 1].astype(np.int32)
    print(f"host bucket build: {time.perf_counter() - t0:.1f}s; "
          f"hot prefixes (run>{CAPB}): {(counts > CAPB).sum()} "
          f"({(counts > CAPB).sum() / nb * 100:.3f}%), "
          f"hot k-mer mass: "
          f"{counts[counts > CAPB].sum() / M * 100:.3f}%",
          file=sys.stderr)
    d_tbl = jnp.asarray(tbl)

    # --- tier-1 prototype: one gather + unpack + compare ---
    @jax.jit
    def tier1(tbl, q):
        p = (q >> np.uint64(64 - BITS)).astype(jnp.int32)
        r = tbl[p]                                   # [Q, 16] i32
        start, count = r[:, 0], r[:, 1]
        qsuf = q & np.uint64((1 << (64 - BITS)) - 1)
        qlo = (qsuf & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        qhi = (qsuf >> np.uint64(32)).astype(jnp.uint32)
        h0 = r[:, 2].astype(jnp.uint32)
        h1 = r[:, 3].astype(jnp.uint32)
        lt = jnp.zeros_like(count)
        eq = jnp.zeros_like(count)
        for sslot in range(CAPB):
            lo32 = r[:, 8 + sslot].astype(jnp.uint32)
            hw = jnp.where(sslot < 4, h0 >> np.uint32(8 * (sslot % 4)),
                           h1 >> np.uint32(8 * (sslot % 4)))
            hv = hw & np.uint32(0x7F)
            in_run = sslot < count
            slot_lt = (hv < qhi) | ((hv == qhi) & (lo32 < qlo))
            slot_eq = (hv == qhi) & (lo32 == qlo)
            lt = lt + (slot_lt & in_run).astype(jnp.int32)
            eq = eq + (slot_eq & in_run).astype(jnp.int32)
        flagged = count > CAPB
        lo = start + lt
        return (jnp.sum(lo * 1 + eq) +
                jnp.sum(flagged.astype(jnp.int32)))

    measure("tier1 bucket join (gather+unpack)", tier1,
            [(d_tbl, q) for q in q_sets])

    # --- compaction sort: (flagkey, q, payload) 3 ops ---
    @jax.jit
    def s3(q):
        flag = (q & np.uint64(255)) == 0        # ~0.4% flagged
        key = jnp.where(flag, q, q | np.uint64(1 << 63))
        a, b, c = jax.lax.sort((key, q, q), num_keys=1)
        return c.astype(jnp.uint32).sum()

    measure("compaction sort 3xu64 [Q]", s3, [(q,) for q in q_sets])

    # --- tier 2: blocked search at T2 queries vs full index ---
    from kslam_tpu.ops import join
    arr = jnp.asarray(km)
    t2_sets = [jnp.asarray(rng.integers(0, 2**63, T2, dtype=np.uint64)
                           .astype(np.uint64)) for _ in range(K_DISPATCH)]

    @jax.jit
    def tier2(a, q):
        lo, hi = join.searchsorted_blocked_both(a, q, force=True)
        return jnp.sum(hi - lo)

    measure(f"tier2 blocked search [{T2}] vs 1e8", tier2,
            [(arr, q) for q in t2_sets])


if __name__ == "__main__":
    main()
