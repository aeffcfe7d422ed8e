"""Gather/sort microbenchmarks driving the phase-A join redesign.

profile_stages.py shows the prefix-rows join (2 row gathers per query,
ops/join.lookup_prefix_rows) at ~191 ms of the ~320 ms phase-A batch --
60% of the whole alignment stage.  This probe measures the primitive
costs on the real chip so the redesign can be arithmetic, not vibes:

  * element/row gathers by row width, table size, and index sortedness
    (is the gather issue-bound at ~45 ns/row regardless of width?),
  * lax.sort by operand count and size (is sorting 2.1M queries viable?),
  * the expansion's searchsorted(starts, iota) step,
  * a one-gather bucket-table join simulation ([2^bits, W] payload rows).

Measurement rules (benches/NOTES.md): DB columns as jit ARGUMENTS, in-jit
scalar checksums, K distinct inputs per timed stage, one device_get of K
scalars to force.  Arrays are freed between sections (the first run died
RESOURCE_EXHAUSTED with every table resident at once).

Usage: python benches/probe_gather.py  (builds/loads the bench DB cache)
"""

import functools
import gc
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402

K_DISPATCH = 8
Q = 16384 * 129          # queries per device batch in the headline bench
CAP = 1 << 19            # expansion capacity


def main():
    import jax
    import jax.numpy as jnp

    gindex, kidx = bench.build_or_load_db()
    M = len(kidx.kmers)
    print(f"index: {M / 1e6:.1f}M k-mers; Q={Q}", file=sys.stderr)

    rng = np.random.default_rng(0)
    idx_sets = [jnp.asarray(rng.integers(0, M - 64, Q).astype(np.int32))
                for _ in range(K_DISPATCH)]
    q_sets = [jnp.asarray(rng.integers(0, 2**63, Q, dtype=np.uint64)
                          .astype(np.uint64))
              for _ in range(K_DISPATCH)]

    def measure(name, fn, args_list):
        outs0 = fn(*args_list[0])
        jax.device_get(outs0)
        t0 = time.perf_counter()
        outs = [fn(*a) for a in args_list]
        jax.device_get(outs)
        dt = (time.perf_counter() - t0) / len(args_list)
        print(f"{name}: {dt * 1e3:.1f} ms", file=sys.stderr, flush=True)
        return dt

    # --- section 1: gathers from the big index ---
    def sec_gathers():
        arr = jnp.asarray(kidx.kmers)          # [M] u64 sorted

        @jax.jit
        def g_elem(a, i):
            return a[i].sum()

        measure("elem gather u64 [Q] of 1e8", g_elem,
                [(arr, i) for i in idx_sets])

        rows16 = arr[:(M // 16) * 16].reshape(-1, 16)

        @jax.jit
        def g_row16(a, i):
            return a[i >> 4].sum()

        measure("row gather [Q,16] u64", g_row16,
                [(rows16, i) for i in idx_sets])
        del rows16
        gc.collect()
        rows32 = arr[:(M // 32) * 32].reshape(-1, 32)

        @jax.jit
        def g_row32(a, i):
            return a[i >> 5].sum()

        measure("row gather [Q,32] u64", g_row32,
                [(rows32, i) for i in idx_sets])

        @jax.jit
        def g_row32_sorted(a, i):
            si = jax.lax.sort(i)
            return a[si >> 5].sum()

        measure("row gather [Q,32] sorted idx (incl sort)", g_row32_sorted,
                [(rows32, i) for i in idx_sets])
        del rows32, arr
        gc.collect()

    sec_gathers()

    # --- section 2: small tables ---
    def sec_small():
        small = jnp.asarray(rng.integers(0, 2**62, 1 << 20,
                                         dtype=np.uint64))

        @jax.jit
        def g_elem(a, i):
            return a[i & ((1 << 20) - 1)].sum()

        measure("elem gather u64 [Q] of 2^20", g_elem,
                [(small, i) for i in idx_sets])
        del small
        gc.collect()
        tbl2 = jnp.asarray(rng.integers(0, 2**31, (1 << 26, 2),
                                        dtype=np.int64).astype(np.int32))

        @jax.jit
        def g_pair(a, i):
            return a[i & ((1 << 26) - 1)].sum()

        measure("row gather [Q,2] i32 of [2^26,2]", g_pair,
                [(tbl2, i) for i in idx_sets])
        del tbl2
        gc.collect()
        bt = jnp.asarray(rng.integers(0, 2**62, (1 << 24, 6),
                                      dtype=np.uint64).astype(np.uint64))

        @jax.jit
        def g_bucket(a, q):
            p = (q >> np.uint64(64 - 24)).astype(jnp.int32)
            r = a[p]                       # [Q, 6]
            eq = jnp.sum((r == q[:, None]), axis=1)
            return eq.sum()

        measure("bucket join [Q,6] u64 of [2^24,6]", g_bucket,
                [(bt, q) for q in q_sets])
        del bt
        gc.collect()

    sec_small()

    # --- section 3: sorts ---
    def sec_sorts():
        @jax.jit
        def s1(q):
            return jax.lax.sort(q)[0].astype(jnp.uint32).sum()

        measure("lax.sort u64 [Q]", s1, [(q,) for q in q_sets])

        @jax.jit
        def s2(q):
            a, b = jax.lax.sort((q, q), num_keys=1)
            return b.astype(jnp.uint32).sum()

        measure("lax.sort (u64,u64) [Q] 1key", s2, [(q,) for q in q_sets])

        cap_sets = [jnp.asarray(rng.integers(0, 2**62, CAP,
                                             dtype=np.uint64))
                    for _ in range(K_DISPATCH)]

        @jax.jit
        def s2k(q):
            a, b = jax.lax.sort((q, q), num_keys=2)
            return b.astype(jnp.uint32).sum()

        measure(f"lax.sort (u64,u64) [{CAP}] 2key", s2k,
                [(q,) for q in cap_sets])
        del cap_sets
        gc.collect()

    sec_sorts()

    # --- section 4: expansion searchsorted ---
    def sec_expansion():
        from kslam_tpu.ops import join

        @jax.jit
        def exp_ss(counts):
            starts = jnp.cumsum(counts.astype(jnp.int64)) - counts
            starts = jnp.minimum(starts, CAP).astype(jnp.int32)
            p = jnp.arange(CAP, dtype=jnp.int32)
            qi = join.searchsorted_blocked(starts, p, side="right") - 1
            return qi.sum()

        cnt_sets = [jnp.asarray((rng.random(Q) < 0.01).astype(np.int32))
                    for _ in range(K_DISPATCH)]
        measure("expansion searchsorted [CAP] in starts[Q]", exp_ss,
                [(c,) for c in cnt_sets])
        del cnt_sets
        gc.collect()

    sec_expansion()

    # --- section 5: current join for reference ---
    def sec_current():
        from kslam_tpu.ops import join
        km, eid, off, rc, pstart, bits, window = kidx.device_arrays()
        del eid, off, rc

        @functools.partial(jax.jit, static_argnames=("pb", "pw"))
        def cur(irows, ip2, q, pb, pw):
            lo, hi, _ = join.lookup_prefix_rows(irows, ip2, q, pb, pw)
            return jnp.sum(hi - lo)

        kmer_rows, pstart2 = jax.jit(
            join.build_prefix_rows, static_argnames="window")(
                km, pstart, window=window)
        del km, pstart
        gc.collect()
        measure("current lookup_prefix_rows", cur,
                [(kmer_rows, pstart2, q, bits, window) for q in q_sets])

    sec_current()


if __name__ == "__main__":
    main()
