"""More join alternatives: real sort costs, u32-split compares, merge-join."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


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

    rng = np.random.default_rng(0)
    m = 1 << 16
    qn = 16384 * 119          # 1.95M
    arr = np.sort(rng.integers(0, 2**63, m).astype(np.uint64))
    qs = rng.integers(0, 2**63, qn).astype(np.uint64)
    d_arr = jnp.asarray(arr)
    d_q = jnp.asarray(qs)

    # true sort costs
    for n, name in ((qn + m, "2.01M"), (1 << 18, "262k")):
        x = jnp.asarray(rng.integers(0, 2**63, n).astype(np.uint64))
        pas = jnp.arange(n, dtype=jnp.int32) if True else None
        f = jax.jit(lambda a, p: jax.lax.sort((a, p), num_keys=1))
        measure(f"lax.sort {name} u64+i32", lambda: f(x, pas),
                lambda r: r[0][0])
        f2 = jax.jit(lambda a: jax.lax.sort((a,), num_keys=1)[0])
        measure(f"lax.sort {name} u64 only", lambda: f2(x),
                lambda r: r[0])
        x32 = jnp.asarray(rng.integers(0, 2**31, n).astype(np.uint32))
        f3 = jax.jit(lambda a, p: jax.lax.sort((a, p), num_keys=1))
        measure(f"lax.sort {name} u32+i32", lambda: f3(x32, pas),
                lambda r: r[0][0])

    # u32-split within-count (rows pre-gathered)
    block = 128
    s = m // block
    blocks2d = jnp.asarray(arr.reshape(s, block))
    b = jnp.asarray(rng.integers(0, s, qn).astype(np.int32))

    @jax.jit
    def gather_and_count_u64(b, q):
        rows = blocks2d[b]
        return jnp.sum(rows < q[:, None], axis=1).astype(jnp.int32)

    measure("gather+count u64", lambda: gather_and_count_u64(b, d_q),
            lambda r: r[0])

    hi32 = jnp.asarray((arr >> np.uint64(32)).astype(np.uint32)
                       .reshape(s, block))
    lo32 = jnp.asarray((arr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
                       .reshape(s, block))
    qhi = (d_q >> np.uint64(32)).astype(jnp.uint32)
    qlo = (d_q & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)

    @jax.jit
    def gather_and_count_u32(b, qhi, qlo):
        rh = hi32[b]
        rl = lo32[b]
        lt = (rh < qhi[:, None]) | ((rh == qhi[:, None]) &
                                    (rl < qlo[:, None]))
        return jnp.sum(lt, axis=1).astype(jnp.int32)

    measure("gather+count u32 split", lambda: gather_and_count_u32(
        b, qhi, qlo), lambda r: r[0])

    # merge-join: one sort of [arr kmers + query kmers] for lo
    tag_arr = jnp.zeros(m, jnp.int32)

    @jax.jit
    def merge_lo(q):
        vals = jnp.concatenate([d_arr, q])
        tags = jnp.concatenate([tag_arr, jnp.ones(qn, jnp.int32)])
        ids = jnp.concatenate([jnp.full(m, qn, jnp.int32),
                               jnp.arange(qn, dtype=jnp.int32)])
        # key: (value, tag) -- arr elements first on ties = left bound
        sv, st, si = jax.lax.sort((vals, tags, ids), num_keys=2)
        pos = jnp.arange(m + qn, dtype=jnp.int32)
        qrank = jnp.cumsum(st) - st            # queries before this slot
        lo_sorted = pos - qrank                # arr elems before this slot
        lo = jnp.zeros(qn, jnp.int32).at[si].set(
            jnp.where(st == 1, lo_sorted, 0), mode="drop",
            unique_indices=False)
        return lo

    got = measure("merge-join lo (sort+scans+scatter)",
                  lambda: merge_lo(d_q), lambda r: r[0])
    want = np.searchsorted(arr, qs, side="left")
    assert np.array_equal(np.asarray(got), want), "merge-join wrong"
    print("merge-join lo exact: OK", file=sys.stderr)


if __name__ == "__main__":
    main()
