"""Microbench lax.sort variants vs cumsum+scatter compaction on the chip."""

import sys
import time

import numpy as np


def t(fn, iters=10):
    import jax
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    for n in (1 << 16, 1 << 18):
        k64a = jnp.asarray(rng.integers(0, 2**63, n, np.uint64))
        k64b = jnp.asarray(rng.integers(0, 2**63, n, np.uint64))
        k32 = jnp.asarray(rng.integers(0, 2**31, n, np.int32))
        i32 = jnp.arange(n, dtype=jnp.int32)
        valid = jnp.asarray(rng.random(n) < 0.2)

        f1 = jax.jit(lambda a: jax.lax.sort((a,), num_keys=1))
        f2 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2))
        f3 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1))
        f4 = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=1))
        f5 = jax.jit(lambda a: jnp.sort(a))

        print(f"n={n}", file=sys.stderr)
        print(f"  u64 single key:        {t(lambda: f1(k64a)):.2f} ms",
              file=sys.stderr)
        print(f"  u64,u64 2 keys:        {t(lambda: f2(k64a, k64b)):.2f} ms",
              file=sys.stderr)
        print(f"  u64 key + i32 pass:    {t(lambda: f3(k64a, i32)):.2f} ms",
              file=sys.stderr)
        print(f"  u64 key + 2 pass:      "
              f"{t(lambda: f4(k64a, i32, k32)):.2f} ms", file=sys.stderr)
        print(f"  i32 single key:        {t(lambda: f5(k32)):.2f} ms",
              file=sys.stderr)

        # compaction alternatives: sort-based vs cumsum+scatter
        m = n // 8

        @jax.jit
        def compact_sort(valid, a, b, c):
            p = a.shape[0]
            key = (jnp.where(valid, np.uint64(0), np.uint64(1))
                   << np.uint64(63)) | jnp.arange(p, dtype=jnp.uint64)
            _, perm = jax.lax.sort((key, jnp.arange(p, dtype=jnp.int32)),
                                   num_keys=1)
            sel = perm[:m]
            return a[sel], b[sel], c[sel]

        @jax.jit
        def compact_scatter(valid, a, b, c):
            dest = jnp.cumsum(valid.astype(jnp.int32)) - 1
            dest = jnp.where(valid, dest, m)  # park invalid in overflow row
            dest = jnp.minimum(dest, m)
            out = []
            for arr in (a, b, c):
                buf = jnp.zeros(m + 1, arr.dtype)
                out.append(buf.at[dest].set(arr, mode="drop")[:m])
            return tuple(out)

        print(f"  compact via sort:      "
              f"{t(lambda: compact_sort(valid, k64a, k32, i32)):.2f} ms",
              file=sys.stderr)
        print(f"  compact via scatter:   "
              f"{t(lambda: compact_scatter(valid, k64a, k32, i32)):.2f} ms",
              file=sys.stderr)

        # gather cost (for perm-apply comparisons)
        perm = jnp.asarray(rng.permutation(n).astype(np.int32))
        g = jax.jit(lambda a, p: a[p])
        print(f"  gather u64 full perm:  {t(lambda: g(k64a, perm)):.2f} ms",
              file=sys.stderr)

        # segmented ops for comparison
        seg = jnp.asarray(np.sort(rng.integers(0, n // 4, n)).astype(
            np.int32))
        f6 = jax.jit(lambda v, s: jax.ops.segment_max(
            v, s, num_segments=n // 4))
        print(f"  segment_max:           {t(lambda: f6(k32, seg)):.2f} ms",
              file=sys.stderr)
        f7 = jax.jit(lambda v: jnp.cumsum(v))
        print(f"  cumsum i32:            {t(lambda: f7(k32)):.2f} ms",
              file=sys.stderr)
        f8 = jax.jit(lambda v: jax.lax.associative_scan(jnp.maximum, v))
        print(f"  assoc scan max:        {t(lambda: f8(k32)):.2f} ms",
              file=sys.stderr)


if __name__ == "__main__":
    main()
