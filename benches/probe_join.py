"""Join-stage internals on chip: bucket vs row-gather vs counts."""

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


def main():
    import jax
    import jax.numpy as jnp
    from kslam_tpu.ops import join

    rng = np.random.default_rng(0)
    m = 1 << 16
    qn = 16384 * 119
    arr = np.sort(rng.integers(0, 2**63, m).astype(np.uint64))
    qs = rng.integers(0, 2**63, qn).astype(np.uint64)
    d_arr = jnp.asarray(arr)
    d_q = jnp.asarray(qs)

    for blk in (128, 256, 512):
        f = jax.jit(lambda a, q, b=blk: join.searchsorted_blocked(
            a, q, side="left", block=b, force=True))
        measure(f"searchsorted left block={blk}", lambda: f(d_arr, d_q),
                lambda r: r[0])

    # components at block=128
    block = 128
    s = m // block
    blocks2d = jnp.asarray(arr.reshape(s, block))
    last = blocks2d[:, block - 1]

    @jax.jit
    def bucket_only(q):
        sb = -(-s // 128)
        super_lasts = last.reshape(-1, sb)
        s2 = jnp.sum(super_lasts[:, sb - 1][None, :] < q[:, None], axis=1)
        s2 = jnp.minimum(s2, super_lasts.shape[0] - 1).astype(jnp.int32)
        within = jnp.sum(super_lasts[s2] < q[:, None], axis=1)
        return jnp.minimum(s2 * sb + within, s - 1).astype(jnp.int32)

    measure("  bucket stage", lambda: bucket_only(d_q), lambda r: r[0])
    b = bucket_only(d_q)

    @jax.jit
    def gather_only(b):
        return blocks2d[b]

    measure("  row gather [Q,128]", lambda: gather_only(b),
            lambda r: r[0, 0])
    rows = gather_only(b)

    @jax.jit
    def count_only(rows, q):
        return jnp.sum(rows < q[:, None], axis=1).astype(jnp.int32)

    measure("  within count", lambda: count_only(rows, d_q),
            lambda r: r[0])

    @jax.jit
    def count_both(rows, q):
        lt = jnp.sum(rows < q[:, None], axis=1).astype(jnp.int32)
        le = jnp.sum(rows <= q[:, None], axis=1).astype(jnp.int32)
        return lt, le

    measure("  within count both", lambda: count_both(rows, d_q),
            lambda r: r[0][0])

    # full both-sides fused (shared bucket, two gathers)
    @jax.jit
    def both(q):
        sb = -(-s // 128)
        super_lasts = last.reshape(-1, sb)
        qq = q[:, None]
        s2lo = jnp.sum(super_lasts[:, sb - 1][None, :] < qq, axis=1)
        s2hi = jnp.sum(super_lasts[:, sb - 1][None, :] <= qq, axis=1)
        s2lo = jnp.minimum(s2lo, super_lasts.shape[0] - 1).astype(jnp.int32)
        s2hi = jnp.minimum(s2hi, super_lasts.shape[0] - 1).astype(jnp.int32)
        blo = jnp.minimum(s2lo * sb + jnp.sum(super_lasts[s2lo] < qq, axis=1),
                          s - 1).astype(jnp.int32)
        bhi = jnp.minimum(s2hi * sb + jnp.sum(super_lasts[s2hi] <= qq,
                                              axis=1),
                          s - 1).astype(jnp.int32)
        lo = blo * block + jnp.sum(blocks2d[blo] < qq, axis=1)
        hi = bhi * block + jnp.sum(blocks2d[bhi] <= qq, axis=1)
        return lo.astype(jnp.int32), hi.astype(jnp.int32)

    measure("both fused", lambda: both(d_q), lambda r: r[0][0])

    # reference: two separate full calls
    f = jax.jit(lambda a, q: (
        join.searchsorted_blocked(a, q, side="left", force=True),
        join.searchsorted_blocked(a, q, side="right", force=True)))
    measure("two separate calls", lambda: f(d_arr, d_q), lambda r: r[0][0])

    # int32 starts-style search (the expansion step)
    starts = np.sort(rng.integers(0, 2**30, qn).astype(np.int64))
    p64 = np.arange(1 << 18, dtype=np.int64)
    d_st, d_p = jnp.asarray(starts), jnp.asarray(p64)
    g = jax.jit(lambda a, q: join.searchsorted_blocked(
        a, q, side="right", force=True))
    measure("expansion search int64[2M] x 262k q", lambda: g(d_st, d_p),
            lambda r: r[0])
    d_st32 = jnp.asarray(starts.astype(np.int32))
    d_p32 = jnp.asarray(p64.astype(np.int32))
    measure("expansion search int32", lambda: g(d_st32, d_p32),
            lambda r: r[0])


if __name__ == "__main__":
    main()
