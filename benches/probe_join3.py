"""Dense single-level bucket stage + fully fused both-sides join."""

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
    qn = 16384 * 119
    arr = np.sort(rng.integers(0, 2**63, m).astype(np.uint64))
    qs = rng.integers(0, 2**63, qn).astype(np.uint64)
    d_q = jnp.asarray(qs)

    block = 128
    s = m // block                       # 512
    blocks2d = jnp.asarray(arr.reshape(s, block))
    last = blocks2d[:, block - 1]

    @jax.jit
    def bucket_dense(q):
        lt = last[None, :] < q[:, None]          # [Q, 512]
        b = jnp.sum(lt, axis=1).astype(jnp.int32)
        return jnp.minimum(b, s - 1)

    b = measure("bucket dense [Q,512] u64", lambda: bucket_dense(d_q),
                lambda r: r[0])

    @jax.jit
    def full_left(q):
        b = jnp.minimum(jnp.sum(last[None, :] < q[:, None], axis=1),
                        s - 1).astype(jnp.int32)
        rows = blocks2d[b]
        return (b * block +
                jnp.sum(rows < q[:, None], axis=1)).astype(jnp.int32)

    got = measure("full left dense+fused", lambda: full_left(d_q),
                  lambda r: r[0])
    want = np.searchsorted(arr, qs, side="left").astype(np.int32)
    assert np.array_equal(np.asarray(got), want)
    print("exact: OK", file=sys.stderr)

    @jax.jit
    def full_both(q):
        qq = q[:, None]
        lt = last[None, :] < qq
        le = last[None, :] <= qq
        blo = jnp.minimum(jnp.sum(lt, axis=1), s - 1).astype(jnp.int32)
        bhi = jnp.minimum(jnp.sum(le, axis=1), s - 1).astype(jnp.int32)
        lo = (blo * block +
              jnp.sum(blocks2d[blo] < qq, axis=1)).astype(jnp.int32)
        hi = (bhi * block +
              jnp.sum(blocks2d[bhi] <= qq, axis=1)).astype(jnp.int32)
        return lo, hi

    got2 = measure("full both dense+fused", lambda: full_both(d_q),
                   lambda r: r[0][0])
    lo_np, hi_np = np.asarray(got2[0]), np.asarray(got2[1])
    assert np.array_equal(lo_np, want)
    assert np.array_equal(hi_np,
                          np.searchsorted(arr, qs, side="right"))
    print("both exact: OK", file=sys.stderr)

    # scaling: m = 2^22 (4M index), needs bigger s
    m2 = 1 << 22
    arr2 = np.sort(rng.integers(0, 2**63, m2).astype(np.uint64))
    blocks2 = jnp.asarray(arr2.reshape(m2 // block, block))
    last2 = blocks2[:, block - 1]        # 32768 lasts
    s2n = m2 // block

    @jax.jit
    def full_left_2lvl(q):
        # level-0: 256 super lasts dense; level-1: [Q,128] gather+count
        sb = s2n // 256
        sup = last2.reshape(256, sb)[:, sb - 1]
        qq = q[:, None]
        t = jnp.minimum(jnp.sum(sup[None, :] < qq, axis=1),
                        255).astype(jnp.int32)
        w = jnp.minimum(jnp.sum(last2.reshape(256, sb)[t] < qq, axis=1),
                        sb - 1).astype(jnp.int32)
        b = t * sb + w
        rows = blocks2[b]
        return (b * block +
                jnp.sum(rows < qq, axis=1)).astype(jnp.int32)

    got3 = measure("4M-index left 2lvl dense", lambda: full_left_2lvl(d_q),
                   lambda r: r[0])
    want3 = np.searchsorted(arr2, qs, side="left").astype(np.int32)
    assert np.array_equal(np.asarray(got3), want3)
    print("4M exact: OK", file=sys.stderr)


if __name__ == "__main__":
    main()
