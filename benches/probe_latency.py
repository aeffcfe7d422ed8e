"""Probe axon-tunnel dispatch/transfer latency and true phase costs."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((8, 128), jnp.float32)
    tiny = jax.jit(lambda x: x + 1)
    jax.block_until_ready(tiny(x))
    t0 = time.perf_counter()
    for _ in range(20):
        y = tiny(x)
        jax.block_until_ready(y)
    print(f"tiny dispatch+block: {(time.perf_counter()-t0)/20*1e3:.2f} ms",
          file=sys.stderr)

    t0 = time.perf_counter()
    for _ in range(20):
        y = tiny(x)
        np.asarray(y)
    print(f"tiny dispatch+device_get: "
          f"{(time.perf_counter()-t0)/20*1e3:.2f} ms", file=sys.stderr)

    # chained enqueue of 20 then one block: amortized enqueue cost
    t0 = time.perf_counter()
    y = x
    for _ in range(20):
        y = tiny(y)
    jax.block_until_ready(y)
    print(f"20 chained then block: {(time.perf_counter()-t0)/20*1e3:.2f} "
          f"ms/step", file=sys.stderr)

    # big standalone op, block vs get
    big = jax.jit(lambda a: jnp.sort(a, axis=0))
    a = jnp.asarray(np.random.default_rng(0)
                    .integers(0, 2**31, (1 << 18,), np.int32))
    jax.block_until_ready(big(a))
    t0 = time.perf_counter()
    for _ in range(10):
        jax.block_until_ready(big(a))
    print(f"sort 256k block: {(time.perf_counter()-t0)/10*1e3:.2f} ms",
          file=sys.stderr)
    t0 = time.perf_counter()
    for _ in range(10):
        np.asarray(big(a))
    print(f"sort 256k get: {(time.perf_counter()-t0)/10*1e3:.2f} ms",
          file=sys.stderr)


if __name__ == "__main__":
    main()
