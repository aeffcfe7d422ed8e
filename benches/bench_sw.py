#!/usr/bin/env python3
"""Standalone Smith-Waterman kernel benchmark (GCUPS/chip).

Measures the Pallas TPU kernel and the XLA scan fallback on batches of
150bp-vs-160bp alignment problems (the pipeline's shape) plus a square
sweep over sizes.  GCUPS counts forward-pass cell updates (B*L*L), the
standard unit for SW kernels; the reference's SSE2 kernel is the
comparison point (ssw.c byte kernel, typically ~1-3 GCUPS/core).

Usage: python benches/bench_sw.py [--sizes 8192x160,16384x160] [--iters 10]
"""

import argparse
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="8192x160,32768x160")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--mut", type=float, default=0.1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from kslam_tpu.ops import sw, sw_pallas

    on_tpu = jax.default_backend() == "tpu"
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    params = (2, 3, 5, 2)
    rng = np.random.default_rng(1)

    for size in args.sizes.split(","):
        b, l = (int(x) for x in size.split("x"))
        q = rng.integers(0, 4, (b, l)).astype(np.int32)
        r = q.copy()
        m = rng.random((b, l)) < args.mut
        r[m] = rng.integers(0, 4, int(m.sum()))
        q, r = jnp.asarray(q), jnp.asarray(r)
        impls = [("xla", lambda q, r: sw.sw_forward_batch(q, r, *params))]
        if on_tpu:
            impls.insert(0, ("pallas", lambda q, r:
                             sw_pallas.sw_forward_batch(q, r, *params)))
        for name, fn in impls:
            out = jax.block_until_ready(fn(q, r))
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(q, r)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.iters
            print(f"{size} {name}: {dt * 1e3:8.2f} ms  "
                  f"{b * l * l / dt / 1e9:7.1f} GCUPS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
