"""CPU-mesh scaling trend of the sharded phase A (VERDICT r3 item 8).

No multi-chip hardware exists in this environment, so this measures the
measurable subset: wall-clock of the FULL sharded phase-A step
(parallel/dist.get_sharded_phase_a) on an 8-virtual-device CPU mesh at
fixed total work across (data x index) shapes, plus the index-axis
all_gather volume (the ICI traffic the SCALING.md model prices).

What the trend can and cannot show: CPU cores emulate devices, so
absolute times mean nothing and collective latency is shared-memory, but
the WORK PARTITIONING trend is real -- per-device join/SW work should
fall with the index axis while the all_gather'd candidate volume per
device stays constant (broadcast-join), which is exactly the model's
assumption.  Run with:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benches/bench_mesh_trend.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
sys.path.insert(0, ".")

import numpy as np

READ_LEN = 150
PAD = 160
N_READS = 4096           # per step (2048 pairs)
GENOME_KB = 400
N_GENOMES = 8
REPS = 5


def main():
    import jax
    # sitecustomize preloads jax on the axon platform; env vars are too
    # late (tests/conftest.py gotcha) -- force CPU on the config object
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from kslam_tpu.config import PipelineConfig
    from kslam_tpu.db.genbank import GenbankEntry, GenbankIndex
    from kslam_tpu.db.kmer_index import KmerIndex
    from kslam_tpu.ops import encode
    from kslam_tpu.parallel import dist

    devs = jax.devices()
    print(f"devices: {len(devs)} x {devs[0].platform}", file=sys.stderr)
    rng = np.random.default_rng(0)
    bases4 = np.frombuffer(b"ACGT", dtype=np.uint8)
    genomes = [bases4[rng.integers(0, 4, GENOME_KB * 1000, np.uint8)]
               for _ in range(N_GENOMES)]
    gindex = GenbankIndex([GenbankEntry(bases=g.tobytes().decode(),
                                        taxonomy_id=10 + i)
                           for i, g in enumerate(genomes)])
    kidx = KmerIndex.build(gindex)
    scodes = encode.sw_codes_np(gindex.bases_concat)
    config = PipelineConfig()
    p = config.sw

    # plant paired reads
    concat = gindex.bases_concat
    offs = gindex.entry_offsets
    n_pairs = N_READS // 2
    reads = np.zeros((N_READS, PAD), np.uint8)
    comp = np.zeros(256, np.uint8)
    comp[ord("A")], comp[ord("C")] = ord("T"), ord("G")
    comp[ord("G")], comp[ord("T")] = ord("C"), ord("A")
    for i in range(n_pairs):
        g = int(rng.integers(0, N_GENOMES))
        pos = int(rng.integers(0, GENOME_KB * 1000 - 500))
        s = concat[offs[g] + pos:offs[g] + pos + 400]
        reads[i, :READ_LEN] = s[:READ_LEN]
        reads[n_pairs + i, :READ_LEN] = comp[s[-READ_LEN:]][::-1]
    lengths = np.full(N_READS, READ_LEN, np.int32)

    capacity = 1 << 16
    sw_batch = 1 << 13
    rows = []
    for d_axis, s_axis in ((1, 1), (1, 2), (1, 4), (1, 8), (2, 4),
                           (4, 2), (8, 1)):
        n_dev = d_axis * s_axis
        if n_dev > len(devs):
            continue
        mesh = dist.build_mesh(devs[:n_dev], data=d_axis, index=s_axis)
        sharded_db = dist.place_sharded_db(mesh, kidx, scodes,
                                           gindex.entry_offsets)
        swb = -(-sw_batch // s_axis) * s_axis
        step = dist.get_sharded_phase_a(
            mesh, paired=True, max_matches=config.max_matches_per_kmer,
            capacity=capacity, sw_batch=swb, chain_iters=48,
            match_s=p.match, mismatch=p.mismatch, gap_open=p.gap_open,
            gap_extend=p.gap_extend, window_len=PAD,
            prefix_bits=sharded_db.prefix_bits,
            prefix_window=sharded_db.prefix_window)
        # stack data-parallel sub-batches
        unit = N_READS // 2 // d_axis
        parts_b, parts_l = [], []
        for i in range(d_axis):
            b = np.zeros((2 * unit, PAD), np.uint8)
            le = np.zeros(2 * unit, np.int32)
            b[:unit] = reads[i * unit:(i + 1) * unit]
            b[unit:] = reads[n_pairs + i * unit:n_pairs + (i + 1) * unit]
            le[:] = READ_LEN
            parts_b.append(b)
            parts_l.append(le)
        sb = jnp.asarray(np.concatenate(parts_b))
        sl = jnp.asarray(np.concatenate(parts_l))
        out = step(sb, sl, np.int32(unit), *sharded_db.operands)
        jax.device_get(out.p_count)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = step(sb, sl, np.int32(unit), *sharded_db.operands)
            jax.device_get(out.p_count)
        dt = (time.perf_counter() - t0) / REPS
        gather_mb = 16 * (capacity // s_axis) * s_axis / 1e6
        rows.append((d_axis, s_axis, dt * 1e3,
                     int(np.asarray(out.p_count).sum()), gather_mb))
        print(f"mesh {d_axis}x{s_axis}: {dt * 1e3:7.1f} ms/step  "
              f"pairs={rows[-1][3]}  index-axis all_gather="
              f"{gather_mb:.1f} MB/device/step", file=sys.stderr)

    print("\n| mesh (data x index) | ms/step | emitted pairs | "
          "all_gather MB/dev |", file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for d, s, ms, c, mb in rows:
        print(f"| {d}x{s} | {ms:.1f} | {c} | {mb:.1f} |", file=sys.stderr)


if __name__ == "__main__":
    main()
