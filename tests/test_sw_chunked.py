"""Gather-free chunked SW window path vs the gather-based reference path:
results must be identical for every field on random overlap batches."""

import numpy as np
import jax.numpy as jnp
import pytest

from kslam_tpu.ops import encode, sw


@pytest.mark.parametrize("seed", range(4))
def test_chunked_matches_gathered(seed):
    rng = np.random.default_rng(seed)
    bases4 = np.frombuffer(b"ACGT", dtype=np.uint8)
    genomes = [rng.choice(bases4, int(rng.integers(100, 700)))
               for _ in range(4)]
    concat = np.concatenate(genomes)
    offsets = np.zeros(len(genomes) + 1, np.int64)
    offsets[1:] = np.cumsum([len(g) for g in genomes])
    scodes = encode.sw_codes_np(concat)
    chunks = sw.genome_chunks_from_scodes(scodes)

    n_reads, lq = 24, 96
    reads = np.zeros((n_reads, lq), np.uint8)
    lengths = rng.integers(40, lq + 1, n_reads).astype(np.int32)
    for i in range(n_reads):
        if i % 2 == 0:  # planted slice with mutations
            g = genomes[i % 4]
            pos = int(rng.integers(0, max(1, len(g) - lengths[i])))
            seg = g[pos:pos + lengths[i]].copy()
            m = rng.random(len(seg)) < 0.1
            seg[m] = bases4[rng.integers(0, 4, int(m.sum()))]
            reads[i, :len(seg)] = seg
            lengths[i] = len(seg)
        else:
            reads[i, :lengths[i]] = rng.choice(bases4, lengths[i])
    read_scodes = encode.sw_codes_np(reads)

    b = 64
    read_id = rng.integers(0, n_reads, b).astype(np.int32)
    entry_id = rng.integers(0, 4, b).astype(np.int32)
    rel_pos = rng.integers(-30, 650, b).astype(np.int32)
    rc = rng.random(b) < 0.5
    valid = np.ones(b, bool)

    args = (jnp.asarray(read_id), jnp.asarray(entry_id),
            jnp.asarray(rel_pos), jnp.asarray(rc), jnp.asarray(valid),
            jnp.asarray(read_scodes), jnp.asarray(lengths))
    params = (2, 3, 5, 2)
    ref = sw.align_overlaps_batch(
        *args, jnp.asarray(scodes), jnp.asarray(offsets), *params,
        window_len=lq)
    got = sw.align_overlaps_batch_chunked(
        *args, jnp.asarray(chunks), jnp.asarray(offsets), *params,
        window_len=lq)
    for name, a, g in zip(ref._fields, ref, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(a),
                                      err_msg=name)
