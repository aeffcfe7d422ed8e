"""Multi-chip sharded alignment: Mesh("data", "index") over jax.sharding.

Scale-out design (SURVEY.md section 5.7/2.2-P7; the reference is single
process, so this is new capability):

  * read batches are sharded over the "data" axis (pure data parallelism,
    the analog of the reference's chunk loop),
  * the sorted k-mer index and its sidecars are sharded by contiguous
    k-mer *value range* over the "index" axis (each device owns a slice of
    the canonical k-mer space -- the EP-style shard of SURVEY 5.7); a range
    shard never splits a pileup (KmerIndex.shard_bounds),
  * every (data, index) device joins its local read sub-batch against its
    local index shard: queries outside the shard's value range simply find
    empty ranges, so a broadcast-join over index shards is exact without
    any routing step,
  * SW validation runs where the candidates were found (genomes replicated
    within this v1; entry-owner routing via all_to_all is the planned
    optimization for DBs that exceed per-device HBM),
  * per-read best scores are combined across index shards with a `pmax`
    collective over ICI -- the cross-shard reduction the host needs for
    score-fraction screening.

Outputs stay sharded [data, index, cap]; the host (or a later fused stage)
consumes overlap columns per shard.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
import functools as _functools
import inspect as _inspect

# check_vma/check_rep=False: scan carries inside the local step start as
# replicated constants and become device-varying, which the strict checker
# rejects; semantics are unaffected (shards never exchange implicitly).
if hasattr(jax, "shard_map"):
    _sm = jax.shard_map
else:  # older jax
    from jax.experimental.shard_map import shard_map as _sm
_flag = ("check_vma" if "check_vma" in _inspect.signature(_sm).parameters
         else "check_rep")
shard_map = _functools.partial(_sm, **{_flag: False})

from ..config import PipelineConfig
from ..ops import encode, kmers, match, sw


class ShardedAlignResult(NamedTuple):
    read_id: jnp.ndarray    # int32 [D, S, cap] global read ids
    entry_id: jnp.ndarray   # int32 [D, S, cap]
    rel_pos: jnp.ndarray    # int32 [D, S, cap]
    rc: jnp.ndarray         # bool  [D, S, cap]
    valid: jnp.ndarray      # bool  [D, S, cap]
    score: jnp.ndarray      # int32 [D, S, cap]
    ref_begin: jnp.ndarray  # int32 [D, S, cap]
    ref_end: jnp.ndarray    # int32 [D, S, cap]
    query_begin: jnp.ndarray
    query_end: jnp.ndarray
    best_score: jnp.ndarray  # int32 [N] per-read best over all shards


def make_sharded_align_step(mesh: Mesh, config: PipelineConfig,
                            capacity: int, window_len: int):
    """Builds the jitted multi-chip alignment step.

    Step args (global shapes):
      bases   uint8 [N, L]      sharded P("data", None)
      lengths int32 [N]         sharded P("data")
      idx_kmers uint64 [M]      sharded P("index")  (sentinel padded)
      idx_entry/off int32 [M], idx_rc bool [M]: same
      genome_scodes uint8 [G]   replicated
      entry_offsets int64 [E+1] replicated
    """
    p = config.sw
    data_size = mesh.shape["data"]

    def local_step(bases, lengths, idx_kmers, idx_entry, idx_off, idx_rc,
                   genome_scodes, entry_offsets):
        n_local = bases.shape[0]
        km, off, rc, valid = kmers.read_kmers_device(bases, lengths)
        res = match.match_overlaps(
            km, off, rc, valid, lengths,
            idx_kmers, idx_entry, idx_off, idx_rc,
            max_matches=config.max_matches_per_kmer,
            capacity=capacity,
            chain_iters=min(config.dedup_group_cap, 48))
        read_scodes = encode.sw_codes(bases)
        al = sw.align_overlaps_batch(
            res.read_id, res.entry_id, res.rel_pos, res.rc, res.valid,
            read_scodes, lengths, genome_scodes, entry_offsets,
            p.match, p.mismatch, p.gap_open, p.gap_extend,
            window_len=window_len)
        score = jnp.where(res.valid, al.score, 0)
        # per-read best across index shards: local segment-max then pmax
        # over ICI ("index" axis)
        safe_read = jnp.clip(res.read_id, 0, n_local - 1)
        local_best = jnp.zeros(n_local, jnp.int32).at[safe_read].max(
            jnp.where(res.valid, score, 0))
        best = jax.lax.pmax(local_best, "index")
        # globalize read ids: local batch row -> global row
        d = jax.lax.axis_index("data")
        gread = jnp.where(res.valid, res.read_id + d * n_local, res.read_id)
        expand = lambda x: x[None, None]
        return (expand(gread), expand(res.entry_id), expand(res.rel_pos),
                expand(res.rc), expand(res.valid), expand(score),
                expand(al.ref_begin), expand(al.ref_end),
                expand(al.query_begin), expand(al.query_end), best)

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P("data", None), P("data"), P("index"), P("index"),
                  P("index"), P("index"), P(), P()),
        out_specs=(P("data", "index", None),) * 10 + (P("data"),))

    @jax.jit
    def step(*args):
        outs = sharded(*args)
        return ShardedAlignResult(*outs)

    return step


def build_mesh(devices=None, data: int = 0, index: int = 0) -> Mesh:
    """Mesh over the available devices; defaults to (data=1, index=all)."""
    import numpy as np
    devices = list(jax.devices() if devices is None else devices)
    n = len(devices)
    if not data or not index:
        data, index = 1, n
    assert data * index == n, (data, index, n)
    arr = np.array(devices[:data * index]).reshape(data, index)
    return Mesh(arr, ("data", "index"))


def shard_database(kidx, num_shards: int):
    """Pads + partitions the sorted k-mer index into equal device slices
    that respect pileup boundaries.  Returns stacked-then-flattened arrays
    whose equal S-way split reproduces the range shards."""
    import numpy as np
    bounds = kidx.shard_bounds(num_shards)
    per = max(int(np.max(bounds[1:] - bounds[:-1])), 16)
    per = 1 << (per - 1).bit_length()
    km = np.full((num_shards, per), np.uint64(2 ** 64 - 1), dtype=np.uint64)
    eid = np.zeros((num_shards, per), np.int32)
    off = np.zeros((num_shards, per), np.int32)
    rc = np.zeros((num_shards, per), bool)
    for s in range(num_shards):
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        km[s, :hi - lo] = kidx.kmers[lo:hi]
        eid[s, :hi - lo] = kidx.entry_id[lo:hi]
        off[s, :hi - lo] = kidx.offset[lo:hi]
        rc[s, :hi - lo] = kidx.rc[lo:hi]
    return (km.reshape(-1), eid.reshape(-1), off.reshape(-1), rc.reshape(-1))
