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
import numpy as np
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
from ..ops import encode, kmers, match, pairing_dev, sw


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


class ShardedPhaseA(NamedTuple):
    """Flattened per-data-shard PhaseAOut columns (leading dim = data
    shards); split_phase_a turns them back into pipeline PhaseAOut's."""
    ov_read: jnp.ndarray      # int32 [D, B]
    ov_entry: jnp.ndarray     # int32 [D, B]
    ov_rel: jnp.ndarray       # int32 [D, B]
    ov_rc: jnp.ndarray        # bool  [D, B]
    ov_valid: jnp.ndarray     # bool  [D, B]
    ov_count: jnp.ndarray     # int32 [D]
    overflow: jnp.ndarray     # int64 [D]
    needed_capacity: jnp.ndarray  # int64 [D] total pairs (sum over shards)
    needed_local: jnp.ndarray     # int64 [D] max PER-INDEX-SHARD pairs --
    # the overflow retry must size the per-shard expansion capacity off
    # this, not the total: one hot range shard can hold nearly all pairs
    max_fanout: jnp.ndarray   # int32 [D]
    score: jnp.ndarray        # int32 [D, B]
    ref_begin: jnp.ndarray    # int32 [D, B]
    ref_end: jnp.ndarray      # int32 [D, B]
    query_begin: jnp.ndarray  # int32 [D, B]
    query_end: jnp.ndarray    # int32 [D, B]
    p_r1: jnp.ndarray         # int32 [D, P]
    p_r2: jnp.ndarray         # int32 [D, P]
    p_score: jnp.ndarray      # int32 [D, P]
    p_entry: jnp.ndarray      # int32 [D, P]
    p_rs: jnp.ndarray         # int32 [D, P]
    p_re: jnp.ndarray         # int32 [D, P]
    p_ins: jnp.ndarray        # uint32 [D, P]
    p_count: jnp.ndarray      # int32 [D]


def shard_genomes(entry_offsets: "np.ndarray", genome_scodes: "np.ndarray",
                  num_shards: int):
    """Entry-range partition of the genome codes so no device holds the
    whole database (SURVEY 5.7: config[3]'s ~50GB DB).  Entries are split
    into `num_shards` contiguous ranges balanced by total bases; each
    shard's base slice is padded to a common length and its entry offsets
    are rebased to the slice.

    Returns (scodes uint8 [S*Gper], offsets int64 [S*(Eper+1)],
    e_bounds int32 [S+1]); the first two split S-ways under P("index")."""
    import numpy as np
    num_entries = len(entry_offsets) - 1
    total = int(entry_offsets[-1])
    targets = (np.arange(1, num_shards) * total) // num_shards
    cuts = np.searchsorted(entry_offsets, targets, side="left")
    e_bounds = np.concatenate([[0], cuts, [num_entries]]).astype(np.int32)
    e_bounds = np.maximum.accumulate(e_bounds)
    g_per = max(int(np.max(entry_offsets[e_bounds[1:]] -
                           entry_offsets[e_bounds[:-1]])), 1)
    e_per = max(int(np.max(e_bounds[1:] - e_bounds[:-1])), 1)
    scodes = np.full((num_shards, g_per), 4, np.uint8)   # 4 = N
    offsets = np.zeros((num_shards, e_per + 1), np.int64)
    for s in range(num_shards):
        lo, hi = int(e_bounds[s]), int(e_bounds[s + 1])
        glo, ghi = int(entry_offsets[lo]), int(entry_offsets[hi])
        scodes[s, :ghi - glo] = genome_scodes[glo:ghi]
        k = hi - lo
        offsets[s, :k + 1] = entry_offsets[lo:hi + 1] - glo
        offsets[s, k + 1:] = offsets[s, k]   # empty padding entries
    return scodes.reshape(-1), offsets.reshape(-1), e_bounds


def make_sharded_phase_a(mesh: Mesh, *, paired: bool, max_matches: int,
                         capacity: int, sw_batch: int, chain_iters: int,
                         match_s: int, mismatch: int, gap_open: int,
                         gap_extend: int, window_len: int,
                         score_threshold: int = 0,
                         genome_sharded: bool = False,
                         sw_owner_cap: int = 0,
                         prefix_bits: int = 0, prefix_window: int = 0,
                         dedup_tail_cap: int = 1 << 16):
    """The FULL phase A of the device pipeline on a (data, index) mesh.

    Per (data, index) mesh cell:
      1. k-merize the local read sub-batch and expand seed pairs against
         the LOCAL index range shard (ops.match.expand_seeds) -- the join
         touches only 1/S of the index per device, which is the scaling
         win for indexes beyond one chip's HBM,
      2. all_gather the packed candidate words over the "index" axis (ICI;
         16 bytes per candidate) and run the merged sort + chained dedup
         (ops.match.finish_overlaps) -- exact vs the unsharded engine
         because range shards never split a pileup, and the merged sort
         erases shard order,
      3. compact to the SW batch and Smith-Waterman ONLY this shard's
         1/S row slice; all_gather the scores/ends back (index-axis
         parallel SW),
      4. score screen + the pairing sweep per data shard (replicated over
         the index axis; every index shard holds identical post-gather
         data, so out_specs omit "index").

    Downstream (insert model, screens, pseudo-assembly, LCA) consumes the
    per-data-shard outputs exactly like per-device-batch PhaseAOut's via
    split_phase_a + pipeline.device_path.run_chunk_phase_b_exact, so the
    sharded path reuses the parity-tested chunk-global phase B.

    genome_sharded=True additionally partitions the GENOME over the index
    axis (shard_genomes): shard s owns the entry range
    [e_bounds[s], e_bounds[s+1]) and stores only that base slice.  SW for
    a candidate then runs on the shard that owns its entry (entry-owner
    routing): each shard front-compacts its owned rows, aligns up to
    `sw_owner_cap` of them against its local slice, and the per-row
    results are combined with a masked psum (each valid row has exactly
    one owner).  Owned rows beyond sw_owner_cap are counted into
    `overflow` so the pipeline's emit-all retry rescales.  This removes
    the last replicated database tensor -- HBM per chip is
    (index + genome)/S + batch state, unlocking DBs larger than one
    chip's memory (SURVEY 5.7, BASELINE config[3]).

    Step operands (global shapes; D/S = data/index mesh axis sizes):
      bases   uint8 [D*rows, L]  P("data", None)  stacked sub-batches
      lengths int32 [D*rows]     P("data")
      midpoint int32 []          P() (local midpoint of every sub-batch)
      idx_kmers/entry/off/rc [S*per]  P("index")  (shard_database layout)
      genome_scodes uint8        P() replicated [G], or P("index")
                                 [S*Gper] when genome_sharded
      entry_offsets int64        P() [E+1], or P("index") [S*(Eper+1)]
      e_bounds int32 [S+1]       P() (entry range bounds; dummy when not
                                 genome_sharded)
    """
    S = mesh.shape["index"]
    cap_local = -(-capacity // S)
    if sw_batch % S:
        raise ValueError(f"sw_batch {sw_batch} not divisible by index "
                         f"axis {S}")
    sw_local = sw_batch // S
    owner_cap = min(sw_owner_cap or max(2 * sw_local, 64), sw_batch)

    def local_step(bases, lengths, midpoint, idx_kmers, idx_entry, idx_off,
                   idx_rc, genome_scodes, entry_offsets, e_bounds,
                   idx_pstart):
        km, off, rc, valid = kmers.read_kmers_device(bases, lengths)
        # per-shard prefix table (clipped to the shard's range) gives the
        # same O(1) direct-addressed join the single-chip path uses;
        # queries owned by other range shards find empty windows.
        # tier2_cap: heavy-tail prefix runs the window cannot cover are
        # resolved EXACTLY in-program by the compacted blocked search
        # against this shard's own k-mer slice (ADVICE r4 #5) -- without
        # it, any partial-coverage prefix table would force a whole-mesh
        # exact retry on nearly every repeat-rich chunk
        k1, k2, ovf, needed, fanout = match.expand_seeds(
            km, off, rc, valid, lengths, idx_kmers, idx_entry, idx_off,
            idx_rc, max_matches, cap_local,
            idx_pstart=idx_pstart if prefix_bits else None,
            prefix_bits=prefix_bits, window=prefix_window,
            tier2_cap=max(cap_local // 16, 1024) if prefix_bits else 0)
        k1 = jax.lax.all_gather(k1, "index", tiled=True)
        k2 = jax.lax.all_gather(k2, "index", tiled=True)
        ovf = jax.lax.psum(ovf, "index")
        needed_local = jax.lax.pmax(needed, "index")
        needed = jax.lax.psum(needed, "index")
        fanout = jax.lax.pmax(fanout, "index")
        res = match.finish_overlaps(k1, k2, ovf, needed, fanout,
                                    chain_iters=chain_iters,
                                    dedup_tail_cap=dedup_tail_cap)
        res = match.compact_overlaps(res, sw_batch)
        read_scodes = encode.sw_codes(bases)
        s = jax.lax.axis_index("index")
        if genome_sharded:
            # entry-owner routing: this shard aligns the rows whose entry
            # lives in its genome slice, against LOCAL (rebased) offsets
            e_lo = e_bounds[s]
            owned = res.valid & (res.entry_id >= e_lo) & \
                (res.entry_id < e_bounds[s + 1])
            owned_count = jnp.sum(owned.astype(jnp.int32))
            rows0 = jnp.arange(sw_batch, dtype=jnp.int32)
            okey = (jnp.where(owned, np.uint64(0), np.uint64(1))
                    << np.uint64(32)) | rows0.astype(jnp.uint64)
            _, perm = jax.lax.sort((okey, rows0), num_keys=1)
            sel = perm[:owner_cap]
            ok = owned[sel] & (jnp.arange(owner_cap, dtype=jnp.int32)
                               < owned_count)
            al = sw.align_overlaps_batch(
                res.read_id[sel], res.entry_id[sel] - e_lo,
                res.rel_pos[sel], res.rc[sel], ok, read_scodes, lengths,
                genome_scodes, entry_offsets, match_s, mismatch, gap_open,
                gap_extend, window_len=window_len)
            zero = jnp.zeros(sw_batch, jnp.int32)
            comb = lambda x: jax.lax.psum(
                zero.at[sel].set(jnp.where(ok, x, 0)), "index")
            score = comb(al.score)
            begin, end = comb(al.ref_begin), comb(al.ref_end)
            qbegin, qend = comb(al.query_begin), comb(al.query_end)
            sw_drop = jax.lax.psum(
                jnp.maximum(owned_count - owner_cap, 0).astype(jnp.int64),
                "index")
            res = res._replace(overflow=res.overflow + sw_drop)
        else:
            # SW over this index shard's contiguous row slice; tiled
            # gather reassembles rows in compacted order
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, s * sw_local,
                                                        sw_local)
            al = sw.align_overlaps_batch(
                sl(res.read_id), sl(res.entry_id), sl(res.rel_pos),
                sl(res.rc), sl(res.valid), read_scodes, lengths,
                genome_scodes, entry_offsets, match_s, mismatch, gap_open,
                gap_extend, window_len=window_len)
            g = lambda x: jax.lax.all_gather(x, "index", tiled=True)
            score = g(al.score)
            begin, end = g(al.ref_begin), g(al.ref_end)
            qbegin, qend = g(al.query_begin), g(al.query_end)
        score = jnp.where(res.valid, score, 0)
        # screenOverlapsByScoreThreshold (Overlap.h:329-341)
        keep = res.valid & (score >= score_threshold)
        count = jnp.sum(keep.astype(jnp.int32))
        res = res._replace(valid=keep, count=count)
        if paired:
            pairs = pairing_dev.pair_overlaps_device(
                res.read_id, res.entry_id, res.rel_pos, res.rc, res.valid,
                score, begin, end, lengths, midpoint)
        else:
            n = res.read_id.shape[0]
            rows = jnp.arange(n, dtype=jnp.int32)
            pairs = pairing_dev.DevicePairs(
                r1_idx=jnp.where(res.valid, rows, pairing_dev.NONE),
                r2_idx=jnp.full(n, pairing_dev.NONE, jnp.int32),
                combined_score=score, entry_id=res.entry_id,
                ref_start=begin, ref_end=end,
                insert_size=jnp.zeros(n, jnp.uint32), count=res.count)
        row = lambda x: x[None]
        sc = lambda x: jnp.reshape(x, (1,))
        return ShardedPhaseA(
            row(res.read_id), row(res.entry_id), row(res.rel_pos),
            row(res.rc), row(res.valid), sc(res.count), sc(res.overflow),
            sc(res.needed_capacity), sc(needed_local), sc(res.max_fanout),
            row(score), row(begin), row(end), row(qbegin), row(qend),
            row(pairs.r1_idx), row(pairs.r2_idx), row(pairs.combined_score),
            row(pairs.entry_id), row(pairs.ref_start), row(pairs.ref_end),
            row(pairs.insert_size), sc(pairs.count))

    n_row = (P("data", None),) * 5 + (P("data"),) * 5 + \
        (P("data", None),) * 5 + (P("data", None),) * 7 + (P("data"),)
    g_spec = P("index") if genome_sharded else P()
    p_spec = P("index") if prefix_bits else P()
    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P("data", None), P("data"), P(), P("index"), P("index"),
                  P("index"), P("index"), g_spec, g_spec, P(), p_spec),
        out_specs=ShardedPhaseA(*n_row))

    @jax.jit
    def step(bases, lengths, midpoint, idx_kmers, idx_entry, idx_off,
             idx_rc, genome_scodes, entry_offsets, e_bounds=None,
             idx_pstart=None):
        if e_bounds is None:
            e_bounds = jnp.zeros(S + 1, jnp.int32)
        if idx_pstart is None:
            idx_pstart = jnp.zeros(S, jnp.int32)
        return sharded(bases, lengths, midpoint, idx_kmers, idx_entry,
                       idx_off, idx_rc, genome_scodes, entry_offsets,
                       e_bounds, idx_pstart)

    return step


_STEP_CACHE = {}


def get_sharded_phase_a(mesh: Mesh, **params):
    """Cached make_sharded_phase_a: the chunk loop and the overflow-retry
    path reuse compiled steps instead of rebuilding the shard_map (a fresh
    closure would defeat jit's cache and recompile every chunk)."""
    key = (mesh, tuple(sorted(params.items())))
    step = _STEP_CACHE.get(key)
    if step is None:
        step = _STEP_CACHE[key] = make_sharded_phase_a(mesh, **params)
    return step


class ShardedDB(NamedTuple):
    """place_sharded_db result: the step operand tuple after `midpoint`
    plus the static prefix-table geometry that must be passed to
    make_sharded_phase_a/get_sharded_phase_a."""
    operands: tuple
    prefix_bits: int
    prefix_window: int


def place_sharded_db(mesh: Mesh, kidx, genome_scodes_np, entry_offsets_np,
                     genome_sharded: bool = False) -> ShardedDB:
    """Device_puts the index range shards over the mesh's "index" axis and
    the genome codes/offsets replicated (or entry-range sharded when
    genome_sharded), so the per-chunk step calls move no database bytes.
    Per-shard prefix direct-addressing tables ride the index axis so the
    mesh join matches the single-chip path (ops/join.lookup_prefix_window
    instead of the blocked binary search)."""
    import numpy as np
    from jax.sharding import NamedSharding
    S = mesh.shape["index"]
    km, eid, off, rc, pstart, bits, window = shard_database(
        kidx, S, with_prefix=True)
    on_index = NamedSharding(mesh, P("index"))
    repl = NamedSharding(mesh, P())
    put = jax.device_put
    if genome_sharded:
        scodes, offsets, e_bounds = shard_genomes(
            np.asarray(entry_offsets_np), genome_scodes_np, S)
        genome = (put(scodes, on_index), put(offsets, on_index),
                  put(e_bounds.astype(np.int32), repl))
    else:
        genome = (put(genome_scodes_np, repl), put(entry_offsets_np, repl),
                  put(np.zeros(S + 1, np.int32), repl))
    p_op = (put(pstart, on_index) if bits
            else put(np.zeros(S, np.int32), repl))
    ops = (put(km, on_index), put(eid, on_index), put(off, on_index),
           put(rc, on_index)) + genome + (p_op,)
    return ShardedDB(ops, bits, window)


def split_phase_a(out: ShardedPhaseA, num_shards: int, mesh: Mesh = None):
    """Turns the stacked sharded outputs into a list of per-data-shard
    PhaseAOut's consumable by pipeline.device_path.run_chunk_phase_b_exact
    (each data shard plays the role of one device batch).

    With `mesh`, every shard's slice is committed to the mesh's FIRST
    device: the chunk-global phase B (which concatenates the shards) then
    runs as a plain single-device program, instead of XLA
    auto-partitioning its sorts/scans over the mesh and inserting
    cross-device all-reduces -- phase B is light and latency-bound, and on
    CPU meshes those collectives can trip the rendezvous watchdog."""
    from ..pipeline import device_path
    rows = [ShardedPhaseA(*(x[d] for x in out)) for d in range(num_shards)]
    if mesh is not None:
        dev0 = mesh.devices.reshape(-1)[0]
        rows = [ShardedPhaseA(*(jax.device_put(f, dev0) for f in row))
                for row in rows]
    a_list = []
    for r in rows:
        ov = match.Overlaps(
            read_id=r.ov_read, entry_id=r.ov_entry, rel_pos=r.ov_rel,
            rc=r.ov_rc, valid=r.ov_valid, count=r.ov_count,
            overflow=r.overflow, needed_capacity=r.needed_capacity,
            max_fanout=r.max_fanout)
        pairs = pairing_dev.DevicePairs(
            r1_idx=r.p_r1, r2_idx=r.p_r2, combined_score=r.p_score,
            entry_id=r.p_entry, ref_start=r.p_rs, ref_end=r.p_re,
            insert_size=r.p_ins, count=r.p_count)
        a_list.append(device_path.PhaseAOut(
            overlaps=ov, ov_score=r.score, ov_begin=r.ref_begin,
            ov_end=r.ref_end, ov_qbegin=r.query_begin,
            ov_qend=r.query_end, pairs=pairs))
    return a_list


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


def shard_database(kidx, num_shards: int, with_prefix: bool = False):
    """Pads + partitions the sorted k-mer index into equal device slices
    that respect pileup boundaries.  Returns stacked-then-flattened arrays
    whose equal S-way split reproduces the range shards.

    with_prefix=True additionally builds per-shard prefix
    direct-addressing tables (db/kmer_index.prefix_table clipped to each
    shard's range: out-of-range prefixes collapse to empty windows) and
    returns (km, eid, off, rc, pstart [S*(2^bits+1)], bits, window);
    bits == 0 means no table (fall back to the blocked search)."""
    import numpy as np
    bounds = kidx.shard_bounds(num_shards)
    per = max(int(np.max(bounds[1:] - bounds[:-1])), 16)
    g_pstart, bits, window = kidx.prefix_table() if with_prefix \
        else (None, 0, 0)
    if g_pstart is None:
        bits = window = 0
    if window:
        # the prefix lookup reads aligned [window] rows r and r+1 past the
        # run start, so every shard needs >= 2*window sentinel tail
        per += 2 * window
    per = 1 << (per - 1).bit_length()
    km = np.full((num_shards, per), np.uint64(2 ** 64 - 1), dtype=np.uint64)
    eid = np.zeros((num_shards, per), np.int32)
    off = np.zeros((num_shards, per), np.int32)
    rc = np.zeros((num_shards, per), bool)
    pstart = np.zeros((num_shards, (1 << bits) + 1), np.int32) \
        if bits else None
    for s in range(num_shards):
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        km[s, :hi - lo] = kidx.kmers[lo:hi]
        eid[s, :hi - lo] = kidx.entry_id[lo:hi]
        off[s, :hi - lo] = kidx.offset[lo:hi]
        rc[s, :hi - lo] = kidx.rc[lo:hi]
        if bits:
            pstart[s] = np.clip(g_pstart.astype(np.int64) - lo, 0, hi - lo)
    flat = (km.reshape(-1), eid.reshape(-1), off.reshape(-1),
            rc.reshape(-1))
    if with_prefix:
        return flat + (pstart.reshape(-1) if bits else None, bits, window)
    return flat
