"""Device pairing sweep: vectorized equivalent of PairedOverlap.h:132-271.

The reference's sweep is stateful: per (read-pair, entry) run over overlaps
sorted by (readID%midpoint, entry, relPos), it keeps the most recent
overlap in each of 4 channels (R1/R2 x fwd/rc) with used flags, emitting
  * a full pair when an element arrives and the complementary channel
    (R1fwd<->R2rc, R1rc<->R2fwd) holds an element: the new element pairs
    with the most recent complementary one (used flags are NOT checked, so
    duplicates are emitted on repeated arrivals -- preserved here),
  * a half-pair when a channel slot is overwritten while unused,
  * trailing half-pairs for unused slots at run end, channel order
    R2fwd, R2rc, R1fwd, R1rc (PairedOverlap.h:217-240).

Vectorized derivation (proven element-wise equivalent, see
tests/test_pairing_dev.py golden parity):
  * pair(i) exists iff prev_comp(i) (last complementary index before i in
    the run) exists; its partner is prev_comp(i),
  * overwrite-half(i) (for the PREVIOUS same-channel element) fires iff
    prev_same(i) exists and prev_comp(i) does not: the previous element is
    unused exactly when no complementary element precedes i at all,
  * flush-half for channel c fires iff the run contains c but not comp(c);
    it emits the run's last c element,
and the reference's emission order is reproduced by giving element i the
order keys 6i+0 (overwrite-half), 6i+1 (pair), and run-end element i the
keys 6i+2..6i+5 (flush for channels R2fwd, R2rc, R1fwd, R1rc).

Segmented prev-occurrence scans are associative max-scans over one u64
code word (seg << 32 | idx+1) per element, so segment ids never collide
with in-segment indices; the emission-slot keys are int32, so the only
remaining size constraint is 6*N < 2^31 -- enforced.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

NONE = np.int32(-1)


class DevicePairs(NamedTuple):
    """Columnar pair emissions in exact reference order; rows beyond
    `count` are padding."""
    r1_idx: jnp.ndarray          # int32 [P] index into overlap columns, -1
    r2_idx: jnp.ndarray          # int32 [P]
    combined_score: jnp.ndarray  # int32 [P]
    entry_id: jnp.ndarray        # int32 [P]
    ref_start: jnp.ndarray       # int32 [P]
    ref_end: jnp.ndarray         # int32 [P]
    insert_size: jnp.ndarray     # uint32 [P] (0 for half pairs)
    count: jnp.ndarray           # int32 []


@jax.jit
def pair_overlaps_device(read_id, entry_id, rel_pos, rc, valid,
                         score, ref_begin, ref_end,
                         read_lengths, midpoint) -> DevicePairs:
    """Args: compacted overlap columns [N] (+ SW outputs), read_lengths
    [R], midpoint scalar (device).  Returns DevicePairs with capacity 2N
    (pair + one half per element; flush halves reuse free slots -- see
    layout note below).
    """
    n = read_id.shape[0]
    if 6 * n >= 2**31:
        raise ValueError(f"pairing batch too large for int32 codes: {n}")
    mid = jnp.asarray(midpoint, jnp.int32)
    pid = jnp.where(read_id < mid, read_id, read_id - mid)
    is_r2 = read_id >= mid
    ch = (2 * is_r2.astype(jnp.int32)) | rc.astype(jnp.int32)

    # sort by (pid, entry, rel, read, rc); invalid rows to the tail.
    # pid/entry/read fit 31 bits; rel is arbitrary int32 -> bias.
    k1 = (pid.astype(jnp.uint64) << np.uint64(32)) | \
        entry_id.astype(jnp.uint64)
    k1 = jnp.where(valid, k1, np.uint64(2**64 - 1))
    k2 = (((rel_pos.astype(jnp.int64) + 2**31).astype(jnp.uint64))
          << np.uint64(32)) | \
        ((read_id.astype(jnp.uint64) << np.uint64(1)) |
         rc.astype(jnp.uint64))
    perm0 = jnp.arange(n, dtype=jnp.int32)
    _, _, perm = jax.lax.sort((k1, k2, perm0), num_keys=2)

    s_pid = pid[perm]
    s_entry = entry_id[perm]
    s_valid = valid[perm]
    s_ch = ch[perm]

    # run boundaries + dense segment ids (invalid rows: one trailing chunk,
    # masked out of emissions entirely)
    prev_pid = jnp.roll(s_pid, 1).at[0].set(-1)
    prev_entry = jnp.roll(s_entry, 1).at[0].set(-1)
    prev_valid = jnp.roll(s_valid, 1).at[0].set(False)
    new_run = (s_pid != prev_pid) | (s_entry != prev_entry) | \
        (s_valid != prev_valid)
    seg = jnp.cumsum(new_run.astype(jnp.int32)) - 1
    idx = jnp.arange(n, dtype=jnp.int32)
    seg_hi = seg.astype(jnp.uint64) << np.uint64(32)

    def prev_occ(channel_mask):
        """Per position: last index <= i in this run where channel_mask;
        -1 if none.  The running max rides one u64 word (seg | idx+1):
        a larger seg always wins, so values never leak across runs and
        the old int32 seg*(n+2) code (which capped n at ~46k) is gone."""
        code = seg_hi | jnp.where(channel_mask, idx + 1, 0
                                  ).astype(jnp.uint64)
        scan = jax.lax.associative_scan(jnp.maximum, code)
        val = (scan & np.uint64(0xFFFFFFFF)).astype(jnp.int32)
        val = jnp.where((scan >> np.uint64(32)) == seg.astype(jnp.uint64),
                        val, 0)
        return jnp.where(val > 0, val - 1, NONE)

    prev_c = [prev_occ(s_ch == c) for c in range(4)]
    # exclusive variants (state BEFORE element i arrives)
    def excl(p):
        shifted = jnp.roll(p, 1).at[0].set(NONE)
        # a shifted value from the previous run must not leak: the roll
        # brings position i-1's value, valid only when same seg
        same = jnp.roll(seg, 1).at[0].set(-1) == seg
        return jnp.where(same, shifted, NONE)
    prev_c_excl = [excl(p) for p in prev_c]

    comp_of = [3, 2, 1, 0]
    sel = lambda arrs, key: (
        jnp.where(key == 0, arrs[0], jnp.where(key == 1, arrs[1],
                  jnp.where(key == 2, arrs[2], arrs[3]))))
    my_comp_excl = sel(prev_c_excl, 3 - s_ch)
    my_same_excl = sel(prev_c_excl, s_ch)

    # --- emissions ---
    # pair at i: partner = my_comp_excl
    emit_pair = s_valid & (my_comp_excl != NONE)
    # overwrite-half at i for previous same-channel element
    emit_ohalf = s_valid & (my_same_excl != NONE) & (my_comp_excl == NONE)
    ohalf_src = my_same_excl
    # flush at run end: channel c present, comp(c) absent; emits last c
    run_end = jnp.roll(new_run, -1).at[n - 1].set(True)
    flush = []
    for c in range(4):
        present = prev_c[c] != NONE
        comp_present = prev_c[comp_of[c]] != NONE
        flush.append(run_end & s_valid & present & ~comp_present)

    # --- pair field construction (in sorted space, then emit) ---
    sperm = perm  # sorted row -> original overlap row

    # full pairs: trigger element i, partner j. R1 side / R2 side by ch.
    j_part = jnp.clip(my_comp_excl, 0, n - 1)
    i_is_r1 = s_ch < 2
    a_sorted = jnp.where(i_is_r1, idx, j_part)       # R1-side sorted idx
    b_sorted = jnp.where(i_is_r1, j_part, idx)       # R2-side sorted idx
    ra = sperm[a_sorted]
    rb = sperm[b_sorted]
    # orientation flag of _make_pair: True when the trigger is R2
    orient = ~i_is_r1
    # lengths are per READ: map overlap row -> read id first (indexing
    # read_lengths by the overlap row only coincides when every read has
    # the same length and rows happen to stay in range)
    rmax = np.int32(read_lengths.shape[0] - 1)
    len_r2 = read_lengths[jnp.clip(read_id[rb], 0, rmax)]
    len_r1 = read_lengths[jnp.clip(read_id[ra], 0, rmax)]
    rel_a = rel_pos[ra]
    rel_b = rel_pos[rb]
    # uint32 wrap semantics via two's-complement int32 arithmetic (int64
    # vectors cannot lower on TPU)
    ins32 = jnp.where(orient, rel_b - rel_a + len_r2,
                      rel_a - rel_b + len_r1)
    ins_u32 = ins32.astype(jnp.uint32)
    pair_combined = score[ra] + score[rb]
    pair_entry = entry_id[rb]
    pair_rs = jnp.minimum(ref_begin[ra], ref_begin[rb])
    pair_re = jnp.maximum(ref_end[ra], ref_end[rb])

    def half_fields(src_sorted, treat_as_r1):
        r = sperm[jnp.clip(src_sorted, 0, n - 1)]
        return (jnp.where(treat_as_r1, r, NONE),
                jnp.where(treat_as_r1, NONE, r),
                score[r], entry_id[r], ref_begin[r], ref_end[r])

    # --- assemble emission slots: 6 per sorted element ---
    cap = 6 * n
    order = jnp.arange(n, dtype=jnp.int32) * 6

    slots_valid = []
    slots_key = []
    cols = {k: [] for k in ("r1", "r2", "sc", "en", "rs", "re", "ins")}

    def add_slot(valid_mask, key, r1c, r2c, sc, en, rs, re, insv):
        slots_valid.append(valid_mask)
        slots_key.append(key)
        cols["r1"].append(r1c)
        cols["r2"].append(r2c)
        cols["sc"].append(sc)
        cols["en"].append(en)
        cols["rs"].append(rs)
        cols["re"].append(re)
        cols["ins"].append(insv)

    zero_u32 = jnp.zeros(n, jnp.uint32)
    # overwrite-half (key 6i+0): source element's own channel decides side
    oh_is_r1 = s_ch < 2
    oh = half_fields(ohalf_src, oh_is_r1)
    add_slot(emit_ohalf, order + 0, *oh, zero_u32)
    # pair (key 6i+1)
    add_slot(emit_pair, order + 1,
             jnp.where(emit_pair, ra, NONE), jnp.where(emit_pair, rb, NONE),
             pair_combined, pair_entry, pair_rs, pair_re, ins_u32)
    # flush (keys 6i+2..5), channel order R2fwd(2), R2rc(3), R1fwd(0),
    # R1rc(1)
    for slot_off, c in zip((2, 3, 4, 5), (2, 3, 0, 1)):
        src = prev_c[c]
        fh = half_fields(src, c < 2)
        add_slot(flush[c], order + slot_off, *fh, zero_u32)

    def cat(xs):
        return jnp.concatenate(xs)

    v = cat(slots_valid)
    key = jnp.where(v, cat(slots_key), np.int32(2**31 - 1))
    # compact by order key (invalid to tail)
    key_sorted, pos = jax.lax.sort(
        (key, jnp.arange(cap, dtype=jnp.int32)), num_keys=1)
    take = lambda name: cat(cols[name])[pos]
    countv = jnp.sum(v.astype(jnp.int32))
    ok = key_sorted != np.int32(2**31 - 1)
    fill = lambda arr, default: jnp.where(ok, arr, default)
    return DevicePairs(
        r1_idx=fill(take("r1"), NONE), r2_idx=fill(take("r2"), NONE),
        combined_score=fill(take("sc"), 0), entry_id=fill(take("en"), 0),
        ref_start=fill(take("rs"), 0), ref_end=fill(take("re"), 0),
        insert_size=jnp.where(ok, take("ins"), 0), count=countv)
