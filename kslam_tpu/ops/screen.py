"""Host-read and low-complexity screening, vectorized on device.

TPU-native rebuild of the reference's KMerLookupTable subsystem
(KMerLookupTable.h): a k=16 membership structure over host-genome k-mers,
per-position lookups along each read, greedy chain detection, and the
two-chain host decision rule.  The reference's 2^32-bit table + pointer
scan become either a bitset-word gather or a sorted-array binary search
(db/host_table.py chooses), and the sequential chain scan becomes a
log-depth strided run-length computation -- no per-read loops anywhere.

Behavioral contract mirrored exactly:
  * every read position is looked up with the canonical min(fwd, rc)
    16-mer (KMerLookupTable.h:98-111),
  * chains = greedy strided runs: scanning ascending, a found position
    starts a chain unless consumed by a chain `gap` earlier; runs shorter
    than 3 are discarded (KMerLookupTable.h:116-143),
  * isHost: longest chain >= cutoff, else the two longest chains must not
    overlap (end = start + len*8 + 7 -- the reference hardcodes 8
    regardless of `gap`; we reproduce that quirk) and their combined
    length must reach secondaryCutoff (KMerLookupTable.h:149-161,204-215),
  * low-complexity reads are never host-screened, and low-complexity =
    distinct-3mer count below cutoff (KMer.h:286-301, forward 3-mers at
    every position i >= 2),
  * per-read linear cutoff models from labelHostReads
    (KMerLookupTable.h:257-270): gap 8, cutoff floor(.09*len+1.1),
    secondary floor(.082*len+3.04), complexity floor(.1*len+26).

Chain ties: the reference sorts chains with an unstable std::sort by
length only, leaving tie order unspecified; we deterministically prefer
the smaller start position.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import encode

K16 = 16


def kmer16_canonical(codes, lengths):
    """Canonical (min of fwd/rc) 16-mers at every position.

    Args: codes uint32-compatible [N, L] 2-bit base codes; lengths [N].
    Returns (kmer uint32 [N, W], valid bool [N, W]), W = L-15.
    """
    c = codes.astype(jnp.uint32)
    n, l = c.shape
    w = l - K16 + 1
    fwd = jnp.zeros((n, w), jnp.uint32)
    rev = jnp.zeros((n, w), jnp.uint32)
    rc = c ^ np.uint32(2)
    for t in range(K16):
        fwd = (fwd << np.uint32(2)) | c[:, t:t + w]
        rev = rev | (rc[:, t:t + w] << np.uint32(2 * t))
    start = jnp.arange(w, dtype=jnp.int32)[None, :]
    valid = (start + K16) <= lengths[:, None]
    return jnp.minimum(fwd, rev), valid


def distinct_3mer_count(codes, lengths):
    """Distinct forward 3-mers per read (KMer.h:286-301)."""
    c = codes.astype(jnp.int32)
    n, l = c.shape
    ids = (c[:, :-2] << 4) | (c[:, 1:-1] << 2) | c[:, 2:]
    pos = jnp.arange(l - 2, dtype=jnp.int32)[None, :]
    ok = (pos + 3) <= lengths[:, None]
    onehot = (ids[:, :, None] == jnp.arange(64, dtype=jnp.int32)) & \
        ok[:, :, None]
    return jnp.sum(jnp.any(onehot, axis=1), axis=1).astype(jnp.int32)


def table_lookup_sorted(kmers, table_sorted):
    """Membership via binary search in a sorted unique uint32 array."""
    i = jnp.searchsorted(table_sorted, kmers.reshape(-1)).astype(jnp.int32)
    i = jnp.clip(i, 0, max(table_sorted.shape[0] - 1, 0))
    hit = table_sorted[i] == kmers.reshape(-1)
    if table_sorted.shape[0] == 0:
        hit = jnp.zeros_like(hit)
    return hit.reshape(kmers.shape)


def table_lookup_bitset(kmers, words):
    """Membership via 2^32-bit table stored as uint32 words [2^27]."""
    flat = kmers.reshape(-1)
    word = words[(flat >> np.uint32(5)).astype(jnp.int64)]
    bit = (word >> (flat & np.uint32(31))) & np.uint32(1)
    return (bit == 1).reshape(kmers.shape)


def chain_top2(found, gap: int):
    """Greedy strided chains; returns the two longest (len, start) per read.

    found: bool [N, W].  Chains shorter than 3 are dropped (len 0 output).
    """
    n, w = found.shape
    f = found.astype(jnp.int32)
    # run length at each position along stride `gap`:
    #   len[i] = found[i] ? 1 + len[i+gap] : 0, log-depth doubling
    run = f  # invariant: run[i] = min(true_len[i], t) after each step
    t = 1
    while t * gap < w:
        shifted = jnp.zeros_like(run)
        shifted = shifted.at[:, : w - t * gap].set(run[:, t * gap:])
        run = run + jnp.where(run == t, shifted, 0)
        t *= 2
    # chain heads: found[i] and not consumed by a found at i-gap
    prev = jnp.zeros_like(found)
    prev = prev.at[:, gap:].set(found[:, :-gap])
    head = found & ~prev
    length = jnp.where(head & (run >= 3), run, 0)
    # top-2 by (length desc, start asc): pack key = len*2^16 + (2^16-1-start)
    start = jnp.arange(w, dtype=jnp.int32)[None, :]
    key = jnp.where(length > 0, (length << 16) + (65535 - start), 0)
    k1 = jnp.max(key, axis=1)
    key2 = jnp.where(key == k1[:, None], 0, key)
    k2 = jnp.max(key2, axis=1)

    def unpack(k):
        ln = k >> 16
        st = jnp.where(ln > 0, 65535 - (k & 65535), 0)
        return ln, st
    l1, s1 = unpack(k1)
    l2, s2 = unpack(k2)
    return l1, s1, l2, s2


@functools.partial(jax.jit, static_argnames=("gap", "lookup_kind"))
def screen_reads(bases, lengths, table, gap: int = 8,
                 lookup_kind: str = "sorted"):
    """Batched labelHostReads + labelLowComplexityReads decisions.

    Args:
      bases: uint8 ASCII [N, L]; lengths int32 [N].
      table: sorted uint32 [M] (lookup_kind="sorted") or uint32 words
        [2^27] (lookup_kind="bitset").
    Returns (is_host bool [N], num_distinct_3mers int32 [N]).
    """
    codes = encode.kmer_codes(bases)
    n3 = distinct_3mer_count(codes, lengths)
    flen = lengths.astype(jnp.float32)
    cutoff = jnp.floor(0.09 * flen + 1.1).astype(jnp.int32)
    secondary = jnp.floor(0.082 * flen + 3.04).astype(jnp.int32)
    complexity = jnp.floor(0.1 * flen + 26).astype(jnp.int32)

    k16, valid = kmer16_canonical(codes, lengths)
    if lookup_kind == "bitset":
        found = table_lookup_bitset(k16, table) & valid
    else:
        found = table_lookup_sorted(k16, table) & valid

    l1, s1, l2, s2 = chain_top2(found, gap)
    e1 = s1 + l1 * 8 + 7          # reference hardcodes 8 (not gap)
    e2 = s2 + l2 * 8 + 7
    primary = (l1 > 0) & (l1 >= cutoff)
    no_overlap = ~((s1 <= e2) & (s2 <= e1))
    two_chain = (l2 > 0) & ((l1 + l2) >= secondary) & no_overlap
    low_complexity = n3 < complexity
    too_short = lengths < K16
    is_host = ~low_complexity & ~too_short & (primary | two_chain)
    return is_host, n3


def label_host_reads(batch, table, lookup_kind: str = "sorted"):
    """Host-side wrapper: is_host mask for a ReadBatch (the caller removes
    flagged reads, mirroring KMerLookupTable.h:262-270)."""
    is_host, _ = screen_reads(jnp.asarray(batch.bases),
                              jnp.asarray(batch.lengths),
                              table, gap=8, lookup_kind=lookup_kind)
    return np.asarray(is_host)


def label_low_complexity_reads(batch, cutoff: int):
    """Low-complexity flags at a fixed cutoff (KMerLookupTable.h:280-298;
    flags only, no removal -- the reference's removal is commented out)."""
    codes = encode.kmer_codes(jnp.asarray(batch.bases))
    n3 = distinct_3mer_count(codes, jnp.asarray(batch.lengths))
    return np.asarray(n3 < cutoff)
