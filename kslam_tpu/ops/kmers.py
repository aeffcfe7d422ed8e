"""Canonical k-mer extraction: device (reads, hot path) and host (index build).

Semantics mirror KMer.h:
  * 2-bit codes A=0 C=1 T=2 G=3, non-ACGT encodes as A (KMer.h:246-266),
  * k-mer integer: first base in the high bits (KMer.h:27),
  * canonicalization emits min(kmer, rc_kmer); ties (palindromes) take the
    RC branch (KMer.h:173-177: `kMer < rckMer ? fwd : rc`),
  * offset semantics (KMer.h:140-158): for reads the RC-canonical k-mer
    stores its offset within reverseComplement(read) = len - start - k;
    for genome entries the offset is always the forward k-mer start.

The reference concatenates read+genome k-mers and sorts the union
(SLAM.h:63-66).  Here genome k-mers go into a *presorted static index*
(db/kmer_index.py) and read k-mers are joined against it by binary search
(ops/match.py) -- no runtime mega-sort.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import K
from . import encode


def read_kmers_device(ascii_bases, lengths):
    """All-position canonical k-mers for a padded read batch.

    Args:
      ascii_bases: uint8 [N, L] raw ASCII (zero padded).
      lengths: int32 [N].
    Returns:
      kmer:   uint64 [N, L-K+1] canonical k-mers
      offset: int32  [N, L-K+1] reference offset semantics (RC-space for
              RC-canonical read k-mers)
      rc:     bool   [N, L-K+1] canonical form is the reverse complement
      valid:  bool   [N, L-K+1] window fully inside the read
    """
    codes = encode.kmer_codes(ascii_bases).astype(jnp.uint64)  # [N, L]
    n, l = codes.shape
    w = l - K + 1
    if w <= 0:
        raise ValueError(f"padded read length {l} < K={K}")
    fwd = jnp.zeros((n, w), dtype=jnp.uint64)
    rev = jnp.zeros((n, w), dtype=jnp.uint64)
    rc_codes = codes ^ np.uint64(2)
    for t in range(K):
        fwd = (fwd << np.uint64(2)) | codes[:, t:t + w]
        rev = rev | (rc_codes[:, t:t + w] << np.uint64(2 * t))
    start = jnp.arange(w, dtype=jnp.int32)[None, :]
    lengths = lengths[:, None]
    valid = (start + K) <= lengths
    rc = fwd >= rev
    kmer = jnp.where(rc, rev, fwd)
    offset = jnp.where(rc, lengths - start - K, start).astype(jnp.int32)
    return kmer, offset, rc, valid


def sequence_kmers_np(ascii_bytes: np.ndarray, gap: int):
    """Host canonical k-mers of one sequence with stride `gap` (index build).

    Returns (kmer u64 [M], offset i32 [M], rc bool [M]); offsets are forward
    k-mer starts (genome semantics, KMer.h:152-155).
    """
    codes = encode.kmer_codes_np(ascii_bytes).astype(np.uint64)
    l = len(codes)
    if l < K:
        return (np.zeros(0, np.uint64), np.zeros(0, np.int32),
                np.zeros(0, bool))
    starts = np.arange(0, l - K + 1, gap, dtype=np.int64)
    fwd = np.zeros(len(starts), dtype=np.uint64)
    rev = np.zeros(len(starts), dtype=np.uint64)
    rc_codes = codes ^ np.uint64(2)
    for t in range(K):
        fwd = (fwd << np.uint64(2)) | codes[starts + t]
        rev = rev | (rc_codes[starts + t] << np.uint64(2 * t))
    rc = fwd >= rev
    kmer = np.where(rc, rev, fwd)
    return kmer, starts.astype(np.int32), rc


def kmer_string(kmer: int) -> str:
    """Decompress a k-mer integer to its string (KMer.h:336-351)."""
    return "".join("ACTG"[(int(kmer) >> (2 * (K - 1 - i))) & 3]
                   for i in range(K))
