"""Presorted, shardable canonical k-mer index over a genome database.

This replaces the reference's runtime strategy of appending genome k-mers to
the read k-mer vector and sorting the union (SLAM.h:63-66, KMer.h:388-398,
the ~50GB RAM peak).  The index is built offline, sorted once by k-mer
value, and persisted; at runtime read k-mers are merge-joined against it by
vectorized binary search (ops/match.py).

Layout (struct-of-arrays, device friendly):
  kmers    uint64 [M]   sorted ascending
  entry_id int32  [M]   genome entry (position in GenbankIndex.entries)
  offset   int32  [M]   forward k-mer start within the entry
  rc       bool   [M]   canonical form is the reverse complement

Sharding: `shard_bounds(num_shards)` returns contiguous k-mer range
boundaries so each device/host owns a slice; a read k-mer batch is joined
only against the shard(s) owning its value range (parallel/dist.py).
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from ..config import K, GENOME_KMER_GAP
from ..ops import kmers as kmer_ops
from .genbank import GenbankIndex


class KmerIndex:
    def __init__(self, kmers: np.ndarray, entry_id: np.ndarray,
                 offset: np.ndarray, rc: np.ndarray):
        self.kmers = kmers
        self.entry_id = entry_id
        self.offset = offset
        self.rc = rc

    def __len__(self) -> int:
        return len(self.kmers)

    @classmethod
    def build(cls, index: GenbankIndex,
              gap: int = GENOME_KMER_GAP) -> "KmerIndex":
        """Genome k-mers every `gap` bases (SLAM.h:65 uses gap = k/2)."""
        parts = []
        for i, entry in enumerate(index.entries):
            ascii_bytes = np.frombuffer(entry.bases.encode(), dtype=np.uint8)
            km, off, rc = kmer_ops.sequence_kmers_np(ascii_bytes, gap)
            parts.append((km, np.full(len(km), i, dtype=np.int32), off, rc))
        if parts:
            km = np.concatenate([p[0] for p in parts])
            eid = np.concatenate([p[1] for p in parts])
            off = np.concatenate([p[2] for p in parts])
            rc = np.concatenate([p[3] for p in parts])
        else:
            km = np.zeros(0, np.uint64)
            eid = off = np.zeros(0, np.int32)
            rc = np.zeros(0, bool)
        # Sort by k-mer value; ties by (rc desc, entry desc, offset desc) to
        # mirror the reference's ID_isFromGB_RC-descending tie order within
        # pileups (KMer.h:388-398).  Pair emission order is normalized again
        # by the overlap sort, so this only pins down determinism.
        order = np.lexsort((-off.astype(np.int64), -eid.astype(np.int64),
                            ~rc, km))
        return cls(km[order], eid[order], off[order], rc[order])

    # --- persistence ---

    def save(self, directory: str) -> None:
        os.makedirs(directory, exist_ok=True)
        np.savez(os.path.join(directory, "kmer_index.npz"),
                 kmers=self.kmers, entry_id=self.entry_id,
                 offset=self.offset, rc=self.rc)

    @classmethod
    def load(cls, directory: str) -> "KmerIndex":
        data = np.load(os.path.join(directory, "kmer_index.npz"))
        return cls(data["kmers"], data["entry_id"], data["offset"],
                   data["rc"].astype(bool))

    # --- sharding ---

    def shard_bounds(self, num_shards: int) -> np.ndarray:
        """Split points (by array position) giving near-equal shards that
        never split a run of equal k-mers (a pileup lives on one shard)."""
        bounds = [0]
        m = len(self.kmers)
        for s in range(1, num_shards):
            pos = (m * s) // num_shards
            # advance past the current equal-k-mer run
            while pos < m and pos > 0 and self.kmers[pos] == self.kmers[pos - 1]:
                pos += 1
            bounds.append(pos)
        bounds.append(m)
        return np.array(bounds, dtype=np.int64)

    def shard(self, bounds: np.ndarray, s: int) -> "KmerIndex":
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        return KmerIndex(self.kmers[lo:hi], self.entry_id[lo:hi],
                         self.offset[lo:hi], self.rc[lo:hi])
