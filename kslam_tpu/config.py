"""Global configuration, mirroring the reference's Globals.h + CLI defaults.

Reference: /root/reference/src/Globals.h:23-42 (compile-time k=32, uint64
k-mers, SW penalty globals) and main.cpp:36-82 (CLI defaults: match=2,
mismatch=3, gapOpen=5, gapExtend=2, score-fraction 0.95, 10 SAM alignments,
10M reads per chunk).
"""

from __future__ import annotations

import dataclasses

# Compile-time constants (Globals.h:23-25).
K = 32                      # k-mer length
GENOME_KMER_GAP = K // 2    # genome k-mer stride (SLAM.h:65)
READ_KMER_GAP = 1           # read k-mer stride (KMer.h:378)


@dataclasses.dataclass(frozen=True)
class SWParams:
    """Smith-Waterman scoring parameters (main.cpp:45-52 defaults)."""
    match: int = 2
    mismatch: int = 3       # positive penalty
    gap_open: int = 5       # positive penalty, charged on first gap base
    gap_extend: int = 2     # positive penalty


@dataclasses.dataclass
class PipelineConfig:
    """Runtime configuration (Globals.h:27-42, main.cpp:36-82)."""
    sw: SWParams = dataclasses.field(default_factory=SWParams)
    score_threshold: int = 0            # --min-alignment-score
    score_fraction_threshold: float = 0.95  # --score-fraction-threshold
    num_sam_alignments: int = 10        # --num-alignments
    perform_pseudo_assembly: bool = True  # not --no-pseudo-assembly
    report_cigar: bool = False          # forced True when --sam-file set
    paired_data: bool = True
    sam_xa: bool = False                # --sam-xa
    just_align: bool = False            # --just-align
    num_reads_at_once: int = 10_000_000  # --num-reads-at-once
    num_reads: int = 0xFFFFFFFF         # --num-reads
    command_line: str = ""
    host_screen_dir: str = ""           # --host-screen: host-table dir; the
                                        # reference capability is dormant
                                        # (KMerLookupTable.h, SLAM.h:270-325)
    low_complexity_cutoff: int = 0      # --low-complexity-cutoff: flag reads
                                        # with < N distinct 3-mers
    resume: bool = False                # --resume: continue a checkpointed
                                        # run from its chunk cursor

    # TPU-specific execution knobs (no reference equivalent).
    read_batch: int = 65536             # reads per device batch (padded)
    max_read_len: int = 160             # padded read length bucket
    sw_batch: int = 1 << 15             # dense post-compaction SW set size
    pair_cap: int = 0                   # pair-emission compaction cap
                                        # (0 = auto: 2 * sw_batch)
    device_pipeline: str = "auto"       # "on"/"off"/"auto": full-device
                                        # batch path (auto = TPU only)
    mesh_shape: str = ""                # --mesh DxS: multi-chip
                                        # Mesh("data","index") phase A
                                        # (parallel/dist.py); "" = 1 chip
    genome_sharded: bool = False        # --shard-genomes: partition the
                                        # genome codes by entry range over
                                        # the index axis (entry-owner SW)
    chunk_overlap: bool = True          # --no-chunk-overlap: disable the
                                        # one-chunk software pipeline (two
                                        # chunks' phase-A buffers live at
                                        # once); off = sequential chunks,
                                        # lower peak HBM (ADVICE r3)
    prefix_rows: bool = True            # --no-prefix-rows: skip the 2x
                                        # join-row copy of the k-mer index
                                        # in HBM (slower join, more
                                        # headroom for huge databases)
    max_matches_per_kmer: int = 64      # index-join fanout cap per read k-mer
    max_pairs_per_batch: int = 1 << 19  # capacity of the expanded overlap
                                        # set; every capacity drop triggers
                                        # the emit-all exact-size retry
                                        # (pipeline/run.py), so a lean
                                        # default costs a rare re-dispatch
                                        # instead of sorting 4M mostly-empty
                                        # rows per batch (the old 1<<22 cost
                                        # ~4x the whole phase A)
    dedup_group_cap: int = 128          # seeds per (read, entry) group for
                                        # the chained dedup scan
