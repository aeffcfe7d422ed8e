"""kslam-tpu: a TPU-native metagenomic classification engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of k-SLAM
(reference: /root/reference, aindj/k-SLAM): align FASTQ reads against a
microbial genome database via canonical k-mer seeding, validate candidates
with batched Smith-Waterman on TPU, chain alignments into pseudo-assemblies,
and assign taxa by LCA over the NCBI taxonomy.

Architecture (TPU-first, not a port):
  * reads/genomes are device-resident columnar tensors (uint8 base codes),
  * the reference's runtime mega-sort (SLAM.h:63-66) is replaced by a
    presorted static k-mer index + vectorized searchsorted merge-join,
  * ssw.c's SSE2 striped Smith-Waterman is replaced by a batched
    column-scan SW with a lazy-F prefix-max formulation (JAX + Pallas),
  * LCA pointer-chasing (TaxonomyDatabase.h:185) is replaced by vectorized
    walks over parent/depth int32 tables,
  * scale-out is a jax.sharding Mesh ("data" x "index"): read batches are
    data-parallel, the k-mer index is sharded by k-mer range.
"""

import os

import jax

# k=32 canonical k-mers live in uint64; TPUs emulate 64-bit integers, which
# is fine for the join (compare/gather bound).  Enable x64 once, centrally.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the pipeline is a small set of static-shape
# programs; caching makes repeat runs (and the test suite) start instantly.
_cache_dir = os.environ.get("KSLAM_JAX_CACHE",
                            os.path.expanduser("~/.cache/kslam_jax"))


def _cpu_tag() -> str:
    """Short host-CPU-feature tag.  XLA:CPU persists AOT results whose
    machine features are NOT part of jax's cache key; loading an entry
    compiled on a machine with different ISA extensions warns about (and
    can hit) SIGILL (seen in MULTICHIP_r04 logs).  Keying the cache
    directory by the host's cpuinfo flags keeps entries machine-local."""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    import hashlib
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform
    return platform.machine() or "unknown"


if _cache_dir:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_cache_dir, f"cpu-{_cpu_tag()}"))
    # On remote-compile backends (axon tunnel) the queue wait is not
    # attributed to compile time, so tiny programs (eager slices,
    # conversions) report <1s "compile" while costing minutes of queue --
    # there, cache everything (threshold 0).  On ordinary local backends
    # keep the 1.0s default so the cache holds only real programs instead
    # of growing ~unboundedly with every eager op (ADVICE r3).
    _remote_compile = (
        os.environ.get("KSLAM_CACHE_ALL", "") == "1"
        or "axon" in os.environ.get("JAX_PLATFORMS", "")
        or os.environ.get("PALLAS_AXON_REMOTE_COMPILE", "") == "1")
    if _remote_compile:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

__version__ = "0.1.0"
