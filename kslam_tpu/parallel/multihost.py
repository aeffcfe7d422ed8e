"""Multi-host execution: chunk-parallel classification over jax.distributed.

The reference is strictly single-node shared-memory (SURVEY.md section 2.2);
scale-out is new capability.  The production layout:

  * WITHIN a host: the full-device batch pipeline (pipeline/run.py
    process_batch_device); with >1 local chip the k-mer index is
    range-sharded over them via a local Mesh("data","index")
    (parallel/dist.py make_sharded_phase_a), so a v5p host holds the full
    RefSeq bacteria+viruses index across its 4 chips' HBM (~20GB sorted
    k-mers + genome codes).  --device-pipeline off falls back to the
    host object pipeline.
  * ACROSS hosts: pure data parallelism over FASTQ chunks.  Process p of P
    takes chunks p, p+P, p+2P, ... of the --num-reads-at-once stream (the
    same chunk loop as single-host, SLAM.h:194-251, strided).  No
    cross-host traffic during alignment.
  * MERGE: per-chunk per-read taxonomies are serialized and all-gathered
    to process 0 (host data rides the ICI/DCN via a uint8 all-gather),
    which writes the combined XML/TSV outputs.  SAM output goes to
    per-process files `<sam>.partN`.

Usage (one command per host):
  python -m kslam_tpu.cli ... --coordinator HOST:PORT --num-processes P \
      --process-id N
"""

from __future__ import annotations

import pickle
from typing import List, Optional

import numpy as np

from ..utils.logging import log


def initialize(coordinator: str, num_processes: int, process_id: int) -> None:
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    log(f"distributed: process {process_id}/{num_processes}, "
        f"{jax.local_device_count()} local / {jax.device_count()} "
        f"global devices")


def gather_objects(objs: List, axis_name_unused: str = "hosts") -> List:
    """All-gathers a list of picklable objects across processes; returns
    the concatenated list (same order on every process: by process id)."""
    import jax
    if jax.process_count() == 1:
        return list(objs)
    from jax.experimental import multihost_utils
    payload = np.frombuffer(pickle.dumps(objs), dtype=np.uint8)
    # 1) agree on per-process sizes, 2) pad to the max and gather bytes
    sizes = multihost_utils.process_allgather(
        np.array([payload.size], dtype=np.int64))
    sizes = np.asarray(sizes).reshape(-1)
    cap = int(sizes.max())
    padded = np.zeros(cap, dtype=np.uint8)
    padded[: payload.size] = payload
    blobs = np.asarray(multihost_utils.process_allgather(padded))
    blobs = blobs.reshape(jax.process_count(), cap)
    out: List = []
    for p in range(jax.process_count()):
        out.extend(pickle.loads(blobs[p, : int(sizes[p])].tobytes()))
    return out


def gather_sum(value: int) -> int:
    import jax
    if jax.process_count() == 1:
        return int(value)
    from jax.experimental import multihost_utils
    vals = multihost_utils.process_allgather(
        np.array([value], dtype=np.int64))
    return int(np.asarray(vals).sum())


def strided_chunks(batches, process_id: int, num_processes: int):
    """Process p consumes chunks p, p+P, ... of the chunk stream."""
    for i, batch in enumerate(batches):
        if i % num_processes == process_id:
            yield i, batch


def concat_sam_parts(sam_path: str, num_parts: int) -> None:
    """Merge per-process `<sam>.partN` files into one SAM at sam_path:
    part 0 verbatim (it carries the header), later parts with their
    header (@-prefixed) lines stripped -- one @HD/@SQ/@PG block total,
    like the reference's single-process output (SAM.h:513-531)."""
    import os
    with open(sam_path, "wb") as out:
        for p in range(num_parts):
            part = f"{sam_path}.part{p}"
            with open(part, "rb") as fh:
                for line in fh:
                    if p > 0 and line.startswith(b"@"):
                        continue
                    out.write(line)
            os.remove(part)


def metagenomic_analysis_distributed(r1_path: str, r2_path: Optional[str],
                                     database_dir: str, out_path: str,
                                     sam_path: str, config) -> None:
    """Distributed variant of pipeline.run.metagenomic_analysis."""
    import jax
    from ..db.genbank import GenbankIndex
    from ..db.kmer_index import KmerIndex
    from ..db.taxonomy import TaxonomyDB
    from ..golden.ssw import check_params
    from ..io import sam as sam_io
    from ..io import xml_results
    from ..io.fastq import stream_read_batches
    from ..pipeline import align, classify
    from ..pipeline.run import process_batch, process_batch_device

    pid, nproc = jax.process_index(), jax.process_count()
    check_params(config.sw)
    config.paired_data = bool(r2_path)
    taxdb = TaxonomyDB.read_index(f"{database_dir}/taxDB") \
        if not config.just_align else TaxonomyDB()
    gindex = GenbankIndex.load(database_dir)
    kidx = KmerIndex.load(database_dir)
    db = align.DeviceDB.from_index(gindex, kidx)

    # every host runs the device pipeline on its LOCAL chips: the k-mer
    # index is range-sharded over them via a local (data=1, index=L) mesh
    # (so a DB bigger than one chip's HBM still fits per host) unless the
    # user pins a mesh shape or disables the device path
    use_device = config.device_pipeline != "off"
    mesh = sharded_db = None
    entry_taxids = lca_tables = None
    if use_device:
        import numpy as _np
        import jax.numpy as jnp
        from ..ops import encode, lca as lca_ops
        from . import dist
        local = jax.local_devices()
        if config.mesh_shape:
            d_axis, s_axis = (int(x) for x in config.mesh_shape.split("x"))
        else:
            d_axis, s_axis = 1, len(local)
        if d_axis * s_axis > 1:
            mesh = dist.build_mesh(local[:d_axis * s_axis],
                                   data=d_axis, index=s_axis)
            sharded_db = dist.place_sharded_db(
                mesh, kidx, encode.sw_codes_np(gindex.bases_concat),
                gindex.entry_offsets,
                genome_sharded=config.genome_sharded)
            log(f"[p{pid}] local mesh (data={d_axis}, index={s_axis})")
        entry_taxids = jnp.asarray(gindex.taxonomy_ids.astype(_np.int32))
        lca_tables = lca_ops.build_device_tables(taxdb)

    sam_file = None
    if sam_path:
        config.report_cigar = True
        suffix = f".part{pid}" if nproc > 1 else ""
        sam_file = open(sam_path + suffix, "w")
        sam_file.write(sam_io.sam_header(gindex, config.command_line))

    # identified: list of (chunk_index, block) where a block is a compact
    # columnar ChunkTaxa (device path without SAM) or a list of per-read
    # IdentifiedTaxonomy objects (host/SAM paths).  ChunkTaxa blocks keep
    # the cross-process merge O(names + taxid array) -- megabytes at 10M
    # reads -- instead of pickling per-read objects (VERDICT r3 weak #3).
    identified: List = []
    local_reads = 0
    stream = stream_read_batches(r1_path, r2_path, config.num_reads_at_once,
                                 config.num_reads,
                                 pad_len=config.max_read_len)
    for chunk_i, batch in strided_chunks(stream, pid, nproc):
        local_reads += batch.midpoint if batch.paired else batch.num_reads
        columnar = use_device and not sam_file and not config.just_align
        if use_device:
            result = process_batch_device(
                batch, db, config, entry_taxids, lca_tables,
                mesh=mesh, sharded_db=sharded_db,
                want_objects=not columnar)
            reads_and_pairs = None if columnar else result
        else:
            reads_and_pairs = process_batch(batch, db, config)
        if sam_file:
            from ..pipeline.run import _fill_cigars
            _fill_cigars(reads_and_pairs, batch, gindex, config)
            for read in reads_and_pairs:
                sam_io.write_sam_pairs(sam_file, read, batch, gindex, config)
        if not config.just_align:
            if columnar:
                identified.append((chunk_i, classify.chunk_taxa_from_device(
                    result, batch.names, gindex)))
            else:
                identified.append(
                    (chunk_i, classify.convert_alignments_to_taxonomies(
                        reads_and_pairs, gindex, batch.names, taxdb)))
        log(f"[p{pid}] processed {local_reads} reads")
    if sam_file:
        sam_file.close()
    if config.just_align:
        if sam_path and nproc > 1:
            gather_sum(0)      # barrier: every process closed its part
            if pid == 0:
                concat_sam_parts(sam_path, nproc)
        return

    # gather compact blocks, restore global chunk order (processes hold
    # strided chunks, so a plain by-process concat would interleave them
    # out of stream order)
    n_blk = sum(1 for _, b in identified
                if isinstance(b, classify.ChunkTaxa))
    log(f"[p{pid}] gathering {n_blk}/{len(identified)} columnar blocks")
    gathered = gather_objects(identified)
    gathered.sort(key=lambda t: t[0])
    all_identified: List = []
    for _, block in gathered:
        if isinstance(block, classify.ChunkTaxa):
            all_identified.append(block)
        else:
            all_identified.extend(block)
    total_reads = gather_sum(local_reads)
    if sam_path and nproc > 1 and pid == 0:
        concat_sam_parts(sam_path, nproc)
    if pid == 0:
        with open(out_path + "_PerRead", "w") as per_read:
            xml_results.write_per_read_results(all_identified, per_read)
        combined = classify.combine_taxonomies(all_identified)
        with open(out_path, "w") as out:
            xml_results.write_results(combined, out, taxdb, total_reads)
        xml_results.write_abbreviated_results(
            combined, out_path + "_abbreviated", taxdb, total_reads)
    log("Done")
