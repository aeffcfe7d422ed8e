"""FASTQ input: stream reads into padded columnar batches.

Mirrors the reference's read model (FASTQsequence.h):
  * 4-line state machine (FASTQsequence.h:129-165), CRLF-safe
    (sequenceTools.h:45-73),
  * sequence identifier: strip leading '@', truncate at first space and at
    '/' (FASTQsequence.h:61-71),
  * paired loading appends all R2 reads after all R1 reads into one logical
    array, asserting equal counts (FASTQsequence.h:110-123); read i's mate
    is read i + midpoint,
  * chunked streaming: --num-reads-at-once semantics (SLAM.h:194-251).

TPU-facing representation: a ReadBatch of raw ASCII uint8 [N, Lmax] + length
vector; encoding to k-mer/SW codes happens on device (ops/encode.py).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional

import numpy as np


def _clean_identifier(seq_id: str) -> str:
    """FASTQsequence.h:61-71 (including the off-by-one 'spacePos--' quirk:
    the identifier keeps everything after '@' up to but not including the
    first space, then is truncated at the first '/')."""
    if len(seq_id) <= 1:
        return ""
    space = seq_id.find(" ")
    # C++: substr(1, spacePos-1) when a space exists (spacePos>0 pre-dec),
    # else substr(1, npos).  find()==0 cannot happen for '@'-prefixed ids.
    ident = seq_id[1:space] if space > 0 else seq_id[1:]
    slash = ident.find("/")
    if slash >= 0:
        ident = ident[:slash]
    return ident


class LazyNames:
    """List-like view over the native parser's [N, cap] name buffer that
    decodes identifiers on access; alignment-only runs never pay for
    materializing 10M Python strings per chunk."""

    __slots__ = ("_raw",)

    def __init__(self, raw: np.ndarray):
        self._raw = raw

    def __len__(self) -> int:
        return self._raw.shape[0]

    def __getitem__(self, i):
        if isinstance(i, slice):
            return [self[j] for j in range(*i.indices(len(self)))]
        row = self._raw[i]
        return bytes(row).split(b"\0", 1)[0].decode()

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    def __add__(self, other):
        if isinstance(other, LazyNames) and \
                self._raw.shape[1] == other._raw.shape[1]:
            return LazyNames(np.concatenate([self._raw, other._raw]))
        return list(self) + list(other)

    def __eq__(self, other):
        return list(self) == list(other)


@dataclasses.dataclass
class ReadBatch:
    """Columnar batch of reads (R1 block then R2 block when paired)."""
    names: List[str]
    bases: np.ndarray      # uint8 ASCII [N, Lmax], zero padded
    lengths: np.ndarray    # int32 [N]
    quality: np.ndarray    # uint8 ASCII [N, Lmax], zero padded
    paired: bool           # True => first half R1, second half R2

    @property
    def num_reads(self) -> int:
        return len(self.names)

    @property
    def midpoint(self) -> int:
        return self.num_reads // 2 if self.paired else self.num_reads

    def base_string(self, i: int) -> str:
        return self.bases[i, : self.lengths[i]].tobytes().decode()

    def quality_string(self, i: int) -> str:
        return self.quality[i, : self.lengths[i]].tobytes().decode()


def _read_fastq_records(fh, max_records: int):
    """Yields (id_line, bases, quality) tuples; 4-line state machine."""
    n = 0
    records = []
    while n < max_records:
        id_line = fh.readline()
        if not id_line:
            break
        bases = fh.readline()
        plus = fh.readline()
        quality = fh.readline()
        if not quality and not bases:
            break
        records.append((id_line.rstrip("\r\n"), bases.rstrip("\r\n"),
                        quality.rstrip("\r\n")))
        n += 1
    return records


def _records_to_arrays(records, pad_len: Optional[int]):
    names = [_clean_identifier(r[0]) for r in records]
    lengths = np.array([len(r[1]) for r in records], dtype=np.int32)
    lmax = int(lengths.max()) if len(records) else 0
    if pad_len is not None:
        if lmax > pad_len:
            raise ValueError(f"read length {lmax} exceeds pad bucket {pad_len}")
        lmax = pad_len
    bases = np.zeros((len(records), lmax), dtype=np.uint8)
    quality = np.zeros((len(records), lmax), dtype=np.uint8)
    for i, (_, b, q) in enumerate(records):
        bb = np.frombuffer(b.encode(), dtype=np.uint8)
        qq = np.frombuffer(q.encode(), dtype=np.uint8)
        bases[i, : len(bb)] = bb
        quality[i, : min(len(qq), lmax)] = qq[:lmax]
    return names, bases, lengths, quality


def read_batch_from_handles(r1_fh, r2_fh, max_reads: int,
                            pad_len: Optional[int] = None) -> ReadBatch:
    """One chunk: up to max_reads per file; R2 appended after R1."""
    rec1 = _read_fastq_records(r1_fh, max_reads)
    if r2_fh is None:
        names, bases, lengths, quality = _records_to_arrays(rec1, pad_len)
        return ReadBatch(names, bases, lengths, quality, paired=False)
    rec2 = _read_fastq_records(r2_fh, max_reads)
    if len(rec1) != len(rec2):
        raise RuntimeError("mismatch in R1 and R2 size")  # FASTQsequence.h:121
    names, bases, lengths, quality = _records_to_arrays(rec1 + rec2, pad_len)
    return ReadBatch(names, bases, lengths, quality, paired=True)


def _parse_chunk_native(lib, path: str, offset: "np.ndarray",
                        max_reads: int, pad_len: int, name_cap: int = 256):
    import ctypes
    bases = np.zeros((max_reads, pad_len), dtype=np.uint8)
    quality = np.zeros((max_reads, pad_len), dtype=np.uint8)
    lengths = np.zeros(max_reads, dtype=np.int32)
    names_buf = np.zeros(max_reads * name_cap, dtype=np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    n = lib.kslam_fastq_parse_chunk(
        path.encode(), offset.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int64)),
        max_reads, pad_len, bases.ctypes.data_as(u8p),
        quality.ctypes.data_as(u8p), lengths.ctypes.data_as(i32p),
        names_buf.ctypes.data_as(ctypes.c_char_p), name_cap)
    if n < 0:
        raise RuntimeError(f"native FASTQ parser failed on {path}")
    n = int(n)
    names = LazyNames(names_buf[: n * name_cap].reshape(n, name_cap))
    return names, bases[:n], lengths[:n], quality[:n]


def stream_read_batches_native(r1_path: str, r2_path: Optional[str],
                               reads_per_chunk: int,
                               max_total_reads: int = 0xFFFFFFFF,
                               pad_len: int = 160,
                               skip_reads: int = 0) -> Iterator[ReadBatch]:
    """Chunked streaming via the C++ parser (csrc/fastq_parser.cc); exact
    same record/identifier semantics as the Python path."""
    from . import native
    lib = native.get_lib()
    assert lib is not None
    off1 = np.zeros(1, dtype=np.int64)
    off2 = np.zeros(1, dtype=np.int64)
    while skip_reads > 0:  # resume: advance the byte cursors
        n = min(skip_reads, 1 << 20)
        n1, _, _, _ = _parse_chunk_native(lib, r1_path, off1, n, pad_len)
        if r2_path:
            _parse_chunk_native(lib, r2_path, off2, n, pad_len)
        if not n1:
            return
        skip_reads -= len(n1)
    served = 0
    while served < max_total_reads:
        want = min(reads_per_chunk, max_total_reads - served)
        n1, b1, l1, q1 = _parse_chunk_native(lib, r1_path, off1, want,
                                             pad_len)
        if r2_path is None:
            if not n1:
                break
            served += len(n1)
            yield ReadBatch(n1, b1, l1, q1, paired=False)
            continue
        n2, b2, l2, q2 = _parse_chunk_native(lib, r2_path, off2, want,
                                             pad_len)
        if len(n1) != len(n2):
            raise RuntimeError("mismatch in R1 and R2 size")
        if not n1:
            break
        served += len(n1)
        yield ReadBatch(n1 + n2, np.concatenate([b1, b2]),
                        np.concatenate([l1, l2]),
                        np.concatenate([q1, q2]), paired=True)


def stream_read_batches(r1_path: str, r2_path: Optional[str],
                        reads_per_chunk: int, max_total_reads: int = 0xFFFFFFFF,
                        pad_len: Optional[int] = None,
                        skip_reads: int = 0) -> Iterator[ReadBatch]:
    """Chunked streaming loader (SLAM.h:194-251 semantics).  Uses the
    native parser when built, else pure Python.  skip_reads fast-forwards
    past already-processed reads (checkpoint resume)."""
    if pad_len is not None:
        from . import native
        if native.available():
            yield from stream_read_batches_native(
                r1_path, r2_path, reads_per_chunk, max_total_reads, pad_len,
                skip_reads=skip_reads)
            return
    r1 = open(r1_path)
    r2 = open(r2_path) if r2_path else None
    while skip_reads > 0:
        n = min(skip_reads, 1 << 20)
        rec = _read_fastq_records(r1, n)
        if r2:
            _read_fastq_records(r2, n)
        if not rec:
            r1.close()
            if r2:
                r2.close()
            return
        skip_reads -= len(rec)
    served = 0
    try:
        while served < max_total_reads:
            want = min(reads_per_chunk, max_total_reads - served)
            batch = read_batch_from_handles(r1, r2, want, pad_len)
            if batch.num_reads == 0:
                break
            served += batch.midpoint if batch.paired else batch.num_reads
            yield batch
    finally:
        r1.close()
        if r2:
            r2.close()


def write_fastq(path: str, batch: ReadBatch) -> None:
    with open(path, "w") as out:
        for i in range(batch.num_reads):
            out.write(f"@{batch.names[i]}\n{batch.base_string(i)}\n+\n"
                      f"{batch.quality_string(i)}\n")
