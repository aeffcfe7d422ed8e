"""Native C++ FASTQ parser (csrc/fastq_parser.cc) parity vs pure Python."""

import numpy as np
import pytest

from kslam_tpu.io import fastq, native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native host library not built")


@pytest.fixture
def fixture_fastq(tmp_path):
    rng = np.random.default_rng(3)
    bases4 = "ACGT"
    r1 = tmp_path / "r1.fq"
    r2 = tmp_path / "r2.fq"
    with open(r1, "w") as f1, open(r2, "w") as f2:
        for i in range(23):
            l = int(rng.integers(30, 150))
            s = "".join(rng.choice(list(bases4), l))
            q = "I" * l
            # exercise identifier quirks: spaces, /1 suffixes, CRLF
            f1.write(f"@read{i}/1 descr text\n{s}\n+\n{q}\n")
            f2.write(f"@read{i}/2 other\r\n{s}\r\n+\r\n{q}\r\n")
    return str(r1), str(r2)


def _python_batches(r1, r2, chunk):
    h1 = open(r1)
    h2 = open(r2) if r2 else None
    out = []
    while True:
        b = fastq.read_batch_from_handles(h1, h2, chunk, pad_len=160)
        if not b.num_reads:
            break
        out.append(b)
    return out


@pytest.mark.parametrize("chunk", [5, 23, 100])
def test_native_python_parity_paired(fixture_fastq, chunk):
    r1, r2 = fixture_fastq
    a = list(fastq.stream_read_batches_native(r1, r2, chunk, pad_len=160))
    b = _python_batches(r1, r2, chunk)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert list(x.names) == list(y.names)
        np.testing.assert_array_equal(x.lengths, y.lengths)
        np.testing.assert_array_equal(x.bases, y.bases)
        np.testing.assert_array_equal(x.quality, y.quality)
        assert x.paired == y.paired


def test_native_single_end_and_num_reads(fixture_fastq):
    r1, _ = fixture_fastq
    batches = list(fastq.stream_read_batches_native(r1, None, 100,
                                                    max_total_reads=7,
                                                    pad_len=160))
    assert sum(b.num_reads for b in batches) == 7


def test_native_write_roundtrip(fixture_fastq, tmp_path):
    r1, _ = fixture_fastq
    (batch,) = list(fastq.stream_read_batches_native(r1, None, 100,
                                                     pad_len=160))
    out = tmp_path / "out.fq"
    fastq.write_fastq(str(out), batch)
    (again,) = list(fastq.stream_read_batches_native(str(out), None, 100,
                                                     pad_len=160))
    assert list(again.names) == list(batch.names)
    np.testing.assert_array_equal(again.bases, batch.bases)


def test_lazy_names():
    raw = np.zeros((3, 8), np.uint8)
    for i, s in enumerate([b"abc", b"de", b""]):
        raw[i, :len(s)] = np.frombuffer(s, np.uint8)
    ln = fastq.LazyNames(raw)
    assert len(ln) == 3
    assert ln[0] == "abc" and ln[2] == ""
    assert ln[:2] == ["abc", "de"]
    assert list(ln + ["x"]) == ["abc", "de", "", "x"]
