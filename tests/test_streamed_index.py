"""Out-of-core index build vs the in-RAM build: identical arrays.

KmerIndex.build_streamed spills prefix buckets to disk and sorts per
bucket; prefix buckets never split a k-mer run, so the concatenated
result must equal KmerIndex.build bit-for-bit (same tie order).
"""

import numpy as np

from kslam_tpu.db.genbank import GenbankEntry, GenbankIndex
from kslam_tpu.db.kmer_index import KmerIndex


def _entries(rng, n, lo=200, hi=3000):
    bases4 = np.frombuffer(b"ACGT", dtype=np.uint8)
    out = []
    for _ in range(n):
        glen = int(rng.integers(lo, hi))
        out.append(bases4[rng.integers(0, 4, glen)])
    return out


def test_streamed_equals_in_ram(tmp_path):
    rng = np.random.default_rng(11)
    genomes = _entries(rng, 7)
    # duplicate a slice across entries so pileups span entries (the
    # bucket-boundary case the spill files must not split)
    genomes[3][:500] = genomes[0][:500]
    genomes[6][100:600] = genomes[0][:500]
    gindex = GenbankIndex(
        [GenbankEntry(bases=g.tobytes().decode()) for g in genomes])
    ram = KmerIndex.build(gindex)
    streamed = KmerIndex.build_streamed(
        ((i, g) for i, g in enumerate(genomes)),
        out_dir=str(tmp_path / "idx"), bucket_bits=3)
    assert len(ram) == len(streamed)
    np.testing.assert_array_equal(np.asarray(streamed.kmers), ram.kmers)
    np.testing.assert_array_equal(np.asarray(streamed.entry_id),
                                  ram.entry_id)
    np.testing.assert_array_equal(np.asarray(streamed.offset), ram.offset)
    np.testing.assert_array_equal(np.asarray(streamed.rc), ram.rc)
    # load() discovers the npy layout
    loaded = KmerIndex.load(str(tmp_path / "idx"))
    np.testing.assert_array_equal(np.asarray(loaded.kmers), ram.kmers)


def test_streamed_empty_and_tiny(tmp_path):
    streamed = KmerIndex.build_streamed(
        iter(()), out_dir=str(tmp_path / "empty"), bucket_bits=2)
    assert len(streamed) == 0
    rng = np.random.default_rng(1)
    g = _entries(rng, 1, lo=40, hi=60)[0]
    gindex = GenbankIndex([GenbankEntry(bases=g.tobytes().decode())])
    ram = KmerIndex.build(gindex)
    streamed = KmerIndex.build_streamed(
        [(0, g)], out_dir=str(tmp_path / "tiny"), bucket_bits=2)
    np.testing.assert_array_equal(np.asarray(streamed.kmers), ram.kmers)
