"""Host/low-complexity screening parity vs a literal sequential oracle.

The oracle transcribes the reference algorithms (KMerLookupTable.h:95-215,
KMer.h:286-301) as plain Python over strings; ops/screen.py must agree on
random and planted-host reads for both table layouts.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from kslam_tpu.db.genbank import GenbankEntry, GenbankIndex
from kslam_tpu.db.host_table import HostTable, _canonical_16mers
from kslam_tpu.io.fastq import ReadBatch
from kslam_tpu.ops import screen

CODE = {"A": 0, "C": 1, "T": 2, "G": 3}


def _code(b):
    return CODE.get(b, 0)


def _canon16(s):
    fwd = rev = 0
    for t, b in enumerate(s):
        fwd = ((fwd << 2) | _code(b)) & 0xFFFFFFFF
        rev |= (_code(b) ^ 2) << (2 * t)
    return min(fwd, rev)


def _distinct3(s):
    seen = set()
    for i in range(len(s) - 2):
        seen.add(tuple(_code(c) for c in s[i:i + 3]))
    return len(seen)


def _oracle_is_host(bases, table_set, gap, cutoff, secondary, complexity):
    if _distinct3(bases) < complexity:
        return False
    if len(bases) < 16:
        return False
    found = [1 if _canon16(bases[i:i + 16]) in table_set else 0
             for i in range(len(bases) - 15)]
    chains = []
    for i in range(len(found)):
        if found[i]:
            length = 0
            j = i
            while j < len(found) and found[j]:
                length += 1
                found[j] = 0
                j += gap
            if length > 2:
                chains.append((i, length))
    chains.sort(key=lambda c: (-c[1], c[0]))
    if chains and chains[0][1] >= cutoff:
        return True
    if len(chains) < 2:
        return False
    (s1, l1), (s2, l2) = chains[0], chains[1]
    e1, e2 = s1 + l1 * 8 + 7, s2 + l2 * 8 + 7
    if l1 + l2 >= secondary and not (s1 <= e2 and s2 <= e1):
        return True
    return False


def _make_batch(reads, pad=160):
    n = len(reads)
    bases = np.zeros((n, pad), np.uint8)
    lengths = np.zeros(n, np.int32)
    for i, r in enumerate(reads):
        bases[i, :len(r)] = np.frombuffer(r.encode(), np.uint8)
        lengths[i] = len(r)
    return ReadBatch(names=[f"r{i}" for i in range(n)], bases=bases,
                     lengths=lengths, quality=np.full_like(bases, 73),
                     paired=False)


@pytest.fixture(scope="module")
def host_setup():
    rng = np.random.default_rng(21)
    bases4 = "ACGT"
    host = "".join(rng.choice(list(bases4), 3000))
    gindex = GenbankIndex([GenbankEntry(bases=host)])
    table = HostTable.build(gindex, gap=8, kind="sorted")
    reads = []
    # host reads: exact slices (long chains)
    for _ in range(10):
        p = int(rng.integers(0, 3000 - 150))
        reads.append(host[p:p + 150])
    # mutated host reads (partial chains)
    for _ in range(10):
        p = int(rng.integers(0, 3000 - 150))
        r = list(host[p:p + 150])
        for q in rng.integers(0, 150, 8):
            r[q] = bases4[int(rng.integers(0, 4))]
        reads.append("".join(r))
    # random reads (no chains)
    for _ in range(10):
        reads.append("".join(rng.choice(list(bases4), 150)))
    # low complexity read
    reads.append("ACACACACAC" * 15)
    # short read
    reads.append("ACGTACGTAC")
    return host, table, reads


def test_is_host_parity_sorted(host_setup):
    host, table, reads = host_setup
    table_set = set(int(k) for k in table.data)
    batch = _make_batch(reads)
    got, n3 = screen.screen_reads(jnp.asarray(batch.bases),
                                  jnp.asarray(batch.lengths),
                                  jnp.asarray(table.data), gap=8,
                                  lookup_kind="sorted")
    got = np.asarray(got)
    for i, r in enumerate(reads):
        sz = len(r)
        want = _oracle_is_host(
            r, table_set, 8, int(np.floor(0.09 * sz + 1.1)),
            int(np.floor(0.082 * sz + 3.04)), int(np.floor(0.1 * sz + 26)))
        assert got[i] == want, f"read {i}: got {got[i]} want {want}"
    # sanity: exact host slices screened, random reads kept
    assert got[:10].all()
    assert not got[20:30].any()


def test_distinct_3mers_parity(host_setup):
    _, _, reads = host_setup
    batch = _make_batch(reads)
    from kslam_tpu.ops import encode
    n3 = screen.distinct_3mer_count(
        encode.kmer_codes(jnp.asarray(batch.bases)),
        jnp.asarray(batch.lengths))
    for i, r in enumerate(reads):
        assert int(n3[i]) == _distinct3(r), r


def test_bitset_matches_sorted(host_setup):
    host, table, reads = host_setup
    gindex = GenbankIndex([GenbankEntry(bases=host)])
    bt = HostTable.build(gindex, gap=8, kind="bitset")
    batch = _make_batch(reads)
    a, _ = screen.screen_reads(jnp.asarray(batch.bases),
                               jnp.asarray(batch.lengths),
                               jnp.asarray(table.data), gap=8,
                               lookup_kind="sorted")
    b, _ = screen.screen_reads(jnp.asarray(batch.bases),
                               jnp.asarray(batch.lengths),
                               jnp.asarray(bt.data), gap=8,
                               lookup_kind="bitset")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_host_table_roundtrip(tmp_path, host_setup):
    host, table, _ = host_setup
    table.save(str(tmp_path))
    loaded = HostTable.load(str(tmp_path))
    assert loaded.kind == table.kind
    np.testing.assert_array_equal(loaded.data, table.data)


def test_label_wrappers(host_setup):
    host, table, reads = host_setup
    batch = _make_batch(reads)
    mask = screen.label_host_reads(batch, jnp.asarray(table.data))
    assert mask[:10].all() and not mask[20:30].any()
    lc = screen.label_low_complexity_reads(batch, cutoff=20)
    assert lc[30] and not lc[0]
