"""Base encoding: ASCII bases -> integer codes, host (NumPy) and device (JAX).

Two encodings exist in the reference and both are preserved:

* k-mer 2-bit codes, A=0 C=1 T=2 G=3, complement = code ^ 2; every other
  character (incl. lowercase and N) silently encodes as A=0
  (KMer.h:23-27, 246-266).
* Smith-Waterman 5-letter codes: A=0 C=1 T=2 G=3 (ours), N/other=4 scoring 0
  against everything.  The reference uses A=0 C=1 G=2 T=3 N=4
  (ssw_cpp.cpp:11-23) -- a relabeling that does not change scores because the
  score matrix is uniform (match on the diagonal, -mismatch off it, zeros in
  the N row/column).  Lowercase acgt map to their base; 'U'/'u' maps to A to
  mirror the reference's translation table quirk (ssw_cpp.cpp:18,22).

We store reads/genomes as raw ASCII uint8 and encode on device via a
256-entry table gather, so there is a single source of truth per sequence.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# --- table construction (host) ---

_KMER_TABLE = np.zeros(256, dtype=np.uint8)          # default: A=0
_KMER_TABLE[ord("A")] = 0
_KMER_TABLE[ord("C")] = 1
_KMER_TABLE[ord("T")] = 2
_KMER_TABLE[ord("G")] = 3

# Marks characters that are *valid* uppercase ACGT (used by tests/tools that
# want to know where Ns were, since the k-mer encoding erases them).
_ACGT_TABLE = np.zeros(256, dtype=bool)
for _c in b"ACGT":
    _ACGT_TABLE[_c] = True

_SW_TABLE = np.full(256, 4, dtype=np.uint8)          # default: N=4
for _pair in ((b"Aa", 0), (b"Cc", 1), (b"Tt", 2), (b"Gg", 3), (b"Uu", 0)):
    for _c in _pair[0]:
        _SW_TABLE[_c] = _pair[1]

_CODE_TO_BASE = np.frombuffer(b"ACTGN", dtype=np.uint8).copy()

# device-side copies, created lazily on first use



def kmer_codes_np(ascii_bytes: np.ndarray) -> np.ndarray:
    """ASCII uint8 array -> 2-bit k-mer codes (non-ACGT -> 0)."""
    return _KMER_TABLE[ascii_bytes]


def sw_codes_np(ascii_bytes: np.ndarray) -> np.ndarray:
    """ASCII uint8 array -> 5-letter SW codes (N/other -> 4)."""
    return _SW_TABLE[ascii_bytes]


def is_acgt_np(ascii_bytes: np.ndarray) -> np.ndarray:
    return _ACGT_TABLE[ascii_bytes]


def kmer_codes(ascii_u8):
    """Device version of kmer_codes_np, as pure arithmetic.

    (c >> 1) & 3 maps ASCII A/C/T/G to exactly the reference's 0/1/2/3;
    everything else is masked to A=0 (uppercase-only validity, matching
    _KMER_TABLE).  No lookup table: an embedded device-array constant
    inside a jit costs a per-call constant re-upload on some runtimes,
    and dense VPU ops beat a gather anyway."""
    c = ascii_u8.astype(jnp.int32)
    code = (c >> 1) & 3
    valid = (c == 65) | (c == 67) | (c == 84) | (c == 71)
    return jnp.where(valid, code, 0).astype(jnp.uint8)


def sw_codes(ascii_u8):
    """Device version of sw_codes_np, as pure arithmetic (same rationale
    as kmer_codes): upper/lowercase ACGT -> 0/1/2/3, U/u -> 0 (the
    reference translation-table quirk), everything else -> N=4."""
    c = ascii_u8.astype(jnp.int32)
    code = (c >> 1) & 3
    d = c | 32  # lowercase fold
    is_acgt = (d == 97) | (d == 99) | (d == 116) | (d == 103)
    is_u = d == 117
    out = jnp.where(is_acgt, code, jnp.where(is_u, 0, 4))
    return out.astype(jnp.uint8)


def complement_sw_codes(codes):
    """Complement in SW code space: A<->T, C<->G (code ^ 2), N stays N."""
    return jnp.where(codes < 4, codes ^ 2, codes)


def complement_sw_codes_np(codes: np.ndarray) -> np.ndarray:
    return np.where(codes < 4, codes ^ 2, codes)


def decode_np(codes: np.ndarray) -> str:
    """5-letter codes -> ASCII string (for tests/debugging)."""
    return _CODE_TO_BASE[np.asarray(codes, dtype=np.int64)].tobytes().decode()


def encode_seq(seq: str | bytes) -> np.ndarray:
    """Python string -> ASCII uint8 array."""
    if isinstance(seq, str):
        seq = seq.encode()
    return np.frombuffer(seq, dtype=np.uint8).copy()


def pack_reads_np(ascii2d: np.ndarray):
    """Host-side transfer packing of a read batch: [N, L] ASCII ->
    (codes2 u8 [N, ceil(L/4)], nbits u8 [N, ceil(L/8)],
     kbits u8 [N, ceil(L/8)]) at ~2.25 bits/base instead of 8.

    Exact round trip for BOTH reference encodings (they disagree on
    lowercase/U, so one 2-bit plane cannot serve both):
      * SW code  = codes2 unless its nbit is set (then N=4),
      * k-mer code = codes2 unless its kbit is set (then A=0 -- the
        KMer.h lowercase/other -> A quirk).
    Motivation: the axon tunnel moves H2D at ~19 MB/s (measured), so a
    524k-read chunk's 80 MB of raw ASCII cost ~4 s; packed it is ~23 MB.
    On a local PCIe host this is merely a free 3.5x.
    """
    n, l = ascii2d.shape
    sw = _SW_TABLE[ascii2d]
    kc = _KMER_TABLE[ascii2d]
    base2 = np.where(sw == 4, 0, sw).astype(np.uint8)
    pad4 = (-l) % 4
    b = np.pad(base2, ((0, 0), (0, pad4)))
    codes2 = (b[:, 0::4] | (b[:, 1::4] << 2) | (b[:, 2::4] << 4) |
              (b[:, 3::4] << 6))
    nbits = np.packbits(sw == 4, axis=1, bitorder="little")
    kbits = np.packbits(kc != base2, axis=1, bitorder="little")
    return codes2, nbits, kbits


def unpack_codes(packed, l: int):
    """Device inverse of pack_reads_np's 2-bit plane -> u8 [N, l]."""
    rep = jnp.repeat(packed, 4, axis=1)[:, :l]
    sh = (jnp.arange(l, dtype=jnp.int32) % 4) * 2
    return ((rep >> sh[None, :].astype(packed.dtype)) &
            np.uint8(3)).astype(jnp.uint8)


def unpack_bits(bits, l: int):
    """Device inverse of np.packbits(..., bitorder='little') -> bool."""
    rep = jnp.repeat(bits, 8, axis=1)[:, :l]
    sh = (jnp.arange(l, dtype=jnp.int32) % 8).astype(bits.dtype)
    return ((rep >> sh[None, :]) & np.uint8(1)).astype(bool)


def reverse_complement_str(seq: str) -> str:
    """String-level reverse complement mirroring sequenceTools.h:77-116
    (A<->T, C<->G, case preserved for acgt, everything else unchanged)."""
    table = dict(zip("ACTGactg", "TGACtgac"))
    return "".join(table.get(c, c) for c in reversed(seq))
