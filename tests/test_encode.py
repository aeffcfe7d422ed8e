import numpy as np

from kslam_tpu.ops import encode


def test_kmer_codes_acgt():
    arr = encode.encode_seq("ACTGN")
    np.testing.assert_array_equal(encode.kmer_codes_np(arr), [0, 1, 2, 3, 0])


def test_kmer_codes_non_acgt_silently_a():
    # KMer.h:246-266: anything that is not uppercase ACGT encodes as A
    arr = encode.encode_seq("acgtNX-")
    np.testing.assert_array_equal(encode.kmer_codes_np(arr), [0] * 7)


def test_sw_codes():
    arr = encode.encode_seq("ACTGNacgtUuX")
    np.testing.assert_array_equal(
        encode.sw_codes_np(arr), [0, 1, 2, 3, 4, 0, 1, 3, 2, 0, 0, 4])


def test_complement():
    codes = np.array([0, 1, 2, 3, 4], dtype=np.uint8)
    np.testing.assert_array_equal(
        encode.complement_sw_codes_np(codes), [2, 3, 0, 1, 4])


def test_reverse_complement_str():
    assert encode.reverse_complement_str("ACTG") == "CAGT"
    assert encode.reverse_complement_str("AAN") == "NTT"


def test_device_tables_match_host():
    arr = encode.encode_seq("ACGTNacgtn" * 3)
    np.testing.assert_array_equal(
        np.asarray(encode.kmer_codes(arr)), encode.kmer_codes_np(arr))
    np.testing.assert_array_equal(
        np.asarray(encode.sw_codes(arr)), encode.sw_codes_np(arr))


def test_pack_reads_roundtrip_quirks():
    """pack_reads_np + device unpack reproduce BOTH reference encodings
    exactly, including N (SW code 4), lowercase acgt (SW coded, k-mer
    quirked to A) and U (SW 0)."""
    import jax.numpy as jnp
    from kslam_tpu.ops import encode
    rows = [b"ACGTNacgtUuXY-" + b"A" * 2, b"NNNNacgtACGTTT--"]
    a = np.frombuffer(b"".join(rows), np.uint8).reshape(2, 16).copy()
    packed, nbits, kbits = encode.pack_reads_np(a)
    assert packed.shape == (2, 4) and nbits.shape == (2, 2)
    codes2 = np.asarray(encode.unpack_codes(jnp.asarray(packed), 16))
    nm = np.asarray(encode.unpack_bits(jnp.asarray(nbits), 16))
    km = np.asarray(encode.unpack_bits(jnp.asarray(kbits), 16))
    sw = np.where(nm, 4, codes2)
    kc = np.where(km, 0, codes2)
    np.testing.assert_array_equal(sw, encode.sw_codes_np(a))
    np.testing.assert_array_equal(kc, encode.kmer_codes_np(a))
