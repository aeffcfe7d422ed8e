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
