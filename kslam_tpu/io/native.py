"""ctypes bindings to the native host runtime (csrc/libkslam_host.so).

Loads lazily and degrades gracefully: when the shared library is absent
(not built yet, or a platform without the toolchain) every accessor
returns None and callers fall back to the pure-Python implementations.
Build with `make -C csrc`; an auto-build is attempted once per process if
a compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "build", "libkslam_host.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _configure(lib) -> None:
    i64, i32, u8p = ctypes.c_int64, ctypes.c_int32, \
        ctypes.POINTER(ctypes.c_uint8)
    lib.kslam_fastq_parse_chunk.restype = i64
    lib.kslam_fastq_parse_chunk.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(i64), i64, i32,
        u8p, u8p, ctypes.POINTER(i32), ctypes.c_char_p, i32]
    lib.kslam_fastq_write.restype = i32
    lib.kslam_fastq_write.argtypes = [
        ctypes.c_char_p, i64, i32, u8p, u8p, ctypes.POINTER(i32),
        ctypes.c_char_p, i32, i32]
    if hasattr(lib, "kslam_ref_sort_perm"):
        lib.kslam_ref_sort_perm.restype = None
        lib.kslam_ref_sort_perm.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), i64, ctypes.POINTER(i32)]


def get_lib():
    """The loaded native library, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # make is a fast no-op when the library is current; running it
        # unconditionally also picks up source changes in csrc/
        try:
            subprocess.run(["make", "-C", _CSRC], capture_output=True,
                           timeout=120, check=True)
        except (OSError, subprocess.SubprocessError):
            if not os.path.exists(_LIB_PATH):
                return None
        try:
            _lib = ctypes.CDLL(_LIB_PATH)
            _configure(_lib)
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return get_lib() is not None


def ref_sort_perm(keys):
    """Permutation of `keys` (uint32 array) under the reference's
    __gnu_parallel::sort with force_parallel settings (see csrc/ref_sort.cc),
    or None when the native library is unavailable."""
    import numpy as np
    lib = get_lib()
    if lib is None or not hasattr(lib, "kslam_ref_sort_perm"):
        return None
    keys = np.ascontiguousarray(keys, dtype=np.uint32)
    out = np.empty(len(keys), dtype=np.int32)
    lib.kslam_ref_sort_perm(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_int64(len(keys)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out
