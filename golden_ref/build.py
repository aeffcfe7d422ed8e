"""Build the reference k-SLAM binary for differential testing.

Compiles /root/reference/src/{main.cpp,ssw_cpp.cpp,ssw.c} with the minimal
boost stand-ins in golden_ref/boost_stub (build/src/subdir.mk:26-38 is the
reference's own recipe; we add `-include array -include climits` because
modern libstdc++ no longer includes those transitively, and swap the boost
link deps for the header stubs).  The resulting binary writes/reads its
database through the stub text archive, so databases must be (re)built with
the same binary — which the parity fixtures do anyway.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import subprocess
from typing import Optional

REF_SRC = "/root/reference/src"
STUB = os.path.join(os.path.dirname(os.path.abspath(__file__)), "boost_stub")
DEFAULT_CACHE = "/tmp/kslam_ref_bin"

_SOURCES = ["main.cpp", "ssw_cpp.cpp", "ssw.c"]


def _input_hash() -> str:
    h = hashlib.sha256()
    for root in (REF_SRC, STUB):
        for dirpath, _, files in sorted(os.walk(root)):
            for f in sorted(files):
                p = os.path.join(dirpath, f)
                h.update(p.encode())
                with open(p, "rb") as fh:
                    h.update(fh.read())
    return h.hexdigest()[:16]


def build_reference_binary(cache_dir: str = DEFAULT_CACHE) -> Optional[str]:
    """Compile (or reuse a cached) reference binary; None if unbuildable."""
    if not os.path.isdir(REF_SRC) or shutil.which("g++") is None:
        return None
    os.makedirs(cache_dir, exist_ok=True)
    tag = _input_hash()
    binary = os.path.join(cache_dir, f"slam_ref_{tag}")
    if os.path.exists(binary):
        return binary
    work = os.path.join(cache_dir, f"build_{tag}")
    os.makedirs(work, exist_ok=True)
    cxxflags = ["-std=gnu++11", "-O3", "-fopenmp", "-w",
                "-include", "array", "-include", "climits", "-I", STUB]
    steps = [
        ["gcc", "-O3", "-w", "-c", os.path.join(REF_SRC, "ssw.c"),
         "-o", os.path.join(work, "ssw.o")],
        ["g++", *cxxflags, "-c", os.path.join(REF_SRC, "ssw_cpp.cpp"),
         "-o", os.path.join(work, "ssw_cpp.o")],
        ["g++", *cxxflags, "-c", os.path.join(REF_SRC, "main.cpp"),
         "-o", os.path.join(work, "main.o")],
        ["g++", "-fopenmp",
         os.path.join(work, "main.o"), os.path.join(work, "ssw_cpp.o"),
         os.path.join(work, "ssw.o"), "-o", binary],
    ]
    try:
        for cmd in steps:
            subprocess.run(cmd, check=True, capture_output=True, timeout=600)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired):
        return None
    return binary


if __name__ == "__main__":
    print(build_reference_binary() or "BUILD FAILED")
