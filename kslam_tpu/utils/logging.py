"""Timestamped stage logging, the structured successor of the reference's
`Log` class (sequenceTools.h:154-179).  Unlike the reference (hardcoded
log.txt), logs go to stderr by default; set KSLAM_LOG to a path to tee."""

from __future__ import annotations

import os
import sys
import time

_START = time.monotonic()
_FILE = None


def _target():
    global _FILE
    path = os.environ.get("KSLAM_LOG")
    if path and _FILE is None:
        _FILE = open(path, "a")
    return _FILE


def log(message: str) -> None:
    global _START
    if message == "reset":  # restart the clock (sequenceTools.h:161,177)
        _START = time.monotonic()
        return
    elapsed = time.monotonic() - _START
    line = f"[t = {elapsed:.6f}]\t{message}"
    print(line, file=sys.stderr)
    f = _target()
    if f:
        f.write(line + "\n")
        f.flush()
