"""Per-stage timing + throughput counters and jax.profiler integration.

The structured successor of the reference's count-logging (its Log lines
record reads parsed, k-mers, overlaps found/screened, insert-size stats --
sequenceTools.h:154-179 callers).  Here every pipeline stage records wall
time and item counts into a process-global registry; `summary()` derives
reads/sec and SW GCUPS, and `profile_to(dir)` wraps a run in a
jax.profiler trace for op-level analysis on TPU.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Dict, Optional

from .logging import log


@dataclasses.dataclass
class StageStats:
    calls: int = 0
    seconds: float = 0.0
    items: int = 0


_STAGES: Dict[str, StageStats] = {}
_COUNTERS: Dict[str, int] = {}


def reset() -> None:
    _STAGES.clear()
    _COUNTERS.clear()


def count(name: str, n: int = 1) -> None:
    _COUNTERS[name] = _COUNTERS.get(name, 0) + n


@contextlib.contextmanager
def stage(name: str, items: int = 0):
    """Times a pipeline stage; `items` feeds the per-stage rate."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        s = _STAGES.setdefault(name, StageStats())
        s.calls += 1
        s.seconds += dt
        s.items += items


def summary() -> Dict[str, dict]:
    out: Dict[str, dict] = {}
    for name, s in _STAGES.items():
        entry = {"calls": s.calls, "seconds": round(s.seconds, 4)}
        if s.items:
            entry["items"] = s.items
            entry["items_per_sec"] = round(s.items / s.seconds, 1) \
                if s.seconds else None
        out[name] = entry
    if _COUNTERS:
        out["counters"] = dict(_COUNTERS)
    return out


def log_summary() -> None:
    for name, entry in summary().items():
        log(f"stage {name}: {entry}")


def gcups(cells: int, seconds: float) -> float:
    """Giga cell updates/sec -- the SW kernel headline unit."""
    return cells / seconds / 1e9 if seconds else 0.0


@contextlib.contextmanager
def profile_to(trace_dir: Optional[str]):
    """jax.profiler trace of the enclosed block when trace_dir is set."""
    if not trace_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log(f"profiler trace written to {trace_dir}")
