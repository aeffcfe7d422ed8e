"""One-command green test run: the full suite in a few pytest subprocesses.

The monolithic `python -m pytest tests -q` reproducibly dies with a fatal
abort inside XLA:CPU compilation after ~200 compiled programs in one
process (VERDICT r4 weak #2: test #198, backend_compile_and_load; every
file passes in isolation, with or without the persistent compile cache).
The accumulation is inside the CPU client, not in this repo's code, so the
reliable fix is process isolation: this runner splits the test files into
bounded groups, runs each group as its own pytest subprocess (amortizing
jax startup over ~8 files instead of paying it per file), aggregates the
results, and exits nonzero if ANY group fails or crashes.

This is the documented way to run everything:

    python scripts/run_tests.py            # whole suite
    python scripts/run_tests.py -k kmers   # forwarded pytest args

Groups are deterministic (sorted file list, contiguous chunks) so a
failure report always names the same group for the same file.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# files per subprocess: big enough to amortize startup, small enough that
# no group approaches the ~200-compiled-programs abort zone
GROUP_FILES = 8


def parse_counts(output: str):
    """(passed, failed, skipped, errors) from the pytest summary line."""
    for line in reversed(output.splitlines()):
        if ("passed" in line or "failed" in line or "error" in line) and \
                ("=" in line or "s (" in line or line.endswith("s")):
            p = sum(int(m.group(1)) for m in
                    re.finditer(r"(\d+) passed", line))
            f = sum(int(m.group(1)) for m in
                    re.finditer(r"(\d+) failed", line))
            s = sum(int(m.group(1)) for m in
                    re.finditer(r"(\d+) skipped", line))
            e = sum(int(m.group(1)) for m in
                    re.finditer(r"(\d+) error", line))
            if p or f or s or e:
                return p, f, s, e
    return 0, 0, 0, 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--group-files", type=int, default=GROUP_FILES)
    ap.add_argument("rest", nargs="*",
                    help="extra args forwarded to every pytest subprocess")
    args = ap.parse_args()

    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    groups = [files[i:i + args.group_files]
              for i in range(0, len(files), args.group_files)]
    t0 = time.perf_counter()
    total = [0, 0, 0, 0]
    bad = []
    for gi, group in enumerate(groups):
        names = " ".join(os.path.basename(f) for f in group)
        print(f"[group {gi + 1}/{len(groups)}] {names}", flush=True)
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", *group, "-q", *args.rest],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        counts = parse_counts(proc.stdout)
        for i, c in enumerate(counts):
            total[i] += c
        tail = [ln for ln in proc.stdout.splitlines() if ln.strip()]
        print("  " + (tail[-1] if tail else "(no output)"), flush=True)
        if proc.returncode not in (0, 5):   # 5 = no tests collected
            bad.append((gi, proc.returncode, proc.stdout))
    dt = time.perf_counter() - t0
    p, f, s, e = total
    print(f"\nTOTAL: {p} passed, {f} failed, {s} skipped, {e} errors "
          f"in {dt:.0f}s across {len(groups)} groups")
    for gi, rc, out in bad:
        print(f"\n--- group {gi + 1} FAILED (exit {rc}); last 40 lines ---")
        print("\n".join(out.splitlines()[-40:]))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
