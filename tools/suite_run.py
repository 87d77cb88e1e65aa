"""Timed fresh-process full-suite run -> SUITE_RUN.json (VERDICT r4 #5).

Runs `python -m pytest tests/ -q` in a subprocess (the repo's pytest.ini
xdist settings apply), records wall time and pass/fail/skip counts, and
writes the artifact of record at the repo root — the full-suite analog of
SPEC_RUN.json.  Run AFTER tools/warm_cache.sh so the persistent compile
cache covers every graph; the artifact certifies that a fresh process
completes the suite within the driver/CI budget.

Usage: python tools/suite_run.py [pytest args...]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    args = sys.argv[1:] or ["tests/", "-q"]
    t0 = time.time()
    res = subprocess.run(
        [sys.executable, "-m", "pytest", *args],
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    wall = round(time.time() - t0, 1)
    tail = res.stdout[-3000:]
    counts = {
        k: int(v)
        for v, k in re.findall(
            r"(\d+) (passed|failed|skipped|errors?)", tail[-400:]
        )
    }
    out = {
        "cmd": "python -m pytest " + " ".join(args),
        "rc": res.returncode,
        "wall_s": wall,
        "counts": counts,
        "tail": tail[-600:],
    }
    with open(os.path.join(REPO, "SUITE_RUN.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "tail"}))
    return res.returncode


if __name__ == "__main__":
    raise SystemExit(main())
