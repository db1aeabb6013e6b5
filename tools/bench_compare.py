"""Benchmark regression guard — the reference commits component-bench
baselines and compares on every PR (`tests/benchmarks/baseline/
components.json` + CI compare). Same idea here: a committed per-query
baseline; regressions beyond tolerance fail.

Usage:
  python tools/bench_compare.py            # run bench, compare, report
  python tools/bench_compare.py --update   # re-baseline from a fresh run
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BASELINE = REPO / "tests" / "benchmarks" / "baseline.json"
TOLERANCE = 2.0  # x slower than baseline = regression (local timing noise is real)
MIN_SECONDS = 1.0  # ignore sub-second queries (jitter-dominated)


def run_bench() -> dict:
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        check=True,
        cwd=str(REPO),
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    result = run_bench()
    if "--update" in sys.argv or not BASELINE.exists():
        BASELINE.parent.mkdir(parents=True, exist_ok=True)
        BASELINE.write_text(json.dumps(result, indent=2) + "\n")
        print(f"baseline written: {BASELINE} (total {result['value']}s)")
        return 0

    base = json.loads(BASELINE.read_text())
    failures = []
    for name, sec in result["queries"].items():
        ref = base["queries"].get(name)
        if ref is None:
            print(f"NEW   {name}: {sec}s (no baseline)")
            continue
        if ref >= MIN_SECONDS and sec > ref * TOLERANCE:
            failures.append((name, ref, sec))
            print(f"REGR  {name}: {ref}s -> {sec}s ({sec / ref:.1f}x)")
        else:
            print(f"OK    {name}: {ref}s -> {sec}s")
    print(f"total: {base['value']}s -> {result['value']}s")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
