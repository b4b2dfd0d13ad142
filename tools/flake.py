"""Repeat-trial flakiness harness.

The reference re-runs its whole test suite N times under a timeout
(``/root/reference/src/main/test-mr-many.sh:15-23``) because a single
green pass hides nondeterminism. This is the analogue for this engine:
each trial re-runs the differential parity gate (fresh SparkSession ->
fresh shuffle/task placement) plus the plan-shape and MR-compat test
subsets — the places where collect_set ordering, row_number tiebreaks,
or AQE re-planning could flake.

Usage: python tools/flake.py [n_trials] [sf_dir]
Exit 0 = all trials clean. Per-trial results printed as they finish.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PYTEST_SUBSET = [
    "tests/test_plans.py",
    "tests/test_mr_compat.py",
    "tests/test_mad_twins.py",
    "tests/test_registry_window.py",
    # r11: EXACT float equality across engines/partitionings (the GD
    # trainer's order-free contract) and the mid-micro-batch
    # executor-kill recovery — the two newest places where shuffle
    # placement or task timing could flake
    "tests/test_quality.py",
    "tests/test_stream_crash_cluster.py",
    # r12: the span-window memo's 8-thread concurrent-miss race (the
    # newest genuinely nondeterministic surface) rides in
    # test_spans_mixture.py; test_epoch.py pins the composed capstone
    # whose shuffle/window tiebreaks span five stages
    "tests/test_spans_mixture.py",
    "tests/test_epoch.py",
]


def run_trial(i: int, sf_dir: str) -> bool:
    ok = True
    for label, cmd in (
        ("parity", [sys.executable, "tools/parity.py", sf_dir]),
        ("pytest", [sys.executable, "-m", "pytest", "-x", "-q",
                    *PYTEST_SUBSET]),
    ):
        t0 = time.time()
        # fresh process per leg: new JVM, new shuffle placement
        r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                           timeout=1800)
        dt = time.time() - t0
        status = "ok" if r.returncode == 0 else "FAIL"
        print(f"trial {i} {label}: {status} ({dt:.0f}s)", flush=True)
        if r.returncode != 0:
            ok = False
            tail = (r.stdout + r.stderr).strip().splitlines()[-15:]
            print("\n".join(tail), flush=True)
    return ok


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    clean = sum(run_trial(i + 1, sf_dir) for i in range(n))
    print(f"\n{clean}/{n} trials clean")
    return 0 if clean == n else 1


if __name__ == "__main__":
    sys.exit(main())
