"""Driver-window rotation planner.

The external correctness gate verifies only the FIRST 50 registry
entries per round (CORRECTNESS_r{N}.json). This tool reads every
CORRECTNESS_r*.json in the repo root plus the current registry and
reports:

- queries with a green driver row in some past round,
- queries checked rows-only (no_oracle) — by design,
- queries with NO driver row yet -> the set the next round's window
  rotation must cover.

Usage: python tools/window_plan.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    from mit_6_5840_mapreduce_spark.operators import registry
    queries, oracles = registry()
    names = list(queries)

    green: dict[str, str] = {}
    rows_only: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path)[len("CORRECTNESS_"):-len(".json")]
        with open(path) as f:
            rows = json.load(f)
        for name, r in rows.items():
            if r.get("err") == "no_oracle" and r.get("spark_rows") is not None:
                rows_only.setdefault(name, rnd)
            elif (r.get("rows_match") and r.get("schema_match")
                    and r.get("hash_match")):
                green[name] = rnd

    never = [n for n in names if n not in green and n not in rows_only]
    in_window = set(names[:50])
    print(f"registry: {len(names)} queries; driver-certified green: "
          f"{len(green)}; rows-only by design: {len(rows_only)}")
    print(f"\nno driver row yet ({len(never)}):")
    for n in never:
        mark = "IN WINDOW NOW" if n in in_window else "needs rotation"
        has_oracle = "oracle" if n in oracles else "rows-only"
        print(f"  {n:35s} {has_oracle:10s} {mark}")
    uncovered_next = [n for n in never if n not in in_window]
    if uncovered_next:
        print(f"\nnext-round rotation must pull in: {uncovered_next}")
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:     # reader (e.g. `| head`) closed early
        raise SystemExit(0)
