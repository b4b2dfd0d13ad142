"""Run any registered query by name and show its result (and plan).

Usage:
    python tools/run_query.py <query> [sf_dir] [--explain] [--limit N]
    python tools/run_query.py --list
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mit_6_5840_mapreduce_spark.session import get_spark

import __spark_entry__ as entrymod


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    queries = entrymod.queries()
    if "--list" in flags or not args:
        for name in sorted(queries):
            marker = "" if name in entrymod.oracle_sql() else "  (rows-only)"
            print(f"{name}{marker}")
        return 0
    name = args[0]
    if name not in queries:
        print(f"unknown query {name!r}; --list shows all", file=sys.stderr)
        return 2
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.001"
    limit = 20
    for f in flags:
        if f.startswith("--limit"):
            limit = int(f.split("=", 1)[1]) if "=" in f else limit
    spark = get_spark("run-query")
    df = queries[name](spark, sf_dir)
    if "--explain" in flags:
        df.explain("formatted")
    df.show(limit, truncate=False)
    print(f"rows: {df.count()}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
