"""Local mirror of the driver's DuckDB differential correctness gate.

For every entry in ``__spark_entry__.queries()`` with an oracle: run the
Spark query and the DuckDB SQL on the same parquet tables, canonicalize
(columns sorted by name, rows sorted by all values as strings), and
compare row count / schema shape / values.

Usage: python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mit_6_5840_mapreduce_spark.session import get_spark
from mit_6_5840_mapreduce_spark.sources.tables import TABLES

import __spark_entry__ as entrymod


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # everything through repr-ish strings so float/decimal/timestamp
    # representations normalize; floats via %.6f of rounded values
    out = pd.DataFrame()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            out[c] = col.map(lambda v: "" if pd.isna(v) else f"{v:.6f}")
        else:
            out[c] = col.map(lambda v: "" if v is None or
                             (isinstance(v, float) and pd.isna(v)) else str(v))
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # a selector that names nothing (typo, or flag-style args the tool
    # doesn't take) must fail loudly — a vacuous run prints the same
    # "0 failures" as a real one
    unknown = only - set(queries)
    if unknown:
        print(f"ERROR: not registered queries: {sorted(unknown)}")
        return 2

    spark = get_spark("parity")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{os.path.join(sf_dir, t + '.parquet')}'")

    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(sdf)}, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        cs, co = canon(sdf), canon(odf)
        status = []
        if len(cs) != len(co):
            status.append(f"rowcount {len(cs)} vs {len(co)}")
        if list(cs.columns) != list(co.columns):
            status.append(f"cols {list(cs.columns)} vs {list(co.columns)}")
        elif len(cs) == len(co) and not cs.equals(co):
            diff = (cs != co).any(axis=1)
            idx = diff[diff].index[:3]
            for i in idx:
                status.append(f"row{i}: {cs.loc[i].to_dict()} vs "
                              f"{co.loc[i].to_dict()}")
        if status:
            failures.append(name)
            print(f"FAIL {name} ({time.time()-t0:.1f}s): "
                  + " | ".join(status)[:500])
        else:
            print(f"OK   {name} rows={len(cs)} ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
