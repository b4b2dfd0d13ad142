"""Cross-engine-stable numeric canonicalization.

``round(x, n)`` diverges between Spark and DuckDB on exact decimal halves
(Spark rounds the shortest decimal repr HALF_UP; DuckDB rounds the raw
double), and ratio-of-small-integer scores (Jaccard, cosine, quality
scores) land on exact halves often. ``floor(x * 10^n) / 10^n`` is instead
bit-reproducible whenever both engines hold the identical double — which
they do for ordered folds, single divisions, and identically-shaped
expressions. Use floor4 for every similarity/score column; keep round()
only for large data-dependent sums where inputs already differ in ulps.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE4 = 10_000


def floor4(col: Column) -> Column:
    return F.floor(col * SCALE4) / SCALE4


def duckdb_floor4(expr: str) -> str:
    return f"(floor(({expr}) * {SCALE4}) / {SCALE4})"
