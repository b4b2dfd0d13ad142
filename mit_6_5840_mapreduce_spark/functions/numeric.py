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


def exact_round_sum(col: Column, dp: int = 2) -> Column:
    """``round(sum(col), 2)`` computed in EXACT integer arithmetic.

    ``col`` must be a NON-NEGATIVE dp-decimal-valued DOUBLE expression
    (native 2-dp money columns, or products of them: ep*(1-disc) is
    4-dp, ep*(1-disc)*(1+tax) is 6-dp). Each row is scaled to integer
    10^-dp-dollar units — exact, because the scaled value sits within
    ~1e-5 of an integer for this corpus's magnitudes — summed in
    exact decimal arithmetic (DECIMAL(18,0) rows -> DECIMAL(28,0)
    total: no float accumulation, no BIGINT overflow at 100 TB
    cardinalities, and the unscaled-long aggregation fast path — see
    ``row_units``), decimal-rounded HALF-UP to cents in integer
    arithmetic (never a float .5 boundary, the Spark-vs-DuckDB round()
    divergence class), and divided by 100.0 exactly once. Versus the
    old ``F.round(F.sum(col), 2)`` this is value-identical whenever the
    float sum's accumulated error did not cross a half-cent boundary —
    and unlike it, deterministic under any partial-agg merge order.
    Mirror: ``duckdb_exact_round_sum``."""
    return units_total_to_dollars(F.sum(row_units(col, dp)), dp)


def row_units(col: Column, dp: int = 2) -> Column:
    """Per-row exact integer 10^-dp-dollar units of a dp-decimal-valued
    DOUBLE (the input side of ``exact_round_sum``), as DECIMAL(18,0).

    Round 8: (18,0), not (38,0) — sum over a precision<=18 decimal
    stays on Spark's unscaled-long aggregation path and lands a
    DECIMAL(28,0) total (measured: the (38,0) per-row accumulation cost
    sessionize ~1.18x its round-1 time; this form is ~1.0x, same exact
    integers). Overflow stays LOUD and impossible in practice: the
    per-row cast raises under ANSI if a single row's units reach 1e18
    (a 1e12-dollar line item at dp=6), and the (28,0) total holds 1e28
    units — 1e9x headroom over a 100 TB corpus of 1e13 rows x 1e6-unit
    values. For hot multi-sum aggregates, prefer the two-stage pattern
    (see q1_pricing_summary): sum ``row_units_bigint(col, dp)`` per
    bounded scan chunk first, then re-sum the chunk partials in
    DECIMAL(38,0)."""
    return row_units_bigint(col, dp).cast("decimal(18,0)")


def row_units_bigint(col: Column, dp: int = 2) -> Column:
    """``row_units`` as BIGINT (used directly for two-stage partial
    sums — skips the per-row decimal intermediate). The nearest-integer
    step is ``floor(x + 0.5)`` rather than ``round(x)``: Spark's Round
    on DoubleType goes through BigDecimal per row (measured as the
    dominant per-row cost in q1's five-sum aggregate), while floor
    stays in native double ops. Equivalent here because every scaled
    value sits within ~1e-5 of its integer (col is dp-decimal-valued
    and NON-NEGATIVE), so adding 0.5 can never cross to the wrong
    integer; F.floor on DOUBLE returns BIGINT directly."""
    return F.floor(col * F.lit(10 ** dp) + F.lit(0.5))


def units_total_to_dollars(s: Column, dp: int = 2) -> Column:
    """Exact 2-dp dollars from a wide-decimal total of 10^-dp units
    (the output side of ``exact_round_sum``; any precision>=28 decimal
    sum): integer HALF-UP to cents, one division."""
    if dp <= 2:
        cents = s * F.lit(10 ** (2 - dp))
    else:
        q = 10 ** (dp - 2)
        cents = F.floor((s + F.lit(q // 2)) / F.lit(q))
    return cents.cast("double") / F.lit(100.0)


def duckdb_exact_round_sum(expr: str, dp: int = 2) -> str:
    """DuckDB twin of ``exact_round_sum`` (sum(BIGINT) promotes to
    HUGEINT; ``//`` keeps the cents rounding in integer arithmetic)."""
    u = f"CAST(round(({expr}) * {10 ** dp}) AS BIGINT)"
    if dp <= 2:
        cents = f"(sum({u}) * {10 ** (2 - dp)})"
    else:
        q = 10 ** (dp - 2)
        cents = f"((sum({u}) + {q // 2}) // {q})"
    return f"(CAST({cents} AS DOUBLE) / 100.0)"
