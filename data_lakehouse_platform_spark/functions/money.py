"""Deterministic fixed-point aggregation of double-typed measures.

Two failure modes make naive double sums ungradable and scale-unsafe:

1. fold order: ``SUM(double)`` depends on partitioning — a 1000-
   executor run and a local run disagree in the low bits;
2. decimal casts: ``CAST(double AS DECIMAL)`` rounds HALF_UP in Spark
   but round-half-even in DuckDB, so engines disagree on near-ties.

The fix used everywhere here: scale to fixed point with
``FLOOR(x * 1e6)`` — multiply and floor are single IEEE ops that every
engine computes identically — then sum *exactly* as DECIMAL(28,0)
(order-independent), and rescale once at the end. Results are
bit-identical across engines and across any partitioning.

Reference analog: the reference keeps money in MySQL ints
(scripts/database/create_table.py) for the same reason.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 1_000_000  # six decimal places of fidelity


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dec(col: Column | str) -> Column:
    """Per-row fixed-point units (DECIMAL(28,0)) — sum these exactly."""
    return F.floor(_c(col) * SCALE).cast("decimal(28,0)")


def undec(col: Column) -> Column:
    """Exact fixed-point aggregate → DOUBLE measure."""
    return (col.cast("double") / SCALE)


def dec_sum(col: Column | str, alias: str) -> Column:
    """Order-independent exact sum, surfaced as DOUBLE."""
    return undec(F.sum(dec(col))).alias(alias)


def dec_avg(col: Column | str, alias: str) -> Column:
    """Deterministic mean: exact fixed-point sum, one double divide."""
    return (undec(F.sum(dec(col))) / F.count(_c(col))).alias(alias)


def money(col: Column | str) -> Column:
    """Per-row deterministic 6-dp truncation (for non-aggregated
    computed measures that must hash identically across engines)."""
    return undec(dec(col))


# SQL fragments for the DuckDB oracles — keep in lockstep with above.


def sql_sum(expr: str) -> str:
    return f"CAST(SUM(CAST(FLOOR(({expr}) * 1000000) AS DECIMAL(28,0))) AS DOUBLE) / 1000000"


def sql_avg(expr: str) -> str:
    # COUNT((expr)), not COUNT(*): dec_avg divides by the NON-NULL
    # count (F.count(col)), and the two must stay in lockstep on
    # nullable columns — SUM skips NULLs in both engines, so dividing
    # by the row count would disagree the moment a NULL appears.
    return f"{sql_sum(expr)} / COUNT(({expr}))"


def sql_money(expr: str) -> str:
    return f"CAST(CAST(FLOOR(({expr}) * 1000000) AS DECIMAL(28,0)) AS DOUBLE) / 1000000"
