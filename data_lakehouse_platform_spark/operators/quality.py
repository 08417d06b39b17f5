"""Data-quality rule engine.

Declarative checks compiled into ONE aggregate pass per table (a
single job), then unioned into a metrics DataFrame — instead of the
reference's one-action-per-rule pattern
(bronze_validation.py:66-82 runs a count() per column, which at
100 TB means N full scans; here it is one scan per table regardless of
rule count).

Supported rules mirror the reference's posture:
  null_count (rate threshold), unique, min, completeness
(bronze_validation.py + PyDeequ checks in silver_validation.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class DQCheck:
    table: str
    check: str  # null_count | unique | min | completeness | cross_field
    column: str
    max_null_rate: float = 0.05
    min_value: float = 0.0
    # cross_field: SQL predicate that must hold on EVERY row (metric =
    # violation count); `column` becomes the rule's display name.
    predicate: str | None = None


def _metric_and_passed(c: DQCheck):
    col = F.col(c.column)
    total = F.count(F.lit(1))
    if c.check == "null_count":
        nulls = F.count(F.when(col.isNull(), 1))
        return nulls.cast("double"), nulls <= F.lit(c.max_null_rate) * total
    if c.check == "unique":
        # duplicates among NON-NULL values only: countDistinct ignores
        # NULLs, so comparing against the raw row count would report a
        # unique-but-nullable column as having duplicates. NULL
        # handling belongs to a separate null_count/completeness rule
        # (SQL UNIQUE constraints likewise admit NULLs).
        non_null = F.count(col)
        distinct = F.countDistinct(col)
        dupes = non_null - distinct
        return dupes.cast("double"), non_null == distinct
    if c.check == "min":
        return F.min(col).cast("double"), F.min(col) >= F.lit(c.min_value)
    if c.check == "completeness":
        return (F.count(col).cast("double") / total), F.count(col) == total
    if c.check == "cross_field":
        if not c.predicate:
            raise ValueError("cross_field check needs a predicate")
        # Violations = rows where the invariant is NOT satisfied; NULL
        # predicate results count as violations (unknown != compliant).
        bad = F.count(F.when(~F.coalesce(F.expr(c.predicate), F.lit(False)), 1))
        return bad.cast("double"), bad == 0
    raise ValueError(f"unknown check {c.check!r}")


def schema_drift(
    df: DataFrame, expected: dict[str, str], table: str = ""
) -> list[dict[str, str]]:
    """Schema-drift report vs a stored expected schema (column → Spark
    type name). Mirrors the reference's schema-store check
    (bronze_validation.py: stored JSON schema vs live frame) but is a
    pure metadata comparison — no scan, so it is free at any scale.

    Returns one record per drift: kind in {missing, added, type_changed}.
    """
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    drifts: list[dict[str, str]] = []
    for col, typ in expected.items():
        if col not in actual:
            drifts.append(
                {"table": table, "column": col, "kind": "missing", "expected": typ, "actual": ""}
            )
        elif actual[col] != typ:
            drifts.append(
                {
                    "table": table,
                    "column": col,
                    "kind": "type_changed",
                    "expected": typ,
                    "actual": actual[col],
                }
            )
    for col, typ in actual.items():
        if col not in expected:
            drifts.append(
                {"table": table, "column": col, "kind": "added", "expected": "", "actual": typ}
            )
    return drifts


def run_checks(tables: dict[str, DataFrame], checks: list[DQCheck]) -> DataFrame:
    """Compile checks into one agg per table; union the metric rows."""
    per_table: list[DataFrame] = []
    for table_name in sorted({c.table for c in checks}):
        df = tables[table_name]
        table_checks = [c for c in checks if c.table == table_name]
        aggs = []
        for i, c in enumerate(table_checks):
            metric, passed = _metric_and_passed(c)
            aggs.append(metric.alias(f"m{i}"))
            aggs.append(passed.alias(f"p{i}"))
        wide = df.agg(*aggs)  # single pass over the table
        rows = [
            wide.select(
                F.lit(c.table).alias("table_name"),
                F.lit(c.check).alias("check_name"),
                F.lit(c.column).alias("column_name"),
                F.col(f"m{i}").alias("metric_value"),
                F.col(f"p{i}").alias("passed"),
            )
            for i, c in enumerate(table_checks)
        ]
        per_table.append(reduce(lambda a, b: a.unionByName(b), rows))
    return reduce(lambda a, b: a.unionByName(b), per_table)


def observe_metrics(df: DataFrame, name: str = "dq"):
    """In-flight DQ instrumentation via Spark's ``Observation``: attach
    row-count / null-count / min-max accumulators to a plan so the
    metrics come back FOR FREE with the action that runs it — zero
    extra scans, unlike a separate count() per metric (the
    one-action-per-rule pattern this module replaces batch-side).

    Returns (instrumented_df, observation); read
    ``observation.get`` AFTER an action has executed the plan. At
    scale this is the only affordable way to monitor a 100 TB write:
    the metrics ride the write job itself.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    numeric = [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("integer", "long", "double", "float", "decimal")
    ]
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    metrics += [
        F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls_{c}") for c in df.columns
    ]
    metrics += [F.min(F.col(c)).alias(f"min_{c}") for c in numeric[:4]]
    metrics += [F.max(F.col(c)).alias(f"max_{c}") for c in numeric[:4]]
    return df.observe(obs, *metrics), obs
