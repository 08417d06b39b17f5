"""Range-clustered parquet layout + footer-stats file skipping — the
data-skipping half of a lakehouse table format (Delta/Iceberg file
stats) on plain parquet.

Why it matters at 100 TB: predicate pushdown alone still *opens* every
file to consult row-group stats. Clustering by the hot filter column
makes per-FILE min/max ranges disjoint (repartitionByRange draws
sampled range boundaries, so each output file owns a contiguous value
slice), and the footer index then answers "which files can contain
x BETWEEN lo AND hi" from metadata only — a selective scan touches
2 of 10,000 files instead of listing-and-opening all of them. This is
exactly how Delta's `OPTIMIZE ZORDER BY` (single-column case) + file
stats pruning work; reference analog: the gold tables' y/m/d
partitioning (gold_fact_orders.py partitionBy) is the coarse version —
clustering extends skipping to non-partition columns.

The footer scan itself is metadata-bounded (one pyarrow footer read
per file, no data pages); at cluster scale you'd persist the stats
table next to the data (a 1-row-per-file parquet manifest, refreshed
per write) instead of re-reading footers — `file_stats` is written so
its output IS that manifest.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_clustered(
    df: DataFrame, path: str, cluster_col: str, n_files: int = 8
) -> None:
    """Write ``df`` as parquet range-clustered on ``cluster_col``:
    each output file owns a contiguous, (near-)disjoint value slice,
    sorted within the file so row groups are clustered too."""
    (
        df.repartitionByRange(n_files, F.col(cluster_col))
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .parquet(path)
    )


@dataclass(frozen=True)
class FileStat:
    file: str
    min: object
    max: object
    rows: int


def file_stats_multi(
    path: str, columns: list[str]
) -> dict[str, dict[str, FileStat]]:
    """Per-file (min, max, rows) for EVERY listed column from parquet
    footers only — one footer read per file no matter how many columns
    are asked for. No data pages are read. ``rows`` is always the true
    file row count (``metadata.num_rows``); min/max are None when any
    row group lacks statistics for that column (conservative)."""
    import pyarrow.parquet as pq

    out: dict[str, dict[str, FileStat]] = {}
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        full = os.path.join(path, name)
        meta = pq.ParquetFile(full).metadata
        arrow_schema = meta.schema.to_arrow_schema()
        rows = meta.num_rows
        per_col: dict[str, FileStat] = {}
        for column in columns:
            idx = arrow_schema.get_field_index(column)
            lo, hi = None, None
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    lo, hi = None, None
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            per_col[column] = FileStat(full, lo, hi, rows)
        out[full] = per_col
    return out


def file_stats(path: str, column: str) -> list[FileStat]:
    """Per-file (min, max, rows) for ``column`` from parquet footers
    only — the file-skipping manifest. No data pages are read."""
    many = file_stats_multi(path, [column])
    return [many[f][column] for f in sorted(many)]


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> DataFrame:
    """Attach ``__zkey``: the Morton (Z-order) interleave of the
    columns' bit patterns after min/max scaling to ``bits`` bits each.

    Sorting by the interleaved key places rows close in EVERY listed
    dimension near each other, so per-file min/max ranges become
    narrow on ALL the columns at once — multi-column data skipping,
    where range-clustering can only serve its single sort column.
    This is the Delta `OPTIMIZE ZORDER BY` layout re-done on plain
    parquet. Scaling uses a broadcast 1-row min/max agg; the
    interleave itself is a pure shift/or expression chain (JVM
    codegen, no UDF). Layout-only: correctness never depends on the
    key, so float scaling imprecision is harmless.
    """
    # The interleave must fit 63 bits (long sign bit excluded): with
    # the default bits=16, four columns would push column 0's MSB into
    # the sign bit and wreck the ordering under repartitionByRange.
    # Clustering is layout-only, so silently narrowing per-column
    # precision is safe — locality degrades gracefully, never breaks.
    bits = min(bits, 63 // max(len(cols), 1))
    stats = df.agg(
        *[F.min(c).alias(f"__min_{c}") for c in cols],
        *[F.max(c).alias(f"__max_{c}") for c in cols],
    )
    j = df.crossJoin(F.broadcast(stats))
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        lo = F.col(f"__min_{c}").cast("double")
        rng = F.col(f"__max_{c}").cast("double") - lo
        pos = F.when(rng > 0, (F.col(c).cast("double") - lo) / rng).otherwise(
            F.lit(0.0)
        )
        scaled.append(
            F.least(
                F.lit(top).cast("long"),
                F.greatest(
                    F.lit(0).cast("long"), F.floor(pos * top).cast("long")
                ),
            )
        )
    z = F.lit(0).cast("long")
    for i in range(bits - 1, -1, -1):  # MSB first
        for s in scaled:
            z = F.shiftleft(z, 1).bitwiseOR(
                F.shiftright(s, i).bitwiseAND(F.lit(1))
            )
    return j.withColumn("__zkey", z).drop(
        *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 8, bits: int = 16
) -> None:
    """Write ``df`` as parquet Z-order-clustered on ``cols``: range
    partition + sort on the Morton key, so every output file covers a
    compact hyper-rectangle of the value space and footer stats prune
    on any of the clustered columns."""
    (
        zorder_key(df, cols, bits)
        .repartitionByRange(n_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def read_pruned_multi(
    spark: SparkSession, path: str, ranges: dict[str, tuple]
) -> DataFrame:
    """Scan only files whose footer [min, max] overlaps the requested
    range on EVERY column in ``ranges`` (conjunctive box predicate);
    unknown stats keep the file (conservative). Residual predicates
    still apply row-level, so results equal a full-scan filter."""
    # ONE footer read per file covering every queried column, and
    # dict lookups instead of per-file list scans.
    stats_by_file = file_stats_multi(path, list(ranges))
    candidates = []
    for f in sorted(stats_by_file):
        keep = True
        for c, (lo, hi) in ranges.items():
            st = stats_by_file[f][c]
            if st.min is not None and (st.max < lo or st.min > hi):
                keep = False
                break
        if keep:
            candidates.append(f)
    cond = None
    for c, (lo, hi) in ranges.items():
        term = F.col(c).between(lo, hi)
        cond = term if cond is None else cond & term
    if not candidates:
        return spark.read.parquet(path).filter(cond).limit(0)
    return spark.read.parquet(*candidates).filter(cond)


def read_pruned(
    spark: SparkSession, path: str, column: str, lo, hi
) -> DataFrame:
    """Scan only the files whose [min, max] overlaps [lo, hi] (files
    with unknown stats are kept — skipping must be conservative), with
    the residual predicate still applied row-level. Equivalent rows to
    a full-scan filter, file-list-sized I/O."""
    stats = file_stats(path, column)
    candidates = [
        s.file
        for s in stats
        if s.min is None or not (s.max < lo or s.min > hi)
    ]
    if not candidates:
        return (
            spark.read.parquet(path)
            .filter(F.col(column).between(lo, hi))
            .limit(0)
        )
    return spark.read.parquet(*candidates).filter(F.col(column).between(lo, hi))
