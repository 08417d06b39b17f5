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


def file_stats(path: str, column: str) -> list[FileStat]:
    """Per-file (min, max, rows) for ``column`` from parquet footers
    only — the file-skipping manifest. No data pages are read."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        full = os.path.join(path, name)
        meta = pq.ParquetFile(full).metadata
        idx = meta.schema.to_arrow_schema().get_field_index(column)
        lo, hi, rows = None, None, 0
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            rows += meta.row_group(rg).num_rows
            if st is None or not st.has_min_max:
                lo, hi = None, None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append(FileStat(full, lo, hi, rows))
    return out


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
