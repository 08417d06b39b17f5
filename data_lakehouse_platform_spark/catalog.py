"""Table catalog over the driver-generated parquet test tables.

Mirrors the reference's layered reads (bronze/silver reads in
scripts/batch/*.py read one parquet per table); here a single loader
keeps scans declarative so Catalyst gets pushdown + pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that are always safe to broadcast in joins.
# At 100 TB the fact tables (orders/lineitem/events/documents/
# embeddings) grow with SF; these stay bounded.
BROADCAST_DIMS: frozenset[str] = frozenset({"region", "nation", "supplier", "part", "customer"})


# Tables whose queries are map-CPU-bound (per-row md5/regex/vector
# math), where an under-partitioned scan serializes the whole job.
# Relational tables are NOT fanned out: their queries are shuffle-
# bound, so a pre-shuffle for map parallelism costs more than it buys.
_CPU_HEAVY: frozenset[str] = frozenset({"documents", "embeddings"})


def _fan_out(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Give under-partitioned scans map-side parallelism.

    The test parquet is one single-row-group file per table, so the
    scan yields ONE task and every map-heavy expression (shingle md5,
    text regexes, vector math) runs on one core of local[32]. On a
    real cluster a 100 TB table has thousands of splits and this
    no-ops (scan partitions >= parallelism — the repartition never
    fires, so no gratuitous full-table shuffle at scale). Catalyst
    still pushes filters/pruning through Repartition to the scan.
    """
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def input_scaled_partitions(
    sf_dir: str,
    *tables: str,
    bytes_per_partition: int = 64 * 1024 * 1024,
    floor: int = 1,
) -> int:
    """Partition count derived from INPUT size — the scale-adaptive
    replacement for a constant (r10 optimization round, guide §2).

    Persisted intermediates inherit the static shuffle-partition count
    (AQE does not re-plan cached output partitioning), so a small
    aggregate cached at local[32]'s 32 partitions pays 32 tasks per
    consumer stage on kilobytes of data, while a hard-coded small
    number would wall a 100 TB run.  Sizing by input bytes gives 1
    partition on the local bench and thousands on a real lake: the
    intermediate an operator persists is never LARGER than its input,
    so input bytes / 64 MB is a safe upper-bound shape for it.

    Non-local inputs (r10 advice): the os.path sizing below only works
    for local paths.  For any URI store (s3://, hdfs://, abfs://...) —
    or a local path whose tables can't be found at all — silently
    returning the floor would repartition every persisted intermediate
    to ONE partition at exactly the scale this helper exists for, so
    fall back to the session's configured shuffle width instead (the
    same default the static form used, never worse than it).
    """
    import math
    import re

    def _fallback() -> int:
        return int(
            os.environ.get(
                "SPARK_GRAFT_SHUFFLE", os.environ.get("SPARK_GRAFT_CPUS", "32")
            )
        )

    if re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", sf_dir) and not sf_dir.startswith(
        "file://"
    ):
        return max(floor, _fallback())
    local_dir = sf_dir[len("file://"):] if sf_dir.startswith("file://") else sf_dir
    total = 0
    for t in tables:
        p = f"{local_dir}/{t}.parquet"
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                total += sum(
                    os.path.getsize(os.path.join(root, f)) for f in files
                )
        elif os.path.exists(p):
            total += os.path.getsize(p)
    if total == 0 and tables:
        # nothing measurable (wrong dir, permissions, empty): same
        # single-partition hazard as the URI case — use the static width
        return max(floor, _fallback())
    return max(floor, math.ceil(total / bytes_per_partition))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # Some generations of the testdata write events.ts as parquet
        # TIMESTAMP(NANOS), which Spark rejects by default; others as
        # TIMESTAMP(MICROS), which reads natively. Try the native read
        # first and only flip the nanos-as-long escape hatch when the
        # file is genuinely NANOS — in that case the flag must REMAIN
        # set for the returned DataFrame's lifetime (the scan consults
        # it at execution), so it stays session-wide by design; in the
        # common micros case the loader has no conf side effect at
        # all. Then convert ONLY if ts actually arrived as a raw
        # int64: truncate nanos→micros with INTEGER division (`div`)
        # — double division would lose low bits of the int64 and
        # corrupt timestamps. DuckDB truncates the same way, so the
        # oracle sees identical values either way.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        try:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
            df.schema  # force schema resolution to surface NANOS here
        except Exception:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            # Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) reads as
            # NTZ; downstream code (unix_micros, range joins) expects a
            # regular TIMESTAMP. The session timezone is pinned to UTC
            # (session.py), so this cast is value-preserving and lands
            # on exactly the instants DuckDB reads for the same file.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name in _CPU_HEAVY:
        return _fan_out(spark, df)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql access."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
