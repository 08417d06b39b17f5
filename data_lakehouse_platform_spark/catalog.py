"""Table catalog over the driver-generated parquet test tables.

Mirrors the reference's layered reads (bronze/silver reads in
scripts/batch/*.py read one parquet per table); here a single loader
keeps scans declarative so Catalyst gets pushdown + pruning for free.
"""

from __future__ import annotations

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark rejects by
        # default. Read it as raw nanos and truncate to micros with
        # INTEGER division (`div`) — double division would lose low
        # bits of the int64 and corrupt timestamps. DuckDB truncates
        # the same way, so the oracle sees identical values.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql access."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
