"""LIVE JDBC integration: Spark ships the embedded Derby driver (it
backs the Hive metastore), so the partitioned-parallel JDBC reader —
env-gated for MySQL in the reference's setup — is exercised here
against a real database end-to-end: write over JDBC, read back whole
and partitioned, and verify predicate pushdown reaches the database.

Reference analog: bronze_dimension_fact_load.py:46-58 reads MySQL over
a SINGLE connection; read_jdbc's partitionColumn/bounds split is the
scale fix, proven live here."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.sources.readers import read_jdbc

DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    url = f"jdbc:derby:{tmp_path_factory.mktemp('derby')}/db;create=true"
    src = spark.range(100).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("row-"), F.col("id")).alias("val"),
        (F.col("id") % 7).cast("int").alias("grp"),
    )
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "APP.EVENTS")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )
    return url


def test_jdbc_roundtrip_whole_table(spark, derby):
    back = read_jdbc(spark, derby, "APP.EVENTS", DRIVER)
    rows = sorted((r.id, r.val, r.grp) for r in back.collect())
    assert len(rows) == 100
    assert rows[0] == (0, "row-0", 0) and rows[99] == (99, "row-99", 1)


def test_jdbc_partitioned_parallel_read(spark, derby):
    """partitionColumn/bounds split the scan across N connections —
    N input partitions, same rows, no duplication or loss at the
    stride boundaries."""
    back = read_jdbc(
        spark,
        derby,
        "APP.EVENTS",
        DRIVER,
        partition_column="id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=100,
    )
    assert back.rdd.getNumPartitions() == 4
    assert sorted(r.id for r in back.collect()) == list(range(100))


def test_jdbc_predicate_pushdown_reaches_database(spark, derby):
    back = read_jdbc(spark, derby, "APP.EVENTS", DRIVER).where(F.col("id") < 10)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan(id,10)" in plan.replace(" ", "")
    assert back.count() == 10


def test_jdbc_incremental_watermark_shape(spark, derby):
    """The reference's incremental bronze load (filter > high-water
    mark) expressed over JDBC: the watermark predicate is pushed to
    the database, so each incremental pull transfers only new rows."""
    hi = 90
    inc = read_jdbc(spark, derby, "APP.EVENTS", DRIVER).where(F.col("id") > hi)
    plan = inc._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThan(id,90)".replace(" ", "") in plan.replace(" ", "")
    assert inc.count() == 9
