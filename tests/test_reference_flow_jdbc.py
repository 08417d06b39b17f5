"""The reference's end-to-end batch flow, live: a real JDBC database
(embedded Derby) -> watermark-incremental bronze -> silver cleaning ->
gold SCD2 dim — the exact pipeline shape of
bronze_dimension_fact_load.py + silver_dimensions.py +
gold_dim_products.py, with every layer's semantics asserted, including
the second incremental pull moving ONLY the new rows over JDBC."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.plans import MedallionPipeline
from data_lakehouse_platform_spark.sources.readers import read_jdbc

DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def _seed(spark, url, rows, mode="overwrite"):
    df = spark.createDataFrame(
        rows, "product_id int, name string, price double, updated_at int"
    )
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "APP.PRODUCTS")
        .option("driver", DRIVER)
        .mode(mode)
        .save()
    )


def test_jdbc_to_gold_scd2_end_to_end(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/srcdb;create=true"
    _seed(
        spark,
        url,
        [
            (1, "espresso \r", 3.0, 100),  # trailing \r: the reference's
            (2, "latte", 4.5, 100),        # cleaning case (silver_dimensions)
        ],
    )
    pipe = MedallionPipeline(spark, str(tmp_path / "lake"))

    def pull():
        return read_jdbc(spark, url, "APP.PRODUCTS", DRIVER)

    clean = lambda df: df.withColumn(  # noqa: E731
        "name", F.trim(F.regexp_replace("name", "\r", ""))
    )

    def run_pipeline():
        """One scheduled run of the reference's batch flow:
        bronze pull -> silver clean -> gold SCD2 merge."""
        n = pipe.bronze_ingest(pull(), "products", "updated_at")
        pipe.silver_transform("products", clean)
        pipe.gold_scd2(
            "dim_products",
            "product_id",
            ["name", "price"],
            "updated_at",
            source_table="products",
        )
        return n

    # ---- run 1: full table enters bronze ----
    n1 = run_pipeline()
    assert n1 == 2

    # ---- source grows + one product changes price (new version row) ----
    _seed(
        spark,
        url,
        [(3, "mocha", 5.0, 200), (1, "espresso", 3.5, 200)],
        mode="append",
    )
    # ---- run 2 ----
    n2 = run_pipeline()
    assert n2 == 2  # ONLY the new rows moved (watermark pushed to JDBC)
    n3 = pipe.bronze_ingest(pull(), "products", "updated_at")
    assert n3 == 0  # idempotent re-run is a no-op

    silver = pipe.read("silver", "products")
    assert silver.filter(F.col("name").contains("\r")).count() == 0
    assert silver.count() == 4
    dim = pipe.read("gold", "dim_products")
    current = {
        r.product_id: r.price for r in dim.filter("is_current").collect()
    }
    assert current == {1: 3.5, 2: 4.5, 3: 5.0}
    hist1 = dim.filter(F.col("product_id") == 1).collect()
    assert len(hist1) == 2  # old + new version both retained
    assert sum(1 for r in hist1 if r.is_current) == 1


def test_bronze_watermark_predicate_reaches_jdbc(spark, tmp_path):
    """The incremental pull's high-water filter must appear in the JDBC
    scan's PushedFilters — the property that makes the pattern cheap
    against a big production database."""
    url = f"jdbc:derby:{tmp_path}/srcdb2;create=true"
    _seed(spark, url, [(1, "a", 1.0, 100), (2, "b", 2.0, 200)])
    src = read_jdbc(spark, url, "APP.PRODUCTS", DRIVER)
    inc = src.where(F.col("updated_at") > F.lit(100))
    plan = inc._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThan(updated_at,100)" in plan.replace(" ", "")
    assert [r.product_id for r in inc.collect()] == [2]
