#!/usr/bin/env python
"""Generate the golden format fixtures: one Delta and one Iceberg table
written by THIS engine from a fixed seed dataset.  Committed to git so
every later round proves it can still READ its own earlier output
(format drift across rounds is otherwise invisible without the JVM
runtimes — VERDICT r8, What's missing #1).

Regenerate ONLY on an intentional format change:
    python tests/fixtures/golden/generate.py
then review the git diff of the log/metadata files by hand.
"""

import os
import shutil
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.abspath(os.path.join(HERE, "..", "..", "..")))


def seed_df(spark):
    from pyspark.sql import functions as F

    return (
        spark.range(20)
        .select(
            F.col("id").cast("int").alias("id"),
            (F.col("id") % 3).cast("int").alias("bucket"),
            F.concat(F.lit("row-"), F.col("id")).alias("name"),
            (F.col("id") * 2.5).alias("score"),
        )
        .coalesce(1)
    )


def main():
    from data_lakehouse_platform_spark.session import get_spark
    from data_lakehouse_platform_spark.sources.delta_lite import (
        DeltaLiteTable,
    )
    from data_lakehouse_platform_spark.sources.iceberg_lite import (
        IcebergLiteTable,
    )

    spark = get_spark("golden-fixtures", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    dpath = os.path.join(HERE, "delta_table")
    ipath = os.path.join(HERE, "iceberg_table")
    for p in (dpath, ipath):
        if os.path.isdir(p):
            shutil.rmtree(p)

    df = seed_df(spark)
    dt = DeltaLiteTable(dpath)
    dt.write(df)                       # v0: create
    dt.write(df.filter("id >= 20"), mode="append")  # v1: empty append
    from pyspark.sql import functions as F

    dt.write(
        seed_df(spark)
        .withColumn("score", F.col("score") + 1)
        .filter("id < 5"),
        mode="append",
    )                                  # v2: append
    dt.delete(spark, "id = 1")         # v3: delete (remove + rewrite)
    dt.checkpoint()                    # classic checkpoint

    it = IcebergLiteTable(ipath)
    it.write(df)                       # s1: create/append
    it.write(seed_df(spark).filter("id < 5"), mode="append")  # s2
    it.delete(spark, "id = 2")         # s3: delete
    print("delta versions:", dt.all_versions())
    print("iceberg snapshots:",
          [s["snapshot-id"] for s in it.metadata().get("snapshots", [])])


if __name__ == "__main__":
    main()
