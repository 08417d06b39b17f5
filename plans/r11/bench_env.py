"""Shared measurement session for r11: same layout as bench.py
(fanned-out inputs + 2 MB maxPartitionBytes) so per-query experiments
measure what the bench measures.  Import and call setup()."""
import os
import sys

sys.path.insert(0, "/root/repo")


def setup(app="dlp-r11"):
    from bench import _fan_out_inputs
    from data_lakehouse_platform_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app)
    spark.sparkContext.setLogLevel("ERROR")
    if os.environ.get("SPARK_GRAFT_BENCH_FANOUT", "1") != "0":
        sf_dir = _fan_out_inputs(spark, sf_dir)
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(2 * 1024 * 1024))
    return spark, sf_dir


def timeq(spark, df, iters=3):
    import time

    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        best = el if best is None or el < best else best
        spark.catalog.clearCache()
    return best
