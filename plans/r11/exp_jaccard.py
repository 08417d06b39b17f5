#!/usr/bin/env python
"""A/B: graph_neighbor_jaccard current form vs single-exchange-by-p
re-key (dedup, cap-count, cap-join and pair self-join all reuse one
hash(p) partitioning — guide §2.4)."""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/plans/r11")

from bench_env import setup, timeq  # noqa: E402

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from data_lakehouse_platform_spark.catalog import load_table  # noqa: E402
from data_lakehouse_platform_spark.queries import all_queries  # noqa: E402

_NJ_CAP = 40
_NJ_TOPK = 20


def variant(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges_all = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .repartition(n, "p")
        .dropDuplicates(["c", "p"])
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ok_parts = (
        edges_all.groupBy("p")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") <= _NJ_CAP)
        .select("p")
    )
    edges = edges_all.join(ok_parts, "p").persist(StorageLevel.MEMORY_AND_DISK)
    deg = edges.groupBy("c").agg(F.count(F.lit(1)).alias("d"))
    a = edges.select(F.col("c").alias("cust_a"), "p")
    b = edges.select(F.col("c").alias("cust_b"), "p")
    pairs = (
        a.join(b, "p")
        .filter(F.col("cust_a") < F.col("cust_b"))
        .groupBy("cust_a", "cust_b")
        .agg(F.count(F.lit(1)).alias("shared_parts"))
    )
    da = deg.select(F.col("c").alias("cust_a"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("c").alias("cust_b"), F.col("d").alias("deg_b"))
    out = (
        pairs.join(da, "cust_a")
        .join(db, "cust_b")
        .select(
            "cust_a", "cust_b", "shared_parts", "deg_a", "deg_b",
            (
                F.col("shared_parts").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("shared_parts")).cast("double")
            ).alias("jaccard"),
        )
    )
    return out.orderBy(F.col("jaccard").desc(), "cust_a", "cust_b").limit(_NJ_TOPK)


def main():
    spark, sf_dir = setup("exp-jaccard")
    reg = all_queries()
    cur = getattr(reg["graph_neighbor_jaccard"].build, "__wrapped__")
    # warm
    timeq(spark, cur(spark, sf_dir), iters=1)
    timeq(spark, variant(spark, sf_dir), iters=1)
    t_cur = timeq(spark, cur(spark, sf_dir), iters=3)
    t_var = timeq(spark, variant(spark, sf_dir), iters=3)
    # interleave once more to de-bias drift
    t_cur2 = timeq(spark, cur(spark, sf_dir), iters=3)
    t_var2 = timeq(spark, variant(spark, sf_dir), iters=3)
    print(f"current: {min(t_cur, t_cur2):.3f}s  variant: {min(t_var, t_var2):.3f}s")
    # value identity
    a = cur(spark, sf_dir).collect()
    b = variant(spark, sf_dir).collect()
    print("identical:", [tuple(r) for r in a] == [tuple(r) for r in b], len(a))


if __name__ == "__main__":
    main()
