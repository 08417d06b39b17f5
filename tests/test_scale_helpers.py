"""Scale helpers: bucketed co-located joins (zero-Exchange plans) and
salted skew joins (same results as the plain join)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_lakehouse_platform_spark.catalog import load_table
from data_lakehouse_platform_spark.operators.skew import salted_join
from data_lakehouse_platform_spark.plans import audit_plan
from data_lakehouse_platform_spark.sources.writers import write_bucketed
from tests.conftest import SF_DIR


def test_bucketed_join_has_no_exchange(spark):
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(
        orders, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"]
    )
    write_bucketed(
        lineitem.select("l_orderkey", "l_quantity", "l_extendedprice"),
        "b_lineitem",
        ["l_orderkey"],
        8,
        sort_cols=["l_orderkey"],
    )
    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    # Force a non-broadcast join so the bucketing is what saves the
    # shuffle, then assert the plan has no Exchange at all.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey).select(
            "o_orderkey", "l_quantity"
        )
        audit = audit_plan(joined)
        assert audit.shuffles == 0, "bucketed co-located join must not shuffle"
        # Same join on the raw (unbucketed) parquet DOES shuffle.
        raw = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).select("o_orderkey", "l_quantity")
        assert audit_plan(raw).shuffles > 0
        assert joined.count() == raw.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_join_matches_plain_join(spark):
    # Skewed big side: 90% of rows share one key.
    big = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    plain = {(r["k"], r["payload"], r["v"]) for r in big.join(small, ["k"]).collect()}
    salted = {
        (r["k"], r["payload"], r["v"])
        for r in salted_join(big, small, ["k"], salt=8).collect()
    }
    assert salted == plain and len(salted) == 5000


def test_salted_join_left_outer(spark):
    big = spark.range(0, 200).select((F.col("id") % 5).alias("k"), F.col("id").alias("p"))
    small = spark.range(0, 3).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    out = salted_join(big, small, ["k"], salt=4, how="left")
    rows = out.collect()
    assert len(rows) == 200
    assert {r["v"] for r in rows if r["k"] >= 3} == {None}
    assert {r["v"] for r in rows if r["k"] < 3} == {"x"}


def test_operators_handle_empty_inputs(spark):
    """Custom operators must behave on empty inputs — at 100 TB a
    partition, an incremental slice, or a filtered stream is routinely
    empty, and an operator that throws on zero rows kills the job."""
    from pyspark.sql import functions as F

    from data_lakehouse_platform_spark.operators.asof import asof_join
    from data_lakehouse_platform_spark.operators.dedup import (
        containment_pairs,
        exact_dedup_groups,
        jaccard_pairs,
    )

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    empty_sh = spark.createDataFrame([], "doc_id long, shingle string")

    assert exact_dedup_groups(empty_docs, "doc_id", "text").count() == 0
    assert jaccard_pairs(empty_sh).count() == 0
    assert containment_pairs(empty_sh).count() == 0

    left = spark.createDataFrame([(1, 10, 5)], "k int, ts int, payload int")
    empty_right = spark.createDataFrame([], "k int, ts int, v int")
    # Empty right side: every left row survives with a NULL carry.
    out = asof_join(left, empty_right, on="ts", by="k").collect()
    assert len(out) == 1 and out[0]["v_right"] is None
    # Empty right with tolerance: same, and the matched-ts is NULL too.
    out = asof_join(
        left, empty_right, on="ts", by="k", direction="forward", tolerance=100
    ).collect()
    assert len(out) == 1 and out[0]["ts_right"] is None


def test_ivf_ann_recall_vs_bruteforce(spark):
    """IVF recall audit: with trained centroids and a generous nprobe,
    IVF top-k must recover most of the exact brute-force neighbor set
    — and probing ALL cells must make IVF exactly match brute force
    (the correctness limit of the recall/cost dial)."""
    from data_lakehouse_platform_spark.operators import similarity as S
    from data_lakehouse_platform_spark.operators.kmeans import lloyd_kmeans
    from data_lakehouse_platform_spark.catalog import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    _, centroids = lloyd_kmeans(emb, k=8, rounds=2)
    queries = emb.filter(F.col("vec_id") < 8)
    k = 10

    exact = {
        (r["query_id"], r["cand_id"])
        for r in S.ann_topk_bruteforce(emb, queries, k=k).collect()
    }
    approx = {
        (r["query_id"], r["cand_id"])
        for r in S.ann_topk_ivf(emb, queries, centroids, k=k, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall@{k} too low: {recall:.2f}"

    # probing every cell removes the approximation entirely
    full = {
        (r["query_id"], r["cand_id"])
        for r in S.ann_topk_ivf(emb, queries, centroids, k=k, nprobe=8).collect()
    }
    assert full == exact


def test_map_in_arrow_l2_normalize(spark):
    """mapInArrow vector kernel: every embedding comes back unit-norm
    and exactly proportional to its input. The kernel's vectorized
    fold is numpy pairwise summation — deterministic for a fixed
    vector width, but its norm can differ from a sequential fold in
    the last ulp, so the reference comparison carries an explicit
    1e-15 relative bound instead of bit-equality."""
    from data_lakehouse_platform_spark.functions.vectors import l2_normalize_arrow

    emb = load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 50)
    out = l2_normalize_arrow(emb.selectExpr("vec_id", "CAST(embedding AS array<double>) AS embedding"))
    rows = {r["vec_id"]: r["embedding"] for r in out.collect()}
    src = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    import math

    for vid, v in src.items():
        n = math.sqrt(sum(float(x) * float(x) for x in v))
        got = rows[vid]
        for g, x in zip(got, v):
            assert abs(g - float(x) / n) <= 1e-15 * max(1.0, abs(g))
        assert abs(sum(x * x for x in got) - 1.0) < 1e-9

    # determinism: a second run is bit-identical to the first
    again = {r["vec_id"]: r["embedding"] for r in out.collect()}
    assert again == rows


def test_pandas_api_on_spark_matches_sql(spark):
    """pyspark.pandas front end: a pandas-style groupby/agg over the
    same parquet produces exactly the SQL engine's numbers — the
    dataframe-api-for-analysts surface rides the same optimizer."""
    import pyspark.pandas as ps

    psdf = ps.read_parquet(f"{SF_DIR}/orders.parquet")
    got = (
        psdf.groupby("o_orderpriority")["o_orderkey"].count().sort_index().to_dict()
    )
    want = {
        r["o_orderpriority"]: r["n"]
        for r in load_table(spark, SF_DIR, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
