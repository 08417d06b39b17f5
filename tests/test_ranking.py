"""Distributed ranking (operators/ranking.py): the two-pass bucketed
rank must agree exactly with the single-partition window it replaces,
on every primitive (row_number, NTILE, running sum, prior running max,
grouped variants) — and the LSH production cap must keep an
identical-document crowd bounded."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F


def _toy(spark, n=500, groups=None, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                rng.choice(groups) if groups else "g",
                float(rng.randint(0, 80)),  # deliberately tie-heavy
                rng.randint(1, 9),
            )
        )
    return spark.createDataFrame(rows, "id: long, grp: string, v: double, wt: long")


def test_global_rank_matches_window(spark):
    from data_lakehouse_platform_spark.operators.ranking import with_global_rank

    df = _toy(spark)
    order = [F.col("v").desc(), F.col("id")]
    got, st = with_global_rank(
        df,
        order,
        bucket_key=-F.col("v"),
        buckets=16,
        rn_col="rn",
        cum_col="cum",
        weight=F.col("wt"),
        weight_type="bigint",
    )
    w = Window.orderBy(*order)
    want = df.withColumn("rn", F.row_number().over(w)).withColumn(
        "cum", F.sum("wt").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    g = {r["id"]: (r["rn"], r["cum"]) for r in got.collect()}
    e = {r["id"]: (r["rn"], r["cum"]) for r in want.collect()}
    assert g == e
    assert st.rows == 500 and st.weight_sum == sum(
        r["wt"] for r in df.collect()
    )


def test_global_prior_max_matches_window(spark):
    from data_lakehouse_platform_spark.operators.ranking import with_global_rank

    df = _toy(spark, n=300, seed=11)
    order = [F.col("v").asc(), F.col("id")]
    got, _ = with_global_rank(
        df,
        order,
        bucket_key=F.col("v"),
        buckets=8,
        prior_max_col="pm",
        weight=F.col("wt"),
        weight_type="bigint",
    )
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    want = df.withColumn("pm", F.max("wt").over(w))
    g = {r["id"]: r["pm"] for r in got.collect()}
    e = {r["id"]: r["pm"] for r in want.collect()}
    assert g == e  # includes the NULL-for-first-row case


def test_ntile_expr_matches_spark_ntile(spark):
    from data_lakehouse_platform_spark.operators.ranking import (
        ntile_expr,
        with_global_rank,
    )

    for n, k in [(500, 10), (47, 5), (3, 5)]:
        df = _toy(spark, n=n, seed=n)
        order = [F.col("v").asc(), F.col("id")]
        got, st = with_global_rank(
            df, order, bucket_key=F.col("v"), buckets=8, rn_col="rn"
        )
        got = got.withColumn("t", ntile_expr(F.col("rn"), st.rows, k))
        want = df.withColumn("t", F.ntile(k).over(Window.orderBy(*order)))
        g = {r["id"]: r["t"] for r in got.collect()}
        e = {r["id"]: r["t"] for r in want.collect()}
        assert g == e, (n, k)


def test_grouped_rank_matches_window(spark):
    from data_lakehouse_platform_spark.operators.ranking import with_grouped_rank

    df = _toy(spark, n=600, groups=["a", "b", "c"], seed=13)
    order = [F.col("v"), F.col("id")]
    got = with_grouped_rank(
        df,
        ["grp"],
        order,
        bucket_key=F.col("v"),
        buckets=16,
        rn_col="rn",
        n_col="n",
        cum_col="cum",
        tot_col="tot",
        weight=F.col("wt"),
        weight_type="bigint",
    )
    w = Window.partitionBy("grp").orderBy(*order)
    wg = Window.partitionBy("grp")
    want = (
        df.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(wg))
        .withColumn("cum", F.sum("wt").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("tot", F.sum("wt").over(wg))
    )
    g = {r["id"]: (r["rn"], r["n"], r["cum"], r["tot"]) for r in got.collect()}
    e = {r["id"]: (r["rn"], r["n"], r["cum"], r["tot"]) for r in want.collect()}
    assert g == e


def test_lsh_production_cap_bounds_identical_crowd(spark):
    """A 10k-identical-doc crowd under the production cap emits ZERO
    crowd pairs (uncapped: ~5*10^7 from one reducer) while a genuine
    near-dup pair below the cap survives — the dedup_exact-before-LSH
    contract at the scale that motivated it."""
    from data_lakehouse_platform_spark.operators import dedup as D
    from data_lakehouse_platform_spark.operators import text as T
    from data_lakehouse_platform_spark.queries_llm import (
        _BANDS,
        _LSH_MAX_BUCKET,
        _N_HASHES,
    )

    crowd = [
        (i, "boiler plate legal disclaimer repeated verbatim on every page")
        for i in range(10_000)
    ]
    real = [
        (20_000, "genuinely unique words apple banana cherry date elderberry fig"),
        (20_001, "genuinely unique words apple banana cherry date elderberry fig"),
    ]
    docs = spark.createDataFrame(crowd + real, "doc_id: long, text: string")
    sh = T.explode_shingles(docs, "doc_id", "text", k=3, distinct=False)
    sigs = D.minhash_signatures(sh, n_hashes=_N_HASHES)
    pairs = D.lsh_candidate_pairs(
        sigs, n_hashes=_N_HASHES, bands=_BANDS, max_bucket=_LSH_MAX_BUCKET
    )
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert got == {(20_000, 20_001)}


def test_grouped_rank_null_group_rows_kept(spark):
    """NULL is a real group: ROW_NUMBER() OVER (PARTITION BY g) ranks
    null-group rows normally, so the offsets join-back must be
    null-safe — no silent row loss."""
    from pyspark.sql import functions as F
    from data_lakehouse_platform_spark.operators.ranking import (
        with_grouped_rank,
    )

    rows = [(None, 10, 1), (None, 5, 2), ("a", 7, 3), ("a", 1, 4)]
    df = spark.createDataFrame(rows, "g string, v int, id int")
    out = with_grouped_rank(
        df,
        ["g"],
        [F.col("v"), F.col("id")],
        bucket_key=F.col("v"),
        rn_col="rn",
    ).collect()
    assert len(out) == 4  # null-group rows survive
    got = {(r.g, r.v): r.rn for r in out}
    assert got[(None, 5)] == 1 and got[(None, 10)] == 2
    assert got[("a", 1)] == 1 and got[("a", 7)] == 2


def test_select_group_ranks_matches_window(spark):
    from data_lakehouse_platform_spark.operators.ranking import select_group_ranks

    df = _toy(spark, n=600, groups=["a", "b", "c"], seed=29)
    order = [F.col("v"), F.col("id")]

    def ranks_fn(n):
        # interpolation-endpoint shape plus the extremes
        return {1, n, n // 2 + 1, max(1, n // 4), min(n, 3 * n // 4 + 1)}

    got = select_group_ranks(
        df, ["grp"], order, bucket_key=F.col("v"), ranks_fn=ranks_fn,
        buckets=16, rn_col="rn", n_col="n",
    )
    w = Window.partitionBy("grp").orderBy(*order)
    wg = Window.partitionBy("grp")
    full = (
        df.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(wg))
        .collect()
    )
    sizes = {}
    for r in full:
        sizes[r["grp"]] = r["n"]
    want = {
        (r["grp"], r["rn"]): (r["id"], r["n"])
        for r in full
        if r["rn"] in ranks_fn(sizes[r["grp"]])
    }
    res = {(r["grp"], r["rn"]): (r["id"], r["n"]) for r in got.collect()}
    assert res == want


def test_select_group_ranks_null_group_and_bounds(spark):
    import pytest

    from data_lakehouse_platform_spark.operators.ranking import select_group_ranks

    df = _toy(spark, n=60, groups=["a"], seed=3).withColumn(
        "grp", F.when(F.col("id") % 2 == 0, F.col("grp"))
    )  # half the rows in the NULL group
    out = select_group_ranks(
        df, ["grp"], [F.col("v"), F.col("id")], bucket_key=F.col("v"),
        ranks_fn=lambda n: {1, n}, buckets=8,
    ).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r["rn"])
    assert sorted(by_grp[None]) == [1, 30]
    assert sorted(by_grp["a"]) == [1, 30]

    with pytest.raises(ValueError, match="outside"):
        select_group_ranks(
            df, ["grp"], [F.col("v"), F.col("id")], bucket_key=F.col("v"),
            ranks_fn=lambda n: {n + 1}, buckets=8,
        )


def test_grouped_rank_refuses_high_cardinality_groups(spark, monkeypatch):
    """The |groups| x buckets driver fetch is a hard, loud cap — not a
    docstring convention (VERDICT r7, What's wrong #3).  The probe is
    limit-bounded, so the refusal itself never hauls the oversized
    result to the driver."""
    import pytest

    from data_lakehouse_platform_spark.operators import ranking

    df = spark.range(500).select(
        F.col("id"),
        F.col("id").cast("string").alias("grp"),  # every row its own group
        (F.col("id") % 97).cast("double").alias("v"),
    )
    monkeypatch.setattr(ranking, "STATS_CAP", 100)
    with pytest.raises(ValueError, match="driver stats cap"):
        ranking.with_grouped_rank(
            df, ["grp"], [F.col("v"), F.col("id")],
            bucket_key=F.col("v"), buckets=4, rn_col="rn",
        )
    with pytest.raises(ValueError, match="driver stats cap"):
        ranking.select_group_ranks(
            df, ["grp"], [F.col("v"), F.col("id")],
            bucket_key=F.col("v"), ranks_fn=lambda n: {1}, buckets=4,
        )
    # under the cap the same shapes still work
    monkeypatch.setattr(ranking, "STATS_CAP", 65_536)
    out = ranking.with_grouped_rank(
        df, ["grp"], [F.col("v"), F.col("id")],
        bucket_key=F.col("v"), buckets=4, rn_col="rn",
    )
    assert out.where(F.col("rn") != 1).count() == 0  # singleton groups
