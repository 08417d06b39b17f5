"""Round-11 primitive pins (r10 verdict Next-round #7 + ADVICE):

* ``cosine_with_norms`` / ``py_l2_norm`` must be BIT-identical to the
  ``cosine_similarity`` / ``l2_norm`` forms they replaced in the pair
  joins — the r10 rewrite's whole correctness argument.
* ``select_group_weight_crossing`` must agree with the full
  ``with_grouped_rank`` cum/tot form on the crossing rows, including
  null groups, zero weights, decimal weights, and the all-NULL-weight
  bucket that used to TypeError on the driver.
* ``input_scaled_partitions`` floor/scaling, plus the non-local-URI and
  missing-dir fallbacks (ADVICE medium: returning the floor=1 for an
  s3:// lake would serialize every persisted intermediate).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _vec_df(spark, n=200, d=16, seed=3):
    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(d)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id: long, v: array<float>")


def test_cosine_with_norms_bit_identical(spark):
    from data_lakehouse_platform_spark.functions.vectors import (
        cosine_similarity,
        cosine_with_norms,
        l2_norm,
    )

    df = _vec_df(spark)
    pairs = (
        df.alias("a")
        .join(df.alias("b"), F.col("a.id") < F.col("b.id"))
        .where((F.col("a.id") + F.col("b.id")) % 7 == 0)  # thin it out
    )
    naive = pairs.select(
        F.col("a.id").alias("ia"),
        F.col("b.id").alias("ib"),
        cosine_similarity(F.col("a.v"), F.col("b.v")).alias("c"),
    )
    hoisted_a = df.select("id", "v", l2_norm("v").alias("n"))
    hoisted = (
        hoisted_a.alias("a")
        .join(hoisted_a.alias("b"), F.col("a.id") < F.col("b.id"))
        .where((F.col("a.id") + F.col("b.id")) % 7 == 0)
        .select(
            F.col("a.id").alias("ia"),
            F.col("b.id").alias("ib"),
            cosine_with_norms(
                F.col("a.v"), F.col("b.v"), F.col("a.n"), F.col("b.n")
            ).alias("c"),
        )
    )
    want = {(r["ia"], r["ib"]): repr(r["c"]) for r in naive.collect()}
    got = {(r["ia"], r["ib"]): repr(r["c"]) for r in hoisted.collect()}
    assert got == want and len(got) > 100


def test_py_l2_norm_bit_identical_to_spark_fold(spark):
    from data_lakehouse_platform_spark.functions.vectors import (
        l2_norm,
        py_l2_norm,
    )

    df = _vec_df(spark, n=64, d=24, seed=11)
    rows = df.select("id", "v", l2_norm("v").alias("n")).collect()
    for r in rows:
        assert repr(py_l2_norm(r["v"])) == repr(r["n"])


def _weighted_df(spark, seed=5, n=400):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        grp = rng.choice(["a", "b", None, "zero", "nullw"])
        v = float(rng.randint(0, 25))  # tie-heavy on purpose
        if grp == "zero":
            w = 0
        elif grp == "nullw":
            w = None
        else:
            w = rng.randint(0, 6)  # includes zero weights
        rows.append((i, grp, v, w))
    return spark.createDataFrame(rows, "id: long, grp: string, v: double, wt: long")


def _crossing_rows(rows, cum_col="cum", tot_col="tot"):
    """First row per group (by (v, id) order) where 2*cum >= tot."""
    out = {}
    for r in sorted(rows, key=lambda r: (str(r["grp"]), r["v"], r["id"])):
        g = r["grp"]
        if g in out:
            continue
        cum, tot = r[cum_col], r[tot_col]
        if cum is not None and tot is not None and 2 * cum >= tot:
            out[g] = (r["id"], r["v"], cum, tot)
    return out


def test_weight_crossing_matches_full_form(spark):
    from data_lakehouse_platform_spark.operators.ranking import (
        select_group_weight_crossing,
        with_grouped_rank,
    )

    # NB: a bare `grp != 'nullw'` would ALSO drop the null group
    # (three-valued logic) — keep it, it's the point of the test
    df = _weighted_df(spark).where(
        (F.col("grp") != "nullw") | F.col("grp").isNull()
    )
    order = [F.col("v"), F.col("id")]
    full = with_grouped_rank(
        df,
        ["grp"],
        order,
        bucket_key=F.col("v"),
        buckets=8,
        cum_col="cum",
        tot_col="tot",
        weight=F.col("wt"),
        weight_type="bigint",
    )
    sel = select_group_weight_crossing(
        df,
        ["grp"],
        order,
        bucket_key=F.col("v"),
        weight=F.col("wt"),
        buckets=8,
        cum_col="cum",
        tot_col="tot",
        weight_type="bigint",
    )
    want = _crossing_rows(full.collect())
    got = _crossing_rows(sel.collect())
    # the selection twin must locate the same crossing row per group
    # (incl. the null group and the all-zero-weight group) with the
    # same cum/tot values the full form computes there
    assert got == want
    assert set(map(str, got)) == {"a", "b", "None", "zero"}
    # and every selected row's cum/tot must equal the full form's value
    full_by_id = {r["id"]: (r["cum"], r["tot"]) for r in full.collect()}
    for r in sel.collect():
        assert (r["cum"], r["tot"]) == full_by_id[r["id"]]


def test_weight_crossing_decimal_weights(spark):
    from data_lakehouse_platform_spark.operators.ranking import (
        select_group_weight_crossing,
        with_grouped_rank,
    )

    df = _weighted_df(spark, seed=9).where(
        F.col("grp").isin("a", "b")
    ).withColumn("wt", (F.col("wt") * 1000000).cast("decimal(38,0)"))
    order = [F.col("v"), F.col("id")]
    kw = dict(
        bucket_key=F.col("v"),
        weight=F.col("wt"),
        buckets=8,
        cum_col="cum",
        tot_col="tot",
        weight_type="decimal(38,0)",
    )
    full = with_grouped_rank(df, ["grp"], order, **kw)
    sel = select_group_weight_crossing(df, ["grp"], order, **kw)
    assert _crossing_rows(sel.collect()) == _crossing_rows(full.collect())


def test_weight_crossing_all_null_weights_no_crash(spark):
    """A group whose weights are ALL NULL used to TypeError in the
    driver-side crossing scan (ADVICE low); it must now degrade to
    'crossing at the first bucket' instead of crashing."""
    from data_lakehouse_platform_spark.operators.ranking import (
        select_group_weight_crossing,
    )

    df = _weighted_df(spark)  # includes the 'nullw' group
    sel = select_group_weight_crossing(
        df,
        ["grp"],
        [F.col("v"), F.col("id")],
        bucket_key=F.col("v"),
        weight=F.col("wt"),
        buckets=8,
        weight_type="bigint",
    )
    got_groups = {str(r["grp"]) for r in sel.collect()}
    assert "nullw" in got_groups  # crossing emitted, not crashed


def test_input_scaled_partitions_scaling_and_floor(tmp_path):
    from data_lakehouse_platform_spark.catalog import input_scaled_partitions

    d = tmp_path / "sfX"
    d.mkdir()
    (d / "orders.parquet").write_bytes(b"x" * (3 * 1024))
    t = d / "lineitem.parquet"
    t.mkdir()
    (t / "part-0.bin").write_bytes(b"y" * (5 * 1024))
    # 8 KiB total at 1 KiB per partition -> 8
    assert (
        input_scaled_partitions(
            str(d), "orders", "lineitem", bytes_per_partition=1024
        )
        == 8
    )
    # floor wins when the input is smaller than one partition's budget
    assert (
        input_scaled_partitions(str(d), "orders", floor=3)
        == 3
    )
    # file:// URIs are local too
    assert (
        input_scaled_partitions(
            f"file://{d}", "orders", "lineitem", bytes_per_partition=1024
        )
        == 8
    )


def test_input_scaled_partitions_nonlocal_falls_back(monkeypatch, tmp_path):
    from data_lakehouse_platform_spark.catalog import input_scaled_partitions

    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE", "96")
    # object-store URI: os.path can't size it; must NOT return floor=1
    assert input_scaled_partitions("s3://lake/sf100", "lineitem") == 96
    assert input_scaled_partitions("hdfs://nn:8020/sf100", "lineitem") == 96
    # a local dir with no measurable table is the same hazard
    assert input_scaled_partitions(str(tmp_path), "lineitem") == 96
    monkeypatch.delenv("SPARK_GRAFT_SHUFFLE")
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "48")
    assert input_scaled_partitions("s3://lake/sf100", "lineitem") == 48


def test_with_global_ntile_matches_spark_ntile(spark):
    from data_lakehouse_platform_spark.operators.ranking import (
        with_global_ntile,
    )
    from pyspark.sql import Window

    rng = random.Random(17)
    rows = [(i, float(rng.randint(0, 12))) for i in range(137)]
    df = spark.createDataFrame(rows, "id: long, v: double")
    for k in (5, 10):
        for desc in (False, True):
            got = with_global_ntile(
                df, [("v", desc), ("id", False)], k, "t", buckets=8
            )
            order = [F.col("v").desc() if desc else F.col("v").asc(), F.col("id")]
            want = df.withColumn("t", F.ntile(k).over(Window.orderBy(*order)))
            g = {r["id"]: r["t"] for r in got.collect()}
            e = {r["id"]: r["t"] for r in want.collect()}
            assert g == e, (k, desc)


def test_with_global_ntile_fewer_rows_than_tiles(spark):
    from data_lakehouse_platform_spark.operators.ranking import (
        with_global_ntile,
    )
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(1, 3.0), (2, 1.0), (3, 2.0)], "id: long, v: double"
    )
    got = with_global_ntile(df, [("v", False), ("id", False)], 5, "t")
    want = df.withColumn(
        "t", F.ntile(5).over(Window.orderBy(F.col("v"), F.col("id")))
    )
    assert {r["id"]: r["t"] for r in got.collect()} == {
        r["id"]: r["t"] for r in want.collect()
    }
