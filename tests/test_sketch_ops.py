"""Property tests for operators/sketches.py — the guarantees the
registry queries rely on, checked structurally rather than against
the oracle (tests/test_oracle_parity.py covers value parity):

* HLL registers MERGE: MAX over two half-corpus sketches equals the
  whole-corpus sketch (the contract that lets daily sketches roll up
  into monthly uniques without touching raw data).
* HLL raw estimate lands within the published error envelope.
* Count-min never underestimates, and exact-counts a key that has no
  cell collisions in any row.
* Bloom has no false negatives: every inserted key's bits are set.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_platform_spark.operators import sketches as SK


def _ids(spark, n, label, start=0):
    return spark.range(start, start + n).select(
        F.lit(label).alias("g"), F.col("id").alias("v")
    )


def test_hll_registers_merge_exactly(spark):
    whole = _ids(spark, 3000, "a")
    left = _ids(spark, 1500, "a")
    right = _ids(spark, 1500, "a", start=1500)

    reg_whole = SK.hll_registers(whole, ["g"], "v")
    merged = (
        SK.hll_registers(left, ["g"], "v")
        .unionByName(SK.hll_registers(right, ["g"], "v"))
        .groupBy("g", "reg")
        .agg(F.max("m").alias("m"))
    )
    assert sorted(map(tuple, reg_whole.collect())) == sorted(
        map(tuple, merged.collect())
    )
    # ...and therefore the estimates agree bit for bit.
    e1 = SK.hll_estimate(reg_whole, ["g"]).collect()[0].hll_estimate
    e2 = SK.hll_estimate(merged, ["g"]).collect()[0].hll_estimate
    assert e1 == e2


def test_hll_estimate_within_error_envelope(spark):
    # Raw HLL with m=64 has relative sigma ~ 1.04/sqrt(64) = 13%;
    # 3 sigma on one draw. Distinct count far above 2.5*m so the raw
    # (uncorrected) estimator is in its valid range.
    n = 5000
    est = SK.hll_estimate(
        SK.hll_registers(_ids(spark, n, "a"), ["g"], "v"), ["g"]
    ).collect()[0].hll_estimate
    assert abs(est - n) / n < 0.39


def test_countmin_never_underestimates(spark):
    df = spark.range(1000).select(
        F.concat(F.lit("k"), (F.col("id") % 37).cast("string")).alias("k")
    )
    sketch = SK.countmin_table(df, "k", d=4, w=64)
    exact = {r.k: r.cnt for r in df.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    cells = {(r.row, r.cell): r.cnt for r in sketch.collect()}

    import hashlib

    def h(row, key):
        return int(hashlib.md5(f"{row}:{key}".encode()).hexdigest()[:15], 16) % 64

    for key, true_cnt in exact.items():
        est = min(cells[(row, h(row, key))] for row in range(4))
        assert est >= true_cnt
    # With 37 keys in 4x64 cells some row is collision-free for most
    # keys; assert at least one key is estimated exactly (sanity that
    # the MIN actually tightens).
    assert any(
        min(cells[(row, h(row, k))] for row in range(4)) == c for k, c in exact.items()
    )


def test_bloom_no_false_negatives(spark):
    keys = spark.range(500).select(
        F.concat(F.lit("gram-"), F.col("id").cast("string")).alias("k")
    )
    bits = {r.bitpos for r in SK.bloom_bits(keys, "k", k=3, m_bits=4096).collect()}

    import hashlib

    for i in range(500):
        key = f"gram-{i}"
        for j in range(3):
            pos = int(hashlib.md5(f"{j}:{key}".encode()).hexdigest()[:15], 16) % 4096
            assert pos in bits


def test_attribution_pair_free_matches_pairwise_under_hot_user(spark, tmp_path):
    """The registry attribution plan must produce EXACTLY the pairwise
    interval-join answer on a corpus with a hyperactive user (where the
    pairwise form would materialize |P_u| x |T_u| rows) — and do it
    without any join in the plan."""
    import datetime as dt

    from pyspark.sql import Window

    rows = []
    base = dt.datetime(2024, 1, 1)
    eid = 0
    # hot user 1: 2000 touches + 40 purchases inside overlapping windows
    for i in range(2000):
        rows.append((eid, base + dt.timedelta(hours=i % 168), 1,
                     "click" if i % 2 else "view", 0.0, "{}")); eid += 1
    for i in range(40):
        rows.append((eid, base + dt.timedelta(hours=3 * i + 1), 1,
                     "purchase", 10.0 + i, "{}")); eid += 1
    # normal users
    for u in range(2, 12):
        for i in range(5):
            rows.append((eid, base + dt.timedelta(hours=u + i), u,
                         "view", 0.0, "{}")); eid += 1
        rows.append((eid, base + dt.timedelta(hours=u + 6), u,
                     "purchase", 5.0, "{}")); eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    import __spark_entry__ as e

    got_df = e.queries()["attribution_linear"](spark, str(tmp_path))
    got = {r.touch_type: (r.n_touches, r.credit_millis, r.credited_value)
           for r in got_df.collect()}

    # pairwise twin, straight from the oracle's definition
    p = ev.filter("event_type = 'purchase'").selectExpr(
        "event_id p_id", "user_id", "ts p_ts",
        "CAST(FLOOR(value * 1000000) AS BIGINT) value_micros")
    t = ev.filter("event_type IN ('click','view')").selectExpr(
        "user_id", "ts t_ts", "event_type touch_type")
    j = p.join(t, (p.user_id == t.user_id)
               & (t.t_ts > p.p_ts - F.expr("INTERVAL 7 DAYS"))
               & (t.t_ts <= p.p_ts))
    jn = j.withColumn("n", F.count("*").over(Window.partitionBy("p_id")))
    want = {r.touch_type: (r.n_touches, r.credit_millis, r.credited_value)
            for r in jn.groupBy("touch_type").agg(
                F.count("*").alias("n_touches"),
                F.sum(F.expr("1000 div n")).cast("bigint").alias("credit_millis"),
                (F.sum(F.expr("value_micros div n")).cast("bigint")
                 / F.lit(1000000.0)).alias("credited_value"),
            ).collect()}
    assert got == want and "click" in got

    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # pair-free: union + one window pass


def test_position_attribution_matches_pairwise_under_hot_user(
    spark, tmp_path
):
    """Position-based (U-shaped) credit on a hyperactive user: the
    rank-probe construction must equal the pairwise ROW_NUMBER answer
    exactly, with NO interval join in the plan (only the two
    co-partitioned (user, rank) equi-joins)."""
    import datetime as dt

    from pyspark.sql import Window

    rows = []
    base = dt.datetime(2024, 1, 1)
    eid = 0
    for i in range(2000):
        rows.append((eid, base + dt.timedelta(hours=i % 168), 1,
                     "click" if i % 2 else "view", 0.0, "{}")); eid += 1
    for i in range(40):
        rows.append((eid, base + dt.timedelta(hours=3 * i + 1), 1,
                     "purchase", 10.0 + i, "{}")); eid += 1
    # degenerate windows: n=1 and n=2 users, plus equal-ts tie user
    rows.append((eid, base, 2, "view", 0.0, "{}")); eid += 1
    rows.append((eid, base + dt.timedelta(hours=1), 2,
                 "purchase", 7.0, "{}")); eid += 1
    rows.append((eid, base, 3, "view", 0.0, "{}")); eid += 1
    rows.append((eid, base + dt.timedelta(minutes=30), 3,
                 "click", 0.0, "{}")); eid += 1
    rows.append((eid, base + dt.timedelta(hours=1), 3,
                 "purchase", 9.0, "{}")); eid += 1
    rows.append((eid, base, 4, "view", 0.0, "{}")); eid += 1
    rows.append((eid, base, 4, "click", 0.0, "{}")); eid += 1  # tie ts
    rows.append((eid, base, 4, "click", 0.0, "{}")); eid += 1  # tie ts
    rows.append((eid, base + dt.timedelta(hours=2), 4,
                 "purchase", 11.0, "{}")); eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    import __spark_entry__ as e

    got_df = e.queries()["attribution_position_based"](
        spark, str(tmp_path)
    )
    got = {r.touch_type: (r.n_touches, r.credit_millis, r.credited_value)
           for r in got_df.collect()}

    # pairwise twin from the oracle definition
    p = ev.filter("event_type = 'purchase'").selectExpr(
        "event_id p_id", "user_id", "ts p_ts",
        "CAST(FLOOR(value * 1000000) AS BIGINT) value_micros")
    t = ev.filter("event_type IN ('click','view')").selectExpr(
        "user_id", "ts t_ts", "event_id t_id", "event_type touch_type")
    j = p.join(t, (p.user_id == t.user_id)
               & (t.t_ts > p.p_ts - F.expr("INTERVAL 7 DAYS"))
               & (t.t_ts <= p.p_ts))
    wp = Window.partitionBy("p_id")
    jn = (
        j.withColumn("pos", F.row_number().over(
            wp.orderBy("t_ts", "t_id")))
        .withColumn("n", F.count("*").over(wp))
        .withColumn(
            "millis",
            F.when(F.col("n") == 1, 1000)
            .when(F.col("n") == 2, 500)
            .when((F.col("pos") == 1) | (F.col("pos") == F.col("n")), 400)
            .otherwise(F.expr("200 div (n - 2)")),
        )
    )
    want = {r.touch_type: (r.n_touches, r.credit_millis, r.credited_value)
            for r in jn.groupBy("touch_type").agg(
                F.count("*").alias("n_touches"),
                F.sum("millis").cast("bigint").alias("credit_millis"),
                (F.sum(F.expr("(value_micros * millis) div 1000"))
                 .cast("bigint") / F.lit(1000000.0))
                .alias("credited_value"),
            ).collect()}
    assert got == want and set(got) == {"click", "view"}

    # total credit conservation: every conversion with >=1 touch hands
    # out exactly 1000 millis (up to integer-div remainder on middles)
    n_convs = jn.select("p_id").distinct().count()
    total = sum(v[1] for v in got.values())
    assert total <= 1000 * n_convs
    assert total >= 998 * n_convs - 200 * n_convs  # div remainders only

    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # no interval join
