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
