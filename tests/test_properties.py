"""Property tests (hypothesis): the engine's deterministic primitives
must agree with independent reference models — fixed-point money math
vs exact Python integers, shingling vs a plain Python implementation,
the distributed as-of join vs pandas.merge_asof."""

from __future__ import annotations

import pytest

import math

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.functions.money import SCALE, dec_sum
from data_lakehouse_platform_spark.operators.asof import asof_join
from data_lakehouse_platform_spark.operators.text import shingle_expr, ws_tokens

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_floats = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False)


@given(st.lists(_floats, min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_dec_sum_matches_exact_integer_model(spark, xs):
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    got = df.agg(dec_sum("x", "s")).collect()[0]["s"]
    expected = sum(math.floor(x * SCALE) for x in xs) / SCALE
    assert got == expected


_words = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=4), min_size=0, max_size=12
)


@given(_words, st.integers(min_value=2, max_value=4))
@settings(**_SETTINGS)
def test_shingles_match_python_model(spark, words, k):
    text = " ".join(words)
    df = spark.createDataFrame([(text,)], "text string")
    got = (
        df.select(ws_tokens("text").alias("__toks"))
        .select(shingle_expr("__toks", k).alias("sh"))
        .collect()[0]["sh"]
    )
    # ws_tokens yields [""] for empty text (split of ""), else the words.
    toks = words if words else [""]
    expected = (
        [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        if len(toks) >= k
        else []
    )
    assert got == expected


_ts = st.integers(min_value=0, max_value=1000)


@given(
    st.lists(st.tuples(st.integers(0, 2), _ts), min_size=1, max_size=20),
    st.lists(st.tuples(st.integers(0, 2), _ts, st.integers(-100, 100)), min_size=1, max_size=20),
)
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left_rows, right_rows):
    # Deduplicate right on (key, ts): equal-timestamp updates have no
    # defined winner in either engine, so the property holds on the
    # well-defined input class.
    right_rows = list({(k, t): v for k, t, v in right_rows}.items())
    right_rows = [(k, t, v) for (k, t), v in right_rows]

    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)], "k int, ts int, row_id int"
    )
    right = spark.createDataFrame(right_rows, "k int, ts int, v int")
    got = {
        (r["k"], r["ts"], r["row_id"]): r["v_right"]
        for r in asof_join(left, right, on="ts", by="k").collect()
    }

    lp = pd.DataFrame([(k, t, i) for i, (k, t) in enumerate(left_rows)], columns=["k", "ts", "row_id"]).sort_values("ts", kind="stable")
    rp = pd.DataFrame(right_rows, columns=["k", "ts", "v"]).sort_values("ts", kind="stable")
    merged = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    for row in merged.itertuples(index=False):
        want = None if pd.isna(row.v) else int(row.v)
        assert got[(row.k, row.ts, row.row_id)] == want


@given(
    st.lists(st.tuples(st.integers(0, 2), _ts), min_size=1, max_size=20),
    st.lists(st.tuples(st.integers(0, 2), _ts, st.integers(-100, 100)), min_size=1, max_size=20),
    st.integers(min_value=0, max_value=500),
)
@settings(**_SETTINGS)
def test_asof_forward_tolerance_matches_pandas(spark, left_rows, right_rows, tol):
    """direction='forward' + tolerance must agree with
    pandas.merge_asof(direction='forward', tolerance=tol) — including
    the nulling of out-of-tolerance matches."""
    right_rows = list({(k, t): v for k, t, v in right_rows}.items())
    right_rows = [(k, t, v) for (k, t), v in right_rows]

    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)], "k int, ts int, row_id int"
    )
    right = spark.createDataFrame(right_rows, "k int, ts int, v int")
    got = {
        (r["k"], r["ts"], r["row_id"]): (r["v_right"], r["ts_right"])
        for r in asof_join(
            left, right, on="ts", by="k", direction="forward", tolerance=tol
        ).collect()
    }

    lp = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)],
        columns=["k", "ts", "row_id"],
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(right_rows, columns=["k", "ts", "v"]).sort_values(
        "ts", kind="stable"
    )
    merged = pd.merge_asof(
        lp, rp, on="ts", by="k", direction="forward", tolerance=tol
    )
    for row in merged.itertuples(index=False):
        want = None if pd.isna(row.v) else int(row.v)
        got_v, got_ts = got[(row.k, row.ts, row.row_id)]
        assert got_v == want
        if want is None:
            assert got_ts is None


@given(
    st.lists(
        st.tuples(_floats, st.sampled_from(["A", "B"])), min_size=1, max_size=40
    )
)
@settings(**_SETTINGS)
def test_portable_percentile_matches_order_statistic(spark, rows):
    """quantile_order_values' selection rule — the ceil(p*n)-th value in
    (value, unique-key) order — must equal direct list indexing."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(float(v), seg, i) for i, (v, seg) in enumerate(rows)],
        "val double, seg string, k long",
    )
    w = Window.partitionBy("seg")
    r = df.select(
        "seg",
        "val",
        F.row_number().over(w.orderBy("val", "k")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    got = {
        row.seg: row.p
        for row in r.groupBy("seg")
        .agg(
            F.max(
                F.when(
                    F.col("rn") == F.ceil(F.lit(0.9) * F.col("n")).cast("bigint"),
                    F.col("val"),
                )
            ).alias("p")
        )
        .collect()
    }
    by_seg: dict[str, list[float]] = {}
    for i, (v, seg) in enumerate(rows):
        by_seg.setdefault(seg, []).append((float(v), i))
    for seg, vals in by_seg.items():
        ordered = [v for v, _ in sorted(vals)]
        expected = ordered[math.ceil(0.9 * len(ordered)) - 1]
        assert got[seg] == expected, seg


@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=50)),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_exclusive_prefix_sum_property(spark, weights):
    """Distributed two-pass prefix sum == sequential model for any
    weights, under md5 ordering (adversarial bucket distribution)."""
    import hashlib

    from data_lakehouse_platform_spark.operators.packing import exclusive_prefix_sum

    rows = [
        (i, hashlib.md5(f"w{i}".encode()).hexdigest(), w[0])
        for i, w in enumerate(weights)
    ]
    df = spark.createDataFrame(rows, "id: long, okey: string, w: long")
    got = {
        r["id"]: r["off"]
        for r in exclusive_prefix_sum(df, "okey", "w", out_col="off").collect()
    }
    run, want = 0, {}
    for rid, _, w in sorted(rows, key=lambda r: r[1]):
        want[rid] = run
        run += w
    assert got == want


@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=0, max_size=200),
    st.integers(min_value=1, max_value=40),
    st.data(),
)
@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
def test_chunk_tokens_property(token_ids, size, data):
    """Chunker invariants for ANY token stream and window spec:
    windows never exceed `size`, strides equal size-overlap, stitching
    non-overlap parts reproduces the exact input, and every token is
    covered at least once."""
    from data_lakehouse_platform_spark.operators.chunking import _chunk_tokens

    overlap = data.draw(st.integers(min_value=0, max_value=size - 1))
    toks = [f"t{i}" for i in token_ids]
    rows = list(_chunk_tokens(toks, size, overlap))

    if not toks:
        assert rows == []
        return
    assert rows[0][1] == 0
    assert all(r[2] <= size for r in rows)
    # stride
    for a, b in zip(rows, rows[1:]):
        assert b[1] - a[1] == size - overlap
    # exact reconstruction from non-overlapping tails
    rebuilt = []
    for cid, start, n, chunk in rows:
        parts = chunk.split(" ") if chunk else []
        rebuilt.extend(parts if cid == 0 else parts[overlap:])
    assert rebuilt == toks


@given(
    st.lists(st.tuples(st.integers(0, 2), _ts), min_size=1, max_size=20),
    st.lists(st.tuples(st.integers(0, 2), _ts, st.integers(-100, 100)), min_size=1, max_size=20),
)
@settings(**_SETTINGS)
def test_asof_nearest_matches_pandas(spark, left_rows, right_rows):
    """direction='nearest' must agree with pandas.merge_asof
    (closest side wins, exact ties prefer backward)."""
    from data_lakehouse_platform_spark.operators.asof import asof_join_nearest

    right_rows = list({(k, t): v for k, t, v in right_rows}.items())
    right_rows = [(k, t, v) for (k, t), v in right_rows]

    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)], "k int, ts int, row_id int"
    )
    right = spark.createDataFrame(right_rows, "k int, ts int, v int")
    got = {
        (r["k"], r["ts"], r["row_id"]): r["v_right"]
        for r in asof_join_nearest(left, right, on="ts", by="k").collect()
    }

    lp = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)],
        columns=["k", "ts", "row_id"],
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(right_rows, columns=["k", "ts", "v"]).sort_values(
        "ts", kind="stable"
    )
    merged = pd.merge_asof(lp, rp, on="ts", by="k", direction="nearest")
    for row in merged.itertuples(index=False):
        want = None if pd.isna(row.v) else int(row.v)
        assert got[(row.k, row.ts, row.row_id)] == want


# ---------------------------------------------------------------------------
# Salted twins vs their single-window originals (chunk stitching must be
# invisible for ANY event stream, not just the seeded cases)
# ---------------------------------------------------------------------------

_evt = st.tuples(
    st.integers(min_value=0, max_value=3),        # key
    st.integers(min_value=0, max_value=5_000),    # time (spans ~5 chunks @1000)
    st.integers(min_value=0, max_value=10_000),   # value basis
)


@given(st.lists(_evt, min_size=1, max_size=60, unique_by=lambda e: (e[0], e[1])))
@settings(**_SETTINGS)
def test_sessionize_salted_equals_plain_property(spark, events):
    import datetime as dt

    from data_lakehouse_platform_spark.operators.sessionize import (
        sessionize,
        sessionize_salted,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (k, i, t0 + dt.timedelta(minutes=t), float(v) / 100)
        for i, (k, t, v) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    plain = sessionize(df, "user_id", "ts", "event_id", gap_minutes=30)
    # chunk width 16h40m => sessions regularly straddle chunk edges
    salted = sessionize_salted(
        df, "user_id", "ts", "event_id", gap_minutes=30, chunk_minutes=1000
    )
    canon = lambda d: sorted(tuple(r) for r in d.collect())  # noqa: E731
    assert canon(plain.select(*sorted(plain.columns))) == canon(
        salted.select(*sorted(plain.columns))
    )


_lrow = st.tuples(
    st.integers(min_value=0, max_value=2),
    st.integers(min_value=0, max_value=3_000),
)


@given(
    st.lists(_lrow, min_size=1, max_size=30, unique=True),
    st.lists(_lrow, min_size=0, max_size=30, unique=True),
    st.sampled_from(["backward", "forward"]),
    st.sampled_from([None, 700, 2_500]),
)
@pytest.mark.slow
@settings(**_SETTINGS)
def test_asof_salted_equals_plain_property(spark, lrows, rrows, direction, tol):
    from data_lakehouse_platform_spark.operators.asof import (
        asof_join,
        asof_join_salted,
    )

    left = spark.createDataFrame(
        [(k, t, f"l{i}") for i, (k, t) in enumerate(lrows)],
        "k long, t long, lv string",
    )
    right = spark.createDataFrame(
        [
            # every 3rd value NULL exercises the per-column carry
            (k, t, None if i % 3 == 0 else float(i))
            for i, (k, t) in enumerate(rrows)
        ],
        "k long, t long, price double",
    )
    plain = asof_join(left, right, on="t", by="k", direction=direction, tolerance=tol)
    salted = asof_join_salted(
        left, right, on="t", by="k", direction=direction, tolerance=tol, chunk=1000
    )
    cols = sorted(plain.columns)
    canon = lambda d: sorted(  # noqa: E731
        tuple(r) for r in d.select(*cols).collect()
    )
    assert canon(plain) == canon(salted)


# -- DV codec properties (no Spark session needed) -----------------------

_row_indexes = st.sets(
    st.one_of(
        st.integers(min_value=0, max_value=1 << 17),        # dense low range
        st.integers(min_value=0, max_value=(1 << 40) - 1),  # sparse high
    ),
    max_size=6000,
)


@given(_row_indexes)
@settings(max_examples=40, deadline=None)
def test_roaring_bitmap_array_roundtrip(vals):
    """serialize -> decode is the identity on ANY row-index set the DV
    writer can produce (array + bitset containers, multi-key, multi-
    high-word) — the invariant deletion correctness rides on."""
    from data_lakehouse_platform_spark.sources.delta_lite import (
        roaring_bitmap_array_values,
        serialize_roaring_bitmap_array,
    )

    assert roaring_bitmap_array_values(
        serialize_roaring_bitmap_array(vals)
    ) == sorted(vals)


@given(st.binary(min_size=0, max_size=256).filter(lambda b: len(b) % 4 == 0))
@settings(max_examples=40, deadline=None)
def test_z85_roundtrip(raw):
    from data_lakehouse_platform_spark.sources.delta_lite import (
        z85_decode,
        z85_encode,
    )

    assert z85_decode(z85_encode(raw)) == raw


@given(
    st.lists(
        st.tuples(
            st.text(max_size=20),
            st.one_of(st.none(), st.integers(-(1 << 62), 1 << 62)),
            st.lists(st.integers(-1000, 1000), max_size=8),
        ),
        max_size=20,
    ),
    st.sampled_from(["null", "deflate"]),
)
@settings(max_examples=25, deadline=None)
def test_avro_container_property_roundtrip(tmp_path_factory, rows, codec):
    """avro_lite write -> read is the identity over the type subset
    Iceberg metadata uses (string/union-null-long/array), both codecs."""
    from data_lakehouse_platform_spark.sources.avro_lite import (
        read_container,
        write_container,
    )

    schema = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "n", "type": ["null", "long"], "default": None},
            {"name": "a", "type": {"type": "array", "items": "int"}},
        ],
    }
    recs = [{"s": s, "n": n, "a": a} for s, n, a in rows]
    p = str(tmp_path_factory.mktemp("avro") / "t.avro")
    write_container(p, schema, recs, codec=codec)
    _, back = read_container(p)
    assert back == recs
