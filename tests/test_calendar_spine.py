"""rolling_corr_30d's calendar contract (r9): the 30-day window slides
over CALENDAR days (densified spine, zero-activity days = (0,0)
observations), never over observed rows.  On the shipped testdata every
day has lineitems so the two readings coincide — this test plants a
GAP and proves the window does not silently contract to
"30 observations"."""

from __future__ import annotations

import datetime

from data_lakehouse_platform_spark.queries_r8_ext import rolling_corr_30d


def test_rolling_corr_window_is_calendar_days(spark, tmp_path):
    # 60 observed days with a 15-day hole after day 20: a row-frame
    # window would emit its first full window at the 30th OBSERVED day
    # (calendar day 45); the calendar spine emits at calendar day 30.
    d0 = datetime.date(2024, 1, 1)
    rows = []
    for i in range(60):
        if 20 <= i < 35:
            continue  # the gap
        day = d0 + datetime.timedelta(days=i)
        # two lineitems per day, deterministic values
        for j in range(2):
            rows.append((day, float(1 + (i + j) % 7),
                         100.0 + 10.0 * ((i * 3 + j) % 11)))
    df = spark.createDataFrame(
        rows, "l_shipdate date, l_quantity double, l_extendedprice double"
    )
    df.write.parquet(str(tmp_path / "lineitem.parquet"))

    out = rolling_corr_30d(spark, str(tmp_path)).orderBy("day").collect()
    days = [r.day for r in out]
    # full windows exist for every calendar day from d0+29 to the last
    # observed day — INCLUDING days inside/after the gap (zero-filled)
    assert days[0] == d0 + datetime.timedelta(days=29)
    assert days[-1] == d0 + datetime.timedelta(days=59)
    assert len(days) == 31  # one per calendar day, gap did not shrink it
    # a value inside the gap region is finite (zero days are real
    # observations, not NaN poison) — variance of x stays positive
    # because the window always spans some active days
    import math

    assert all(not math.isnan(r.corr_30d) for r in out)
