"""Pair-free multi-touch attribution.

Linear attribution joins every conversion to every touch in its
lookback window — as a literal interval join that is |P_u| x |T_u|
rows per user, quadratic under a clickstream whale.  This operator
computes the identical answer with NO pair materialization: touches
and two probe rows per conversion (window upper bound at the
conversion time, lower bound at time - lookback) interleave into one
per-user window pass of running per-type counts; each conversion's
in-window counts are probe differences, and per-type credit folds to
``count_type * (credit div n)`` because every touch of one conversion
carries the same integer credit.  Cost: O(|P| + |T|) rows through one
sort per user.  Credit is integer-divided millicredits and
fixed-point value micros, so the result is partition- and
engine-invariant (the registry oracle runs the PAIRWISE SQL form and
matches bit for bit; stress.py drives a whale the pairwise form could
not survive).

Reference analog: the reference's consumer walks per-customer order
events one stream at a time (orders_consumer.py) — this is that
single-pass-per-key shape kept at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def linear_attribution(
    events: DataFrame,
    *,
    touch_types: tuple[str, str] = ("click", "view"),
    conversion_type: str = "purchase",
    lookback: Column | None = None,
) -> DataFrame:
    """Per-touch-type linear credit. Output columns:
    ``touch_type, n_touches, credit_millis, credited_value``.

    ``events`` needs ``event_id, ts, user_id, event_type, value``.
    The window is ``(conv_ts - lookback, conv_ts]``.
    """
    if lookback is None:
        lookback = F.expr("INTERVAL 7 DAYS")
    ta, tb = touch_types

    purchases = events.filter(F.col("event_type") == conversion_type).select(
        F.col("event_id").alias("p_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.floor(F.col("value") * 1000000).cast("bigint").alias("value_micros"),
    )
    touches = events.filter(F.col("event_type").isin(*touch_types)).select(
        F.col("user_id"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
    )

    # One interleaved stream per user: touches count +1 into running
    # per-type sums; each conversion contributes a probe at p_ts
    # (inclusive upper bound) and one at p_ts - lookback (its count is
    # the EXCLUSIVE lower bound, since t_ts > p_ts-lookback ==
    # C(p_ts) - C(p_ts-lookback) with C counting t_ts <= x).  Probes
    # sort after touches at equal ts (is_probe tiebreak), matching
    # both bounds' tie semantics; the default RANGE frame makes
    # same-key touches peers, which cannot change a probe's count
    # because probes never tie with touches.
    t_rows = touches.select(
        "user_id",
        F.col("t_ts").alias("ts"),
        F.lit(0).alias("is_probe"),
        F.lit(None).cast("long").alias("p_id"),
        F.lit(None).cast("string").alias("bound"),
        F.when(F.col("touch_type") == ta, 1).otherwise(0).alias("is_a"),
        F.when(F.col("touch_type") == tb, 1).otherwise(0).alias("is_b"),
        F.lit(None).cast("bigint").alias("value_micros"),
    )
    p_rows = purchases.select(
        "user_id",
        F.explode(
            F.array(
                F.struct(F.col("p_ts").alias("ts"), F.lit("hi").alias("bound")),
                F.struct(
                    (F.col("p_ts") - lookback).alias("ts"),
                    F.lit("lo").alias("bound"),
                ),
            )
        ).alias("pr"),
        "p_id",
        "value_micros",
    ).select(
        "user_id",
        F.col("pr.ts").alias("ts"),
        F.lit(1).alias("is_probe"),
        "p_id",
        F.col("pr.bound").alias("bound"),
        F.lit(0).alias("is_a"),
        F.lit(0).alias("is_b"),
        "value_micros",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "is_probe", "p_id", "bound")
    cum = (
        t_rows.unionByName(p_rows)
        .withColumn("c_a", F.sum("is_a").over(w))
        .withColumn("c_b", F.sum("is_b").over(w))
        .filter(F.col("is_probe") == 1)
    )
    per_purchase = (
        cum.groupBy("p_id", "value_micros")
        .agg(
            F.sum(
                F.when(F.col("bound") == "hi", F.col("c_a")).otherwise(-F.col("c_a"))
            )
            .cast("bigint")
            .alias("n_a"),
            F.sum(
                F.when(F.col("bound") == "hi", F.col("c_b")).otherwise(-F.col("c_b"))
            )
            .cast("bigint")
            .alias("n_b"),
        )
        .withColumn("n", F.col("n_a") + F.col("n_b"))
        .filter(F.col("n") > 0)
    )

    # Every touch of one conversion carries the identical integer
    # credit, so per-type totals are count_type * (credit div n) — no
    # per-pair rows ever exist.
    long_form = per_purchase.select(
        "n",
        "value_micros",
        F.explode(
            F.array(
                F.struct(F.lit(ta).alias("touch_type"), F.col("n_a").alias("cnt")),
                F.struct(F.lit(tb).alias("touch_type"), F.col("n_b").alias("cnt")),
            )
        ).alias("t"),
    ).select(
        "n",
        "value_micros",
        F.col("t.touch_type").alias("touch_type"),
        F.col("t.cnt").alias("cnt"),
    )
    return (
        long_form.filter(F.col("cnt") > 0)
        .groupBy("touch_type")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_touches"),
            F.sum(F.col("cnt") * F.expr("1000 div n"))
            .cast("bigint")
            .alias("credit_millis"),
            (
                F.sum(F.col("cnt") * F.expr("value_micros div n")).cast("bigint")
                / F.lit(1000000.0)
            ).alias("credited_value"),
        )
    )


def last_touch_attribution(
    events: DataFrame,
    *,
    touch_types: tuple[str, ...] = ("click", "view"),
    conversion_type: str = "purchase",
    lookback: Column | None = None,
) -> DataFrame:
    """Last-touch attribution, pair-free: each conversion's full value
    credits the LATEST touch in its lookback window.

    Output: ``touch_type, n_conversions, attributed_value``.

    Same interleaved-stream shape as :func:`linear_attribution`, but
    the running state is a per-user ``MAX(struct(t_ts, t_id, type))``
    — lexicographic struct max IS argmax-by-(time, id) — so each probe
    row reads the latest preceding touch directly; a window-bound
    check replaces the lower probe.  Ties at equal timestamps resolve
    to the larger event_id, the same total order the pairwise oracle's
    ``ORDER BY t_ts DESC, t_id DESC`` picks.  O(|P| + |T|) rows, one
    sort per user, no pairs.
    """
    if lookback is None:
        lookback = F.expr("INTERVAL 7 DAYS")

    purchases = events.filter(F.col("event_type") == conversion_type).select(
        F.col("event_id").alias("p_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.floor(F.col("value") * 1000000).cast("bigint").alias("value_micros"),
    )
    touches = events.filter(F.col("event_type").isin(*touch_types)).select(
        F.col("user_id"),
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("touch_type"),
    )

    t_rows = touches.select(
        "user_id",
        F.col("t_ts").alias("ts"),
        F.lit(0).alias("is_probe"),
        F.lit(None).cast("long").alias("p_id"),
        F.struct(
            F.col("t_ts").alias("t_ts"),
            F.col("t_id").alias("t_id"),
            F.col("touch_type").alias("touch_type"),
        ).alias("touch"),
        F.lit(None).cast("bigint").alias("value_micros"),
    )
    p_rows = purchases.select(
        "user_id",
        F.col("p_ts").alias("ts"),
        F.lit(1).alias("is_probe"),
        "p_id",
        F.lit(None)
        .cast("struct<t_ts:timestamp,t_id:bigint,touch_type:string>")
        .alias("touch"),
        "value_micros",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "is_probe", "p_id")
    probes = (
        t_rows.unionByName(p_rows)
        .withColumn("latest", F.max("touch").over(w))
        .filter(F.col("is_probe") == 1)
    )
    credited = probes.filter(
        F.col("latest").isNotNull()
        & (F.col("latest.t_ts") > F.col("ts") - lookback)
    )
    return credited.groupBy(
        F.col("latest.touch_type").alias("touch_type")
    ).agg(
        F.count("*").alias("n_conversions"),
        (F.sum("value_micros").cast("bigint") / F.lit(1000000.0)).alias(
            "attributed_value"
        ),
    )


_DAY_US = 86_400_000_000  # exact micros per day; age buckets are integer math


def time_decay_attribution(
    events: DataFrame,
    *,
    touch_types: tuple[str, str] = ("click", "view"),
    conversion_type: str = "purchase",
    days: int = 7,
) -> DataFrame:
    """Time-decay attribution, pair-free: a touch aged ``d`` whole days
    at conversion time earns ``credit div 2^d``.

    Output: ``touch_type, n_touches, decay_units_milli, decayed_value``.

    Probe generalization of :func:`linear_attribution`: each conversion
    emits ``days + 1`` probes at ``p_ts - k days``; consecutive probe
    count differences are exactly the per-day age buckets (age is
    integer MICROSECONDS, ``d = age_us div day_us`` — timestamps here
    carry sub-second precision, so second-truncated ages would disagree
    with the oracle's at day boundaries).  Every touch in bucket ``d``
    of one conversion carries the identical integer credit
    ``x div (1 << d)``, so per-type totals fold to
    ``count * credit`` — still no per-pair rows; cost is
    O(|T| + (days+1)|P|) through one sort per user.
    """
    ta, tb = touch_types

    purchases = events.filter(F.col("event_type") == conversion_type).select(
        F.col("event_id").alias("p_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.floor(F.col("value") * 1000000).cast("bigint").alias("value_micros"),
    )
    touches = events.filter(F.col("event_type").isin(*touch_types)).select(
        F.col("user_id"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
    )

    t_rows = touches.select(
        "user_id",
        F.col("t_ts").alias("ts"),
        F.lit(0).alias("is_probe"),
        F.lit(None).cast("long").alias("p_id"),
        F.lit(None).cast("int").alias("k"),
        F.when(F.col("touch_type") == ta, 1).otherwise(0).alias("is_a"),
        F.when(F.col("touch_type") == tb, 1).otherwise(0).alias("is_b"),
        F.lit(None).cast("bigint").alias("value_micros"),
    )
    # Probe timestamps from PHYSICAL micros, not calendar-interval
    # arithmetic: the age buckets are defined as epoch-micro diffs
    # (d = age_us div _DAY_US), and 'p_ts - INTERVAL k DAYS' is not
    # k*86400s across a DST transition — physical subtraction keeps the
    # operator timezone-invariant instead of relying on the session's
    # pinned UTC zone.
    probe_structs = F.array(
        *[
            F.struct(
                F.timestamp_micros(
                    F.unix_micros(F.col("p_ts")) - k * _DAY_US
                ).alias("ts"),
                F.lit(k).alias("k"),
            )
            for k in range(days + 1)
        ]
    )
    p_rows = purchases.select(
        "user_id", F.explode(probe_structs).alias("pr"), "p_id", "value_micros"
    ).select(
        "user_id",
        F.col("pr.ts").alias("ts"),
        F.lit(1).alias("is_probe"),
        "p_id",
        F.col("pr.k").alias("k"),
        F.lit(0).alias("is_a"),
        F.lit(0).alias("is_b"),
        "value_micros",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "is_probe", "p_id", "k")
    probes = (
        t_rows.unionByName(p_rows)
        .withColumn("c_a", F.sum("is_a").over(w))
        .withColumn("c_b", F.sum("is_b").over(w))
        .filter(F.col("is_probe") == 1)
    )
    # Consecutive probes of ONE conversion differ by its day-k bucket
    # counts; the per-conversion window is days+2 rows, never data-sized.
    pw = Window.partitionBy("p_id").orderBy("k")
    buckets = (
        probes.withColumn("n_a", F.col("c_a") - F.lead("c_a").over(pw))
        .withColumn("n_b", F.col("c_b") - F.lead("c_b").over(pw))
        .filter(F.col("k") < days)  # k = days row is the exclusive floor
    )
    long_form = buckets.select(
        "k",
        "value_micros",
        F.explode(
            F.array(
                F.struct(F.lit(ta).alias("touch_type"), F.col("n_a").alias("cnt")),
                F.struct(F.lit(tb).alias("touch_type"), F.col("n_b").alias("cnt")),
            )
        ).alias("t"),
    ).select(
        "k",
        "value_micros",
        F.col("t.touch_type").alias("touch_type"),
        F.col("t.cnt").alias("cnt"),
    )
    return (
        long_form.filter(F.col("cnt") > 0)
        .groupBy("touch_type")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_touches"),
            F.sum(
                F.col("cnt")
                * F.expr("1000 div shiftleft(CAST(1 AS BIGINT), k)")
            )
            .cast("bigint")
            .alias("decay_units_milli"),
            (
                F.sum(
                    F.col("cnt")
                    * F.expr(
                        "value_micros div shiftleft(CAST(1 AS BIGINT), k)"
                    )
                ).cast("bigint")
                / F.lit(1000000.0)
            ).alias("decayed_value"),
        )
    )


def position_attribution(
    events: DataFrame,
    *,
    touch_types: tuple[str, str] = ("click", "view"),
    conversion_type: str = "purchase",
    lookback_days: int = 7,
) -> DataFrame:
    """Position-based (U-shaped) attribution, pair-free: per
    conversion window the FIRST touch earns 400 millicredits, the LAST
    400, the middles split 200 (integer ``200 div (n-2)`` each);
    degenerate windows collapse deterministically (n=1 -> 1000,
    n=2 -> 500/500).  Value credit per touch is
    ``(value_micros * millis) div 1000`` — exact integers end to end.

    Output: ``touch_type, n_touches, credit_millis, credited_value``.

    Pair-free construction on top of :func:`linear_attribution`'s
    probe machinery: touches carry a per-user RUNNING RANK (rows
    frame — equal-ts peers must get distinct ranks, tiebroken by
    event_id exactly like the oracle's ROW_NUMBER), probes read the
    window's [lo, hi] rank bounds, and the first/last touch of each
    conversion resolve by co-partitioned equi-joins on
    (user, rank == lo+1) / (user, rank == hi) — never a pairwise
    interval join.  Cost: O(|T| + 2|P|) rows through one sort per
    user plus two hash joins on (user, rank).
    """
    ta, tb = touch_types
    look_us = lookback_days * _DAY_US

    purchases = events.filter(F.col("event_type") == conversion_type).select(
        F.col("event_id").alias("p_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.floor(F.col("value") * 1000000).cast("bigint").alias("value_micros"),
    )
    touches = events.filter(F.col("event_type").isin(*touch_types)).select(
        F.col("user_id"),
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("touch_type"),
    )

    t_rows = touches.select(
        "user_id",
        F.col("t_ts").alias("ts"),
        F.lit(0).alias("is_probe"),
        F.col("t_id"),
        F.col("touch_type"),
        F.lit(None).cast("long").alias("p_id"),
        F.lit(None).cast("string").alias("bound"),
        F.lit(1).alias("is_t"),
        F.lit(None).cast("bigint").alias("value_micros"),
    )
    p_rows = purchases.select(
        "user_id",
        F.explode(
            F.array(
                F.struct(F.col("p_ts").alias("ts"), F.lit("hi").alias("bound")),
                F.struct(
                    F.timestamp_micros(
                        F.unix_micros(F.col("p_ts")) - look_us
                    ).alias("ts"),
                    F.lit("lo").alias("bound"),
                ),
            )
        ).alias("pr"),
        "p_id",
        "value_micros",
    ).select(
        "user_id",
        F.col("pr.ts").alias("ts"),
        F.lit(1).alias("is_probe"),
        F.lit(None).cast("long").alias("t_id"),
        F.lit(None).cast("string").alias("touch_type"),
        "p_id",
        F.col("pr.bound").alias("bound"),
        F.lit(0).alias("is_t"),
        "value_micros",
    )
    # ROWS frame: equal-ts touches are peers under the default RANGE
    # frame and would share a rank — the first/last joins need
    # ROW_NUMBER semantics, tiebroken by t_id like the oracle.
    w = Window.partitionBy("user_id").orderBy(
        "ts", "is_probe", "t_id", "p_id", "bound"
    ).rowsBetween(Window.unboundedPreceding, 0)
    ranked = t_rows.unionByName(p_rows).withColumn(
        "r", F.sum("is_t").over(w)
    )
    touch_ranks = ranked.filter(F.col("is_probe") == 0).select(
        "user_id", F.col("r"), "touch_type"
    )
    probes = ranked.filter(F.col("is_probe") == 1)
    per_purchase = (
        probes.groupBy("user_id", "p_id", "value_micros")
        .agg(
            F.max(F.when(F.col("bound") == "hi", F.col("r"))).alias("hi"),
            F.max(F.when(F.col("bound") == "lo", F.col("r"))).alias("lo"),
        )
        .withColumn("n", (F.col("hi") - F.col("lo")).cast("bigint"))
        .filter(F.col("n") > 0)
    )
    first = touch_ranks.select(
        "user_id",
        (F.col("r") - 1).alias("lo"),
        F.col("touch_type").alias("first_type"),
    )
    last = touch_ranks.select(
        "user_id",
        F.col("r").alias("hi"),
        F.col("touch_type").alias("last_type"),
    )
    pp = per_purchase.join(first, ["user_id", "lo"]).join(
        last, ["user_id", "hi"]
    )
    # in-window per-type counts from the same rank bounds: count of
    # type T with lo < r <= hi — one more co-partitioned aggregation
    # (touch ranks joined to the conversion's rank interval via the
    # first/last rows would under-count middles, so recompute by
    # probe-difference on per-type running counts)
    wr = Window.partitionBy("user_id").orderBy(
        "ts", "is_probe", "t_id", "p_id", "bound"
    ).rowsBetween(Window.unboundedPreceding, 0)
    typed = (
        t_rows.unionByName(p_rows)
        .withColumn(
            "c_a",
            F.sum(
                F.when(F.col("touch_type") == ta, 1).otherwise(0)
            ).over(wr),
        )
        .withColumn(
            "c_b",
            F.sum(
                F.when(F.col("touch_type") == tb, 1).otherwise(0)
            ).over(wr),
        )
        .filter(F.col("is_probe") == 1)
        .groupBy("p_id")
        .agg(
            F.sum(
                F.when(F.col("bound") == "hi", F.col("c_a")).otherwise(
                    -F.col("c_a")
                )
            )
            .cast("bigint")
            .alias("n_a"),
            F.sum(
                F.when(F.col("bound") == "hi", F.col("c_b")).otherwise(
                    -F.col("c_b")
                )
            )
            .cast("bigint")
            .alias("n_b"),
        )
    )
    pp = pp.join(typed, "p_id")

    pp = pp.withColumn(
        "mid_millis",
        F.when(F.col("n") >= 3, F.expr("200 div (n - 2)")).otherwise(
            F.lit(0)
        ).cast("long"),
    ).withColumn(
        "first_millis",
        F.when(F.col("n") == 1, 1000)
        .when(F.col("n") == 2, 500)
        .otherwise(400)
        .cast("long"),
    ).withColumn(
        "last_millis",
        F.when(F.col("n") == 1, 0)
        .when(F.col("n") == 2, 500)
        .otherwise(400)
        .cast("long"),
    )

    # Per-type totals folded from exact integers: every touch in one
    # positional class of one conversion carries the identical credit,
    # so value credit is class_count * ((value_micros * millis) div
    # 1000) — integer div on both engines, never a float divide.
    def _fold(tname: str, cnt_col: str):
        is_first = (F.col("first_type") == tname).cast("long")
        # n=1: the single touch is both first and last; its full 1000
        # rides first_millis, so last contributes 0 then.
        is_last = F.when(F.col("n") == 1, F.lit(0)).otherwise(
            (F.col("last_type") == tname).cast("long")
        )
        mid_cnt = F.col(cnt_col) - is_first - F.when(
            F.col("n") == 1, F.lit(0)
        ).otherwise((F.col("last_type") == tname).cast("long"))
        millis = (
            is_first * F.col("first_millis")
            + is_last * F.col("last_millis")
            + mid_cnt * F.col("mid_millis")
        )
        value = (
            is_first * F.expr("(value_micros * first_millis) div 1000")
            + is_last * F.expr("(value_micros * last_millis) div 1000")
            + mid_cnt * F.expr("(value_micros * mid_millis) div 1000")
        )
        return F.struct(
            F.lit(tname).alias("touch_type"),
            F.col(cnt_col).alias("cnt"),
            millis.cast("bigint").alias("millis"),
            value.cast("bigint").alias("value_credit"),
        )

    long_form = pp.select(
        F.explode(F.array(_fold(ta, "n_a"), _fold(tb, "n_b"))).alias("t")
    ).select("t.*")
    return (
        long_form.filter(F.col("cnt") > 0)
        .groupBy("touch_type")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_touches"),
            F.sum("millis").cast("bigint").alias("credit_millis"),
            (
                F.sum("value_credit").cast("bigint") / F.lit(1000000.0)
            ).alias("credited_value"),
        )
    )
