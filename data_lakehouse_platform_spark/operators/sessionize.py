"""Gap-based sessionization.

One shuffle by user key, two window passes over the same sort order
(Catalyst fuses them into a single Window exec): lag → gap flag →
running-sum session index → grouped session rollup. Scales linearly;
the skew risk — a single hyperactive user funneling its whole history
through one window task — is eliminated by :func:`sessionize_salted`,
which chunks the timeline so window partitions are bounded and
stitches chunk boundaries exactly.

Reference analog: per-order event accumulation in Redis with a TTL
window (order_details_consumer.py:33-71) — here the "session" close is
the inactivity gap instead of an explicit count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.functions.money import dec, undec


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    order_col: str,
    gap_minutes: int = 30,
    value_col: str = "value",
) -> DataFrame:
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    prev_ts = F.lag(ts_col).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)) > gap_us),
        1,
    ).otherwise(0)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = df.select(
        user_col,
        order_col,
        ts_col,
        value_col,
        new_session.alias("new_session"),
    ).withColumn("session_idx", F.sum("new_session").over(w_run))
    return flagged.groupBy(user_col, "session_idx").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        undec(F.sum(dec(value_col))).alias("total_value"),
    )


def sessionize_salted(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    order_col: str,
    gap_minutes: int = 30,
    value_col: str = "value",
    chunk_minutes: int = 24 * 60,
    cache_partitions: int | None = None,
) -> DataFrame:
    """Exact sessionization with BOUNDED window partitions — the
    hot-key-safe twin of :func:`sessionize`.

    ``sessionize`` partitions its window by user alone, so one
    hyperactive user (a bot, a load tester) funnels its entire history
    through a single sort task. Here the expensive window partitions
    by ``(user, time-chunk)`` — no task ever sorts more than one
    chunk's worth of one user — and a per-chunk metadata pass (one row
    per (user, chunk), ~events/chunk_size rows total) stitches the
    chunks back into exact global sessions:

    1. within each (user, chunk): lag → gap flags → running count
       (``local_run``, the 1-based within-chunk session ordinal), the
       chunk's first event tentatively flagged as a session start;
    2. the per-event stream is IMMEDIATELY rolled up to per-
       ``(user, chunk, local_run)`` session partials (min/max ts,
       count, exact decimal value sum) — same shuffle partitioning, so
       the rollup partial-aggregates map-side and the event-cardinality
       stream is consumed exactly once, never persisted;
    3. a chunk-list pass over those partials (one row per (user,
       chunk), via a lag over the user's CHUNK LIST) decides whether
       each chunk's first session really starts a session (gap from
       the previous chunk's last event) — time-ordered chunk ids make
       "previous chunk" well-defined even across empty chunks — and a
       running sum gives each chunk its session-index offset;
    4. the session PARTIALS (not the events) re-join their chunk's
       correction on the same (user, chunk) key and the final rollup
       merges partials per (user, session_idx): min/max/count/decimal-
       sum are associative, so the merge is exact.

    Results are bit-identical to :func:`sessionize` (tested, including
    sessions spanning chunk boundaries). Only session-cardinality
    intermediates are cached/joined — at corpus scale the persisted
    footprint is #sessions, not #events. Worst case is all of a
    user's events inside ONE chunk width — pick ``chunk_minutes`` so a
    chunk of the hottest conceivable key fits a task (a day of 10 Hz
    events is ~1M rows; an hour ~36K).
    """
    gap_us = gap_minutes * 60 * 1_000_000
    chunk_us = chunk_minutes * 60 * 1_000_000

    base = df.select(
        user_col,
        order_col,
        ts_col,
        value_col,
        F.floor(F.unix_micros(F.col(ts_col)) / F.lit(chunk_us)).alias("__chunk"),
    )
    w = Window.partitionBy(user_col, "__chunk").orderBy(ts_col, order_col)
    prev_ts = F.lag(ts_col).over(w)
    flag = F.when(
        prev_ts.isNull()
        | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)) > gap_us),
        1,
    ).otherwise(0)
    ev = base.withColumn("__flag", flag).withColumn(
        "__local_run",
        F.sum("__flag").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # Collapse events → per-(user, chunk, local session) partials right
    # away: session_idx is a pure function of (user, chunk, local_run),
    # so the final rollup can merge these partials instead of raw
    # events. This is what keeps the twice-consumed (meta + join-back)
    # intermediate at SESSION cardinality — the persist below holds
    # one row per session-chunk fragment, not per event.
    part = ev.groupBy(user_col, "__chunk", "__local_run").agg(
        F.min(ts_col).alias("__s_start"),
        F.max(ts_col).alias("__s_end"),
        F.count(F.lit(1)).alias("__n"),
        F.sum(dec(value_col)).alias("__vdec"),
    )
    # Both the metadata branch and the join-back branch consume `part`;
    # without this persist the scan + chunk window would evaluate twice
    # (Spark does not share subtrees across lineage branches).
    # ``cache_partitions`` (r10): width for the persisted partials —
    # cached plans keep their static shuffle width (AQE cannot coalesce
    # them), so a session-cardinality cache pinned at the full shuffle
    # width pays width-tasks per consumer stage on small data.  Callers
    # that know their input size pass an input-scaled count; the
    # re-shuffle keys on (user, chunk), which BOTH consumers cluster
    # on, so the exchange is reused by the meta groupBy and the
    # join-back instead of adding one.
    from pyspark import StorageLevel

    if cache_partitions is not None:
        part = part.repartition(cache_partitions, user_col, "__chunk")
    part = part.persist(StorageLevel.MEMORY_AND_DISK)

    # Chunk metadata derived from the partials: the chunk's first/last
    # event ts and its tentative session-start count (= highest local
    # session ordinal, since local_run is a 1-based running count).
    meta = part.groupBy(user_col, "__chunk").agg(
        F.min("__s_start").alias("__first_ts"),
        F.max("__s_end").alias("__last_ts"),
        F.max("__local_run").alias("__tentative"),
    )
    w_meta = Window.partitionBy(user_col).orderBy("__chunk")
    prev_last = F.lag("__last_ts").over(w_meta)
    bnew = F.when(
        prev_last.isNull()
        | (
            (F.unix_micros(F.col("__first_ts")) - F.unix_micros(prev_last))
            > gap_us
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    meta = meta.withColumn("__bnew", bnew).withColumn(
        "__corrected", F.col("__tentative") - 1 + F.col("__bnew")
    )
    meta = meta.withColumn(
        "__offset",
        F.coalesce(
            F.sum("__corrected").over(
                w_meta.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select(user_col, "__chunk", "__bnew", "__offset")

    joined = part.join(meta, [user_col, "__chunk"])
    session_idx = (
        F.col("__offset") + F.col("__local_run") - 1 + F.col("__bnew")
    ).alias("session_idx")
    return (
        joined.select(user_col, "__s_start", "__s_end", "__n", "__vdec", session_idx)
        .groupBy(user_col, "session_idx")
        .agg(
            F.min("__s_start").alias("session_start"),
            F.max("__s_end").alias("session_end"),
            F.sum("__n").alias("n_events"),
            undec(F.sum("__vdec")).alias("total_value"),
        )
    )
