"""Distributed as-of (merge-asof) join.

Spark has no native ASOF JOIN, and the naive formulation (range join +
row_number, or a correlated subquery) degenerates into an O(n*m)
nested-loop or a giant range-join blowup. The scalable formulation is
the *union-sort* trick:

    1. tag right rows 0, left rows 1, union them with aligned schemas
    2. one shuffle: repartition by key, sort by (time, tag)
    3. ``last(right_value, ignorenulls=True)`` over a running window
       carries the most recent right-hand value forward onto each
       left row

Cost: exactly one shuffle + sort over (|L|+|R|) — the same cost as a
sort-merge join — regardless of time-range density, so it holds at
100 TB where a range join would explode. This mirrors the reference's
realtime "latest state for this key" correlation done in Redis
(scripts/real-time/orders_consumer.py:38-56), re-expressed as a
declarative distributed plan.

Skew: the union-sort window partitions by key, so one hyperactive key
funnels its history through one sort task; :func:`asof_join_salted`
is the exact hot-key-safe twin ((key, time-chunk) windows + boundary
carry injection), at the cost of two extra metadata-scale passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    value_cols: list[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row within the same
    ``by`` group (like ``pandas.merge_asof``):

    * ``direction="backward"`` (default): latest right row with
      ``right.on <= left.on`` (inclusive);
    * ``direction="forward"``: earliest right row with
      ``right.on >= left.on`` (inclusive).

    ``tolerance``: maximum allowed |left.on - right.on| for a match —
    in MICROSECONDS when ``on`` is a timestamp column, else in the
    column's own numeric units. Out-of-tolerance matches are nulled
    (the left row survives, pandas-style). When set, the matched right
    time is also exposed as ``{on}{suffix}``.

    ``value_cols``: right columns to carry (default: all non-key,
    non-time columns). Ties on the time column prefer the right row
    (inclusive match). Either direction costs the same single
    union-shuffle-sort; tolerance adds only a per-row comparison.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by_cols = [by] if isinstance(by, str) else list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in {*by_cols, on}]

    carried = [f"{c}{suffix}" for c in value_cols]

    left_cols = [c for c in left.columns]
    # Align schemas: left rows carry nulls for the right's values;
    # right rows carry nulls for the left's payload.
    on_type = right.schema[on].dataType
    r_on = f"{on}{suffix}"

    # The matched right-hand time is only materialized when a
    # tolerance gate needs it — the default path carries no extra
    # window aggregate.
    with_r_on = tolerance is not None

    l_tagged = left.select(
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(a) for c, a in zip(value_cols, carried)],
        *([F.lit(None).cast(on_type).alias(r_on)] if with_r_on else []),
        F.lit(1).alias("__side"),
    )
    r_tagged = right.select(
        *[
            F.col(c) if c in {*by_cols, on} else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        *[F.col(c).alias(a) for c, a in zip(value_cols, carried)],
        *([F.col(on).alias(r_on)] if with_r_on else []),
        F.lit(0).alias("__side"),
    )

    unioned = l_tagged.unionByName(r_tagged)
    on_ordered = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(on_ordered, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *left_cols,
        *[F.last(a, ignorenulls=True).over(w).alias(a) for a in carried],
        *([F.last(r_on, ignorenulls=True).over(w).alias(r_on)] if with_r_on else []),
        "__side",
    )
    out = filled.filter(F.col("__side") == 1).drop("__side")

    if tolerance is not None:
        # Exact integer time axis: micros for timestamps, else the
        # column's own units — no float rounding in the gate.
        def _axis(c: str) -> F.Column:
            col = F.col(c)
            return F.unix_micros(col) if on_type.typeName().startswith("timestamp") else col.cast("long")

        diff = (_axis(on) - _axis(r_on)) if direction == "backward" else (_axis(r_on) - _axis(on))
        ok = F.col(r_on).isNotNull() & (diff <= F.lit(tolerance))
        out = out.select(
            *left_cols,
            *[F.when(ok, F.col(a)).alias(a) for a in carried],
            F.when(ok, F.col(r_on)).alias(r_on),
        )
    return out


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    value_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance: int | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Nearest-direction as-of join (``pandas.merge_asof
    direction='nearest'``): each left row takes whichever of its
    backward or forward neighbor is closer in time; exact ties prefer
    backward (pandas semantics — and an equal-time right row always
    resolves backward with distance 0, so inclusivity costs nothing).

    ONE union + ONE partitioned sort serves BOTH directions: the
    backward candidate is last_value(IGNORE NULLS) over the preceding
    frame, the forward candidate first_value over the following frame
    — no second shuffle, same cost as a single-direction as-of.

    ``tolerance`` (micros for timestamps) gates each side BEFORE the
    choice; ``right_tiebreak`` orders same-timestamp right rows
    deterministically (pass the right table's unique id when exact
    reproducibility across runs/engines matters).
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in {*by_cols, on}]
    left_cols = list(left.columns)
    on_type = right.schema[on].dataType
    r_on = f"{on}{suffix}"

    tb = "__tb"
    l_tagged = left.select(
        *[F.col(c) for c in left_cols],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}")
            for c in value_cols
        ],
        F.lit(None).cast(on_type).alias("__rts"),
        (
            F.lit(None).cast(right.schema[right_tiebreak].dataType)
            if right_tiebreak
            else F.lit(None).cast("long")
        ).alias(tb),
        F.lit(1).alias("__side"),
    )
    r_tagged = right.select(
        *[
            F.col(c)
            if c in {*by_cols, on}
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        F.col(on).alias("__rts"),
        (F.col(right_tiebreak) if right_tiebreak else F.lit(0)).alias(tb),
        F.lit(0).alias("__side"),
    )
    u = l_tagged.unionByName(r_tagged)
    order = [F.col(on).asc(), F.col("__side").asc(), F.col(tb).asc()]
    back = (
        Window.partitionBy(*by_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(*by_cols)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = u.select(
        *left_cols,
        "__side",
        F.last("__rts", ignorenulls=True).over(back).alias("__bts"),
        F.first("__rts", ignorenulls=True).over(fwd).alias("__fts"),
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(back).alias(f"__b_{c}")
            for c in value_cols
        ],
        *[
            F.first(f"__v_{c}", ignorenulls=True).over(fwd).alias(f"__f_{c}")
            for c in value_cols
        ],
    ).filter(F.col("__side") == 1)

    def _axis(col: F.Column) -> F.Column:
        return (
            F.unix_micros(col)
            if on_type.typeName().startswith("timestamp")
            else col.cast("long")
        )

    db = _axis(F.col(on)) - _axis(F.col("__bts"))
    df_ = _axis(F.col("__fts")) - _axis(F.col(on))
    ok_b = F.col("__bts").isNotNull() & (
        F.lit(True) if tolerance is None else (db <= F.lit(tolerance))
    )
    ok_f = F.col("__fts").isNotNull() & (
        F.lit(True) if tolerance is None else (df_ <= F.lit(tolerance))
    )
    pick_b = ok_b & (~ok_f | (db <= df_))
    pick_f = ok_f & ~pick_b
    return filled.select(
        *left_cols,
        F.when(pick_b, F.col("__bts")).when(pick_f, F.col("__fts")).alias(r_on),
        *[
            F.when(pick_b, F.col(f"__b_{c}"))
            .when(pick_f, F.col(f"__f_{c}"))
            .alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )


def asof_join_salted(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    value_cols: list[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    tolerance: int | None = None,
    chunk: int = 24 * 3600 * 1_000_000,
) -> DataFrame:
    """Hot-key-safe twin of :func:`asof_join` — identical results, but
    the expensive union-sort window partitions by ``(by, time-chunk)``
    instead of ``by`` alone, so one hyperactive key can never funnel
    its entire history through a single sort task.

    Chunk stitching (the same boundary-metadata pattern as
    ``sessionize_salted``): a left row earlier than every right row in
    its chunk must inherit the nearest right row from a PREVIOUS chunk
    (next chunk, under ``direction="forward"``). That carry is
    computed on per-chunk metadata — the boundary-nearest right row of
    each (key, chunk), one row per chunk — with a tiny as-of pass of
    the same union-sort shape partitioned by key (bounded: chunks per
    key, not rows per key). Carries are then INJECTED into the
    union as synthetic right rows carrying their true timestamps:
    within-chunk sorting places them before (after, forward) all real
    rows of the chunk, so the one partitioned window sees exactly the
    state a global sort would have seen. Tolerance gating rides the
    carried true timestamp unchanged.

    ``chunk`` is in the time column's exact integer units (micros for
    timestamps) — size it so the hottest key's densest chunk fits a
    task, same contract as ``sessionize_salted``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by_cols = [by] if isinstance(by, str) else list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in {*by_cols, on}]
    carried = [f"{c}{suffix}" for c in value_cols]
    left_cols = list(left.columns)
    on_type = right.schema[on].dataType
    r_on = f"{on}{suffix}"
    is_ts = on_type.typeName().startswith("timestamp")

    def _axis(col):
        c = F.col(col) if isinstance(col, str) else col
        return F.unix_micros(c) if is_ts else c.cast("long")

    chunk_of = F.floor(_axis(on) / F.lit(int(chunk)))

    # ---- per-chunk boundary metadata from the RIGHT side ----
    # The main window carries EACH value column independently with
    # last(ignorenulls), so the boundary state of a chunk is the
    # per-column last non-null value (first, under forward) plus the
    # chunk's boundary timestamp — NOT simply its boundary row (whose
    # null columns would wrongly mask older non-null values).
    w_full = (
        Window.partitionBy(*by_cols, "__chunk")
        .orderBy(F.col(on).asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    if direction == "backward":
        col_state = [
            F.last(c, ignorenulls=True).over(w_full).alias(c) for c in value_cols
        ]
        on_state = F.max(on).over(w_full).alias(on)
    else:
        col_state = [
            F.first(c, ignorenulls=True).over(w_full).alias(c) for c in value_cols
        ]
        on_state = F.min(on).over(w_full).alias(on)
    wb = Window.partitionBy(*by_cols, "__chunk").orderBy(F.col(on).asc())
    r_chunked = right.withColumn("__chunk", chunk_of)
    chunk_last = (
        r_chunked.select(
            *by_cols,
            "__chunk",
            on_state,
            *col_state,
            F.row_number().over(wb).alias("__rn"),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    # ---- carry per LEFT chunk: nearest boundary row from a strictly
    # earlier (later, forward) chunk — a metadata-scale as-of on chunk
    # ids, partitioned by key only (rows here are one-per-chunk).
    l_chunks = (
        left.withColumn("__chunk", chunk_of).select(*by_cols, "__chunk").distinct()
    )
    m_l = l_chunks.select(
        *by_cols,
        "__chunk",
        F.lit(None).cast(on_type).alias("__m_on"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__m_{c}") for c in value_cols],
        F.lit(1).alias("__mside"),
    )
    m_r = chunk_last.select(
        *by_cols,
        "__chunk",
        F.col(on).alias("__m_on"),
        *[F.col(c).alias(f"__m_{c}") for c in value_cols],
        F.lit(0).alias("__mside"),
    )
    # Strictly-earlier-chunk carry: order by chunk with the LEFT marker
    # first among equal chunks (backward), so a chunk's own boundary
    # row is never its carry — in-chunk rows are handled by the main
    # window. Forward mirrors.
    if direction == "backward":
        m_order = [F.col("__chunk").asc(), F.col("__mside").desc()]
    else:
        m_order = [F.col("__chunk").desc(), F.col("__mside").desc()]
    wm = (
        Window.partitionBy(*by_cols)
        .orderBy(*m_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = (
        m_l.unionByName(m_r)
        .select(
            *by_cols,
            "__chunk",
            "__mside",
            F.last("__m_on", ignorenulls=True).over(wm).alias("__c_on"),
            *[
                F.last(f"__m_{c}", ignorenulls=True).over(wm).alias(f"__c_{c}")
                for c in value_cols
            ],
        )
        .filter(F.col("__mside") == 1)
        .filter(F.col("__c_on").isNotNull())
        .select(*by_cols, "__chunk", "__c_on", *[f"__c_{c}" for c in value_cols])
    )

    # ---- main union, with carries injected as synthetic right rows ----
    l_tagged = left.select(
        *[F.col(c) for c in left_cols],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(a)
            for c, a in zip(value_cols, carried)
        ],
        F.lit(None).cast(on_type).alias(r_on),
        F.lit(1).alias("__side"),
    ).withColumn("__chunk", chunk_of)
    r_main = right.select(
        *[
            F.col(c)
            if c in {*by_cols, on}
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        *[F.col(c).alias(a) for c, a in zip(value_cols, carried)],
        F.col(on).alias(r_on),
        F.lit(0).alias("__side"),
    ).withColumn("__chunk", chunk_of)
    # synthetic carry rows: true right timestamp in r_on, but chunk =
    # the LEFT chunk they serve; their `on` is set to the carried time
    # too — it sorts before (after, forward) every real row of that
    # chunk because it comes from an earlier (later) chunk.
    r_carry = carry.select(
        *[
            F.col(c)
            if c in by_cols
            else (
                F.col("__c_on").alias(on)
                if c == on
                else F.lit(None).cast(left.schema[c].dataType).alias(c)
            )
            for c in left_cols
        ],
        *[F.col(f"__c_{c}").alias(a) for c, a in zip(value_cols, carried)],
        F.col("__c_on").alias(r_on),
        F.lit(0).alias("__side"),
        F.col("__chunk"),
    )

    unioned = l_tagged.unionByName(r_main).unionByName(r_carry)
    on_ordered = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    w = (
        Window.partitionBy(*by_cols, "__chunk")
        .orderBy(on_ordered, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *left_cols,
        *[F.last(a, ignorenulls=True).over(w).alias(a) for a in carried],
        F.last(r_on, ignorenulls=True).over(w).alias(r_on),
        "__side",
    )
    out = filled.filter(F.col("__side") == 1).drop("__side")

    if tolerance is not None:
        diff = (
            (_axis(on) - _axis(r_on))
            if direction == "backward"
            else (_axis(r_on) - _axis(on))
        )
        ok = F.col(r_on).isNotNull() & (diff <= F.lit(tolerance))
        return out.select(
            *left_cols,
            *[F.when(ok, F.col(a)).alias(a) for a in carried],
            F.when(ok, F.col(r_on)).alias(r_on),
        )
    # match asof_join's default column surface (no r_on unless tolerance)
    return out.drop(r_on)
