"""Distributed global ranking — exact ``row_number``/``NTILE``/running
aggregates over a total order WITHOUT an unpartitioned window.

The naive form, ``Window.orderBy(keys)`` with no ``partitionBy``, funnels
every row through ONE task: fine on a 150k-customer aggregate at sf0.1,
a wall at 10^9 customers on a 100 TB corpus.  This module generalizes the
two-pass distributed prefix-sum in :mod:`operators.packing` to arbitrary
numeric sort keys:

1. sample B-1 cut points of a *monotone numeric bucket key* (any numeric
   expression non-decreasing along the desired total order, e.g.
   ``-total_spend`` for a descending spend rank) via ``approxQuantile`` —
   cut *placement* only affects balance, never correctness;
2. assign each row a bucket by counting cuts strictly below its key —
   deterministic given the cuts (which are collected once and baked in as
   literals), so recomputed lineage branches always agree;
3. per-bucket windows (PARTITIONED — parallel across the cluster) compute
   local row numbers / running sums / running maxes;
4. per-bucket totals (<= B rows, the only driver-side data) are cumulated
   on the driver and broadcast back as bucket offsets.

global row_number = bucket count-offset + local row_number, and likewise
for running sums (offset add) and running maxes (offset ``greatest``).
Wall-clock is two parallel passes plus a B-row broadcast, independent of
row count.  The input is persisted so the cuts/stats/main passes reuse one
materialization instead of re-running the upstream aggregation three times.

Reference analog: the reference's customer tiers are a static enum
column (scripts/database/create_table.py) cached node-locally for
eligibility checks (scripts/database/lookup_data_cache.py); this is
the shape that survives when tiers must be COMPUTED by rank over a
customer table that no longer fits a node.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass
from typing import Any

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_B = "__rk_bucket"

# Hard ceiling on the grouped-rank stats fetch: the offsets pass pulls
# |groups| x buckets rows to the driver, which is the whole point (a few
# hundred rows for priorities/nations/bands) and a silent OOM footgun for
# a high-cardinality group key.  Enforced with a limit-probe so the
# driver never materializes more than STATS_CAP + 1 rows even when a
# caller violates the contract.
STATS_CAP = 65_536


def _capped_stats(grouped, what: str) -> list:
    """Collect grouped stats with a loud cardinality refusal.

    ``limit(STATS_CAP + 1)`` bounds the fetch itself — the refusal costs
    at most one extra row, never the full high-cardinality result.
    """
    rows = grouped.limit(STATS_CAP + 1).collect()
    if len(rows) > STATS_CAP:
        raise ValueError(
            f"{what}: groups x buckets exceeds the {STATS_CAP}-row driver "
            "stats cap - the group key is not low-cardinality. Use a plain "
            "partitioned window (Window.partitionBy(group).orderBy(...)) "
            "instead: at high group cardinality it has no skew wall and "
            "needs no driver-side offsets."
        )
    return rows


@dataclass(frozen=True)
class RankStats:
    """Driver-side scalars that fall out of the bucket-stats pass."""

    rows: int
    weight_sum: Any = None  # total of `weight` (None when no weight given)
    weight_max: Any = None


def _bucketize(df: DataFrame, bucket_key: Column, buckets: int) -> DataFrame:
    """Add a deterministic bucket id that is non-decreasing in ``bucket_key``.

    Cuts come from one ``approxQuantile`` pass; they are baked into the plan
    as literals so every downstream lineage recomputation assigns identical
    buckets.  Rows with equal keys always share a bucket, so bucket ranges
    stay contiguous in the total order.
    """
    keyed = df.withColumn("__rk_key", bucket_key.cast("double"))
    qs = [i / buckets for i in range(1, buckets)]
    # Loose relative error on purpose: cut PLACEMENT only affects bucket
    # balance, never correctness (ranks are exact downstream), and the
    # looser sketch merges far cheaper on wide clusters.
    cuts = sorted(set(keyed.stat.approxQuantile("__rk_key", qs, 0.01)))
    if not cuts:
        return keyed.withColumn(_B, F.lit(0))
    arr = F.array(*[F.lit(float(c)) for c in cuts])
    return keyed.withColumn(
        _B, F.size(F.filter(arr, lambda c: c < F.col("__rk_key")))
    )


def with_global_rank(
    df: DataFrame,
    order_cols: Sequence[Column],
    bucket_key: Column,
    *,
    buckets: int = 64,
    rn_col: str | None = None,
    cum_col: str | None = None,
    prior_max_col: str | None = None,
    weight: Column | None = None,
    weight_type: str = "decimal(38,0)",
) -> tuple[DataFrame, RankStats]:
    """Return ``(df + requested columns, RankStats)``.

    * ``rn_col``       — exact global 1-based ``row_number`` over
      ``order_cols`` (which must define a TOTAL order: unique tiebreaker).
    * ``cum_col``      — running inclusive sum of ``weight`` in that order.
    * ``prior_max_col``— running max of ``weight`` over *strictly preceding*
      rows (NULL for the global first row) — the sort-based skyline sweep.
    * ``bucket_key``   — numeric expression non-decreasing along
      ``order_cols``'s order (negate for DESC keys); must be non-null.

    Total row count / weight sum / weight max fall out of the bucket-stats
    pass for free, so callers needing ``n`` (NTILE, percent_rank) or the
    grand total (ABC share cuts) don't pay another action.
    """
    need_weight = cum_col is not None or prior_max_col is not None
    if need_weight and weight is None:
        raise ValueError("cum_col/prior_max_col require a weight column")

    bucketed = _bucketize(df, bucket_key, buckets)
    if need_weight:
        bucketed = bucketed.withColumn("__rk_w", weight.cast(weight_type))
    bucketed = bucketed.persist(StorageLevel.MEMORY_AND_DISK)

    aggs = [F.count(F.lit(1)).alias("__cnt")]
    if cum_col is not None:
        aggs.append(F.sum("__rk_w").alias("__wsum"))
    if prior_max_col is not None:
        aggs.append(F.max("__rk_w").alias("__wmax"))
    stats = sorted(
        bucketed.groupBy(_B).agg(*aggs).collect(), key=lambda r: r[_B]
    )  # bounded: <= `buckets` rows

    total = 0
    run_cnt, run_sum, run_max = 0, None, None
    offsets = []
    for r in stats:
        offsets.append((r[_B], run_cnt, run_sum, run_max))
        run_cnt += r["__cnt"]
        if cum_col is not None:
            run_sum = r["__wsum"] if run_sum is None else run_sum + r["__wsum"]
        if prior_max_col is not None:
            run_max = (
                r["__wmax"]
                if run_max is None
                else max(run_max, r["__wmax"])
            )
    total = run_cnt

    off_schema = (
        f"{_B}: int, __cnt_off: long, __sum_off: {weight_type}, "
        f"__max_off: {weight_type}"
    )
    off_df = df.sparkSession.createDataFrame(offsets, off_schema)

    w = Window.partitionBy(_B).orderBy(*order_cols)
    joined = bucketed.join(F.broadcast(off_df), _B)
    out = joined
    if rn_col is not None:
        out = out.withColumn(rn_col, (F.col("__cnt_off") + F.row_number().over(w)))
    if cum_col is not None:
        run = F.sum("__rk_w").over(w.rowsBetween(Window.unboundedPreceding, 0))
        out = out.withColumn(
            cum_col, F.coalesce(F.col("__sum_off"), F.lit(0).cast(weight_type)) + run
        )
    if prior_max_col is not None:
        prior = F.max("__rk_w").over(w.rowsBetween(Window.unboundedPreceding, -1))
        out = out.withColumn(prior_max_col, F.greatest(
            F.coalesce(prior, F.col("__max_off")),
            F.coalesce(F.col("__max_off"), prior),
        ))
    drop = ["__rk_key", _B, "__cnt_off", "__sum_off", "__max_off"]
    if need_weight:
        drop.append("__rk_w")
    final_sum = run_sum if cum_col is not None else None
    final_max = run_max if prior_max_col is not None else None
    return out.drop(*drop), RankStats(total, final_sum, final_max)


def with_grouped_rank(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    bucket_key: Column,
    *,
    buckets: int = 64,
    rn_col: str | None = None,
    n_col: str | None = None,
    cum_col: str | None = None,
    tot_col: str | None = None,
    weight: Column | None = None,
    weight_type: str = "bigint",
) -> DataFrame:
    """Per-group exact ``row_number``/group size/running weight sum — the
    grouped twin of :func:`with_global_rank`, for the quantile-family
    pattern ``Window.partitionBy(low_card_key).orderBy(value)``.

    A window partitioned by a 5-value key pushes ~20% of the fact table
    through ONE sort task — the skew wall the plain form hits at 100x
    scale.  Here rows are sub-bucketed by value cuts (one global
    ``approxQuantile`` pass — monotone within every group), windows run
    per ``(group, bucket)`` so task input is bounded by bucket width, and
    per-group/per-bucket counts (<= groups x buckets rows, the only
    driver-side data) are cumulated into broadcast offsets.

    Contract: ``group_cols`` must be LOW cardinality (priority, segment,
    flag — the stats collect is groups x buckets rows).  ENFORCED, not
    conventional: the stats fetch is limit-probed and raises loudly past
    ``STATS_CAP`` rows instead of hauling an unbounded result to the
    driver.  For high-cardinality groups the plain partitioned window has
    no skew wall and should be used directly.  ``order_cols`` need not be unique per row,
    but running sums are then only value-deterministic when tied rows
    carry equal weights (order ties by the weight column to guarantee
    this — the weighted-median trick).
    """
    need_weight = cum_col is not None or tot_col is not None
    if need_weight and weight is None:
        raise ValueError("cum_col/tot_col require a weight column")
    gcols = list(group_cols)

    bucketed = _bucketize(df, bucket_key, buckets)
    if need_weight:
        bucketed = bucketed.withColumn("__rk_w", weight.cast(weight_type))
    bucketed = bucketed.persist(StorageLevel.MEMORY_AND_DISK)

    aggs = [F.count(F.lit(1)).alias("__cnt")]
    if need_weight:
        aggs.append(F.sum("__rk_w").alias("__wsum"))
    stats = _capped_stats(
        bucketed.groupBy(*gcols, _B).agg(*aggs), "with_grouped_rank"
    )

    per_group: dict[tuple, list] = {}
    for r in sorted(stats, key=lambda r: (tuple(str(r[g]) for g in gcols), r[_B])):
        per_group.setdefault(tuple(r[g] for g in gcols), []).append(r)
    from decimal import Decimal

    zero = Decimal(0) if weight_type.startswith("decimal") else 0
    off_rows = []
    for key, rows in per_group.items():
        run_cnt, run_sum = 0, zero
        grp_n = sum(r["__cnt"] for r in rows)
        grp_tot = sum(r["__wsum"] for r in rows) if need_weight else None
        for r in rows:
            off_rows.append(
                tuple(key) + (r[_B], run_cnt, run_sum if need_weight else None,
                              grp_n, grp_tot)
            )
            run_cnt += r["__cnt"]
            if need_weight:
                run_sum += r["__wsum"]

    gschema = ", ".join(
        f"__off_{g}: {dict(df.dtypes)[g]}" for g in gcols
    )
    off_schema = (
        f"{gschema}, {_B}_off: int, __cnt_off: long, __sum_off: {weight_type}, "
        f"__grp_n: long, __grp_tot: {weight_type}"
    )
    off_df = df.sparkSession.createDataFrame(off_rows, off_schema)

    w = Window.partitionBy(*gcols, _B).orderBy(*order_cols)
    # NULL is a real group (SQL window PARTITION BY ranks it normally),
    # so the offsets join back with NULL-SAFE equality — a plain
    # equi-join would silently drop every null-group row.
    join_cond = F.col(_B) == F.col(f"{_B}_off")
    for g in gcols:
        join_cond = join_cond & F.col(g).eqNullSafe(F.col(f"__off_{g}"))
    out = bucketed.join(F.broadcast(off_df), join_cond).drop(
        f"{_B}_off", *[f"__off_{g}" for g in gcols]
    )
    if rn_col is not None:
        out = out.withColumn(rn_col, F.col("__cnt_off") + F.row_number().over(w))
    if n_col is not None:
        out = out.withColumn(n_col, F.col("__grp_n"))
    if cum_col is not None:
        run = F.sum("__rk_w").over(w.rowsBetween(Window.unboundedPreceding, 0))
        out = out.withColumn(cum_col, F.col("__sum_off") + run)
    if tot_col is not None:
        out = out.withColumn(tot_col, F.col("__grp_tot"))
    drop = ["__rk_key", _B, "__cnt_off", "__sum_off", "__grp_n", "__grp_tot"]
    if need_weight:
        drop.append("__rk_w")
    return out.drop(*drop)


def select_group_ranks(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    bucket_key: Column,
    ranks_fn,
    *,
    buckets: int = 64,
    rn_col: str = "rn",
    n_col: str | None = None,
) -> DataFrame:
    """Rows at SPECIFIC per-group ranks only — the selection twin of
    :func:`with_grouped_rank` for the quantile family.

    When a query needs a handful of order statistics per group (Q1/Q3
    endpoints, a median row, percentile cut rows), ranking every row is
    wasted motion: the full grouped rank persists the table and sorts
    every bucket.  Here only the buckets that CONTAIN a requested rank
    flow through a window — with 4 requested ranks and 64 buckets
    that's ~1/16 of the rows, and the sorted task input is bounded by
    bucket width exactly as in the full form.

    ``ranks_fn(n) -> iterable[int]`` maps a group's size to the 1-based
    ranks wanted from it (so callers can ask for ``floor(p*(n-1))+1``
    style interpolation endpoints).  Output: ``df``'s columns plus
    ``rn_col`` (the exact per-group rank, bigint) — one row per
    requested rank.  ``n_col`` additionally emits the group size (it is
    already known driver-side from the stats pass, so callers needing
    ``n`` — every interpolating quantile does — skip a whole extra
    scan-and-aggregate job).

    Same contract as the full form: ``group_cols`` low-cardinality,
    ``order_cols`` a total order within groups, ``bucket_key`` numeric,
    non-null, and non-decreasing along ``order_cols``.
    """
    gcols = list(group_cols)
    bucketed = _bucketize(df, bucket_key, buckets)
    stats = _capped_stats(
        bucketed.groupBy(*gcols, _B).agg(F.count(F.lit(1)).alias("__cnt")),
        "select_group_ranks",
    )  # bounded: <= |groups| x buckets rows, enforced by the cap probe

    per_group: dict[tuple, list] = {}
    for r in sorted(stats, key=lambda r: (tuple(str(r[g]) for g in gcols), r[_B])):
        per_group.setdefault(tuple(r[g] for g in gcols), []).append(
            (r[_B], r["__cnt"])
        )

    need_rows = []
    for key, rows in per_group.items():
        n = sum(c for _, c in rows)
        want = sorted(set(int(x) for x in ranks_fn(n)))
        if want and (want[0] < 1 or want[-1] > n):
            raise ValueError(
                f"ranks_fn asked for ranks {want} outside 1..{n} for group {key}"
            )
        cum, i = 0, 0
        for b, c in rows:
            while i < len(want) and want[i] <= cum + c:
                need_rows.append(tuple(key) + (b, want[i] - cum, want[i], n))
                i += 1
            cum += c

    gschema = ", ".join(f"__sel_{g}: {dict(df.dtypes)[g]}" for g in gcols)
    need_df = df.sparkSession.createDataFrame(
        need_rows,
        f"{gschema}, {_B}_sel: int, __rn_in_b: long, __rn: long, __grp_n: long",
    )

    # Semi-join down to target buckets first (broadcast — the needed
    # set is |groups| x |ranks| rows), then rank WITHIN those buckets
    # and keep exactly the requested positions.  NULL groups join
    # null-safely, same as the full form.  `keys` is built from the
    # driver-side rows (not derived from need_df) so the two joins
    # don't share lineage and trip the ambiguous-self-join check.
    keys = df.sparkSession.createDataFrame(
        sorted(
            {r[: len(gcols) + 1] for r in need_rows},
            key=lambda t: tuple(str(x) for x in t),
        ),
        f"{gschema}, {_B}_sel: int",
    )
    cond = F.col(_B) == keys[f"{_B}_sel"]
    for g in gcols:
        cond = cond & F.col(g).eqNullSafe(keys[f"__sel_{g}"])
    filtered = bucketed.join(F.broadcast(keys), cond).drop(
        f"{_B}_sel", *[f"__sel_{g}" for g in gcols]
    )

    w = Window.partitionBy(*gcols, _B).orderBy(*order_cols)
    local = filtered.withColumn("__rn_in_b", F.row_number().over(w).cast("long"))
    cond2 = (local[_B] == need_df[f"{_B}_sel"]) & (
        local["__rn_in_b"] == need_df["__rn_in_b"]
    )
    for g in gcols:
        cond2 = cond2 & local[g].eqNullSafe(need_df[f"__sel_{g}"])
    picked = local.join(F.broadcast(need_df), cond2)
    cols = [
        *[local[c] for c in df.columns],
        need_df["__rn"].cast("bigint").alias(rn_col),
    ]
    if n_col is not None:
        cols.append(need_df["__grp_n"].cast("bigint").alias(n_col))
    return picked.select(*cols)


def select_group_weight_crossing(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    bucket_key: Column,
    weight: Column,
    *,
    buckets: int = 64,
    cum_col: str = "cum",
    tot_col: str = "tot",
    weight_type: str = "bigint",
) -> DataFrame:
    """Rows of each group's WEIGHT-CROSSING bucket only — the selection
    twin of the ``cum_col``/``tot_col`` form of :func:`with_grouped_rank`
    for weighted-median-style queries (r10).

    The full form persists the table and computes a running weight sum
    for EVERY row, when a weighted median only reads rows around the
    single position where ``2 * cum >= tot`` first holds.  The per-
    (group, bucket) weight sums are already collected driver-side by
    the stats pass, so the crossing bucket is known before any window
    runs: only its rows get a running sum (offset by the preceding
    buckets' driver-side total), bounded by bucket width.

    Returns ``df``'s columns plus ``cum_col`` (running weight sum in
    ``order_cols`` order, identical to the full form's value on these
    rows) and ``tot_col`` (group total).  Weights must be non-negative
    (a weighted median is undefined otherwise); equal bucket keys share
    a bucket (``_bucketize``), so every row tied with the crossing row
    is present.  Same STATS_CAP contract as the other selection twins.
    """
    gcols = list(group_cols)
    bucketed = _bucketize(df, bucket_key, buckets).withColumn(
        "__rk_w", weight.cast(weight_type)
    )
    stats = _capped_stats(
        bucketed.groupBy(*gcols, _B).agg(F.sum("__rk_w").alias("__wsum")),
        "select_group_weight_crossing",
    )

    from decimal import Decimal

    zero = Decimal(0) if weight_type.startswith("decimal") else 0
    per_group: dict[tuple, list] = {}
    for r in sorted(
        stats, key=lambda r: (tuple(str(r[g]) for g in gcols), r[_B])
    ):
        # SUM over an all-NULL (group, bucket) collects None; treat it
        # as zero weight exactly like the full with_grouped_rank form's
        # NULL-tolerant running sum (r10 advice — latent TypeError for
        # callers with nullable weights).
        per_group.setdefault(tuple(r[g] for g in gcols), []).append(
            (r[_B], r["__wsum"] if r["__wsum"] is not None else zero)
        )
    need_rows = []
    for key, rows in per_group.items():
        tot = sum((w for _, w in rows), zero)
        cum_before = zero
        for b, w in rows:
            if 2 * (cum_before + w) >= tot:
                need_rows.append(tuple(key) + (b, cum_before, tot))
                break
            cum_before += w

    gschema = ", ".join(f"__sel_{g}: {dict(df.dtypes)[g]}" for g in gcols)
    need_df = df.sparkSession.createDataFrame(
        need_rows,
        f"{gschema}, {_B}_sel: int, __cum_off: {weight_type}, "
        f"__grp_tot: {weight_type}",
    )
    cond = F.col(_B) == need_df[f"{_B}_sel"]
    for g in gcols:
        cond = cond & F.col(g).eqNullSafe(need_df[f"__sel_{g}"])
    filtered = bucketed.join(F.broadcast(need_df), cond)

    w = Window.partitionBy(*gcols, _B).orderBy(*order_cols)
    run = F.sum("__rk_w").over(w.rowsBetween(Window.unboundedPreceding, 0))
    out = filtered.withColumn(cum_col, F.col("__cum_off") + run).withColumn(
        tot_col, F.col("__grp_tot")
    )
    return out.drop(
        "__rk_key",
        _B,
        "__rk_w",
        "__cum_off",
        "__grp_tot",
        f"{_B}_sel",
        *[f"__sel_{g}" for g in gcols],
    )


def select_global_ranks(
    df: DataFrame,
    order_cols: Sequence[Column],
    bucket_key: Column,
    ranks_fn,
    *,
    buckets: int = 64,
    rn_col: str = "rn",
    n_col: str | None = None,
) -> DataFrame:
    """Rows at specific GLOBAL ranks — the global twin of
    :func:`select_group_ranks` (one group spanning the whole frame).

    With no group key the machinery collapses: the per-bucket counts
    are <= ``buckets`` driver rows, the bucket semi-join becomes a
    literal ``isin`` filter, and the rank pick becomes a literal
    predicate + CASE — no join at all in the plan.  Intended for small
    rank sets (quantile endpoints, NTILE cuts); the requested ranks are
    baked in as literals.
    """
    bucketed = _bucketize(df, bucket_key, buckets)
    stats = sorted(
        bucketed.groupBy(_B).agg(F.count(F.lit(1)).alias("__cnt")).collect(),
        key=lambda r: r[_B],
    )  # bounded: <= buckets rows
    n = sum(r["__cnt"] for r in stats)
    want = sorted(set(int(x) for x in ranks_fn(n)))
    if want and (want[0] < 1 or want[-1] > n):
        raise ValueError(
            f"ranks_fn asked for ranks {want} outside 1..{n}"
        )
    need: list[tuple[int, int, int]] = []  # (bucket, rn_in_bucket, rn)
    cum, i = 0, 0
    for r in stats:
        b, c = r[_B], r["__cnt"]
        while i < len(want) and want[i] <= cum + c:
            need.append((b, want[i] - cum, want[i]))
            i += 1
        cum += c
    target_buckets = sorted({b for b, _, _ in need})
    filtered = bucketed.where(F.col(_B).isin(target_buckets))
    w = Window.partitionBy(_B).orderBy(*order_cols)
    local = filtered.withColumn(
        "__rn_in_b", F.row_number().over(w).cast("long")
    )
    pick = F.lit(False)
    rn_expr = F.lit(None).cast("bigint")
    for b, rib, rn in need:
        hit = (F.col(_B) == b) & (F.col("__rn_in_b") == rib)
        pick = pick | hit
        rn_expr = F.when(hit, F.lit(rn).cast("bigint")).otherwise(rn_expr)
    out = local.where(pick).withColumn(rn_col, rn_expr)
    if n_col is not None:
        out = out.withColumn(n_col, F.lit(n).cast("bigint"))
    return out.drop("__rk_key", _B, "__rn_in_b")


def ntile_cut_ranks(n: int, k: int) -> list[int]:
    """1-based global ranks of the LAST row of tiles 1..k-1 under SQL
    NTILE(k) over ``n`` rows (q = n // k, r = n % k: the first r tiles
    hold q+1 rows).  Deduplicated: when n < k several cuts coincide at
    rank n; strict-less boundary counting is unaffected because no row
    ranks beyond the last cut in that regime (see with_global_ntile).
    """
    q, r = divmod(n, k)
    return sorted({i * q + min(i, r) for i in range(1, k)} - {0})


def with_global_ntile(
    df: DataFrame,
    keys: Sequence[tuple[str, bool]],
    k: int,
    out_col: str,
    *,
    buckets: int = 64,
) -> DataFrame:
    """Exact global ``NTILE(k)`` WITHOUT ranking every row (r11,
    guide §1.2 — algorithm first).

    The full form (``with_global_rank`` + :func:`ntile_expr`) persists
    the frame, windows EVERY row and broadcast-joins offsets, when the
    tile id only depends on which of k-1 CUT rows a row sorts after.
    Those cut rows are rank-selections at known positions
    (:func:`ntile_cut_ranks`), so :func:`select_global_ranks` locates
    them touching only the buckets that contain a cut; their key
    tuples are collected (k-1 rows) and every row's tile becomes
    ``1 + |{cuts strictly below it}|`` — a pure projection, no window,
    no join, no persist.

    ``keys``: (column_name, is_desc) pairs forming a TOTAL order over
    ``df`` (the last key must be unique, all keys non-null).  The first
    key must be numeric — it doubles as the bucket key.

    Equivalence to SQL NTILE: ranks are a total order, so
    ``rank(row) <= cut_rank_i  <=>  tuple(row) <= tuple(cut_row_i)``;
    counting strictly-smaller cut tuples therefore reproduces
    ``ntile_expr(row_number(), n, k)`` exactly.  When n < k the cuts
    coincide at rank n, but no row ranks beyond rank n, so the
    deduplicated cut list counts identically (row at rank j sorts
    strictly after exactly the j-1 cuts at ranks < j).
    """
    first, first_desc = keys[0]
    bucket_key = (-F.col(first)) if first_desc else F.col(first)
    order_cols = [
        F.col(n).desc() if d else F.col(n).asc() for n, d in keys
    ]
    cuts = select_global_ranks(
        df,
        order_cols,
        bucket_key,
        lambda n: ntile_cut_ranks(n, k),
        buckets=buckets,
        rn_col="__ntile_rn",
    )
    bounds = sorted(
        cuts.select(*[n for n, _ in keys], "__ntile_rn").collect(),
        key=lambda r: r["__ntile_rn"],
    )  # bounded: k-1 rows
    tile: Column = F.lit(1)
    for brow in bounds:
        gt = F.lit(False)
        eqs = F.lit(True)
        for name, desc in keys:
            bval = F.lit(brow[name])
            after = (F.col(name) < bval) if desc else (F.col(name) > bval)
            gt = gt | (eqs & after)
            eqs = eqs & (F.col(name) == bval)
        tile = tile + F.when(gt, 1).otherwise(0)
    return df.withColumn(out_col, tile.cast("int"))


def ntile_expr(rn: Column, n: int, k: int) -> Column:
    """SQL-standard NTILE(k) from an exact global row_number and total n.

    With q = n // k and r = n % k, buckets 1..r get q+1 rows and the rest
    get q — the same distribution every engine implements.  Pure integer
    arithmetic on plan-time literals, so it composes with the distributed
    row_number instead of forcing a single-partition window.
    """
    q, r = divmod(n, k)
    head = r * (q + 1)
    if q == 0:  # fewer rows than tiles: row i -> tile i
        return rn.cast("int")
    return (
        F.when(rn <= head, F.floor((rn - 1) / (q + 1)))
        .otherwise(r + F.floor((rn - head - 1) / q))
        .cast("int")
        + 1
    )
