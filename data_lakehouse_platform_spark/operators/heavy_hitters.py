"""Distributed heavy hitters: Misra–Gries candidate generation with an
exact recount — top-K frequent items whose SHUFFLE VOLUME is bounded by
the summary capacity, not by the number of distinct items.

The plain exact plan (``groupBy(item).count().orderBy(...).limit(K)``)
is already scale-correct — map-side partial aggregation plus a parallel
TakeOrderedAndProject — but its shuffle carries one record per DISTINCT
item per map partition.  On a 100 TB corpus the distinct n-gram
vocabulary is billions of entries: the shuffle width is the
vocabulary, and the hash-aggregate state on every mapper is too.  The
classic fix is a mergeable frequency summary:

1. **per-partition Misra–Gries** (capacity ``c``): each input partition
   reduces its item stream to at most ``c`` weighted counters using the
   mergeable-summaries formulation (Agarwal et al., PODS'12) — merge
   exact per-Arrow-batch counts into the running summary, and when it
   exceeds ``c`` entries, subtract the (c+1)-th largest count from all
   and drop the non-positive.  Guarantee: any item whose frequency in
   that partition exceeds ``n_p / (c+1)`` survives.  Only ``c`` items
   per partition ever leave the executor.
2. **candidate union**: the distinct survivors across partitions.  An
   item with GLOBAL frequency ``f > n / (c+1)`` must exceed the local
   floor in at least one partition (if it missed every one, summing the
   per-partition bounds gives ``f <= n/(c+1)``), so the union covers
   every sufficiently-frequent item.
3. **exact recount**: broadcast-semi-join the item stream against the
   candidates and count exactly — a second streaming pass whose
   aggregate state is at most ``c × partitions`` keys, then a parallel
   top-K.

The result is *provably* the true top-K whenever the K-th exact count
clears the MG floor ``n/(c+1)`` — an integer comparison emitted as the
``above_mg_floor`` audit column (all-true ⇒ certificate of exactness).
For Zipf-distributed corpora (text tokens, URLs, user ids) the top
items sit orders of magnitude above the floor at any scale.

The per-partition summary runs in ``mapInPandas``: Misra–Gries is
inherently sequential per item, which is exactly the "per-partition
imperative logic" case where a Python kernel is warranted — the item
stream arrives as Arrow batches, per-batch counting is vectorized
(``value_counts``), and only the ≤ c-entry summary dict is touched per
batch.

Reference analog: the reference's gold fact rebuild
(scripts/batch/gold_fact_orders.py) and its duplicate-count gates
(scripts/batch/data_quality/bronze_validation.py) compute full groupBy
counts; this is the shape that survives when the group domain no
longer fits the shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def _mg_summary(items: DataFrame, item_col: str, capacity: int) -> DataFrame:
    """Per-partition Misra–Gries pass. Output rows: one per surviving
    candidate (``__prows`` null) plus ONE partition-total row per
    partition (``item_col`` null, ``__prows`` = rows streamed) — so the
    corpus row count falls out of the same single scan instead of
    costing another full pass.

    NULL item values are never candidates (the null slot is the
    partition-total sentinel; value_counts drops them) but DO count
    toward ``__prows``, which only makes the exactness certificate
    more conservative."""
    dtype = dict(items.dtypes)[item_col]

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Vectorized throughout: per-batch exact counts via
        # value_counts, summary merge via index-aligned Series.add —
        # Python-level work is O(summary size), never O(rows).
        run = pd.Series(dtype="int64")
        rows = 0
        for pdf in batches:
            rows += len(pdf)
            vc = pdf[item_col].value_counts()
            run = run.add(vc, fill_value=0) if len(run) else vc.astype("int64")
            if len(run) > capacity:
                # Mergeable-summaries reduction: subtract the (c+1)-th
                # largest counter from all, drop the non-positive —
                # at most c strictly-greater entries remain.
                d = run.nlargest(capacity + 1).iloc[-1]
                run = run[run > d] - d
        # Two separate frames (not concat): mixing a typed index with a
        # null row would coerce int64 items to float64 and break the
        # Arrow cast back to the declared type.
        yield pd.DataFrame(
            # object dtype on purpose: an empty partition's summary has
            # an int64 RangeIndex, and Arrow type-checks the dtype even
            # for zero rows; object converts per the declared schema.
            {item_col: run.index.astype(object), "__prows": [None] * len(run)}
        )
        yield pd.DataFrame({item_col: [None], "__prows": [rows]})

    return items.select(item_col).mapInPandas(
        mg, schema=f"{item_col} {dtype}, __prows bigint"
    )


def misra_gries_candidates(
    items: DataFrame, item_col: str, capacity: int = 512
) -> DataFrame:
    """≤ ``capacity`` candidate items per input partition (distinct
    overall), covering every item with global share > 1/(capacity+1).
    Works for any atomic item type — the kernel's output schema is
    derived from the input column."""
    summary = _mg_summary(items, item_col, capacity)
    return (
        summary.filter(F.col(item_col).isNotNull())
        .select(item_col)
        .distinct()
    )


def heavy_hitters_exact(
    items: DataFrame,
    item_col: str,
    k: int,
    capacity: int = 512,
    freq_col: str = "freq",
) -> DataFrame:
    """Top-``k`` items by exact count via MG candidates + exact recount.

    Output: ``(item_col, freq_col, hh_rank, corpus_n, above_mg_floor)``
    ordered by frequency desc with the item value as tiebreak.
    ``above_mg_floor`` true on every row certifies the result equals
    the unrestricted exact top-K.
    """
    # One MG scan produces BOTH the candidates and the corpus row count
    # (partition-total rows).  The whole summary is driver-bounded by
    # construction — ≤ (capacity+1) × partitions narrow rows, that is
    # the point of the sketch — so ONE collect of ONE job yields both
    # outputs: no persist to leak into a long-lived session, no second
    # pass over the kernel.
    summary = _mg_summary(items, item_col, capacity)
    rows = summary.collect()
    cand_rows = sorted(
        {r[item_col] for r in rows if r[item_col] is not None}
    )
    corpus_n = sum(r["__prows"] for r in rows if r[item_col] is None)
    item_type = summary.schema[item_col].dataType
    spark = items.sparkSession
    cands = spark.createDataFrame(
        [(v,) for v in cand_rows],
        StructType([StructField(item_col, item_type)]),
    )
    totals = spark.createDataFrame([(int(corpus_n),)], "corpus_n bigint")
    exact = (
        items.join(F.broadcast(cands), item_col)
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias(freq_col))
        .orderBy(F.col(freq_col).desc(), F.col(item_col))
        .limit(k)
    )
    # At most k rows reach this window — bounded, not a reducer wall.
    w_rank = F.row_number().over(
        Window.orderBy(F.col(freq_col).desc(), F.col(item_col))
    )
    return (
        exact.crossJoin(F.broadcast(totals))
        .withColumn("hh_rank", w_rank)
        .withColumn(
            "above_mg_floor",
            # integer arithmetic: freq * (c+1) > n  ⇔  freq > n/(c+1)
            (F.col(freq_col) * (capacity + 1) > F.col("corpus_n")).cast(
                "int"
            ),
        )
        .select(item_col, freq_col, "hh_rank", "corpus_n", "above_mg_floor")
    )
