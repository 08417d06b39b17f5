"""Skew mitigation for shuffle joins: key salting.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime by splitting oversized post-shuffle partitions. Salting is the
explicit fallback for the cases AQE can't fix — a single join key so
hot that even a split partition is one reducer's worth of one key, or
engines/paths where AQE is off (e.g. some streaming joins).

Mechanics: every row of the big (skewed) side gets a deterministic
salt in [0, salt); the small side is replicated once per salt value;
the join key becomes (key, salt), spreading each hot key over `salt`
reducers. Cost: |small| * salt extra rows — use only when the small
side is modest but too big to broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed big side to a non-broadcastable small side with
    the hot keys spread over ``salt`` partitions.

    The salt is a deterministic hash of the whole big-side row (not a
    RNG), so retries and speculative tasks agree — the same
    reproducibility posture as the rest of the engine.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        # right/full outer are WRONG under salting: a small-side row
        # with no big-side match would surface once per salt value
        # (salt copies of it exist), not once. Fail loudly rather than
        # emit duplicated null-padded rows.
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got "
            f"{how!r} — the replicated small side makes right/full "
            "outer emit one unmatched row per salt value"
        )
    salt_col = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt)
    ).cast("int")
    b = big.withColumn("__salt", salt_col)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return b.join(s, on + ["__salt"], how).drop("__salt")


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: list[tuple[str, str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-stage aggregation for hot grouping keys: stage 1 groups by
    (key, salt) — a deterministic row hash spreads each hot key over
    ``salt`` reducers — stage 2 merges the partials per key.

    ``aggs``: (col, fn, out_name) with fn in {sum, count, min, max} —
    the decomposable aggregates whose partials merge losslessly
    (count merges by SUM). Spark's own partial aggregation usually
    makes this unnecessary; it wins when a downstream windowing or
    distinct forces full rows of one key through one reducer. Same
    trick as salted_join, applied to groupBy.
    """
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    salt_col = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt)
    ).alias("__salt")
    stage1 = (
        df.select("*", salt_col)
        .groupBy(*key_cols, "__salt")
        .agg(
            *[
                getattr(F, fn)(col).alias(out)
                for col, fn, out in aggs
            ]
        )
    )
    return stage1.groupBy(*key_cols).agg(
        *[
            getattr(F, merge_fn[fn])(out).alias(out)
            for _, fn, out in aggs
        ]
    )
