"""Portable probabilistic sketches: HyperLogLog, count-min, Bloom.

Spark ships approximate sketches (``approx_count_distinct`` is HLL++,
``count_min_sketch`` exists as an expression), but their register
layouts are engine-private: an estimate computed by Spark can neither
be re-verified by another engine nor merged with a sketch built
elsewhere. At 100 TB that matters — sketch state routinely outlives
the job that built it (daily HLL registers merged into monthly
uniques, Bloom filters shipped to the ingest tier), so the register
layout IS the interface.

Everything here is therefore built from two engine-neutral bricks:

* ``hash60`` — the top 60 bits of md5, parsed as a BIGINT. md5 is
  bit-identical everywhere; 60 bits keeps the value positive and
  inside int64 in every engine (DuckDB, Spark, Trino all agree).
* deterministic post-processing — integer max/min/count per cell and,
  for HLL's harmonic mean, a left fold over the register list in
  register order, so the one floating-point reduction happens in the
  same sequence on every engine and partitioning (same pattern as
  functions/money.py's fixed-point sums).

All sketch state is tiny and mergeable: HLL is ``m`` registers per
group (a further ``MAX`` merges days into months), count-min is a
``d x w`` grid (element-wise ``+``), Bloom is a set of bit positions
(``UNION``). The expensive input side stays map-side combinable —
shuffle width is bounded by sketch capacity, never by cardinality.

Reference analog: the reference has no sketches — its uniques are
exact MySQL ``COUNT(DISTINCT)`` (scripts/database/*), which is the
single-node luxury these operators replace at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 60-bit hash space: 15 hex chars of md5. Positive in int64 everywhere.
HASH_BITS = 60
_MASK54 = (1 << 54) - 1  # low bits left after a 6-bit register index


def hash60(col: Column | str, salt: str | None = None) -> Column:
    """Deterministic 60-bit integer hash of a string column.

    ``conv(hex, 16, 10)`` on 15 md5 hex chars — pure JVM expression,
    bit-identical to DuckDB's ``('0x' || substr(md5(x),1,15))::BIGINT``
    (see :func:`sql_hash60`), positive, so ``%`` behaves the same in
    every engine.  NULL input hashes to NULL (md5 of NULL) in both
    engines — consumers that must count nulls should ``coalesce`` to a
    sentinel first, the way dedup_exact does.
    """
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(F.lit(salt), F.lit(":"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def sql_hash60(expr: str, salt: str | None = None) -> str:
    """DuckDB twin of :func:`hash60` — keep in lockstep."""
    if salt is not None:
        expr = f"'{salt}' || ':' || ({expr})"
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


# ----------------------------------------------------------------------------
# HyperLogLog (m = 64 registers, p = 6)
# ----------------------------------------------------------------------------

HLL_P = 6
HLL_M = 1 << HLL_P  # 64 registers
# alpha_64 from the HLL paper's bias table (Flajolet et al. 2007) —
# a published constant, same in every implementation.
HLL_ALPHA = 0.709


def hll_rho_projection(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Map-side HLL projection: ``group_cols + (reg, __rho)``.

    Register index = top 6 bits of the 60-bit hash; rank = position of
    the highest set bit in the remaining 54 (``55 - length(bin(w))``,
    0-input capped at 55). Pure expression work, shared verbatim by
    the batch sketch and the streaming sketch (streaming/sketches.py)
    so both produce identical register state from identical rows.
    """
    h = df.select(
        *group_cols,
        hash60(F.col(value_col).cast("string")).alias("__hv"),
    )
    split = h.select(
        *group_cols,
        F.expr("shiftright(__hv, 54)").alias("reg"),
        F.expr(f"__hv & {_MASK54}").alias("__w"),
    )
    return split.select(
        *group_cols,
        "reg",
        F.expr("IF(__w = 0, 55, 55 - length(bin(__w)))")
        .cast("bigint")
        .alias("__rho"),
    )


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Per-group HLL register maxima: ``group_cols + (reg, m)``.

    This is the *mergeable sketch state*: a further ``MAX(m)`` per
    (group, reg) merges sketches across days/shards exactly.
    Integer-only, map-side combinable — the shuffle carries at most
    ``|groups| * 64`` rows.
    """
    return (
        hll_rho_projection(df, group_cols, value_col)
        .groupBy(*group_cols, "reg")
        .agg(F.max("__rho").alias("m"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Raw HLL estimate per group from a register table.

    Contract: ``registers`` has at most one row per (group, reg) — the
    shape :func:`hll_registers` and any ``MAX``-merge of such tables
    produce (``map_from_entries`` rejects duplicate keys loudly
    otherwise).  Missing registers count as 0 (empty). The harmonic-mean denominator
    folds ``1 / 2^m`` over the 64 registers *in register order* via
    ``aggregate`` — a left fold DuckDB's ``list_reduce`` replays in the
    identical sequence, so the double is bit-identical across engines
    (each term is an exact power of two; only the fold order could
    differ, and it doesn't). No bias/small-range correction: this is
    the raw estimator, same formula both sides of the oracle.
    """
    per_group = registers.groupBy(*group_cols).agg(
        F.map_from_entries(F.collect_list(F.struct("reg", "m"))).alias("__mm")
    )
    denom = (
        "aggregate("
        "  transform(sequence(CAST(0 AS BIGINT), CAST(63 AS BIGINT)),"
        "            r -> coalesce(try_element_at(__mm, r), CAST(0 AS BIGINT))),"
        "  CAST(0.0 AS DOUBLE),"
        "  (acc, x) -> acc + 1.0D / CAST(shiftleft(CAST(1 AS BIGINT), CAST(x AS INT)) AS DOUBLE)"
        ")"
    )
    return per_group.select(
        *group_cols,
        F.expr(f"{HLL_ALPHA}D * {HLL_M * HLL_M} / {denom}").alias("hll_estimate"),
    )


# ----------------------------------------------------------------------------
# Count-min sketch (d rows x w cells)
# ----------------------------------------------------------------------------


def countmin_table(
    df: DataFrame, key_col: str, d: int = 4, w: int = 512
) -> DataFrame:
    """Count-min cell counts ``(row, cell, cnt)`` for a key column.

    Each key lands in one cell per hash row (md5 salted by row index);
    the grouped count is map-side combinable, so the shuffle carries at
    most ``d * w`` cells no matter how large the vocabulary — the whole
    point of the sketch at corpus scale. Estimates read back with
    ``MIN(cnt)`` over the d rows (see queries_sketch_ext).
    """
    rows = df.select(
        F.col(key_col).alias("__k"),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row"),
    )
    cells = rows.select(
        "row",
        (
            F.expr(
                f"CAST(conv(substring(md5(concat(CAST(row AS STRING), ':', __k)), 1, 15), 16, 10) AS BIGINT)"
            )
            % w
        ).alias("cell"),
    )
    return cells.groupBy("row", "cell").agg(F.count("*").alias("cnt"))


# ----------------------------------------------------------------------------
# Bloom filter (k hashes into m bits)
# ----------------------------------------------------------------------------


def bloom_bits(
    df: DataFrame, key_col: str, k: int = 3, m_bits: int = 8192
) -> DataFrame:
    """The Bloom filter itself: DISTINCT set bit positions (``bitpos``).

    ``k`` salted hashes per key, modulo ``m_bits``. The result is a
    single-column table of at most ``m_bits`` rows — broadcast it.
    Unlike shipping the raw eval set (decontaminate_ngram), the
    broadcast is bounded by the filter size, not the eval corpus; the
    price is the textbook false-positive rate, which the consumer
    reports rather than hides.
    """
    hashes = df.select(
        F.col(key_col).alias("__k"),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__i"),
    )
    return hashes.select(
        (
            F.expr(
                "CAST(conv(substring(md5(concat(CAST(__i AS STRING), ':', __k)), 1, 15), 16, 10) AS BIGINT)"
            )
            % m_bits
        ).alias("bitpos")
    ).distinct()
