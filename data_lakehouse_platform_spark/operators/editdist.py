"""Bounded-blowup exact edit-distance similarity join.

The classic record-linkage failure mode is the blocked self-join whose
block population grows with the table: pair count is sum(block^2), so a
"125 distinct blocks" key that looks fine at sf0.1 is quadratic at
100x.  This module replaces pair *generation* with a deletion-
neighborhood signature join (the SymSpell / FastSS family): every
string emits the set of variants obtainable by deleting up to
``max_edits`` characters, and candidate pairs are strings that share a
variant (within the same hard block, if one is given).

Completeness (what makes the naive pairwise SQL a valid oracle): if
``lev(a, b) = k <= max_edits``, fix an optimal alignment; delete from
``a`` its substituted+deleted characters (<= k of them) and from ``b``
its substituted+inserted characters (<= k), and both sides reach the
same subsequence — so the pair shares a signature and is generated.
The signature join therefore misses nothing at the threshold, unlike
the MinHash-LSH family (probabilistic recall) this library also ships.

Scale shape, two levers:

1. Signatures are emitted per DISTINCT text, not per row.  Identical
   strings are THE adversarial near-dup input (a verbatim-replica
   crowd shares every variant, so per-row signatures would square the
   candidate stream through the crowd's buckets — measured 15x wall on
   a 10x verbatim-replicated corpus before this dedup, ~linear after).
   Verified pairs expand back through group membership afterwards, and
   distance-0 pairs come straight from group sizes — no join at all.
2. Signature rows are then ``n_distinct * O(len^max_edits)`` — linear
   with a per-row constant (1 + len + C(len, 2) ~ 172 for 18-char
   names).  A signature bucket holds only strings whose deletion
   neighborhoods intersect — bounded by alphabet/length geometry (for
   9-digit numeric suffixes, <= C(len, 2) * 10^2 regardless of table
   size), NOT by block population.  A "whale block" (every row in one
   (nation, segment) block) therefore splits across signatures instead
   of funneling into one task — proven by stress.py shape 8 and the
   10x scale lane.

Reference analog: the reference resolves entities by exact xxhash64
equality only (gold_dim_products.py:70-88); this is the bounded fuzzy
tier above it.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

__all__ = ["deletion_variants", "edit_distance_pairs"]


def deletion_variants(col: str | Column, max_edits: int = 2) -> Column:
    """Array of distinct strings reachable by deleting up to
    ``max_edits`` (1 or 2) characters from ``col``.

    Pure Spark expressions (sequence/transform/flatten) — stays inside
    whole-stage codegen, no Python on the data path.  Deleting original
    positions i < j is expressed as three substring slices so the
    second delete does not shift the first.
    """
    if max_edits not in (1, 2):
        raise ValueError("max_edits must be 1 or 2")
    s = F.col(col) if isinstance(col, str) else col
    n = F.length(s)
    # NB: sequence(1, 0) is DESCENDING in Spark, so every sequence()
    # below is guarded for short strings (empty array instead).
    empty = F.array().cast("array<string>")
    one = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat(
                s.substr(F.lit(1), i - 1),
                s.substr(i + 1, F.greatest(n - i, F.lit(0))),
            ),
        ),
    ).otherwise(empty)
    parts = [F.array(s), one]
    if max_edits == 2:
        two = F.when(
            n >= 2,
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), n - 1),
                    lambda i: F.transform(
                        F.sequence(i + 1, n),
                        lambda j: F.concat(
                            s.substr(F.lit(1), i - 1),
                            s.substr(i + 1, j - i - 1),
                            s.substr(j + 1, F.greatest(n - j, F.lit(0))),
                        ),
                    ),
                )
            ),
        ).otherwise(empty)
        parts.append(two)
    return F.array_distinct(F.flatten(F.array(*parts)))


def edit_distance_pairs(
    df: DataFrame,
    key: str,
    text: str,
    block_cols: Sequence[str] = (),
    threshold: int = 2,
    include_zero: bool = True,
    eager: bool = False,
) -> DataFrame:
    """All pairs (a, b), ``a.key < b.key``, with ``lev(a.text, b.text)
    <= threshold`` (and equal ``block_cols``, if given) — WITHOUT a
    blocked self-join.

    Returns columns: ``*block_cols, a_key, b_key, dist``.

    Cache lifecycle: the operator persists two intermediates (the
    distinct-text groups and the exploded signatures) because each is
    read more than once.  With the default ``eager=False`` the result
    is LAZY and those persisted blocks are released only when the
    returned DataFrame is garbage-collected (Spark's ContextCleaner) —
    one action's worth of storage, fine for run-once queries, but a
    long session that calls this in a loop and keeps results alive
    accumulates pinned blocks.  Pass ``eager=True`` to materialize the
    (small) pair result via ``localCheckpoint`` and unpersist both
    intermediates deterministically before returning; the returned
    frame is then backed by checkpoint blocks, not a re-runnable plan
    (so plan introspection sees a scan, and a lost executor fails the
    job instead of recomputing).

    Plan: group identical texts (dedup lever #1 above) -> explode
    deletion variants of each distinct text -> self-join on
    (block_cols, variant hash) -> verify with the builtin threshold
    Levenshtein (returns -1 above the threshold, so the verify is
    O(len * threshold) per pair) -> dedup verified text pairs -> expand
    back to member key pairs.  Candidates per distinct string are
    bounded by deletion-neighborhood density, not block size.

    ``include_zero=False`` skips materializing the distance-0 pairs
    (pairs of rows with byte-identical text).  Those expand as
    C(group, 2) rows — inherent to the answer, but a caller that only
    wants *near* matches (or counts the exact-dup tier separately from
    group sizes, as ``fuzzy_match_customers`` does) should skip them:
    a million-row verbatim crowd is then one group row here instead of
    half a trillion output pairs.
    """
    base = df.select(
        *block_cols, F.col(key).alias("__k"), F.col(text).alias("__t")
    )
    # One group per distinct (block, text): the representative key for
    # candidate generation plus the member list for the expansion.
    # Persisted because three consumers re-read it (signature explode +
    # the two member-expansion sides); MEMORY_AND_DISK spills instead
    # of OOMing at scale.
    groups = (
        base.groupBy(*block_cols, "__t")
        .agg(
            F.min("__k").alias("__rep"),
            F.collect_list("__k").alias("__ks"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Signatures are shuffled/hashed as 64-bit xxhash64 of the variant
    # string, not the string itself — halves shuffle bytes and compare
    # cost; a hash collision only adds a false candidate that the
    # Levenshtein verify discards.  (The groupBy above already spread
    # the rows across shuffle partitions, so the ~100x explode CPU is
    # distributed without an extra repartition.)  Persisted: the
    # self-join reads it twice and Spark does not reuse the exchange
    # across the two sides, so without this the explode (and its
    # array_distinct, O(variants^2) per row) runs twice.
    sigs = groups.select(
        *block_cols,
        "__rep",
        "__t",
        F.explode(deletion_variants("__t", threshold)).alias("__v"),
    ).select(
        *block_cols,
        "__rep",
        "__t",
        F.xxhash64(F.col("__v")).alias("__sig"),
    )
    sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    # shuffle_hash, not broadcast: the exploded side is ~100x the
    # distinct-text count, so a broadcast build is a single-threaded
    # hash of the whole signature set; shuffling both sides by
    # (block, sig) builds small per-partition maps and scales out.
    a = sigs.alias("a")
    b = sigs.hint("shuffle_hash").alias("b")
    cond = (F.col("a.__sig") == F.col("b.__sig")) & (
        F.col("a.__rep") < F.col("b.__rep")
    )
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    # Verify BEFORE dedup: a true pair at distance d shares many
    # variants (every common extra-delete combo), so the raw join
    # output is dominated by duplicates of real matches.  The
    # threshold Levenshtein is O(len * threshold) per row and runs
    # inside the join stage (no shuffle), so filtering first makes the
    # distinct() shuffle carry only verified pairs — tiny — instead of
    # the full candidate stream.  Texts in a group are distinct, so
    # d >= 1 here by construction; the = 0 tier is handled below.
    d = F.levenshtein(F.col("a.__t"), F.col("b.__t"), threshold)
    text_pairs = (
        a.join(b, cond)
        .where(d >= 1)
        .select(
            *[F.col(f"a.{c}").alias(c) for c in block_cols],
            F.col("a.__t").alias("__ta"),
            F.col("b.__t").alias("__tb"),
            d.alias("dist"),
        )
        .distinct()
    )
    # Expand each verified text pair to its member key pairs.  The
    # expansion joins key on the exact text (not its hash — a collision
    # here would attach the wrong members); verified pairs are few, so
    # these joins are cheap.  Ordering: the rep order says nothing
    # about member order, so emit least/greatest — each cross pair
    # appears exactly once (the text pair itself is generated once).
    ga = groups.select(
        *block_cols,
        F.col("__t").alias("__ta"),
        F.explode("__ks").alias("__ka"),
    )
    gb = groups.select(
        *block_cols,
        F.col("__t").alias("__tb"),
        F.explode("__ks").alias("__kb"),
    )
    on_a = [*block_cols, "__ta"]
    on_b = [*block_cols, "__tb"]
    out = (
        text_pairs.join(ga, on_a)
        .join(gb, on_b)
        .select(
            *block_cols,
            F.least("__ka", "__kb").alias("a_key"),
            F.greatest("__ka", "__kb").alias("b_key"),
            "dist",
        )
    )
    if include_zero:
        # Distance-0 pairs: all unordered member pairs within a group.
        # O(group^2) output — inherent to the answer; the double
        # explode keeps it off the driver and out of the signature
        # join.  Callers with verbatim mega-crowds should pass
        # include_zero=False and read group sizes instead.
        zeros = (
            groups.where(F.size("__ks") >= 2)
            .select(*block_cols, F.explode("__ks").alias("a_key"), "__ks")
            .select(*block_cols, "a_key", F.explode("__ks").alias("b_key"))
            .where(F.col("a_key") < F.col("b_key"))
            .withColumn("dist", F.lit(0))
        )
        out = out.unionByName(zeros)
    if eager:
        out = out.localCheckpoint(eager=True)
        groups.unpersist()
        sigs.unpersist()
    return out
