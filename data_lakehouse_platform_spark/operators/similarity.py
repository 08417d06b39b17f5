"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k: the correctness baseline. The query set
  is small by construction (it is broadcast); candidates stream
  through a single pass — O(|Q| * n) with no shuffle on the corpus
  side until the final per-query top-k (a width-k aggregation).
* LSH-bucketed variant (random-hyperplane signs with deterministic
  md5-derived coefficients): the scale path — buckets bound the
  candidate set so the join is |Q| x bucket instead of |Q| x n.

All vector math is JVM higher-order functions (functions/vectors.py)
— verified bit-identical to DuckDB's list_dot_product on DOUBLE[],
so oracle comparison needs no tolerance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.functions.vectors import (
    cosine_similarity,
    cosine_with_norms,
    dot,
    l2_norm,
    py_l2_norm,
)

#: Hard cap on ANN query sets that are materialized on the driver
#: (per-query lookup tables / broadcast literals). The registry queries
#: select a handful of designated rows; a library user passing a
#: corpus-sized DataFrame as ``queries`` gets this named error instead
#: of an opaque driver OOM.
MAX_QUERY_SET_ROWS = 10_000


class QuerySetTooLargeError(ValueError):
    """ANN ``queries`` DataFrame exceeds the driver-side cap."""


def collect_query_set(queries: DataFrame, max_rows: int | None = None):
    """Collect a query set that the caller contract says is small,
    enforcing the cap BEFORE driver memory is at risk: one job,
    ``limit(max_rows + 1)``, never an unbounded collect."""
    if max_rows is None:
        max_rows = MAX_QUERY_SET_ROWS
    rows = queries.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise QuerySetTooLargeError(
            f"ANN query set exceeds {max_rows} rows; per-query scoring "
            "state lives on the driver, so batch the queries (e.g. "
            "process in chunks of <= "
            f"{max_rows}) instead of passing a corpus-sized DataFrame"
        )
    return rows


def cosine_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """All pairs with cosine >= threshold (brute force; for the
    bounded near-dup audit path — at full scale use LSH buckets)."""
    extra = extra_cols or []
    # r10 optimization: norms hoisted onto the join SIDES (computed once
    # per vector) and the cheap id inequality placed FIRST in an
    # explicit join condition.  The previous form let Catalyst push the
    # threshold filter into the BroadcastNestedLoopJoin condition, where
    # the full 3-HOF cosine ran per candidate pair — ordered BEFORE the
    # cheap a<b conjunct — and then re-ran in the project (measured
    # 3.7s -> see OPTIMIZATION_r10.md; emitted cosine is bit-identical:
    # same dot, same norm product, same division).
    a = emb.select(
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("__va"),
        l2_norm(vec_col).alias("__na"),
        *[F.col(c).alias(f"{c}_a") for c in extra],
    )
    b = emb.select(
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("__vb"),
        l2_norm(vec_col).alias("__nb"),
        *[F.col(c).alias(f"{c}_b") for c in extra],
    )
    cos = cosine_with_norms("__va", "__vb", "__na", "__nb")
    return a.join(
        b, (a.vec_a < b.vec_b) & (cos >= threshold)
    ).select(
        "vec_a",
        "vec_b",
        cos.alias("cosine"),
        *[F.col(f"{c}_a") for c in extra],
        *[F.col(f"{c}_b") for c in extra],
    )


def lsh_bucket(vec_col: Column | str, pivot_pairs: list[tuple[list[float], list[float]]]) -> Column:
    """Deterministic hyperplane-sign bucket id for a vector column.

    Each bit j is ``dot(v, A_j) >= dot(v, B_j)`` for a fixed pivot pair
    (A, B) — equivalent to the sign of ``dot(v, A_j - B_j)``, i.e. a
    random-hyperplane LSH bit, but with data-derived pivots so both
    engines can recompute it exactly. Pivots enter as literal arrays,
    so the whole bucket expression is a single codegen'd map pass —
    no join, no shuffle.
    """
    bits = []
    for pa, pb in pivot_pairs:
        da = dot(vec_col, F.array(*[F.lit(float(x)) for x in pa]))
        db = dot(vec_col, F.array(*[F.lit(float(x)) for x in pb]))
        bits.append(F.when(da >= db, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def ann_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    pivot_pairs: list[tuple[list[float], list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    The scale path vs :func:`ann_topk_bruteforce` — the broadcast join
    keys on (bucket, id!=) so each corpus row is scored against only
    the queries sharing its bucket, turning O(|Q| * n) scoring into
    O(n / 2^bits * |Q|) expected. Corpus side never shuffles until the
    final per-query top-k window (width-k per query).
    """
    bucket = lsh_bucket(vec_col, pivot_pairs)
    c = emb.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(vec_col).alias("__nc"),
        bucket.alias("__cb"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(vec_col).alias("__nq"),
        bucket.alias("__qb"),
    )
    scored = c.join(
        F.broadcast(q),
        (F.col("__cb") == F.col("__qb")) & (F.col("cand_id") != F.col("query_id")),
    ).select(
        "query_id",
        "cand_id",
        F.col("__cb").alias("bucket"),
        # norms hoisted per vector (r10): same emitted cosine
        cosine_with_norms("__qv", "__cv", "__nq", "__nc").alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign(
    vec_col: Column | str,
    centroids: list[tuple[int, list[float]]],
    vec_norm: Column | str | None = None,
) -> Column:
    """Nearest-centroid cell id for a vector column (IVF coarse quantizer).

    Centroids enter as literal arrays, so assignment is a single
    codegen'd map pass over the corpus — no join, no shuffle, exactly
    like :func:`lsh_bucket`. Ties on cosine go to the lowest centroid
    id (struct max over (cosine, -id) is lexicographic), so both
    engines pick identical cells. At scale the centroid list is the
    output of an offline k-means (bounded, e.g. 4-65k entries); here it
    is a deterministic sample so the oracle can recompute it.
    """
    # r10 optimization: centroid norms are constants — folded on the
    # driver with Spark's exact fold semantics (py_l2_norm) — and the
    # row norm is evaluated once instead of once PER CENTROID when the
    # caller passes a precomputed ``vec_norm`` column.  Same cosine
    # values (same dot, same norm product, same division), so ties
    # break identically.
    vn = (
        l2_norm(vec_col)
        if vec_norm is None
        else (F.col(vec_norm) if isinstance(vec_norm, str) else vec_norm)
    )
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    (
                        dot(vec_col, F.array(*[F.lit(float(x)) for x in vec]))
                        / (vn * F.lit(py_l2_norm(vec)))
                    ).alias("cos"),
                    F.lit(-int(cid)).alias("negid"),
                )
                for cid, vec in centroids
            ]
        )
    )
    return (-best["negid"]).cast("int")


def ann_topk_ivf(
    emb: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: corpus rows live in their nearest-centroid
    cell; each query probes its ``nprobe`` closest cells.

    The corpus side is one map pass (cell assignment) and never
    shuffles until the final per-query top-k window; the probe list is
    |Q| x nprobe rows and broadcasts. Expected candidates per query:
    nprobe/n_cells of the corpus — the recall/cost dial is (n_cells,
    nprobe), the classic IVF trade-off.
    """
    cdf = queries.sparkSession.createDataFrame(
        [(int(cid), [float(x) for x in vec]) for cid, vec in centroids],
        "cid int, cvec array<double>",
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    wq = Window.partitionBy("query_id").orderBy(
        F.col("__qcos").desc(), F.col("cid")
    )
    probe = (
        q.crossJoin(F.broadcast(cdf))
        .withColumn("__qcos", cosine_similarity("__qv", "cvec"))
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "__qv", "cid")
    )
    c = emb.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(vec_col).alias("__nc"),
    ).select(
        "cand_id",
        "__cv",
        "__nc",
        # __nc is multi-referenced and non-cheap, so CollapseProject
        # keeps it materialized below — one row-norm evaluation feeds
        # all k centroid cosines
        ivf_assign("__cv", centroids, vec_norm="__nc").alias("cid"),
    )
    qn = probe.withColumn("__nq", l2_norm("__qv"))
    scored = c.join(
        F.broadcast(qn),
        (c.cid == qn.cid) & (F.col("cand_id") != F.col("query_id")),
    ).select(
        "query_id",
        "cand_id",
        # norms hoisted per vector (r10): same emitted cosine
        cosine_with_norms("__qv", "__cv", "__nq", "__nc").alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ann_topk_bruteforce(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries`` must be small (it is broadcast): (id, vector). One
    pass over the corpus, then a per-query top-k window.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(vec_col).alias("__nq"),
    )
    c = emb.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(vec_col).alias("__nc"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("cand_id") != F.col("query_id"))
        # norms hoisted per vector (r10): same emitted cosine, one dot
        # per scored pair instead of three HOF evaluations
        .select(
            "query_id",
            "cand_id",
            cosine_with_norms("__qv", "__cv", "__nq", "__nc").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
