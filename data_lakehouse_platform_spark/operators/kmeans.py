"""Distributed spherical k-means (Lloyd's algorithm) — the trainer
that produces the IVF coarse quantizer (similarity.ivf_assign /
ann_topk_ivf consume its centroid list).

Each round is one codegen'd map pass plus one bounded aggregation:

* **assign**: centroids are literal arrays baked into an argmax-cosine
  expression (`ivf_assign`) — no join, no shuffle of the corpus;
* **update**: per-(cell, dimension) means, shuffled on (cid, dim) —
  at most k x d groups regardless of corpus size. Only the k x d mean
  rows (e.g. 16 x 64) ever reach the driver, which re-bakes them into
  the next round's literals.

Determinism contract (what makes the trainer oracle-exact): float
summation is order-dependent, so centroid means are computed in FIXED
POINT — ``sum(floor(x * 1e6))`` over exact int64, divided back as one
double division. Every engine that groups the same members produces
bit-identical centroids, so assignment ties break identically and the
whole iteration is reproducible run-to-run — which also makes the
trained index auditable (same corpus -> same centroids, any cluster
size, any partitioning).

Ties on assignment go to the lowest cell id (struct-max over
(cosine, -cid)); empty cells drop out of the update (standard Lloyd
degeneracy handling, deterministic on both engines).

Reference analog: the reference ships no vector indexing — this plus
similarity.py IS the ANN subsystem the LLM-pipeline mandate adds; the
fixed-point discipline mirrors functions/money.py's exact-aggregation
scheme (reference computes money in DECIMAL for the same reason,
silver_facts.py cast patterns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.operators.similarity import ivf_assign
from data_lakehouse_platform_spark.functions.vectors import (
    dot,
    l2_norm,
    py_l2_norm,
)

_SCALE = 1_000_000


def _best_cell(vec_col, centroids, vec_norm):
    """Struct of (cosine, -cid) for the argmax-cosine centroid —
    lexicographic array_max == ORDER BY cosine DESC, cid ASC.

    ``vec_norm`` is the pre-computed row norm column and centroid norms
    fold on the driver (py_l2_norm, exact same IEEE sequence as the
    previous per-row l2_norm of the literal array), so each centroid
    costs one dot product instead of three HOF evaluations — same
    cosine values, same tie-breaks (r10)."""
    return F.array_max(
        F.array(
            *[
                F.struct(
                    (
                        dot(vec_col, F.array(*[F.lit(float(x)) for x in vec]))
                        / (vec_norm * F.lit(py_l2_norm(vec)))
                    ).alias("cos"),
                    F.lit(-int(cid)).alias("negid"),
                )
                for cid, vec in centroids
            ]
        )
    )


def lloyd_kmeans(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    rounds: int = 2,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Train k centroids for ``rounds`` Lloyd iterations; seeds are the
    rows with ``id_col < k`` (deterministic, oracle-recomputable).

    Returns ``(assignments, centroids)``: assignments has one row per
    input vector — (vec_id, cell_id, cosine, cell_size) against the
    FINAL centroids; centroids feed straight into ``ann_topk_ivf``.
    """
    pts = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).withColumn(
        # row norm computed ONCE per vector and cached with the points:
        # every round's assignment and the final argmax reuse it (r10)
        "__nv",
        l2_norm("v"),
    )
    # r10 optimization: pts feeds the seed collect, every round's mean
    # update, and the final assignment — unpersisted, each consumer
    # re-ran the scan + fan-out repartition + double-cast (plan audit:
    # embeddings scanned 4x per 2-round training).  Kept at the fanned
    # scan width: every consumer stage is CPU-dense (argmax-cosine over
    # k centroids x d dims per row).
    from pyspark import StorageLevel

    pts = pts.persist(StorageLevel.MEMORY_AND_DISK)
    centroids = [
        (int(r["vec_id"]), [float(x) for x in r["v"]])
        for r in pts.filter(F.col("vec_id") < k).collect()
    ]
    for _ in range(rounds):
        assigned = pts.select(
            "vec_id", "v", ivf_assign("v", centroids, vec_norm="__nv").alias("cid")
        )
        mean_rows = (
            assigned.select("cid", F.posexplode("v").alias("d", "x"))
            .groupBy("cid", "d")
            .agg(
                (
                    F.sum(F.floor(F.col("x") * _SCALE)).cast("double")
                    / (F.lit(float(_SCALE)) * F.count(F.lit(1)))
                ).alias("x")
            )
            .collect()  # bounded: k x d rows of trained metadata
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in mean_rows:
            by_cell.setdefault(int(r["cid"]), {})[int(r["d"])] = float(r["x"])
        centroids = [
            (cid, [dims[d] for d in sorted(dims)]) for cid, dims in sorted(by_cell.items())
        ]
    best = _best_cell(F.col("v"), centroids, F.col("__nv"))
    w = Window.partitionBy("cell_id")
    return (
        pts.select(
            "vec_id",
            (-best["negid"]).cast("int").alias("cell_id"),
            best["cos"].alias("cosine"),
        ).withColumn("cell_size", F.count(F.lit(1)).over(w)),
        centroids,
    )
