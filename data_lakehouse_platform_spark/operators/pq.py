"""Product-quantization (PQ) ANN: compress each vector to ``m`` small
codes, score queries against the codes via lookup tables — the
memory-side of the ANN trade-off space, complementing the compute-side
variants already here (LSH hyperplanes, IVF coarse cells, int8
scalar quantization in the registry).

Why PQ at 100 TB: a 64-dim float corpus is 256 B/vector; PQ at m=8,
k=16 is 8 B/vector (32x), so the scan side of ANN fits in a fraction
of the executors — and the asymmetric-distance (ADC) scan is pure
JVM expression work (zip_with + aggregate over literal lookup
tables), no Python, no shuffle until the final per-query top-k.

Training is per-SUBSPACE Lloyd with the same determinism contract as
operators/kmeans.py: fixed-point centroid means (sum of
floor(x*1e6) over exact int64, one double division), assignment by
argmin L2 expressed as argmax(2·x·c − |c|²) with lowest-code-id tie
break — same corpus in, bit-identical codebooks out, on any
partitioning. Only m × k × (d/m) centroid floats ever reach the
driver.

Reference analog: none — the reference ships no vector indexing; this
extends the ANN subsystem the LLM-pipeline mandate adds
(similarity.py:75-186).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.operators.similarity import collect_query_set

_SCALE = 1_000_000

Codebooks = list[list[tuple[int, list[float]]]]  # [block][(code_id, subvec)]


def _block_dot(vec_col, start0: int, c: list[float]):
    """Sequential left-fold dot of vec[start0 : start0+len(c)] with the
    literal centroid — FLAT scalar arithmetic (element_at + literal
    multiply-adds) instead of aggregate/zip_with lambdas, which Spark
    evaluates per element OUTSIDE whole-stage codegen (~8x slower
    measured on the encode pass).  The fold starts at 0.0 and adds
    left-to-right, bit-identical to the lambda form and to DuckDB's
    list_dot_product, so oracle hash parity is preserved."""
    acc = F.lit(0.0)
    for i, ci in enumerate(c):
        acc = acc + F.element_at(vec_col, start0 + i + 1).cast("double") * F.lit(
            float(ci)
        )
    return acc


def _block_assign(
    vec_col, centroids: list[tuple[int, list[float]]], start0: int = 0
):
    """argmin_c ||x − c||² == argmax_c (2·x·c − |c|²), ties to the
    LOWEST code id (struct array_max over (score, −cid)) — one codegen
    expression, no join.  ``start0`` slices the block out of the full
    vector without a transform/slice pass."""
    entries = []
    for cid, c in centroids:
        dot = _block_dot(vec_col, start0, c)
        c2 = float(sum(x * x for x in c))
        entries.append(
            F.struct(
                (2.0 * dot - F.lit(c2)).alias("score"),
                F.lit(-int(cid)).alias("negid"),
            )
        )
    return F.array_max(F.array(*entries))


def _slice(vec_col, start0: int, length: int):
    return F.transform(
        F.slice(vec_col, start0 + 1, length), lambda x: x.cast("double")
    )


def train_pq(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    rounds: int = 2,
) -> Codebooks:
    """Train ``m`` per-subspace codebooks of ``k`` centroids each.
    d must divide evenly by m. Seeds are the block-slices of the rows
    with the ``k`` smallest ids (deterministic, recomputable, and safe
    for offset/sparse id spaces)."""
    d = len(emb.select(vec_col).first()[0])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    blk = d // m

    from pyspark import StorageLevel

    pts = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    # The training loop consumes `pts` m*rounds+1 times, and each pass
    # embeds DIFFERENT centroid literals (non-identical subtrees, so
    # ReuseExchange can't fuse them) — materialize once instead of
    # re-running the upstream pipeline per (block, round).
    pts = pts.persist(StorageLevel.MEMORY_AND_DISK)
    # Seed from the k smallest ids — NOT `vec_id < k`, which assumes dense
    # ids starting at 0 and yields too few (possibly zero) seeds on a
    # corpus with offset or sparse ids.
    seed_rows = pts.orderBy("vec_id").limit(k).collect()
    if len(seed_rows) < k:
        raise ValueError(
            f"train_pq needs at least k={k} vectors to seed the codebooks; "
            f"corpus has only {len(seed_rows)}"
        )

    codebooks: Codebooks = []
    for b in range(m):
        centroids = [
            (int(r["vec_id"]), [float(x) for x in r["v"][b * blk : (b + 1) * blk]])
            for r in seed_rows
        ]
        sub = pts.select("vec_id", _slice(F.col("v"), b * blk, blk).alias("s"))
        for _ in range(rounds):
            assigned = sub.select(
                "s", (-_block_assign(F.col("s"), centroids)["negid"]).alias("cid")
            )
            mean_rows = (
                assigned.select("cid", F.posexplode("s").alias("d", "x"))
                .groupBy("cid", "d")
                .agg(
                    (
                        F.sum(F.floor(F.col("x") * _SCALE)).cast("double")
                        / (F.lit(float(_SCALE)) * F.count(F.lit(1)))
                    ).alias("x")
                )
                .collect()  # bounded: k x (d/m) trained metadata
            )
            by_code: dict[int, dict[int, float]] = {}
            for r in mean_rows:
                by_code.setdefault(int(r["cid"]), {})[int(r["d"])] = float(r["x"])
            centroids = [
                (cid, [dims[i] for i in sorted(dims)])
                for cid, dims in sorted(by_code.items())
            ]
        # re-number codes 0..len-1 so element_at lookups are dense
        codebooks.append([(j, vec) for j, (_, vec) in enumerate(centroids)])
    pts.unpersist()
    return codebooks


def pq_encode(
    emb: DataFrame,
    codebooks: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Arrow-batched map pass: (vec_id, codes array<int>[m],
    recon_norm2) — recon_norm2 is the squared norm of the RECONSTRUCTED
    vector (sum of chosen centroids' |c|² per block), the candidate-side
    half of the approximate-cosine denominator, paid once at encode time.

    Implementation note: the assignment is a numpy kernel in
    mapInPandas, not a Catalyst expression.  The expression forms both
    lose: aggregate/zip_with lambdas evaluate per element OUTSIDE
    whole-stage codegen (~5s/5k vectors), and the flattened
    element_at+literal arithmetic (m·k·blk ≈ 1k terms) blows the 64 KB
    JIT method limit and falls back to interpreted (slower still).
    The kernel reproduces the expression semantics BIT-EXACTLY: the
    per-row dot is a left fold starting at 0.0, looped over dims and
    vectorized over rows, so every double equals the lambda form and
    DuckDB's list_dot_product; ties go to the lowest code id
    (np.argmax first-max over code-ascending rows == array_max over
    (score, −cid) structs)."""
    import numpy as np
    import pandas as pd

    m = len(codebooks)
    blk = len(codebooks[0][0][1])
    # code-ascending order makes argmax's first-max tie rule == lowest id
    books = [sorted(cb, key=lambda e: e[0]) for cb in codebooks]
    cids = [np.array([cid for cid, _ in cb], dtype=np.int32) for cb in books]
    c2s = [
        np.array([float(sum(x * x for x in c)) for _, c in cb]) for cb in books
    ]

    def kernel(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            codes = np.empty((n, m), dtype=np.int32)
            norm2 = np.zeros(n)
            for b in range(m):
                scores = np.empty((len(books[b]), n))
                for j, (_cid, c) in enumerate(books[b]):
                    acc = np.zeros(n)  # 0.0-seeded left fold over dims
                    for i in range(blk):
                        acc = acc + V[:, b * blk + i] * c[i]
                    scores[j] = 2.0 * acc - c2s[b][j]
                best = np.argmax(scores, axis=0)
                codes[:, b] = cids[b][best]
                norm2 = norm2 + c2s[b][best]
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col],
                    "codes": [row.tolist() for row in codes],
                    "recon_norm2": norm2,
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        kernel, schema="vec_id long, codes array<int>, recon_norm2 double"
    )


def ann_topk_pq_mips(
    encoded: DataFrame,
    queries: DataFrame,
    codebooks: Codebooks,
    k: int = 10,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Integer-quantized ADC maximum-inner-product top-k — the
    oracle-checkable twin of :func:`ann_topk_pq`.

    Each LUT entry is ``floor(scale · dot(q_block, centroid))``: the
    dot is a sequential left fold (bit-identical across engines on the
    same operands), and the per-candidate score ``adc_q6 = Σ_b
    lut[b][code_b]`` is then an exact BIGINT sum — associative, order-
    free, hash-safe — so ranking and emitted values reproduce exactly
    under any execution plan.  The corpus scan stays one
    zip_with/aggregate expression over the m-byte codes; queries are
    driver-small by construction like the other ANN variants.
    """
    m = len(codebooks)
    blk = len(codebooks[0][0][1])
    qrows = collect_query_set(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        )
    )
    lut_rows = []
    for r in qrows:
        qv = [float(x) for x in r["v"]]
        lut = []
        for b in range(m):
            row = []
            for _, c in codebooks[b]:
                acc = 0.0  # same left fold as the engine dot products
                for i in range(blk):
                    acc += qv[b * blk + i] * c[i]
                row.append(math.floor(scale * acc))
            lut.append(row)
        lut_rows.append((int(r["query_id"]), lut))
    ldf = queries.sparkSession.createDataFrame(
        lut_rows, "query_id long, lut array<array<bigint>>"
    )
    adc = F.aggregate(
        F.zip_with("codes", "lut", lambda c, row: F.element_at(row, c + 1)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    scored = encoded.join(
        F.broadcast(ldf), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        adc.alias("adc_q6"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_q6").desc(), F.col("cand_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ann_topk_pq(
    encoded: DataFrame,
    queries: DataFrame,
    codebooks: Codebooks,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k: each query precomputes its m × k
    lookup table of subspace dot products (driver-side — |Q| × m × k
    floats, query-side-small by construction like the other ANN
    variants), then the corpus scan is one zip_with/aggregate
    expression per candidate over the 8-byte codes. Score is
    approximate cosine: ADC dot / (|q| · |reconstructed x|)."""
    m = len(codebooks)
    blk = len(codebooks[0][0][1])
    qrows = collect_query_set(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        )
    )
    lut_rows = []
    for r in qrows:
        qv = [float(x) for x in r["v"]]
        qnorm = sum(x * x for x in qv) ** 0.5
        lut = [
            [
                sum(qv[b * blk + i] * c[i] for i in range(blk))
                for _, c in codebooks[b]
            ]
            for b in range(m)
        ]
        lut_rows.append((int(r["query_id"]), lut, qnorm))
    ldf = queries.sparkSession.createDataFrame(
        lut_rows, "query_id long, lut array<array<double>>, qnorm double"
    )
    adc = F.aggregate(
        F.zip_with("codes", "lut", lambda c, row: F.element_at(row, c + 1)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        encoded.join(F.broadcast(ldf), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            (adc / (F.col("qnorm") * F.sqrt("recon_norm2"))).alias("approx_cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_cosine").desc(), F.col("cand_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
