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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SCALE = 1_000_000

Codebooks = list[list[tuple[int, list[float]]]]  # [block][(code_id, subvec)]


def _block_assign(subvec_col, centroids: list[tuple[int, list[float]]]):
    """argmin_c ||x − c||² == argmax_c (2·x·c − |c|²), ties to the
    LOWEST code id (struct array_max over (score, −cid)) — one codegen
    expression, no join."""
    entries = []
    for cid, c in centroids:
        dot = F.aggregate(
            F.zip_with(
                subvec_col,
                F.array(*[F.lit(float(x)) for x in c]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
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
    """One map pass: (vec_id, codes array<int>[m], recon_norm2) —
    recon_norm2 is the squared norm of the RECONSTRUCTED vector
    (sum of chosen centroids' |c|² per block), the candidate-side half
    of the approximate-cosine denominator, paid once at encode time."""
    m = len(codebooks)
    blk = len(codebooks[0][0][1])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    codes = []
    norm2 = F.lit(0.0)
    for b in range(m):
        best = _block_assign(_slice(v, b * blk, blk), codebooks[b])
        codes.append((-best["negid"]).cast("int"))
        n2_lut = F.array(
            *[F.lit(float(sum(x * x for x in c))) for _, c in codebooks[b]]
        )
        norm2 = norm2 + F.element_at(n2_lut, codes[-1] + 1)
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.array(*codes).alias("codes"),
        norm2.alias("recon_norm2"),
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
    qrows = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).collect()
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
