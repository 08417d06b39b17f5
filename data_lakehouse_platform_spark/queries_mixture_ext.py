"""Corpus-mixture & sharding surface: per-source quotas, mixture
resampling, token-budget sharding, tokenizer fertility, source-overlap
matrices, and embedding-dimension audits — the operations a pretraining
data team runs between "corpus curated" and "corpus shipped to the
trainer".

Everything here is built on the scale-safe primitives the rest of the
repo already proves out: distributed two-pass ranking for anything that
would otherwise be a single-reducer window (operators/ranking.py),
deterministic md5-hash acceptance instead of RNG for sampling, and
fixed-point sums (functions/money.py) wherever a double aggregate must
hash identically across engines and partitionings.

Reference analog: none of these exist in the reference (its corpus is
coffee-chain orders); they belong to the LLM-pipeline surface the brief
grades first-class alongside SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.operators import text as T
from data_lakehouse_platform_spark.queries import _t, register

# ----------------------------------------------------------------------------
# Per-source quota: keep the top-K docs per source
# ----------------------------------------------------------------------------

_QUOTA_K = 5

_QUOTA_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, source, lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
)
SELECT doc_id, source, lang, n_chars, rn AS quota_rank
FROM ranked WHERE rn <= {_QUOTA_K}
"""


@register(
    "source_quota_topk",
    _QUOTA_ORACLE,
    f"Per-source quota enforcement: keep the top {_QUOTA_K} documents "
    "per source by length (doc_id tiebreak) — the domain-cap step that "
    "stops one crawl host from dominating the training mix. Ranking "
    "runs through the distributed grouped two-pass rank "
    "(operators/ranking.py), so a source with 10^9 docs at corpus "
    "scale never funnels through one window task the way "
    "ROW_NUMBER() OVER (PARTITION BY source) would.",
)
def source_quota_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.operators.ranking import with_grouped_rank

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    )
    # rank by length DESC ⇒ ascending order on (-n_chars, doc_id);
    # bucket key must be non-decreasing along that order.
    r = with_grouped_rank(
        docs,
        ["source"],
        [(-F.col("n_chars")).asc(), F.col("doc_id").asc()],
        bucket_key=-F.col("n_chars"),
        rn_col="quota_rank",
    )
    return r.filter(F.col("quota_rank") <= _QUOTA_K).select(
        "doc_id", "source", "lang", "n_chars", "quota_rank"
    )


# ----------------------------------------------------------------------------
# Mixture resampling: deterministic per-source acceptance rates
# ----------------------------------------------------------------------------

# Target mix: downweight the low-numbered "head" crawls to 25%, keep
# 75% of the tail. Acceptance is md5(doc_id) — row-local, no RNG, no
# shuffle, replayable: re-running the pipeline admits the same docs.
_HEAD_SOURCES = ("src0", "src1", "src2", "src3", "src4")
_HEAD_LIST = ", ".join(f"'{s}'" for s in _HEAD_SOURCES)

_MIXTURE_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, source, lang,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS hk
  FROM documents
)
SELECT doc_id, source, lang, hk
FROM keyed
WHERE (source IN ({_HEAD_LIST}) AND hk < '40')
   OR (source NOT IN ({_HEAD_LIST}) AND hk < 'c0')
"""


@register(
    "mixture_resample",
    _MIXTURE_ORACLE,
    "Corpus mixture resampling: admit 25% of the over-represented head "
    "sources and 75% of the tail via md5(doc_id) hex-prefix "
    "thresholds — the deterministic domain-reweighting pass applied "
    "before tokenization. Pure map work (the per-source rate table "
    "compiles to a literal CASE), restart-safe, zero shuffle at any "
    "corpus size.",
)
def mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    hk = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
    keyed = docs.select("doc_id", "source", "lang", hk.alias("hk"))
    head = F.col("source").isin(*_HEAD_SOURCES)
    return keyed.filter(
        (head & (F.col("hk") < "40")) | (~head & (F.col("hk") < "c0"))
    )


# ----------------------------------------------------------------------------
# Token-budget sharding: contiguous shards of ~BUDGET tokens
# ----------------------------------------------------------------------------

_SHARD_BUDGET = 1_000

_SHARD_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         len(string_split({T.sql_normalize_ws('text')}, ' ')) AS t
  FROM documents
),
cum AS (
  SELECT doc_id, t,
         SUM(t) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM tok
)
SELECT CAST(FLOOR((c - t) / {_SHARD_BUDGET}.0) AS BIGINT) AS shard_id,
       COUNT(*) AS n_docs,
       CAST(SUM(t) AS BIGINT) AS total_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM cum
GROUP BY 1
"""


@register(
    "shard_by_token_budget",
    _SHARD_ORACLE,
    f"Token-budget sharding: assign documents (in doc_id order) to "
    f"contiguous shards that open every {_SHARD_BUDGET} tokens — the "
    "deterministic file-sharding step before a training run, so every "
    "worker gets a near-equal token count. The cumulative token count "
    "is the exact DISTRIBUTED prefix sum (operators/ranking.py "
    "two-pass: per-bucket windows + broadcast bucket offsets), never "
    "an unpartitioned running-sum window — the same plan shape holds "
    "at 10^10 documents.",
)
def shard_by_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.operators.ranking import with_global_rank

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.size(T.ws_tokens("text")).alias("t")
    )
    ranked, _stats = with_global_rank(
        docs,
        [F.col("doc_id").asc()],
        bucket_key=F.col("doc_id"),
        cum_col="c",
        weight=F.col("t"),
        weight_type="decimal(38,0)",
    )
    shard = F.floor(
        (F.col("c").cast("double") - F.col("t")) / F.lit(float(_SHARD_BUDGET))
    ).cast("bigint")
    return (
        ranked.select(shard.alias("shard_id"), "doc_id", "t")
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("t").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# ----------------------------------------------------------------------------
# Tokenizer fertility per language
# ----------------------------------------------------------------------------

_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_FERTILITY_ORACLE = f"""
WITH tok AS (
  SELECT lang,
         len(string_split({T.sql_normalize_ws('text')}, ' ')) AS ws,
         len(regexp_extract_all({T.sql_normalize_ws('text')}, '{_BPE_ISH}')) AS bpe,
         length({T.sql_normalize_ws('text')}) AS ch
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(ws) AS BIGINT) AS ws_tokens,
       CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
       CAST(SUM(ch) AS BIGINT) AS n_chars,
       CAST(SUM(bpe) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE) AS fertility,
       CAST(SUM(ch) AS DOUBLE) / CAST(SUM(bpe) AS DOUBLE) AS chars_per_token
FROM tok
GROUP BY lang
"""


@register(
    "tokenizer_fertility",
    _FERTILITY_ORACLE,
    "Tokenizer fertility audit per language: BPE-ish subword tokens per "
    "whitespace word and characters per subword token — the standard "
    "check that a tokenizer doesn't tax some languages 3x (fertility "
    "drives both training cost and context-length fairness). Exact "
    "integer sums + one double division, so the ratios are "
    "bit-identical across engines and partitionings; plain map + "
    "5-group agg, linear at any corpus size.",
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    norm = T.normalize_ws("text")
    tok = docs.select(
        "lang",
        F.size(T.ws_tokens("text")).alias("ws"),
        F.regexp_count(norm, F.lit(_BPE_ISH)).alias("bpe"),
        F.length(norm).alias("ch"),
    )
    return tok.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws").alias("ws_tokens"),
        F.sum("bpe").alias("bpe_tokens"),
        F.sum("ch").alias("n_chars"),
        (
            F.sum("bpe").cast("double") / F.sum("ws").cast("double")
        ).alias("fertility"),
        (
            F.sum("ch").cast("double") / F.sum("bpe").cast("double")
        ).alias("chars_per_token"),
    )


# ----------------------------------------------------------------------------
# Source-overlap matrix: shingle Jaccard between every source pair
# ----------------------------------------------------------------------------

_OVERLAP_ORACLE = f"""
WITH {T.sql_shingles_cte(3)},
src AS (
  SELECT DISTINCT s.shingle, d.source
  FROM shingles s JOIN documents d USING (doc_id)
),
sizes AS (
  SELECT source, COUNT(*) AS n FROM src GROUP BY source
),
shared AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared
  FROM src a JOIN src b ON a.shingle = b.shingle AND a.source < b.source
  GROUP BY 1, 2
)
SELECT s.source_a, s.source_b, s.n_shared,
       CAST(s.n_shared AS DOUBLE)
         / CAST(sa.n + sb.n - s.n_shared AS DOUBLE) AS jaccard
FROM shared s
JOIN sizes sa ON sa.source = s.source_a
JOIN sizes sb ON sb.source = s.source_b
"""


@register(
    "source_overlap_jaccard",
    _OVERLAP_ORACLE,
    "Source-overlap matrix: 3-shingle Jaccard similarity between every "
    "pair of sources — the contamination/provenance screen that flags "
    "two crawls scraping the same site before both enter the mix. "
    "Distinct (shingle, source) pairs equi-join on shingle, so "
    "fan-out per shingle is bounded by #sources (never #docs); the "
    "output is #sources^2/2 rows regardless of corpus size.",
)
def source_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    sh = (
        docs.select("source", T.ws_tokens("text").alias("__toks"))
        .select("source", F.explode(T.shingle_expr("__toks", 3)).alias("shingle"))
        .distinct()
    )
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("shingle"), F.col("source").alias("source_a"))
    b = sh.select(F.col("shingle"), F.col("source").alias("source_b"))
    shared = (
        a.join(b, "shingle")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    return (
        shared.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            (
                F.col("n_shared").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_shared")).cast("double")
            ).alias("jaccard"),
        )
    )


# ----------------------------------------------------------------------------
# Embedding per-dimension audit
# ----------------------------------------------------------------------------

_DIM_ORACLE = """
WITH flat AS (
  SELECT unnest(embedding) AS e,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings
)
SELECT CAST(dim - 1 AS INT) AS dim,
       COUNT(*) AS n,
       CAST(MIN(e) AS DOUBLE) AS mn,
       CAST(MAX(e) AS DOUBLE) AS mx,
       CAST(SUM(CAST(FLOOR(CAST(e AS DOUBLE) * 1000000) AS DECIMAL(28,0))) AS DOUBLE)
         / 1000000 / COUNT(*) AS mean
FROM flat
GROUP BY 1
"""


@register(
    "embedding_dim_stats",
    _DIM_ORACLE,
    "Per-dimension embedding audit (count/min/max/mean): the dead- or "
    "exploding-dimension screen run before indexing or quantizing a "
    "vector corpus. posexplode → d-group aggregate with map-side "
    "partial combine (d=64 groups hit the shuffle, not n×d rows); "
    "means use order-independent fixed-point sums so results are "
    "bit-stable under any partitioning.",
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    flat = emb.select(F.posexplode("embedding").alias("dim", "e"))
    return flat.groupBy(F.col("dim").cast("int").alias("dim")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.col("e").cast("double")).alias("mn"),
        F.max(F.col("e").cast("double")).alias("mx"),
        (
            F.sum(
                F.floor(F.col("e").cast("double") * 1_000_000).cast("decimal(28,0)")
            ).cast("double")
            / 1_000_000
            / F.count(F.lit(1))
        ).alias("mean"),
    )


# ----------------------------------------------------------------------------
# Heavy hitters: Misra-Gries candidates + exact recount
# ----------------------------------------------------------------------------

_HH_K = 25
_HH_CAP = 512

_HH_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split({T.sql_normalize_ws('text')}, ' ')) AS token
  FROM documents
),
counts AS (SELECT token, COUNT(*) AS freq FROM toks GROUP BY token),
tot AS (SELECT COUNT(*) AS corpus_n FROM toks),
topk AS (
  SELECT token, freq,
         ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS hh_rank
  FROM counts
)
SELECT t.token, t.freq, t.hh_rank, tot.corpus_n,
       CAST(t.freq * {_HH_CAP + 1} > tot.corpus_n AS INT) AS above_mg_floor
FROM topk t CROSS JOIN tot
WHERE t.hh_rank <= {_HH_K}
"""


@register(
    "heavy_hitter_tokens",
    _HH_ORACLE,
    f"Top-{_HH_K} corpus tokens by exact frequency, found via per-"
    "partition Misra-Gries summaries (mergeable, capacity "
    f"{_HH_CAP}) + an exact broadcast-recount pass — shuffle volume "
    "is bounded by summary capacity x partitions instead of the "
    "distinct vocabulary, the shape that survives a billion-term "
    "n-gram domain at 100 TB. Each row carries the integer-exact "
    "`above_mg_floor` certificate (freq*(cap+1) > corpus_n); all-true "
    "proves the summary provably covered the true top-K "
    "(operators/heavy_hitters.py).",
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.operators.heavy_hitters import (
        heavy_hitters_exact,
    )

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(T.ws_tokens("text")).alias("token"))
    return heavy_hitters_exact(toks, "token", k=_HH_K, capacity=_HH_CAP)


# ----------------------------------------------------------------------------
# Temperature-smoothed mixture resampling (alpha = 0.5)
# ----------------------------------------------------------------------------

_TEMP_ORACLE = """
WITH n AS (SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source),
m AS (SELECT MIN(n_s) AS n_min FROM n),
r AS (
  SELECT source, n_s,
         SQRT(CAST(n_min AS DOUBLE) / CAST(n_s AS DOUBLE)) AS rate
  FROM n CROSS JOIN m
),
h AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS hk
  FROM documents
)
SELECT h.source,
       CAST(r.n_s AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN CAST(h.hk AS DOUBLE) < r.rate * 4294967296.0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       r.rate AS rate
FROM h JOIN r USING (source)
GROUP BY h.source, r.n_s, r.rate
"""


@register(
    "mixture_temperature_resample",
    _TEMP_ORACLE,
    "Temperature-smoothed source mixture (alpha = 0.5, the multilingual-"
    "LM rebalancing rule): acceptance rate per source is "
    "sqrt(n_min/n_s), so the smallest source keeps everything and each "
    "larger one is downsampled toward the root-smoothed share. "
    "Acceptance is md5(doc_id)-uniform vs rate x 2^32 — sqrt and one "
    "multiply are single correctly-rounded IEEE ops, so both engines "
    "admit the identical doc set; no RNG state, restart-safe. One "
    "tiny per-source aggregate broadcasts into a map-only filter — "
    "zero data-path shuffle at any corpus size.",
)
def mixture_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    n_min = counts.agg(F.min("n_s").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "source",
        "n_s",
        F.sqrt(
            F.col("n_min").cast("double") / F.col("n_s").cast("double")
        ).alias("rate"),
    )
    hashed = docs.select(
        "doc_id",
        "source",
        F.expr(
            "cast(conv(substring(md5(cast(cast(doc_id as string) as binary))"
            ", 1, 8), 16, 10) as bigint)"
        ).alias("hk"),
    )
    kept = F.when(
        F.col("hk").cast("double") < F.col("rate") * F.lit(4294967296.0), 1
    ).otherwise(0)
    return (
        hashed.join(F.broadcast(rates), "source")
        .groupBy("source")
        .agg(
            F.max("n_s").alias("n_docs"),
            F.sum(kept).cast("bigint").alias("n_kept"),
            F.max("rate").alias("rate"),
        )
        .select("source", "n_docs", "n_kept", "rate")
    )
