"""LLM-scale data-pipeline queries: dedup, similarity search, text
analysis over the documents/embeddings tables (SURVEY.md §2 #25-35).

Oracle strategy: every hash is md5 (identical hex output in Spark and
DuckDB), every float either passes through bit-identical JVM/DuckDB
arithmetic (verified: dot products agree exactly) or is an integer
ratio — so all queries here are hash-exact against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.catalog import load_table
from data_lakehouse_platform_spark.operators import dedup as D
from data_lakehouse_platform_spark.operators.components import connected_components
from data_lakehouse_platform_spark.operators import similarity as S
from data_lakehouse_platform_spark.operators import text as T
from data_lakehouse_platform_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------------------
# Dedup family
# ----------------------------------------------------------------------------

_EXACT_ORACLE = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents
GROUP BY md5(text)
"""


@register(
    "dedup_exact",
    _EXACT_ORACLE,
    "Exact dedup via content-hash groupBy: map-side md5 so the shuffle "
    "carries 16-byte keys, not bodies. keep = min id per group.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup_groups(_t(spark, sf_dir, "documents"), "doc_id", "text")


_JACCARD_THRESHOLD = 0.2
_JACCARD_MAX_DF = 100

_JACCARD_ORACLE = f"""
WITH {T.sql_shingles_cte(3)},
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
dfreq AS (SELECT shingle, COUNT(*) AS df FROM shingles GROUP BY shingle),
filtered AS (
  SELECT s.doc_id, s.shingle FROM shingles s
  JOIN dfreq USING (shingle) WHERE df <= {_JACCARD_MAX_DF}
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM filtered a JOIN filtered b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= {_JACCARD_THRESHOLD}
"""


@register(
    "dedup_ngram_jaccard",
    _JACCARD_ORACLE,
    "Near-dup pairs by exact word-3-shingle Jaccard >= 0.2. Candidates "
    "from a shingle equi-join with a document-frequency cap (<=100) on "
    "the join key so hot shingles can't make O(n²) buckets; Jaccard uses "
    "full shingle sets. No cross join anywhere.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = T.explode_shingles(_t(spark, sf_dir, "documents"), "doc_id", "text", k=3)
    return D.jaccard_pairs(
        sh, threshold=_JACCARD_THRESHOLD, max_df=_JACCARD_MAX_DF
    )


_N_HASHES = 16
_BANDS = 4

# Hot-bucket safety valve, ON in the production path (and mirrored in
# every oracle below, so results stay exact): an LSH bucket holding B
# docs emits B^2/2 candidate pairs from one reducer — 10k identical
# boilerplate docs would mean 5*10^7 pairs. Buckets over the cap are
# near-identical crowds that exact dedup (dedup_exact) collapses more
# cheaply first; SURVEY §4 documents the dedup_exact-before-LSH
# contract. At driver-checked scales no bucket approaches the cap, so
# capped and uncapped semantics coincide there.
_LSH_MAX_BUCKET = 1000


def _minhash_ctes(cap: int = _LSH_MAX_BUCKET) -> str:
    """Shared CTE chain `shingles -> sigs -> banded` (DuckDB side of
    the MinHash+LSH pipeline), composed by the pair and cluster
    oracles.  ``cap`` mirrors ``lsh_candidate_pairs``'s ``max_bucket``
    hot-bucket gate as ``HAVING COUNT(*) <= cap`` on the band key."""
    mins = ",\n    ".join(
        f"MIN(substr(md5('{k // 4}|' || shingle), {1 + 8 * (k % 4)}, 8)) AS h{k}"
        for k in range(_N_HASHES)
    )
    rows_per_band = _N_HASHES // _BANDS
    band_selects = []
    for b in range(_BANDS):
        cols = " || ',' || ".join(
            f"h{b * rows_per_band + r}" for r in range(rows_per_band)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band, md5({cols}) AS bkey FROM sigs"
        )
    bands_sql = "\n  UNION ALL\n  ".join(band_selects)
    return f"""{T.sql_shingles_cte(3)},
sigs AS (
  SELECT doc_id,
    {mins}
  FROM shingles GROUP BY doc_id
),
banded_all AS (
  {bands_sql}
),
banded AS (
  SELECT b.doc_id, b.band, b.bkey FROM banded_all b
  JOIN (SELECT band, bkey FROM banded_all
        GROUP BY band, bkey HAVING COUNT(*) <= {cap}) ok
  ON b.band = ok.band AND b.bkey = ok.bkey
)"""


def _minhash_oracle() -> str:
    return f"""
WITH {_minhash_ctes()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared_bands
FROM banded a
JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


@register(
    "dedup_minhash_lsh",
    _minhash_oracle(),
    "MinHash (16 md5-derived permutations) + LSH banding (4 bands x 4 "
    "rows): docs sharing any band key become candidate pairs. Signatures "
    "are fixed-width, so the candidate join shuffles 16-byte band keys — "
    "corpus size only enters linearly. Tune bands/rows for the "
    "recall/precision point; verify candidates with dedup_ngram_jaccard.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distinct=False: MIN per hash is duplicate-insensitive, so the
    # distinct's full shuffle of exploded shingles is pure waste here.
    sh = T.explode_shingles(
        _t(spark, sf_dir, "documents"), "doc_id", "text", k=3, distinct=False
    )
    sigs = D.minhash_signatures(sh, n_hashes=_N_HASHES)
    return D.lsh_candidate_pairs(sigs, n_hashes=_N_HASHES, bands=_BANDS, max_bucket=_LSH_MAX_BUCKET)


def _minhash_est_oracle() -> str:
    agree = " + ".join(
        f"(CASE WHEN sa.h{k} = sb.h{k} THEN 1 ELSE 0 END)" for k in range(_N_HASHES)
    )
    return f"""
WITH {_minhash_ctes()},
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared_bands
  FROM banded a
  JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(n_shared_bands AS BIGINT) AS n_shared_bands,
       CAST({agree} AS BIGINT) AS n_agree,
       CAST({agree} AS DOUBLE) / {_N_HASHES} AS jaccard_est
FROM cand
JOIN sigs sa ON doc_a = sa.doc_id
JOIN sigs sb ON doc_b = sb.doc_id
"""


@register(
    "minhash_jaccard_est",
    _minhash_est_oracle(),
    "Jaccard ESTIMATION from MinHash signatures: for each LSH "
    "candidate pair, the fraction of the 16 permutation minima that "
    "agree is an unbiased Jaccard estimator — no shingle-set "
    "intersection ever computed, so the verify stage costs "
    "O(pairs x 16) instead of O(pairs x doc length). The md5-derived "
    "permutations make the estimate itself deterministic and "
    "oracle-checkable. Rank/threshold on the estimate, then reserve "
    "exact verification (dedup_verify_editdist) for the survivors.",
)
def minhash_jaccard_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = T.explode_shingles(
        _t(spark, sf_dir, "documents"), "doc_id", "text", k=3, distinct=False
    )
    from pyspark import StorageLevel

    # Three consumers (the banded index inside lsh_candidate_pairs and
    # both sides of the signature re-join) — materialize the signature
    # table once instead of re-hashing the corpus per consumer.
    sigs = D.minhash_signatures(sh, n_hashes=_N_HASHES).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cand = D.lsh_candidate_pairs(sigs, n_hashes=_N_HASHES, bands=_BANDS, max_bucket=_LSH_MAX_BUCKET)
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{k}").alias(f"__a{k}") for k in range(_N_HASHES)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{k}").alias(f"__b{k}") for k in range(_N_HASHES)],
    )
    n_agree = None
    for k in range(_N_HASHES):
        term = F.when(F.col(f"__a{k}") == F.col(f"__b{k}"), 1).otherwise(0)
        n_agree = term if n_agree is None else n_agree + term
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("n_shared_bands").cast("bigint").alias("n_shared_bands"),
            n_agree.cast("bigint").alias("n_agree"),
            (n_agree.cast("double") / _N_HASHES).alias("jaccard_est"),
        )
    )


def _cluster_oracle() -> str:
    """Transitive closure of the LSH candidate pairs via recursive CTE:
    each node's cluster id is the min node id reachable through
    near-dup edges (exactly what min-label propagation converges to)."""
    return f"""
WITH RECURSIVE {_minhash_ctes()},
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT doc_a AS node, doc_b AS nbr FROM pairs
  UNION
  SELECT doc_b AS node, doc_a AS nbr FROM pairs
),
reach(node, label) AS (
  SELECT node, node FROM (SELECT DISTINCT node FROM edges) v
  UNION
  SELECT e.nbr, r.label FROM reach r JOIN edges e ON e.node = r.node
),
assign AS (
  SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY node
)
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       CAST(doc_id = cluster_id AS INT) AS is_keeper
FROM assign
"""


@register(
    "dedup_cluster",
    _cluster_oracle(),
    "Fuzzy-dedup endgame: MinHash+LSH candidate pairs -> connected "
    "components (iterative min-label propagation, operators/components.py) "
    "-> one keeper per cluster (min doc_id). Pairs alone over-remove "
    "(A~B, B~C should keep ONE of {A,B,C}, not zero or two) — clustering "
    "is what production LLM dedup pipelines actually ship. Edge list is "
    "tiny vs the corpus; rounds = graph diameter (1-3 for near-dup "
    "clumps).",
)
def dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = T.explode_shingles(
        _t(spark, sf_dir, "documents"), "doc_id", "text", k=3, distinct=False
    )
    sigs = D.minhash_signatures(sh, n_hashes=_N_HASHES)
    pairs = D.lsh_candidate_pairs(sigs, n_hashes=_N_HASHES, bands=_BANDS, max_bucket=_LSH_MAX_BUCKET)
    comp = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    w = Window.partitionBy("cluster_id")
    return (
        comp.select(F.col("node").alias("doc_id"), F.col("component").alias("cluster_id"))
        .withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .withColumn("is_keeper", (F.col("doc_id") == F.col("cluster_id")).cast("int"))
    )


def _simhash_oracle(bits: int = 16) -> str:
    odd = "('1','3','5','7','9','b','d','f')"
    sums = ",\n    ".join(
        f"SUM(CASE WHEN substr(md5(shingle), {i + 1}, 1) IN {odd} THEN 1 ELSE -1 END) AS s{i}"
        for i in range(bits)
    )
    fp = " + ".join(f"CASE WHEN s{i} > 0 THEN {2**i} ELSE 0 END" for i in range(bits))
    return f"""
WITH {T.sql_shingles_cte(3)},
per_doc AS (
  SELECT doc_id,
    {sums}
  FROM shingles GROUP BY doc_id
),
fp AS (SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM per_doc)
SELECT doc_id, simhash, COUNT(*) OVER (PARTITION BY simhash) AS bucket_size
FROM fp
"""


@register(
    "dedup_simhash",
    _simhash_oracle(),
    "16-bit SimHash fingerprint per doc (md5 hex-digit parity bits, unit "
    "weights over distinct shingles); near-dup groups are hamming-0 "
    "buckets. One aggregation pass — the cheapest near-dup signal.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = T.explode_shingles(_t(spark, sf_dir, "documents"), "doc_id", "text", k=3)
    return D.simhash(sh, bits=16)


# ----------------------------------------------------------------------------
# Embedding similarity
# ----------------------------------------------------------------------------

_NEARDUP_THRESHOLD = 0.4

_NEARDUP_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings)
SELECT
  a.vec_id AS vec_a,
  b.vec_id AS vec_b,
  list_dot_product(a.v, b.v)
    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine,
  a.label AS label_a,
  b.label AS label_b
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v)
    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
    >= {_NEARDUP_THRESHOLD}
"""


@register(
    "embed_neardup_cosine",
    _NEARDUP_ORACLE,
    "Embedding near-dup pairs: cosine >= 0.4 over array<float> columns "
    "via JVM zip_with/aggregate (bit-identical to the oracle's "
    "list_dot_product — no tolerance needed). Brute-force audit path; "
    "the LSH-bucketed ann path is the scale route.",
)
def embed_neardup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return S.cosine_pairs(emb, threshold=_NEARDUP_THRESHOLD, extra_cols=["label"])


_ANN_K = 10

_ANN_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id AS cand_id,
    list_dot_product(qv, v)
      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
  FROM e JOIN q ON e.vec_id != q.query_id
)
SELECT query_id, cand_id, cosine, rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, cand_id
  ) AS rank
  FROM scored
) t
WHERE rank <= {_ANN_K}
"""


@register(
    "ann_cosine_topk",
    _ANN_ORACLE,
    "Brute-force cosine top-k (k=10) for a broadcast query set "
    "(vec_id < 5): one corpus pass + per-query top-k window. The exact "
    "baseline that LSH/IVF variants are measured against.",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return S.ann_topk_bruteforce(emb, queries, k=_ANN_K).select(
        "query_id", "cand_id", "cosine", "rank"
    )


# LSH-bucketed ANN: deterministic hyperplane bits from fixed pivot pairs
# (vec_id 100..115 -> 8 bits); candidates restricted to same-bucket rows.
_LSH_PIVOT_BASE = 100
_LSH_BITS = 8

_LSH_BIT_SQL = ",\n    ".join(
    "CASE WHEN list_dot_product(e.v, (SELECT v FROM piv WHERE vec_id = {a}))"
    " >= list_dot_product(e.v, (SELECT v FROM piv WHERE vec_id = {b}))"
    " THEN '1' ELSE '0' END".format(a=_LSH_PIVOT_BASE + 2 * j, b=_LSH_PIVOT_BASE + 2 * j + 1)
    for j in range(_LSH_BITS)
)

_ANN_LSH_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
piv AS (
  SELECT vec_id, v FROM e
  WHERE vec_id BETWEEN {_LSH_PIVOT_BASE} AND {_LSH_PIVOT_BASE + 2 * _LSH_BITS - 1}
),
b AS (
  SELECT e.vec_id, e.v, concat(
    {_LSH_BIT_SQL}
  ) AS bucket
  FROM e
),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, b.vec_id AS cand_id, b.bucket,
    list_dot_product(qv, b.v)
      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
  FROM b JOIN q ON b.bucket = q.bucket AND b.vec_id != q.query_id
)
SELECT query_id, cand_id, bucket, cosine, rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, cand_id
  ) AS rank
  FROM scored
) t
WHERE rank <= {_ANN_K}
"""


@register(
    "ann_lsh_topk",
    _ANN_LSH_ORACLE,
    "LSH-bucketed approximate top-k: 8 deterministic hyperplane bits "
    "(dot(v, A_j) >= dot(v, B_j) over fixed pivot pairs) computed as a "
    "literal-array map pass, candidates restricted to the query's "
    "bucket — expected candidate set n/2^bits instead of n. The scale "
    "route for ann_cosine_topk (SURVEY §2 #31).",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    # Bounded metadata fetch (16 rows) — same posture as the watermark
    # 1-row agg: pivots become literal arrays in the bucket expression.
    piv_rows = (
        emb.filter(
            F.col("vec_id").between(_LSH_PIVOT_BASE, _LSH_PIVOT_BASE + 2 * _LSH_BITS - 1)
        )
        .select("vec_id", "embedding")
        .collect()
    )
    pivs = {int(r.vec_id): [float(x) for x in r.embedding] for r in piv_rows}
    pairs = [
        (pivs[_LSH_PIVOT_BASE + 2 * j], pivs[_LSH_PIVOT_BASE + 2 * j + 1])
        for j in range(_LSH_BITS)
    ]
    queries = emb.filter(F.col("vec_id") < 5)
    return S.ann_topk_lsh(emb, queries, pairs, k=_ANN_K).select(
        "query_id", "cand_id", "bucket", "cosine", "rank"
    )


# ----------------------------------------------------------------------------
# Text analysis
# ----------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": r"\b(the|a|of|and|to)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "es": r"\b(el|los|las|y|es)\b",
}

_LANGID_ORACLE = f"""
WITH scored AS (
  SELECT doc_id,
    len(regexp_extract_all({T.sql_normalize_ws('text')}, '{_LANG_MARKERS["en"]}')) AS score_en,
    len(regexp_extract_all({T.sql_normalize_ws('text')}, '{_LANG_MARKERS["de"]}')) AS score_de,
    len(regexp_extract_all({T.sql_normalize_ws('text')}, '{_LANG_MARKERS["fr"]}')) AS score_fr,
    len(regexp_extract_all({T.sql_normalize_ws('text')}, '{_LANG_MARKERS["es"]}')) AS score_es
  FROM documents
)
SELECT doc_id, score_en, score_de, score_fr, score_es,
  CASE
    WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es AND score_en > 0 THEN 'en'
    WHEN score_de >= score_fr AND score_de >= score_es AND score_de > 0 THEN 'de'
    WHEN score_fr >= score_es AND score_fr > 0 THEN 'fr'
    WHEN score_es > 0 THEN 'es'
    ELSE 'und'
  END AS predicted_lang
FROM scored
"""


@register(
    "text_langid",
    _LANGID_ORACLE,
    "Heuristic language ID: stopword-marker hit counts per language, "
    "deterministic priority argmax. Pure regexp_count — codegen'd, no "
    "UDF; at scale this is a single map pass.",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    norm = T.normalize_ws("text")
    scored = docs.select(
        "doc_id",
        *[
            F.regexp_count(norm, F.lit(pat)).alias(f"score_{lang}")
            for lang, pat in _LANG_MARKERS.items()
        ],
    )
    en, de, fr, es = (F.col(f"score_{x}") for x in ("en", "de", "fr", "es"))
    predicted = (
        F.when((en >= de) & (en >= fr) & (en >= es) & (en > 0), "en")
        .when((de >= fr) & (de >= es) & (de > 0), "de")
        .when((fr >= es) & (fr > 0), "fr")
        .when(es > 0, "es")
        .otherwise("und")
    )
    return scored.select(
        "doc_id", "score_en", "score_de", "score_fr", "score_es",
        predicted.alias("predicted_lang"),
    )


_STOPWORDS = r"\b(the|a|of|and|to)\b"
_PUNCT = "[^A-Za-z0-9 ]"

_QUALITY_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
    {T.sql_normalize_ws('text')} AS norm,
    len(string_split({T.sql_normalize_ws('text')}, ' ')) AS n_tokens
  FROM documents
),
m AS (
  SELECT doc_id, n_tokens,
    length(norm) AS n_chars,
    len(regexp_extract_all(norm, '{_PUNCT}')) AS n_punct,
    len(regexp_extract_all(norm, '{_STOPWORDS}')) AS n_stop
  FROM base
)
SELECT doc_id, n_chars, n_tokens, n_punct, n_stop,
  CAST(n_punct AS DOUBLE) / n_chars  AS punct_ratio,
  CAST(n_stop AS DOUBLE) / n_tokens  AS stopword_ratio,
  CAST(FLOOR((0.5 * (CAST(n_stop AS DOUBLE) / n_tokens)
      + 0.3 * (1 - CAST(n_punct AS DOUBLE) / n_chars)
      + 0.2 * (LEAST(n_tokens, 200) / 200.0)) * 1000000) AS DOUBLE) / 1000000 AS quality_score
FROM m
"""


@register(
    "text_quality",
    _QUALITY_ORACLE,
    "Quality scoring: length, punctuation ratio, stopword ratio, "
    "capped-length bonus, combined into a 6-dp deterministic score. "
    "Single map pass, no shuffle.",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    norm = T.normalize_ws("text")
    base = docs.select(
        "doc_id",
        F.length(norm).alias("n_chars"),
        F.size(T.ws_tokens("text")).alias("n_tokens"),
        F.regexp_count(norm, F.lit(_PUNCT)).alias("n_punct"),
        F.regexp_count(norm, F.lit(_STOPWORDS)).alias("n_stop"),
    )
    punct_ratio = base.n_punct.cast("double") / base.n_chars
    stop_ratio = base.n_stop.cast("double") / base.n_tokens
    score = (
        F.lit(0.5) * stop_ratio
        + F.lit(0.3) * (F.lit(1) - punct_ratio)
        + F.lit(0.2) * (F.least(base.n_tokens, F.lit(200)) / F.lit(200.0))
    )
    return base.select(
        "doc_id", "n_chars", "n_tokens", "n_punct", "n_stop",
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        (F.floor(score * 1000000).cast("double") / 1000000).alias("quality_score"),
    )


_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_TOKENS_ORACLE = f"""
SELECT doc_id,
  len(string_split({T.sql_normalize_ws('text')}, ' ')) AS ws_tokens,
  len(regexp_extract_all({T.sql_normalize_ws('text')}, '{_BPE_ISH}')) AS bpe_ish_tokens,
  length({T.sql_normalize_ws('text')}) AS n_chars
FROM documents
"""


@register(
    "text_tokens",
    _TOKENS_ORACLE,
    "Token counting: whitespace tokens + BPE-ish regex tokens "
    "(letter-runs | digit-runs | single punctuation) + chars. The cheap "
    "pre-tokenization size estimate for corpus budgeting.",
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    norm = T.normalize_ws("text")
    return docs.select(
        "doc_id",
        F.size(T.ws_tokens("text")).alias("ws_tokens"),
        F.regexp_count(norm, F.lit(_BPE_ISH)).alias("bpe_ish_tokens"),
        F.length(norm).alias("n_chars"),
    )


_FINGERPRINT_ORACLE = f"""
SELECT doc_id,
  md5(lower({T.sql_normalize_ws('text')})) AS fingerprint,
  substr(md5(lower({T.sql_normalize_ws('text')})), 1, 8) AS fp_prefix,
  length({T.sql_normalize_ws('text')}) AS n_chars
FROM documents
"""


@register(
    "text_fingerprint",
    _FINGERPRINT_ORACLE,
    "Document fingerprint: md5 of the case/whitespace-normalized text "
    "(+ 8-hex prefix for cheap sharding/bucketing). The key used by "
    "dedup_exact, exposed as a first-class column.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    norm = T.normalize_ws("text")
    fp = F.md5(F.lower(norm).cast("binary"))
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.substring(fp, 1, 8).alias("fp_prefix"),
        F.length(norm).alias("n_chars"),
    )


# ----------------------------------------------------------------------------
# Corpus curation extras: sampling, scrubbing, frequency stats
# ----------------------------------------------------------------------------

# Deterministic hash sampling: the first two hex digits of
# md5(doc_id) are uniform over 256 values, so a string-compare
# threshold gives an exact, engine-identical sampling decision with
# no RNG state. Production twin: xxhash64(key) % N on the JVM.
_SAMPLE_ORACLE = """
WITH keyed AS (
  SELECT doc_id, lang, source,
    substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS hk
  FROM documents
)
SELECT doc_id, lang, source, hk
FROM keyed
WHERE (lang = 'en' AND hk < '40') OR (lang != 'en' AND hk < 'c0')
"""


@register(
    "sample_stratified",
    _SAMPLE_ORACLE,
    "Deterministic stratified sampling for corpus mix balancing: "
    "downsample the dominant language (en -> 25%) while keeping 75% of "
    "the rest, keyed on md5(doc_id) hex prefix so the decision is "
    "reproducible row-local map work — no RNG, no shuffle, restart-safe. "
    "The standard pretraining-mix rebalancing primitive.",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    hk = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
    keyed = docs.select("doc_id", "lang", "source", hk.alias("hk"))
    return keyed.filter(
        ((F.col("lang") == "en") & (F.col("hk") < "40"))
        | ((F.col("lang") != "en") & (F.col("hk") < "c0"))
    )


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_LONGNUM = r"\b\d{9,}\b"

_PII_ORACLE = f"""
SELECT doc_id,
  len(regexp_extract_all(text, '{_PII_EMAIL}'))
    + len(regexp_extract_all(text, '{_PII_LONGNUM}')) AS n_redactions,
  regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                 '{_PII_LONGNUM}', '<NUM>', 'g') AS text_scrubbed
FROM documents
"""


@register(
    "pii_scrub",
    _PII_ORACLE,
    "PII scrubbing pass: redact email addresses and long digit runs "
    "(IDs/phones/cards) with typed placeholder tokens, and count the "
    "redactions per document for audit metrics. Pure regexp map pass — "
    "codegen'd, zero shuffle, linear at any corpus size.",
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    n_red = F.regexp_count("text", F.lit(_PII_EMAIL)) + F.regexp_count(
        "text", F.lit(_PII_LONGNUM)
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", _PII_EMAIL, "<EMAIL>"), _PII_LONGNUM, "<NUM>"
    )
    return docs.select(
        "doc_id", n_red.alias("n_redactions"), scrubbed.alias("text_scrubbed")
    )


_NGRAM_TOPK = 20

# Term-frequency bigrams (NOT distinct-per-doc — this is the corpus
# frequency table, the other consumer of the shingle machinery).
_NGRAM_ORACLE = f"""
WITH norm_docs AS (
  SELECT doc_id, string_split({T.sql_normalize_ws('text')}, ' ') AS toks
  FROM documents
),
grams AS (
  SELECT doc_id, unnest(
    CASE WHEN len(toks) >= 2
         THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])
         ELSE [] END) AS ngram
  FROM norm_docs
)
SELECT ngram, term_freq, doc_freq FROM (
  SELECT ngram,
    COUNT(*) AS term_freq,
    COUNT(DISTINCT doc_id) AS doc_freq,
    ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, ngram) AS rn
  FROM grams GROUP BY ngram
) t
WHERE rn <= {_NGRAM_TOPK}
"""


@register(
    "ngram_topk",
    _NGRAM_ORACLE,
    "Corpus bigram frequency table (top-20 by term frequency, with "
    "document frequency): the n-gram statistics pass used for stop-list "
    "construction and contamination checks. Shuffle is keyed on the "
    "ngram string with map-side partial aggregation, so width is bounded "
    "by vocabulary, not corpus size.",
)
def ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    grams = (
        docs.select("doc_id", T.ws_tokens("text").alias("__toks"))
        .select("doc_id", F.explode(T.shingle_expr("__toks", 2)).alias("ngram"))
    )
    # Top-K via sort+limit (TakeOrderedAndProject): each task keeps a
    # local K-heap and the driver merges — parallel partial top-K with
    # the same deterministic tiebreak, vs. row_number over an
    # unpartitioned window which funnels the whole vocabulary (hundreds
    # of millions of bigrams at 100 TB) through one reducer.
    ranked = (
        grams.groupBy("ngram")
        .agg(
            F.count(F.lit(1)).alias("term_freq"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.col("term_freq").desc(), F.col("ngram"))
        .limit(_NGRAM_TOPK)
        .select("ngram", "term_freq", "doc_freq")
    )
    return ranked


_LEN_BUCKET = 50

_LENHIST_ORACLE = f"""
SELECT
  CAST(FLOOR(len(string_split({T.sql_normalize_ws('text')}, ' ')) / {_LEN_BUCKET})
    AS BIGINT) * {_LEN_BUCKET} AS token_bucket,
  COUNT(*) AS n_docs,
  CAST(SUM(len(string_split({T.sql_normalize_ws('text')}, ' '))) AS BIGINT) AS total_tokens
FROM documents
GROUP BY 1
"""


@register(
    "length_histogram",
    _LENHIST_ORACLE,
    f"Token-length histogram ({_LEN_BUCKET}-token buckets) with per-bucket "
    "token totals — the length-distribution audit every pretraining mix "
    "needs before choosing packing/truncation lengths. One map pass plus "
    "a tiny grouped agg (bucket count is bounded).",
)
def length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    n_tokens = F.size(T.ws_tokens("text"))
    bucket = (F.floor(n_tokens / _LEN_BUCKET).cast("bigint") * _LEN_BUCKET).alias(
        "token_bucket"
    )
    return (
        docs.select(bucket, n_tokens.alias("__nt"))
        .groupBy("token_bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("__nt").alias("total_tokens"))
    )


_EDIT_RATIO_MAX = 0.4


def _levenshtein_oracle() -> str:
    return f"""
WITH {_minhash_ctes()},
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b,
  levenshtein(da.text, db.text) AS edit_distance,
  CAST(levenshtein(da.text, db.text) AS DOUBLE)
    / GREATEST(length(da.text), length(db.text)) AS edit_ratio,
  CAST(CAST(levenshtein(da.text, db.text) AS DOUBLE)
    / GREATEST(length(da.text), length(db.text)) <= {_EDIT_RATIO_MAX} AS INT)
    AS is_verified_dup
FROM pairs p
JOIN documents da ON p.doc_a = da.doc_id
JOIN documents db ON p.doc_b = db.doc_id
"""


@register(
    "dedup_verify_editdist",
    _levenshtein_oracle(),
    "The verify stage of the two-phase dedup pipeline: LSH candidate "
    "pairs (cheap, approximate) re-checked with exact Levenshtein edit "
    "distance, flagged dup when distance/max-length <= "
    f"{_EDIT_RATIO_MAX}. Candidate generation bounds the O(len^2) "
    "edit-distance work to near-dup pairs only — the standard "
    "generate-then-verify recipe; the integer metric keeps both "
    "engines bit-agreed. Text bodies join onto the narrow pair list "
    "(pairs << corpus), never the reverse.",
)
def dedup_verify_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    sh = T.explode_shingles(docs, "doc_id", "text", k=3, distinct=False)
    sigs = D.minhash_signatures(sh, n_hashes=_N_HASHES)
    pairs = D.lsh_candidate_pairs(sigs, n_hashes=_N_HASHES, bands=_BANDS, max_bucket=_LSH_MAX_BUCKET).select(
        "doc_a", "doc_b"
    )
    da = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("__ta"))
    db = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("__tb"))
    dist = F.levenshtein("__ta", "__tb")
    ratio = dist.cast("double") / F.greatest(F.length("__ta"), F.length("__tb"))
    return (
        pairs.join(da, "doc_a")
        .join(db, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            dist.alias("edit_distance"),
            ratio.alias("edit_ratio"),
            (ratio <= _EDIT_RATIO_MAX).cast("int").alias("is_verified_dup"),
        )
    )


_PR_SCALE = 1_000_000_000_000
_PR_DAMP = 85
_PR_BASE = _PR_SCALE * (100 - _PR_DAMP) // 100


def _pagerank_oracle(rounds: int = 2) -> str:
    ctes = [
        _minhash_ctes().lstrip(),
        """pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)""",
        """sym AS (
  SELECT doc_a AS node, doc_b AS nbr FROM pairs
  UNION
  SELECT doc_b AS node, doc_a AS nbr FROM pairs
)""",
        "deg AS (SELECT node, COUNT(*) AS deg FROM sym GROUP BY node)",
        f"r0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS r FROM deg)",
    ]
    for i in range(1, rounds + 1):
        ctes += [
            f"""c{i} AS (
  SELECT s.nbr AS node, r.r // d.deg AS c
  FROM r{i - 1} r JOIN deg d ON r.node = d.node JOIN sym s ON r.node = s.node
)""",
            f"""r{i} AS (
  SELECT node, CAST({_PR_BASE} + (SUM(c) * {_PR_DAMP}) // 100 AS BIGINT) AS r
  FROM c{i} GROUP BY node
)""",
        ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT node AS doc_id, r AS rank_scaled,
       CAST(r AS DOUBLE) / {_PR_SCALE} AS rank
FROM r{rounds}
"""
    )


@register(
    "graph_pagerank",
    _pagerank_oracle(2),
    "PageRank (2 rounds, damping 0.85) over the near-dup similarity "
    "graph in EXACT int64 fixed point (rank units of 1e-12, integer "
    "division everywhere) — the canonical-document signal: the highest "
    "rank in a dup cluster is its best exemplar. Iterative float "
    "algorithms become oracle-checkable under this discipline (same as "
    "the k-means trainer); each round is one edge-list join + grouped "
    "sum keyed on node id, the textbook scalable PageRank shape.",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.operators.components import pagerank_fixed

    sh = T.explode_shingles(
        _t(spark, sf_dir, "documents"), "doc_id", "text", k=3, distinct=False
    )
    sigs = D.minhash_signatures(sh, n_hashes=_N_HASHES)
    pairs = D.lsh_candidate_pairs(sigs, n_hashes=_N_HASHES, bands=_BANDS, max_bucket=_LSH_MAX_BUCKET)
    pr = pagerank_fixed(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
        rounds=2,
        damping_pct=_PR_DAMP,
    )
    return pr.select(F.col("node").alias("doc_id"), "rank_scaled", "rank")
