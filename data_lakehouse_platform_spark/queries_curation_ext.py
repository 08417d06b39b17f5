"""Curation-extension queries: the pretraining-pipeline steps that sit
AFTER dedup/quality scoring — benchmark decontamination, repetition
auditing (Gopher-style), and deterministic sequence packing.

All three are oracle-exact: hashes are md5 (identical hex in Spark and
DuckDB) and every float is a ratio of integers (bit-identical IEEE
division in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.catalog import load_table
from data_lakehouse_platform_spark.operators.packing import exclusive_prefix_sum
from data_lakehouse_platform_spark.operators import text as T
from data_lakehouse_platform_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------------------
# Benchmark decontamination: flag training docs sharing any word
# k-shingle with a held-out benchmark set (here: doc_id % 50 == 0
# stands in for the eval suite).
# ----------------------------------------------------------------------------

_DECON_K = 5
_BENCH_MOD = 50

_DECON_ORACLE = f"""
WITH {T.sql_shingles_cte(_DECON_K)},
bench AS (
  SELECT DISTINCT shingle FROM shingles WHERE doc_id % {_BENCH_MOD} = 0
),
hits AS (
  SELECT s.doc_id, COUNT(*) AS n_shared
  FROM shingles s JOIN bench USING (shingle)
  WHERE s.doc_id % {_BENCH_MOD} <> 0
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared,
       CAST(COALESCE(h.n_shared, 0) > 0 AS INT) AS is_contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % {_BENCH_MOD} <> 0
"""


@register(
    "decontaminate_ngram",
    _DECON_ORACLE,
    f"Benchmark decontamination: per training doc, the count of distinct "
    f"word {_DECON_K}-shingles shared with the benchmark set, plus a "
    f"contamination flag. Benchmark shingles are DISTINCT then "
    f"broadcast — eval suites are MBs against a 100 TB corpus, so the "
    f"corpus-side scan never shuffles (bloom-filter pushdown is the "
    f"fallback if the benchmark outgrows broadcast). GPT-3/PaLM-style "
    f"n-gram overlap decontamination.",
)
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    sh = T.explode_shingles(docs, "doc_id", "text", k=_DECON_K, distinct=True)
    is_bench = F.col("doc_id") % _BENCH_MOD == 0
    bench = sh.filter(is_bench).select("shingle").distinct()
    hits = (
        sh.filter(~is_bench)
        .join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return (
        docs.filter(~is_bench)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("n_shared"),
            (F.coalesce(F.col("__n"), F.lit(0)) > 0).cast("int").alias("is_contaminated"),
        )
    )


# ----------------------------------------------------------------------------
# Repetition audit (Gopher-style): within-doc repetition signals that
# catch boilerplate/spam which plain length/quality gates miss.
# ----------------------------------------------------------------------------

_TOP_WORD_MAX = 0.2
_TOP_BIGRAM_MAX = 0.18

_REP_ORACLE = f"""
WITH norm_docs AS (
  SELECT doc_id, string_split({T.sql_normalize_ws('text')}, ' ') AS toks
  FROM documents
),
tok AS (SELECT doc_id, unnest(toks) AS tok FROM norm_docs),
tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
ts AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         COUNT(*) AS n_distinct, MAX(c) AS top_c
  FROM tc GROUP BY 1
),
big AS (
  SELECT doc_id, unnest(
    CASE WHEN len(toks) >= 2
         THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])
         ELSE [] END) AS bg
  FROM norm_docs
),
bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY 1, 2),
bs AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS nb, MAX(c) AS top_b FROM bc GROUP BY 1)
SELECT ts.doc_id, ts.n_tokens,
       CAST(n_distinct AS DOUBLE) / n_tokens AS distinct_frac,
       CAST(top_c AS DOUBLE) / n_tokens AS top_word_frac,
       COALESCE(CAST(top_b AS DOUBLE) / nb, 0.0) AS top_bigram_frac,
       CAST(CAST(top_c AS DOUBLE) / n_tokens > {_TOP_WORD_MAX}
            OR COALESCE(CAST(top_b AS DOUBLE) / nb, 0.0) > {_TOP_BIGRAM_MAX}
            AS INT) AS is_repetitive
FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id
"""


@register(
    "repetition_stats",
    _REP_ORACLE,
    "Per-doc repetition signals (Gopher filters): distinct-token ratio, "
    "most-frequent-word fraction, most-frequent-bigram fraction, and a "
    "repetitive flag (top word > 0.2 or top bigram > 0.18). Shuffles key "
    "on (doc_id, term) with map-side partial aggregation, then collapse "
    "to one row per doc — fully data-parallel, no hot keys possible "
    "beyond a single document's own term counts.",
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _t(spark, sf_dir, "documents").select(
        "doc_id", T.ws_tokens("text").alias("__toks")
    )
    tc = (
        toks.select("doc_id", F.explode("__toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ts = tc.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    bc = (
        toks.select("doc_id", F.explode(T.shingle_expr("__toks", 2)).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bs = bc.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("nb"), F.max("c").alias("top_b")
    )
    top_word = F.col("top_c").cast("double") / F.col("n_tokens")
    top_bigram = F.coalesce(F.col("top_b").cast("double") / F.col("nb"), F.lit(0.0))
    return (
        ts.join(bs, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_distinct").cast("double") / F.col("n_tokens")).alias(
                "distinct_frac"
            ),
            top_word.alias("top_word_frac"),
            top_bigram.alias("top_bigram_frac"),
            ((top_word > _TOP_WORD_MAX) | (top_bigram > _TOP_BIGRAM_MAX))
            .cast("int")
            .alias("is_repetitive"),
        )
    )


# ----------------------------------------------------------------------------
# Deterministic sequence packing: concatenate docs in md5-shuffled
# order, split the token stream into fixed-size context windows.
# ----------------------------------------------------------------------------

_PACK_BUDGET = 512

_PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split({T.sql_normalize_ws('text')}, ' ')) AS BIGINT)
           AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS okey
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY okey ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_offset
  FROM t
)
SELECT doc_id, n_tokens, start_offset,
       CAST(FLOOR(CAST(start_offset AS DOUBLE) / {_PACK_BUDGET}) AS BIGINT) AS bin_id
FROM c
"""


@register(
    "pack_sequences",
    _PACK_ORACLE,
    f"Deterministic sequence packing: md5(doc_id) gives a reproducible "
    f"global shuffle order; an EXACT distributed prefix sum of token "
    f"counts (two-pass, operators/packing.py — no single-partition "
    f"global window) assigns each doc its start offset in the "
    f"concatenated token stream; bin_id = offset // {_PACK_BUDGET} maps "
    f"it to a training context window. The standard concat-and-chunk "
    f"packing used to build fixed-length pretraining batches.",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(T.ws_tokens("text")).cast("bigint").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("okey"),
    )
    packed = exclusive_prefix_sum(
        docs, order_col="okey", weight_col="n_tokens", out_col="start_offset"
    )
    return packed.select(
        "doc_id",
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / _PACK_BUDGET).cast("bigint").alias("bin_id"),
    )


# ----------------------------------------------------------------------------
# Inverted index: term -> document frequency + bounded postings list.
# ----------------------------------------------------------------------------

_POSTINGS_CAP = 16

_INVIDX_ORACLE = f"""
WITH norm_docs AS (
  SELECT doc_id, string_split({T.sql_normalize_ws('text')}, ' ') AS toks
  FROM documents
),
tok AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM norm_docs),
dfc AS (SELECT term, COUNT(*) AS df FROM tok GROUP BY term),
small AS (
  SELECT t.term, array_to_string(list(t.doc_id ORDER BY t.doc_id), ',') AS postings
  FROM tok t JOIN dfc USING (term)
  WHERE dfc.df <= {_POSTINGS_CAP}
  GROUP BY t.term
)
SELECT dfc.term, dfc.df, small.postings
FROM dfc LEFT JOIN small USING (term)
"""


@register(
    "inverted_index",
    _INVIDX_ORACLE,
    f"Inverted-index build: per term, document frequency plus a sorted "
    f"postings list materialized ONLY for terms with df <= "
    f"{_POSTINGS_CAP} (two-phase: df first, then postings collection "
    f"restricted to qualifying terms) — hot/stopword terms never "
    f"accumulate unbounded arrays in any aggregation buffer, the "
    f"failure mode of a naive collect_list at corpus scale. Postings "
    f"emit as a CSV string for engine-portable comparison.",
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", F.explode(T.ws_tokens("text")).alias("term"))
        .distinct()
    )
    dfc = tok.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    small = (
        tok.join(dfc.filter(F.col("df") <= _POSTINGS_CAP).select("term"), "term")
        .groupBy("term")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string")
                ),
                ",",
            ).alias("postings")
        )
    )
    return dfc.join(small, "term", "left").select("term", "df", "postings")


# ----------------------------------------------------------------------------
# Corpus boilerplate removal (C4-style): drop text segments that repeat
# across documents, reconstruct the cleaned text.
# ----------------------------------------------------------------------------

_BOIL_K = 4
_BOIL_MIN_DF = 2

_BOIL_ORACLE = f"""
WITH norm_docs AS (
  SELECT doc_id, string_split({T.sql_normalize_ws('text')}, ' ') AS toks
  FROM documents
),
ch AS (
  SELECT doc_id, unnest(range(1, CAST(CEIL(len(toks)/{_BOIL_K}.0) AS INT) + 1)) AS i, toks
  FROM norm_docs
),
cc AS (
  SELECT doc_id, CAST(i AS INT) AS idx,
         array_to_string(list_slice(toks, (i-1)*{_BOIL_K}+1, i*{_BOIL_K}), ' ') AS chunk
  FROM ch
),
hot AS (
  SELECT chunk FROM (SELECT chunk, COUNT(DISTINCT doc_id) AS nd FROM cc GROUP BY chunk)
  WHERE nd >= {_BOIL_MIN_DF}
),
kept AS (SELECT * FROM cc WHERE chunk NOT IN (SELECT chunk FROM hot)),
cl AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         array_to_string(list(chunk ORDER BY idx), ' ') AS cleaned_text
  FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, COUNT(*) AS n_chunks FROM cc GROUP BY doc_id)
SELECT t.doc_id, t.n_chunks,
       t.n_chunks - COALESCE(cl.n_kept, 0) AS n_removed,
       COALESCE(cl.cleaned_text, '') AS cleaned_text
FROM tot t LEFT JOIN cl USING (doc_id)
"""


@register(
    "boilerplate_removal",
    _BOIL_ORACLE,
    f"C4-style cross-document boilerplate removal: split each doc into "
    f"{_BOIL_K}-token segments, drop every segment whose exact text "
    f"appears in >= {_BOIL_MIN_DF} distinct docs (headers, nav bars, "
    f"cookie banners at web scale), reconstruct cleaned text in segment "
    f"order. Two shuffles keyed on segment text (at 100 TB: on its "
    f"16-byte md5) — frequency count then anti-join; per-doc rebuild is "
    f"a grouped sort-collect bounded by document length.",
)
def boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    chunks = (
        docs.select("doc_id", T.ws_tokens("text").alias("toks"))
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, int(ceil(size(toks)/{_BOIL_K}.0))), "
                    f"i -> concat_ws(' ', slice(toks, (i-1)*{_BOIL_K}+1, {_BOIL_K})))"
                )
            ).alias("pos", "chunk"),
        )
        .select("doc_id", (F.col("pos") + 1).alias("idx"), "chunk")
    )
    hot = (
        chunks.groupBy("chunk")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= _BOIL_MIN_DF)
        .select("chunk")
    )
    kept = chunks.join(hot, "chunk", "left_anti")
    cleaned = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(idx, chunk))), "
            "s -> s.chunk), ' ')"
        ).alias("cleaned_text"),
    )
    totals = chunks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    return (
        totals.join(cleaned, "doc_id", "left")
        .select(
            "doc_id",
            "n_chunks",
            (F.col("n_chunks") - F.coalesce(F.col("n_kept"), F.lit(0))).alias("n_removed"),
            F.coalesce(F.col("cleaned_text"), F.lit("")).alias("cleaned_text"),
        )
    )


# ----------------------------------------------------------------------------
# Flagship v2: curation + packing end-to-end (one declarative plan)
# ----------------------------------------------------------------------------


def _curate_and_pack_oracle() -> str:
    from data_lakehouse_platform_spark.queries_relational_ext import _CURATE_ORACLE

    return f"""
WITH curated AS (SELECT * FROM ({_CURATE_ORACLE}) q),
t AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS okey
  FROM curated
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY okey ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_offset
  FROM t
)
SELECT doc_id, n_tokens, start_offset,
       CAST(FLOOR(CAST(start_offset AS DOUBLE) / {_PACK_BUDGET}) AS BIGINT) AS bin_id
FROM c
"""


@register(
    "curate_and_pack",
    _curate_and_pack_oracle(),
    "The pretraining pipeline end-to-end in ONE declarative plan: "
    "curation gates (exact-dedup keeper, language, quality, length — "
    "curate_corpus's predicate) feed straight into deterministic "
    "sequence packing (md5 order, exact distributed prefix sum, "
    f"{_PACK_BUDGET}-token bins). Catalyst fuses the gates into the "
    "scan, so the only materialized rows between 'raw corpus' and "
    "'training batches' are the survivors — the composition property "
    "that makes a declarative engine beat stitched-together scripts at "
    "100 TB.",
)
def curate_and_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lakehouse_platform_spark.queries_relational_ext import curate_corpus

    curated = curate_corpus(spark, sf_dir).select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("okey"),
    )
    packed = exclusive_prefix_sum(
        curated, order_col="okey", weight_col="n_tokens", out_col="start_offset"
    )
    return packed.select(
        "doc_id",
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / _PACK_BUDGET).cast("bigint").alias("bin_id"),
    )


# ----------------------------------------------------------------------------
# Quality-gate funnel: first-failing-gate attribution
# ----------------------------------------------------------------------------

_FUNNEL_MIN_CHARS = 60
_FUNNEL_LANGS = ("en", "de", "fr", "es")
_FUNNEL_LANG_LIST = ", ".join(f"'{s}'" for s in _FUNNEL_LANGS)

_FUNNEL_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, n_chars,
         string_split({T.sql_normalize_ws('text')}, ' ') AS t
  FROM documents
),
gated AS (
  SELECT doc_id, n_chars,
    CASE
      WHEN n_chars < {_FUNNEL_MIN_CHARS} THEN '1_too_short'
      WHEN lang NOT IN ({_FUNNEL_LANG_LIST}) THEN '2_bad_lang'
      WHEN len(list_distinct(t)) * 10 < len(t) * 3 THEN '3_low_diversity'
      ELSE '4_passed'
    END AS gate
  FROM toks
)
SELECT gate,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars,
       CAST(SUM(CAST(n_chars AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_chars
FROM gated
GROUP BY gate
"""


@register(
    "quality_gate_funnel",
    _FUNNEL_ORACLE,
    "Curation funnel attribution: each document is charged to its FIRST "
    "failing quality gate (length -> language -> token diversity), in "
    "the order the production filter chain applies them, so the "
    "datacard answers 'which gate costs us the most data' without "
    "re-running the chain N times. The diversity test is an integer "
    "cross-multiplication (10 x distinct < 3 x total), never a float "
    "ratio — both engines branch identically. One map pass + one "
    "4-group aggregate; no shuffle beyond the final rollup.",
)
def quality_gate_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = T.ws_tokens("text")
    gate = (
        F.when(F.col("n_chars") < _FUNNEL_MIN_CHARS, "1_too_short")
        .when(~F.col("lang").isin(*_FUNNEL_LANGS), "2_bad_lang")
        .when(
            F.size(F.array_distinct(toks)) * 10 < F.size(toks) * 3,
            "3_low_diversity",
        )
        .otherwise("4_passed")
    )
    return (
        docs.select(F.col("n_chars").cast("bigint").alias("n_chars"), gate.alias("gate"))
        .groupBy("gate")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            (
                F.sum("n_chars").cast("double") / F.count(F.lit(1))
            ).alias("avg_chars"),
        )
    )


# ----------------------------------------------------------------------------
# Cross-source duplicate provenance attribution
# ----------------------------------------------------------------------------

_PROV_ORACLE = """
WITH h AS (
  SELECT doc_id, source, md5(coalesce(text, '')) AS th FROM documents
),
canon AS (
  SELECT th, MIN(doc_id) AS canon_id,
         MIN_BY(source, doc_id) AS canon_source
  FROM h GROUP BY th
)
SELECT h.source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN h.doc_id = c.canon_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_canonical,
       CAST(SUM(CASE WHEN h.doc_id != c.canon_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_shadowed,
       CAST(SUM(CASE WHEN h.doc_id != c.canon_id
                      AND h.source != c.canon_source THEN 1 ELSE 0 END)
            AS BIGINT) AS n_cross_source
FROM h JOIN canon c USING (th)
GROUP BY h.source
"""


@register(
    "dedup_provenance",
    _PROV_ORACLE,
    "Duplicate PROVENANCE attribution on top of exact dedup: every "
    "content hash elects a canonical doc (lowest doc_id, MIN/MIN_BY "
    "aggregates — no per-hash window, so a million-copy boilerplate "
    "crowd is one aggregate group, not one sort task), then each "
    "source is scored on how many of its docs are canonical, shadowed "
    "by an earlier copy, or shadowed by a DIFFERENT source's copy. "
    "The cross-source column is the one that finds mirror/scraper "
    "relationships between crawls — the provenance question a plain "
    "dedup count cannot answer. Null text folds to the empty-string "
    "sentinel like operators/dedup.py's ledger.",
)
def dedup_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id", "source", F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("th")
    )
    canon = h.groupBy("th").agg(
        F.min("doc_id").alias("canon_id"),
        F.min_by("source", "doc_id").alias("canon_source"),
    )
    j = h.join(canon, "th")
    is_canon = (F.col("doc_id") == F.col("canon_id")).cast("int")
    is_shadow = (F.col("doc_id") != F.col("canon_id")).cast("int")
    cross = (
        (F.col("doc_id") != F.col("canon_id"))
        & (F.col("source") != F.col("canon_source"))
    ).cast("int")
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(is_canon).cast("bigint").alias("n_canonical"),
            F.sum(is_shadow).cast("bigint").alias("n_shadowed"),
            F.sum(cross).cast("bigint").alias("n_cross_source"),
        )
    )
