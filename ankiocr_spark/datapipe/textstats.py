"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All pure JVM-side expressions (whole-stage
codegen, no Python) with exact DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: function-word markers for the n-gram/stopword language heuristic
EN_MARKERS = ("the", "a", "row", "line")

#: BPE-ish pre-tokenization: letter runs | digit runs | single non-space symbol
BPE_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"

LANG_RATIO_THRESHOLD = 0.04


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ankiocr_spark.ops import load

    return load(spark, sf_dir, "documents")


def marker_ratio_col(tokens) -> "F.Column":
    """English function-word ratio over a token array — the ONE definition
    shared by q_lang_id and the training-set capstone, so the gate cannot
    drift from the component operator (r3 review cleanup)."""
    markers = F.size(F.filter(tokens, lambda x: x.isin(*EN_MARKERS)))
    return F.round(markers / F.size(tokens), 6)


def quality_col(tokens) -> "F.Column":
    """Composite quality score (length + lexical diversity) over a token
    array — shared by q_quality_score and the training-set capstone."""
    n_tokens = F.size(tokens)
    distinct_ratio = F.size(F.array_distinct(tokens)) / n_tokens
    return F.round(
        0.4 * F.least(F.lit(1.0), n_tokens / F.lit(100.0))
        + 0.6 * distinct_ratio,
        6,
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: ratio of English function-word tokens.
    (A real model would be a pandas UDF; the heuristic keeps this JVM-side
    and oracle-checkable — the plumbing is what transfers to 100 TB.)"""
    docs = _docs(spark, sf_dir)
    tokens = F.split("text", " ")
    ratio = marker_ratio_col(tokens)
    return docs.select(
        "doc_id",
        "lang",
        ratio.alias("marker_ratio"),
        F.when(ratio >= LANG_RATIO_THRESHOLD, F.lit("en-like"))
        .otherwise(F.lit("other"))
        .alias("predicted"),
    )


_MARKER_LIST = "[" + ", ".join(f"'{m}'" for m in EN_MARKERS) + "]"

ORACLE_LANG_ID = f"""
SELECT doc_id, lang,
       round(len(list_filter(str_split(text, ' '), x -> list_contains({_MARKER_LIST}, x)))
             / len(str_split(text, ' ')), 6) AS marker_ratio,
       CASE WHEN round(len(list_filter(str_split(text, ' '), x -> list_contains({_MARKER_LIST}, x)))
                       / len(str_split(text, ' ')), 6) >= {LANG_RATIO_THRESHOLD}
            THEN 'en-like' ELSE 'other' END AS predicted
FROM documents
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score from length + lexical-diversity ratios —
    the standard cheap pre-filter before expensive pipeline stages."""
    docs = _docs(spark, sf_dir)
    tokens = F.split("text", " ")
    n_tokens = F.size(tokens)
    distinct_ratio = F.size(F.array_distinct(tokens)) / n_tokens
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        quality_col(tokens).alias("quality"),
    )


ORACLE_QUALITY = """
SELECT doc_id,
       len(str_split(text, ' ')) AS n_tokens,
       round(len(list_distinct(str_split(text, ' '))) / len(str_split(text, ' ')), 6) AS distinct_ratio,
       round(0.4 * least(1.0, len(str_split(text, ' ')) / 100.0)
           + 0.6 * (len(list_distinct(str_split(text, ' '))) / len(str_split(text, ' '))), 6) AS quality
FROM documents
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + BPE-ish pre-tokens per document."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_REGEX), 0)).alias("bpe_tokens"),
    )


ORACLE_TOKEN_COUNT = f"""
SELECT doc_id,
       len(list_filter(str_split(text, ' '), x -> x <> '')) AS ws_tokens,
       len(regexp_extract_all(text, '{BPE_REGEX}')) AS bpe_tokens
FROM documents
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprint: hash of normalized prefix +
    length — the cheap first-pass near-dup key (rolling-hash analog)."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.md5(
            F.concat(F.substring("text", 1, 64), F.lit(":"), F.length("text").cast("string"))
        ).alias("fingerprint"),
    )


ORACLE_FINGERPRINT = """
SELECT doc_id, md5(substr(text, 1, 64) || ':' || length(text)) AS fingerprint
FROM documents
"""


QUALITY_FLOOR = 0.5


def q_training_set_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone composition: the final training-set selection a
    pipeline user runs — language gate AND quality floor AND exact-dedup
    keeper, in one plan. All three predicates are cheap JVM expressions,
    so Catalyst fuses the gates into the scan side and the only shuffle is
    the dedup group-by on the content hash. At 10^12 docs this is the
    'shrink first' stage that every expensive operator (MinHash, ANN,
    extraction re-runs) reads from instead of the raw crawl."""
    docs = _docs(spark, sf_dir)
    tokens = F.split("text", " ")
    lang_ok = marker_ratio_col(tokens) >= LANG_RATIO_THRESHOLD
    gated = docs.where(
        lang_ok & (quality_col(tokens) >= QUALITY_FLOOR)
    ).select(
        "doc_id", F.md5("text").alias("content_hash"), "lang", "n_chars"
    )
    keepers = gated.groupBy("content_hash").agg(
        F.min("doc_id").alias("doc_id")
    )
    return (
        gated.join(keepers, ["content_hash", "doc_id"], "left_semi")
        .select("doc_id", "lang", "n_chars")
    )


ORACLE_TRAINING_SET = f"""
WITH scored AS (
  SELECT doc_id, lang, n_chars, md5(text) AS content_hash,
         round(len(list_filter(str_split(text, ' '),
                               x -> list_contains({_MARKER_LIST}, x)))
               / len(str_split(text, ' ')), 6) AS marker_ratio,
         round(0.4 * least(1.0, len(str_split(text, ' ')) / 100.0)
             + 0.6 * (len(list_distinct(str_split(text, ' ')))
                      / len(str_split(text, ' '))), 6) AS quality
  FROM documents),
gated AS (
  SELECT * FROM scored
  WHERE marker_ratio >= {LANG_RATIO_THRESHOLD} AND quality >= {QUALITY_FLOOR})
SELECT doc_id, lang, n_chars FROM gated
WHERE doc_id IN (SELECT min(doc_id) FROM gated GROUP BY content_hash)
"""


def q_quality_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality-score distribution (median + p90 + count) —
    the corpus-health report every curation run starts from (where do the
    gates bite, per language?).

    Scale note: ``F.percentile`` is EXACT (it buffers the group's values),
    which is what makes this oracle-checkable; the group count is bounded
    by the language set, not the corpus, but per-group state is O(docs in
    group). The 100-TB path swaps in ``approx_percentile(col, p, acc)``
    (bounded GK-sketch state, partial-aggregatable) — one identifier, same
    plan shape; the exact form stays here as the value contract."""
    docs = _docs(spark, sf_dir).where(F.col("text").isNotNull())
    tokens = F.split("text", " ")
    return (
        docs.select("lang", quality_col(tokens).alias("quality"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.percentile("quality", F.lit(0.5)), 6).alias("quality_p50"),
            F.round(F.percentile("quality", F.lit(0.9)), 6).alias("quality_p90"),
        )
    )


ORACLE_QUALITY_PERCENTILES = """
WITH scored AS (
  SELECT lang,
         round(0.4 * least(1.0, len(str_split(text, ' ')) / 100.0)
             + 0.6 * (len(list_distinct(str_split(text, ' '))) / len(str_split(text, ' '))), 6) AS quality
  FROM documents WHERE text IS NOT NULL)
SELECT lang, count(*)::BIGINT AS n_docs,
       round(quantile_cont(quality, 0.5), 6) AS quality_p50,
       round(quantile_cont(quality, 0.9), 6) AS quality_p90
FROM scored GROUP BY lang
"""


QUERIES = {
    "lang_id": q_lang_id,
    "quality_percentiles": q_quality_percentiles,
    "quality_score": q_quality_score,
    "token_count": q_token_count,
    "doc_fingerprint": q_fingerprint,
    "training_set_select": q_training_set_select,
}

ORACLE_SQL = {
    "lang_id": ORACLE_LANG_ID,
    "quality_percentiles": ORACLE_QUALITY_PERCENTILES,
    "quality_score": ORACLE_QUALITY,
    "token_count": ORACLE_TOKEN_COUNT,
    "doc_fingerprint": ORACLE_FINGERPRINT,
    "training_set_select": ORACLE_TRAINING_SET,
}
