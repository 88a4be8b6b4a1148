"""Composed end-to-end pipeline queries over the flagship extract output.

These are the queries a real 100-TB training-data user runs (VERDICT r3
items #3 and #6): the full extract → quality-gate → dedup → decontaminate
→ select composition in ONE plan, and a user-facing window function over
the extract table. Every stage is individually closed-form oracle-able
(the flagship kernel's CASE form, the shared gate expressions from
textstats, the shingle definition from dedup), so the composition is too
— the same technique as outlinks_pagerank.

Reference analog: the full-pipeline e2e test
(/root/reference/tests/test_ocr.py:80-85) runs OCR → field update →
verify over a whole collection in one pass; these queries are that
composition at corpus scale.

Scale shape: the kernel stage is the only Python; gates fuse into the
post-kernel projection (JVM codegen), exact-dedup is one hash shuffle,
decontamination is a broadcast probe of the eval shingle dictionary, and
the final anti-join keys on url. No stage re-reads the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import ExtractConfig
from ..job import run_extract
from ..ops import H1_TEXT, URL_PREFIX, doc_url, load, wrap_html
from .dedup import DECONTAM_NGRAM, EVAL_DOC_MOD, shingles, _ngram_sql
from .textstats import (
    _MARKER_LIST, LANG_RATIO_THRESHOLD, QUALITY_FLOOR,
    marker_ratio_col, quality_col,
)

#: every 10th doc re-crawled under a new key — the dup slice that makes the
#: dedup stage do real work (same convention as q_dedup_exact).
DUP_MOD = 10


def _extract_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ re-keyed re-crawl slice, wrapped to pages and run through
    the fused extraction kernel — the shared front half of both queries."""
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    dupes = docs.where(F.col("doc_id") % DUP_MOD == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    corpus = docs.unionByName(dupes)
    pages = corpus.select(
        doc_url(F.col("doc_id")).alias("url"),
        wrap_html(F.col("text")).alias("html"),
        F.col("lang"),
    )
    return run_extract(spark, pages, ExtractConfig(salt_buckets=8)).select(
        "url", "extracted_text"
    )


def q_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone composition, end-to-end in one plan:

    extract (fused kernel over wrapped pages, incl. a re-crawl dup slice)
    → body isolation (drop the constant H1 heading line)
    → language gate (marker ratio) AND quality floor, on the BODY
    → exact dedup (md5(body) groups, keeper = min url)
    → benchmark decontamination (drop docs sharing an 8-gram with the
      eval slice doc_id % EVAL_DOC_MOD of the raw table)
    → final selection (url, n_tokens, quality).

    The kernel's closed form makes body = trim(text) when it clears
    MIN_TEXT_CHARS else '', so the whole composition stays oracle-able.

    Plan shape — ONE lineage, so the Python kernel runs ONCE (the naive
    keepers-join + anti-join composition re-ran the kernel per DataFrame
    branch: Spark has no cross-branch common-subexpression reuse, the
    same trap q_dedup_ngram_jaccard documents):
      1. kernel pass → JVM gates fused onto its output;
      2. dedup keeper = min(url) per content_hash as a WINDOW (one
         exchange), filter url == keeper — no second branch;
      3. body shingles exploded with (n_tokens, quality) riding along,
         broadcast LEFT join against the eval dictionary marks hits;
      4. groupBy(url) folds the exploded rows back (shingling is
         row-local, so every url's shingles sit in one partition and the
         partial agg collapses them map-side — the exchange carries
         O(docs), not O(shingles)); max(hit)=0 keeps the doc.
    At 10^12 docs: one kernel pass, two O(docs) exchanges, one broadcast."""
    ext = _extract_corpus(spark, sf_dir)
    # closed form: extracted = H1 ("\n" body)? — body starts after the
    # constant heading + newline; absent newline → empty body
    body = F.expr(f"substring(extracted_text, {len(H1_TEXT) + 2})")
    toks = F.split("body", " ")
    gated = (
        ext.select("url", body.alias("body"))
        .where(
            (marker_ratio_col(toks) >= LANG_RATIO_THRESHOLD)
            & (quality_col(toks) >= QUALITY_FLOOR)
        )
        .select(
            "url",
            "body",
            F.md5("body").alias("content_hash"),
            F.size(toks).alias("n_tokens"),
            quality_col(toks).alias("quality"),
        )
    )
    keeper = F.min("url").over(Window.partitionBy("content_hash"))
    deduped = (
        gated.withColumn("keeper", keeper)
        .where(F.col("url") == F.col("keeper"))
        .select("url", "body", "n_tokens", "quality")
    )
    ev = (
        shingles(
            load(spark, sf_dir, "documents")
            .where(F.col("text").isNotNull() & (F.col("doc_id") % EVAL_DOC_MOD == 0))
            .select("doc_id", F.trim("text").alias("text")),
            n=DECONTAM_NGRAM,
            distinct=False,
        )
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    marked = shingles(
        deduped.select(
            F.col("url").alias("doc_id"), "n_tokens", "quality",
            F.col("body").alias("text"),
        ),
        n=DECONTAM_NGRAM,
        distinct=False,
        extra_cols=("n_tokens", "quality"),
    ).join(F.broadcast(ev), "shingle", "left")
    return (
        marked.groupBy(F.col("doc_id").alias("url"))
        .agg(
            F.first("n_tokens").alias("n_tokens"),
            F.first("quality").alias("quality"),
            F.max(F.coalesce(F.col("hit"), F.lit(0))).alias("_hit"),
        )
        .where(F.col("_hit") == 0)
        .select("url", "n_tokens", "quality")
    )


def _oracle_training_pipeline() -> str:
    return f"""
WITH base AS (
  SELECT doc_id, trim(text) AS t FROM documents WHERE text IS NOT NULL
  UNION ALL
  SELECT doc_id + 1000000, trim(text) FROM documents
  WHERE text IS NOT NULL AND doc_id % {DUP_MOD} = 0),
ext AS (
  SELECT '{URL_PREFIX}' || doc_id AS url,
         CASE WHEN length(t) >= 25 THEN t ELSE '' END AS body
  FROM base),
scored AS (
  SELECT url, body, str_split(body, ' ') AS toks FROM ext),
gated AS (
  SELECT url, body, md5(body) AS content_hash,
         len(toks)::BIGINT AS n_tokens,
         round(0.4 * least(1.0, len(toks) / 100.0)
             + 0.6 * (len(list_distinct(toks)) / len(toks)), 6) AS quality
  FROM scored
  WHERE round(len(list_filter(toks, x -> list_contains({_MARKER_LIST}, x)))
              / len(toks), 6) >= {LANG_RATIO_THRESHOLD}
    AND round(0.4 * least(1.0, len(toks) / 100.0)
            + 0.6 * (len(list_distinct(toks)) / len(toks)), 6)
        >= {QUALITY_FLOOR}),
deduped AS (
  SELECT url, body, n_tokens, quality FROM gated
  WHERE url IN (SELECT min(url) FROM gated GROUP BY content_hash)),
evtok AS (
  SELECT doc_id, str_split(trim(text), ' ') AS t FROM documents
  WHERE text IS NOT NULL AND doc_id % {EVAL_DOC_MOD} = 0),
ev AS (
  SELECT DISTINCT shingle FROM ({_ngram_sql(DECONTAM_NGRAM)} FROM evtok)),
trtok AS (SELECT url AS doc_id, str_split(body, ' ') AS t FROM deduped),
contaminated AS (
  SELECT DISTINCT doc_id AS url
  FROM ({_ngram_sql(DECONTAM_NGRAM)} FROM trtok) s
  JOIN ev USING (shingle))
SELECT url, n_tokens, quality FROM deduped
WHERE url NOT IN (SELECT url FROM contaminated)
"""


def q_host_length_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-facing window function over the extract table (VERDICT r3 #6):
    dense_rank of pages per host by extracted length. Pages get
    deterministic multi-host urls (doc_id % 7 hosts) so the partition
    clause does real work; ties share a rank (dense_rank over length
    alone), which keeps the result a pure function of (host, length).

    Scale shape: ONE window exchange on host over the kernel output —
    the standard per-host leaderboard every crawl-ops dashboard runs."""
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    pages = docs.select(
        F.concat(
            F.lit("https://h"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.org/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        wrap_html(F.col("text")).alias("html"),
        F.col("lang"),
    )
    ext = run_extract(spark, pages, ExtractConfig(salt_buckets=8)).select(
        "url", "extracted_text"
    )
    w = Window.partitionBy("host").orderBy(F.desc("n_chars_extracted"))
    return ext.select(
        "url",
        F.regexp_extract("url", r"^https://([^/]+)/", 1).alias("host"),
        F.length("extracted_text").alias("n_chars_extracted"),
    ).withColumn("length_rank", F.dense_rank().over(w))


def _oracle_host_length_rank() -> str:
    return f"""
WITH ext AS (
  SELECT 'https://h' || (doc_id % 7) || '.example.org/doc/' || doc_id AS url,
         'h' || (doc_id % 7) || '.example.org' AS host,
         length(CASE WHEN length(trim(text)) >= 25
                THEN '{H1_TEXT}' || chr(10) || trim(text)
                ELSE '{H1_TEXT}' END) AS n_chars_extracted
  FROM documents WHERE text IS NOT NULL)
SELECT url, host, n_chars_extracted,
       dense_rank() OVER (PARTITION BY host ORDER BY n_chars_extracted DESC)
           AS length_rank
FROM ext
"""


#: per-language acceptance rates consumed by the composed pipeline's mix
#: stage — a PRECOMPUTED artifact (the materialized output of a rate job
#: like q_domain_mix_sample's counts stage), exactly how a 100-TB run
#: stages it: the rate table is computed once upstream and broadcast, so
#: the curation pass itself never branches over the corpus for counts.
CURATION_MIX_RATES = {"en": 0.9, "zh": 0.6, "es": 0.6, "de": 0.6, "fr": 0.3}


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation-stack capstone (VERDICT r4 #1): the full post-extract
    curation chain a 100-TB corpus owner runs, composed in ONE lineage —

      extract (fused kernel; doc_id+lang ride the Arrow batch as
               positional passthrough — zero rejoin)
      → C4 line/doc rules (injected structure, c4_lines/c4_line_ok —
        the SAME definitions as the standalone q_c4_filter)
      → bad-words dictionary gate
      → hashed linear classifier gate (integer wsum ≥ 0 — exact boundary)
      → mixture sampling against precomputed per-lang rates
        (CURATION_MIX_RATES; the deterministic mix_draw hash)
      → sequence packing of the survivors (pack_chunks — the two-phase
        prefix sum with the offset-relation guard).

    Plan shape — the ride-the-exchange discipline end-to-end: the corpus
    is scanned ONCE and the kernel runs ONCE at runtime (every gate is a
    codegen projection/filter fused onto the kernel output — they all
    collapse into ONE Filter pushed beneath the pack window; the rate
    lookup is a literal map, not a join); the only corpus exchanges are
    pack_chunks' two (the within-bucket window hash exchange — whose
    subtree, kernel included, is canonically identical in both prefix-sum
    branches, so AQE stage reuse materializes it once and the offsets
    branch reads it back as a ReusedExchange — plus the final chunk
    aggregation). Asserted by tests/test_pipeline.py on the EXECUTED
    adaptive plan (the reuse only appears with isFinalPlan=true).

    Gate order is the cost order: free codegen gates shrink the corpus
    before the (still cheap) packing shuffles — the shrink-first rule
    every curation stack follows.

    Reference analog: the full-collection e2e test
    (/root/reference/tests/test_ocr.py:80-85) runs OCR → cleanup →
    field-update over the whole collection in one pass; this is that
    composition with the curation stages a webtext pipeline inserts
    between extraction and training-set assembly."""
    from ..ops import load
    from .curation import c4_line_ok, c4_lines, mix_draw
    from .packing import pack_chunks
    from .curation import BAD_WORDS
    from .textstats import clf_token_weight

    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    pages = docs.select(
        doc_url(F.col("doc_id")).alias("url"),
        wrap_html(F.col("text")).alias("html"),
        "doc_id",
        "lang",
    )
    cfg = ExtractConfig(
        salt_buckets=8, extra_passthrough_cols=("doc_id", "lang")
    )
    body = F.expr(f"substring(extracted_text, {len(H1_TEXT) + 2})")
    ext = run_extract(spark, pages, cfg).select(
        "doc_id", "lang", body.alias("body")
    )
    # C4 stage: build the injected line array once, filter by the shared
    # rule, gate the doc (each HOF output projected ONCE — no codegen CSE
    # inside lambdas, docs/PLANS.md §CSE)
    c4 = ext.select(
        "doc_id", "lang", "body",
        c4_lines(F.col("body"), F.col("doc_id")).alias("_lines"),
    ).select(
        "doc_id", "lang", "body",
        F.filter("_lines", c4_line_ok).alias("_kept"),
    ).where(
        (F.size("_kept") > 0)
        & ~F.col("body").contains("lorem ipsum")
        & ~F.col("body").contains("{")
    )
    toks = c4.select(
        "doc_id",
        "lang",
        F.filter(
            F.split(F.array_join("_kept", "\n"), " "), lambda x: x != ""
        ).alias("_toks"),
    )
    gated = toks.select(
        "doc_id",
        "lang",
        "_toks",
        F.size(F.filter("_toks", lambda x: x.isin(*BAD_WORDS))).alias(
            "_n_bad"
        ),
        F.aggregate(
            "_toks", F.lit(0).cast("bigint"), lambda acc, t: acc + clf_token_weight(t)
        ).alias("_wsum"),
    ).where((F.col("_n_bad") == 0) & (F.col("_wsum") >= 0))
    rate = F.create_map(
        *[F.lit(x) for kv in CURATION_MIX_RATES.items() for x in kv]
    )[F.col("lang")]
    sampled = gated.where(
        F.col("lang").isin(list(CURATION_MIX_RATES))
        & (mix_draw(F.col("doc_id")) < rate)
    )
    return pack_chunks(
        sampled.select("doc_id", F.size("_toks").cast("bigint").alias("n"))
    )


def _oracle_curation_pipeline() -> str:
    from .curation import (
        _C4_CTA, _C4_JS_LINE, BAD_WORDS, C4_JS_MOD, C4_PUNCT_MOD,
        SQL_C4_LINE_OK, sql_c4_doc_gate, sql_mix_draw,
    )
    from .packing import PACK_CHUNK_TOKENS
    from .textstats import SQL_CLF_TOKEN_WEIGHT

    bad = "[" + ", ".join(f"'{w}'" for w in BAD_WORDS) + "]"
    rate_case = "CASE lang " + " ".join(
        f"WHEN '{k}' THEN {v}::DOUBLE" for k, v in CURATION_MIX_RATES.items()
    ) + " END"
    return f"""
WITH ext AS (
  SELECT doc_id, lang,
         CASE WHEN length(trim(text)) >= 25 THEN trim(text) ELSE '' END AS body
  FROM documents WHERE text IS NOT NULL),
c4 AS (
  SELECT doc_id, lang, body,
         list_filter(
           list_filter([
             CASE WHEN doc_id % {C4_PUNCT_MOD} = 0 THEN body || '.' ELSE body END,
             '{_C4_CTA}',
             CASE WHEN doc_id % {C4_JS_MOD} = 0 THEN '{_C4_JS_LINE}' END
           ], x -> x IS NOT NULL),
           x -> {SQL_C4_LINE_OK}) AS ks
  FROM ext),
c4gated AS (
  SELECT doc_id, lang,
         coalesce(array_to_string(ks, chr(10)), '') AS clean_text
  FROM c4
  WHERE len(ks) > 0 AND {sql_c4_doc_gate("body")}),
toks AS (
  SELECT doc_id, lang,
         list_filter(str_split(clean_text, ' '), x -> x <> '') AS toks
  FROM c4gated),
gated AS (
  SELECT doc_id, lang, len(toks)::BIGINT AS n FROM toks
  WHERE len(list_filter(toks, x -> list_contains({bad}, x))) = 0
    AND list_sum(list_transform(toks,
          t -> {SQL_CLF_TOKEN_WEIGHT}))::BIGINT >= 0),
sampled AS (
  SELECT doc_id, n FROM gated
  WHERE {rate_case} IS NOT NULL
    AND {sql_mix_draw("doc_id")} < {rate_case}),
off AS (
  SELECT doc_id, n,
         coalesce(sum(n) OVER (ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0)::BIGINT AS start
  FROM sampled WHERE n > 0),
spans AS (
  SELECT doc_id, start, start + n AS fin,
         unnest(generate_series(start // {PACK_CHUNK_TOKENS},
                                (start + n - 1) // {PACK_CHUNK_TOKENS})) AS chunk_id
  FROM off)
SELECT chunk_id::BIGINT AS chunk_id,
       count(*)::BIGINT AS n_docs,
       sum(least(fin, (chunk_id + 1) * {PACK_CHUNK_TOKENS})
           - greatest(start, chunk_id * {PACK_CHUNK_TOKENS}))::BIGINT AS chunk_tokens,
       min(doc_id)::BIGINT AS first_doc,
       max(doc_id)::BIGINT AS last_doc
FROM spans GROUP BY chunk_id
"""


# ---------------------------------------------------------------------------
# Gate-funnel ablation report — per-gate kill accounting over ONE scan
# ---------------------------------------------------------------------------


def q_gate_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate-ablation funnel: the one-row report every curation owner
    reads before touching a threshold — how many documents survive each
    gate cumulatively in pipeline order (C4 → bad-words → classifier →
    mixture draw), and how many each gate kills STANDALONE (its kill set
    ignoring the other gates). Cumulative-vs-standalone is the ablation
    pair: a gate whose standalone kills are all already dead upstream is
    free to drop; one whose cumulative step is large is doing unique
    work. (Semantics note: this composes the STANDALONE per-doc verdicts
    — each gate judged on the raw text, exactly as its individual driver
    query does; `curation_pipeline_e2e` is the PIPELINE semantics where
    later gates see progressively cleaned text. Both are real tools; the
    ablation wants independent verdicts.)

    Scale shape: ONE pruned corpus scan; every verdict is the shared
    codegen gate expression (c4_lines/c4_line_ok, BAD_WORDS, integer
    clf_token_weight fold, mix_draw) computed in one projection, and the
    funnel collapses via map-side-partial conditional sums — the only
    exchange is the metadata-sized one-row collapse. Integer counts end
    to end: nothing to ulp-flake.

    Reference analog: AnkiOCR's end-of-run processed/errored readout
    (`gui.py:70-76`), lifted to per-gate corpus accounting."""
    from .curation import BAD_WORDS, c4_line_ok, c4_lines, mix_draw
    from .textstats import clf_token_weight

    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # project the HOF inputs ONCE below their consumers (no codegen CSE
    # inside lambdas — docs/PLANS.md §CSE)
    staged = docs.select(
        "doc_id",
        "lang",
        "text",
        c4_lines(F.col("text"), F.col("doc_id")).alias("_lines"),
        F.filter(F.split("text", " "), lambda x: x != "").alias("_toks"),
    )
    rate = F.create_map(
        *[F.lit(x) for kv in CURATION_MIX_RATES.items() for x in kv]
    )[F.col("lang")]
    verd = staged.select(
        (
            (F.size(F.filter("_lines", c4_line_ok)) > 0)
            & ~F.col("text").contains("lorem ipsum")
            & ~F.col("text").contains("{")
        ).alias("c4"),
        (
            F.size(F.filter("_toks", lambda x: x.isin(*BAD_WORDS))) == 0
        ).alias("bad"),
        (
            F.aggregate(
                "_toks",
                F.lit(0).cast("bigint"),
                lambda acc, t: acc + clf_token_weight(t),
            )
            >= 0
        ).alias("clf"),
        # a lang outside the mixture has NULL rate → draw < NULL is NULL
        # → must read as FALSE (the e2e drops those langs up front)
        F.coalesce(
            mix_draw(F.col("doc_id")) < rate, F.lit(False)
        ).alias("mix"),
    )

    def n(cond):
        return F.sum(cond.cast("int")).cast("bigint")

    c4, bad, clf, mix = (F.col(c) for c in ("c4", "bad", "clf", "mix"))
    return verd.agg(
        F.count("*").alias("n_docs"),
        n(c4).alias("pass_c4"),
        n(c4 & bad).alias("pass_badwords"),
        n(c4 & bad & clf).alias("pass_classifier"),
        n(c4 & bad & clf & mix).alias("pass_mix"),
        n(~c4).alias("kill_c4"),
        n(~bad).alias("kill_badwords"),
        n(~clf).alias("kill_classifier"),
        n(~mix).alias("kill_mix"),
    )


def _oracle_gate_funnel() -> str:
    from .curation import (
        _BAD_LIST, _C4_CTA, _C4_JS_LINE, C4_JS_MOD, C4_PUNCT_MOD,
        SQL_C4_LINE_OK, sql_c4_doc_gate, sql_mix_draw,
    )
    from .textstats import SQL_CLF_TOKEN_WEIGHT

    mix_case = " ".join(
        f"WHEN '{k}' THEN {v}::DOUBLE"
        for k, v in CURATION_MIX_RATES.items()
    )
    return f"""
WITH staged AS (
  SELECT doc_id, lang, text,
         list_filter([
           CASE WHEN doc_id % {C4_PUNCT_MOD} = 0 THEN text || '.' ELSE text END,
           '{_C4_CTA}',
           CASE WHEN doc_id % {C4_JS_MOD} = 0 THEN '{_C4_JS_LINE}' END
         ], x -> x IS NOT NULL) AS ls,
         list_filter(str_split(text, ' '), x -> x <> '') AS toks
  FROM documents WHERE text IS NOT NULL),
verd AS (
  SELECT
    (len(list_filter(ls, x -> {SQL_C4_LINE_OK})) > 0
     AND {sql_c4_doc_gate("text")}) AS c4,
    (len(list_filter(toks, x -> list_contains({_BAD_LIST}, x))) = 0) AS bad,
    (coalesce(list_sum(list_transform(toks,
       t -> {SQL_CLF_TOKEN_WEIGHT})), 0) >= 0) AS clf,
    coalesce(
      {sql_mix_draw("doc_id")}
        < CASE lang {mix_case} END,
      false) AS mix
  FROM staged)
SELECT count(*)::BIGINT AS n_docs,
       sum(CASE WHEN c4 THEN 1 ELSE 0 END)::BIGINT AS pass_c4,
       sum(CASE WHEN c4 AND bad THEN 1 ELSE 0 END)::BIGINT AS pass_badwords,
       sum(CASE WHEN c4 AND bad AND clf THEN 1 ELSE 0 END)::BIGINT
         AS pass_classifier,
       sum(CASE WHEN c4 AND bad AND clf AND mix THEN 1 ELSE 0 END)::BIGINT
         AS pass_mix,
       sum(CASE WHEN NOT c4 THEN 1 ELSE 0 END)::BIGINT AS kill_c4,
       sum(CASE WHEN NOT bad THEN 1 ELSE 0 END)::BIGINT AS kill_badwords,
       sum(CASE WHEN NOT clf THEN 1 ELSE 0 END)::BIGINT AS kill_classifier,
       sum(CASE WHEN NOT mix THEN 1 ELSE 0 END)::BIGINT AS kill_mix
FROM verd
"""


QUERIES = {
    "training_pipeline_e2e": q_training_pipeline,
    "host_length_rank": q_host_length_rank,
    "curation_pipeline_e2e": q_curation_pipeline,
    "gate_funnel": q_gate_funnel,
}

ORACLE_SQL = {
    "training_pipeline_e2e": _oracle_training_pipeline(),
    "host_length_rank": _oracle_host_length_rank(),
    "curation_pipeline_e2e": _oracle_curation_pipeline(),
    "gate_funnel": _oracle_gate_funnel(),
}
