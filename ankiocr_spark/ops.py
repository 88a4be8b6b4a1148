"""SURVEY.md §2 operator inventory as DuckDB-checkable queries.

Each entry is one operator row from the inventory, expressed Spark-first
(declarative DataFrame ops; Catalyst does pushdown/pruning/join selection)
over the driver-provided tables at /root/testdata/sf*. The paired ORACLE_SQL
is ANSI SQL for DuckDB over the same parquet views; column names/aliases
match exactly (driver hashes values after sorting columns by name).

The flagship query wraps `documents.text` into a deterministic HTML page
IN-FLIGHT (no external data) and runs the real extraction kernel over the
binary column — so the correctness gate exercises the actual mapInPandas
hot path, with a closed-form oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import ExtractConfig
from .job import run_extract

# --- deterministic in-flight HTML wrap (flagship input) --------------------

H1_TEXT = "Synthetic Document Page"

WRAP_PREFIX = (
    '<html><head><style>x{}</style><script>var junk=1;</script></head><body>'
    '<nav><ul><li><a href="/">home</a></li><li><a href="/about">about</a></li></ul></nav>'
    f"<h1>{H1_TEXT}</h1><p>"
)
WRAP_SUFFIX = (
    '</p><div class="farm"><a href="/a">alpha beta</a> <a href="/b">gamma delta</a>'
    ' <a href="/c">epsilon zeta</a></div>'
    "<footer><p>copyright notice</p></footer></body></html>"
)

URL_PREFIX = "https://example.org/doc/"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def wrap_html(text_col) -> "F.Column":
    """The ONE definition of the page wrap as a binary column — every
    fixture-building query (flagship, WARC dump, merge delta, streaming
    dumps) must encode through here so the wrap template cannot drift from
    the oracles generated off the same constants (r3 review fix)."""
    return F.encode(
        F.concat(F.lit(WRAP_PREFIX), text_col, F.lit(WRAP_SUFFIX)), "utf-8"
    )


def doc_url(doc_id_col) -> "F.Column":
    return F.concat(F.lit(URL_PREFIX), doc_id_col.cast("string"))


def docs_as_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents(doc_id, text, lang, ...) → pages(url, html BINARY, lang):
    the input_hint shape synthesized in-flight, deterministically."""
    return load(spark, sf_dir, "documents").select(
        doc_url(F.col("doc_id")).alias("url"),
        wrap_html(F.col("text")).alias("html"),
        F.col("lang"),
    )


# --- §2 row 9/12: the flagship fused kernel ---------------------------------

def q_flagship_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = docs_as_pages(spark, sf_dir)
    out = run_extract(spark, pages, ExtractConfig(salt_buckets=8))
    return out.select("url", "extracted_text").orderBy("url")


def extract_case_sql(text_expr: str = "text") -> str:
    """The kernel's closed form on a wrapped page as one shared SQL CASE,
    NULL-SAFE: NULL text wraps to NULL html, which the kernel quarantines
    with extracted_text = NULL (r3 review fix — the previous per-site CASE
    copies fell through to the ELSE branch on NULL, emitting the H1; latent
    only because no shipped sf table has NULL text)."""
    return (
        f"CASE WHEN {text_expr} IS NULL THEN NULL "
        f"WHEN length(trim({text_expr})) >= 25 "
        f"THEN '{H1_TEXT}' || chr(10) || trim({text_expr}) "
        f"ELSE '{H1_TEXT}' END"
    )


#: kernel spec on the wrapped page: nav/script/style/footer pruned, link-farm
#: dropped by link density, h1 + body paragraph kept (paragraph only if it
#: clears MIN_TEXT_CHARS=25).
ORACLE_FLAGSHIP = f"""
SELECT '{URL_PREFIX}' || doc_id AS url,
       {extract_case_sql()} AS extracted_text
FROM documents ORDER BY url
"""


# --- §2 row 15: span-level output (the "tooltip" writeback analog) ----------

def q_extract_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span mode over the wrapped pages: one row per scored block
    (api.py:230-236 writeback recast as block records). The wrapped page
    has a closed-form block structure — h1 (kept heading), the body
    paragraph (kept iff >= MIN_TEXT_CHARS, absent iff empty), and the
    link-farm div (density-dropped but still reported) — so the oracle
    enumerates the exact rows."""
    pages = docs_as_pages(spark, sf_dir)
    out = run_extract(
        spark, pages, ExtractConfig(output_mode="spans", salt_buckets=8)
    )
    return out.select(
        "url", "block_id", "tag", "text", "n_chars", "link_density", "kept"
    )


#: farm-div constants: text 35 chars, anchor text 33 → density 33/35
_FARM_TEXT = "alpha beta gamma delta epsilon zeta"
_FARM_DENSITY = 0.942857

ORACLE_EXTRACT_SPANS = f"""
WITH d AS (
  SELECT '{URL_PREFIX}' || doc_id AS url, trim(text) AS t
  FROM documents WHERE text IS NOT NULL)
SELECT url, 0 AS block_id, 'h1' AS tag,
       '{H1_TEXT}' AS text, {len(H1_TEXT)} AS n_chars,
       0.0::DOUBLE AS link_density, true AS kept
FROM d
UNION ALL
SELECT url, 1, 'p', t, length(t), 0.0::DOUBLE, length(t) >= 25
FROM d WHERE length(t) > 0
UNION ALL
SELECT url, CASE WHEN length(t) > 0 THEN 2 ELSE 1 END, 'div',
       '{_FARM_TEXT}', {len(_FARM_TEXT)}, {_FARM_DENSITY}::DOUBLE, false
FROM d
"""


# --- §2 rows 1-2: source scan + id-list semi-join ---------------------------

def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    # full-table scan with projection (the `select * from notes` id-list,
    # scripts/run_ocr.py:19) — Catalyst prunes the parquet ReadSchema.
    return load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")


def q_semi_join_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NotesQuery(col, note_ids) analog (api.py:252-268): select rows whose
    # key is in a query-provided id set — left-semi join, broadcast by AQE.
    docs = load(spark, sf_dir, "documents")
    ids = docs.select("doc_id").where(F.col("doc_id") % 17 == 0)
    return (
        docs.join(ids.hint("broadcast"), "doc_id", "left_semi")
        .select("doc_id", "lang", "n_chars")
    )


# --- §2 rows 5-6: whitelist + validity filters ------------------------------

def q_filter_whitelist(spark: SparkSession, sf_dir: str) -> DataFrame:
    # format-whitelist filter (api.py:39,64) recast over events.event_type
    ev = load(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_type").isin("click", "view", "purchase"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )


def q_validity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # existence/validity predicates before the kernel (api.py:50-62):
    # non-null, non-empty, sane length
    docs = load(spark, sf_dir, "documents")
    return docs.where(
        F.col("text").isNotNull()
        & (F.length("text") > 0)
        & (F.col("n_chars") == F.length("text"))
        & (F.col("n_chars") >= 100)
    ).select("doc_id", "n_chars")


# --- §2 rows 4/7: explode / unnest ------------------------------------------

def q_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    # notes→fields→images flatten (ocr.py:192-199) as explode of parsed
    # children; here: document → token rows → frequency table
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )


# --- skew-safe aggregation: two-phase count-distinct -------------------------

def q_count_distinct_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-doc count per token via the two-phase decomposition:
    dedup on the composite key first, THEN count per token. The naive
    ``collect_set(doc_id)`` materializes a hot token's entire posting list
    in one task (OOM at 10^12 docs); the decomposition keeps every stage a
    streaming hash aggregate with map-side partials — the standard
    hot-key-safe shape (AQE balances the residual partition skew)."""
    docs = load(spark, sf_dir, "documents")
    pairs = (
        docs.select(F.explode(F.split("text", " ")).alias("token"), "doc_id")
        .where(F.col("token") != "")
        .distinct()  # phase 1: composite-key dedup (partial agg map-side)
    )
    return (
        pairs.groupBy("token")
        .agg(F.count("*").alias("n_docs"))  # phase 2: count per token
        .where(F.col("n_docs") >= 5)
    )


ORACLE_COUNT_DISTINCT = """
WITH pairs AS (
  SELECT DISTINCT doc_id, unnest(str_split(text, ' ')) AS token
  FROM documents)
SELECT token, count(*) AS n_docs
FROM pairs WHERE token <> '' GROUP BY token HAVING count(*) >= 5
"""


# --- §2 row 10: positional split + rejoin ------------------------------------

def q_positional_rejoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the batch-result split + positional zip (ocr.py:151-161): posexplode,
    # keep first 5 positions, positional re-join via ordered re-aggregation
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    ).where(F.col("pos") < 5)
    return (
        tok.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "token"))),
                    lambda s: s["token"],
                ),
                " ",
            ).alias("first5")
        )
    )


# --- §2 row 11: key-lookup rejoin (broadcast hash join) ----------------------

def q_broadcast_rejoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dict-lookup rejoin of results to work items (ocr.py:163-173) → join
    # against a small per-key dim, explicitly broadcast
    docs = load(spark, sf_dir, "documents")
    dim = docs.groupBy("lang").agg(F.count("*").alias("lang_total"))
    return (
        docs.join(F.broadcast(dim), "lang")
        .select("doc_id", "lang", "lang_total")
    )


# --- §2 row 16: group-by string aggregation ("new_field" writeback) ----------

def q_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-note concat of per-image texts (api.py:237-247): deterministic
    # order by key, newline→<br/> analog separator
    docs = load(spark, sf_dir, "documents")
    snip = docs.select(
        "lang",
        "doc_id",
        F.concat(
            F.lit("Doc: "), F.col("doc_id").cast("string"), F.lit("\n"),
            F.lit("-" * 20), F.lit("\n"), F.substring("text", 1, 40)
        ).alias("snippet"),
    )
    return snip.groupBy("lang").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "snippet"))),
                lambda s: F.replace(s["snippet"], F.lit("\n"), F.lit("<br/>")),
            ),
            "<br/>",
        ).alias("ocr_field")
    )


# --- §2 row 17: skip-empties filter on results --------------------------------

def q_filter_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    # `if ocr_img.text != ""` (api.py:244) over real kernel output
    pages = docs_as_pages(spark, sf_dir)
    out = run_extract(spark, pages, ExtractConfig(salt_buckets=8))
    return (
        out.where(
            F.col("extracted_text").isNotNull() & (F.col("extracted_text") != "")
        )
        .select("url", F.length("extracted_text").alias("extract_len"))
    )


# --- §2 rows 13-14: schema evolution / devolution -----------------------------

def q_schema_evolution_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ADD COLUMN (create_OCR_notemodel, api.py:196-214): append the computed
    # column after the existing schema
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "text", "lang", "source", "n_chars"
    ).withColumn(
        "extracted_text",
        F.concat(F.lit(H1_TEXT), F.lit("\n"), F.trim("text")),
    ).select("doc_id", "lang", "extracted_text")


def q_schema_devolution_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DROP COLUMN (create_orig_notemodel, api.py:216-223)
    docs = load(spark, sf_dir, "documents")
    evolved = docs.withColumn("extracted_text", F.lit("x"))
    return evolved.drop("extracted_text", "source", "n_chars")


def q_evolve_keep_existing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """overwrite_existing=False end-to-end (config.md knob → ExtractConfig →
    evolve.evolve_with_config): rows with a pre-existing extract keep it;
    nulls fill from real kernel output. The reference behavior: skip notes
    whose OCR field is already populated."""
    from .evolve import evolve_with_config

    pages = docs_as_pages(spark, sf_dir)
    out = run_extract(spark, pages, ExtractConfig(salt_buckets=8))
    docs = load(spark, sf_dir, "documents").select(
        doc_url(F.col("doc_id")).alias("url"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("OLD:"), F.col("doc_id").cast("string")),
        ).alias("extracted_text"),
    )
    cfg = ExtractConfig(overwrite_existing=False)
    return evolve_with_config(docs, out.select("url", "extracted_text"), cfg)


ORACLE_EVOLVE_KEEP = f"""
SELECT '{URL_PREFIX}' || doc_id AS url,
       coalesce(CASE WHEN doc_id % 3 = 0 THEN 'OLD:' || doc_id END,
                {extract_case_sql()}) AS extracted_text
FROM documents
"""


def q_extract_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extra_passthrough_cols end-to-end: ``lang`` rides the kernel's Arrow
    batch and re-attaches positionally — no post-kernel join needed to
    recover input metadata (the zero-join form of the broadcast rejoin)."""
    pages = docs_as_pages(spark, sf_dir)
    out = run_extract(
        spark,
        pages,
        ExtractConfig(salt_buckets=8, extra_passthrough_cols=["lang"]),
    )
    return out.select("url", "extracted_text", "lang")


ORACLE_EXTRACT_PASSTHROUGH = f"""
SELECT '{URL_PREFIX}' || doc_id AS url,
       {extract_case_sql()} AS extracted_text,
       lang
FROM documents
"""


# --- §2 row 12: the scalar cleaner as a relational expression -----------------

def q_clean_text_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    # clean_ocr_text (ocr.py:141-149) in pure Spark SQL, applied to a
    # newline-shaped derivation of text (space→newline), so line-strip,
    # blank-drop and colon-collapse all execute
    docs = load(spark, sf_dir, "documents")
    nl_text = F.concat(
        F.lit("  head::line  \n\n"),
        F.replace(F.col("text"), F.lit(" "), F.lit("\n")),
        F.lit("\n:::\n"),
    )
    cleaned = F.regexp_replace(
        F.array_join(
            F.filter(
                F.transform(F.split(nl_text, "\n"), lambda x: F.trim(x)),
                lambda x: x != "",
            ),
            "\n",
        ),
        ":+",
        ":",
    )
    return docs.select("doc_id", cleaned.alias("cleaned"))


# --- §2 row 18: inverse job (remove extracted data) ---------------------------

def q_remove_extracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # UPDATE ... SET NULL WHERE key IN (...) (remove_ocr_on_notes,
    # ocr.py:263-273) applied to real kernel output
    pages = docs_as_pages(spark, sf_dir)
    out = run_extract(spark, pages, ExtractConfig(salt_buckets=8))
    return out.select(
        "url",
        F.when(
            F.substring("url", len(URL_PREFIX) + 1, 100).cast("long") % 7 == 0,
            F.lit(None).cast("string"),
        )
        .otherwise(F.col("extracted_text"))
        .alias("extracted_text"),
    )


# --- §2 rows 6/23: quarantine report (error-class counts) --------------------

def q_error_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counts per error class over REAL kernel output — the observability
    face of the failed-row quarantine (SURVEY.md §2 row 23: typed error
    column instead of the reference's log-and-skip, api.py:50-62). At scale
    this query is the job's health dashboard: a spike in one class flags a
    bad crawl segment without failing the run."""
    pages = docs_as_pages(spark, sf_dir)
    out = run_extract(spark, pages, ExtractConfig(salt_buckets=8))
    return (
        out.groupBy(F.coalesce("error", F.lit("ok")).alias("error_class"))
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.when(F.col("extracted_text").isNotNull(), 1).otherwise(0)
                  ).alias("n_with_text"),
        )
    )


# docs_as_pages: html is NULL exactly when documents.text is NULL (concat
# with null -> null), so the kernel quarantines those as 'null_html'.
ORACLE_ERROR_REPORT = """
SELECT CASE WHEN text IS NULL THEN 'null_html' ELSE 'ok' END AS error_class,
       count(*) AS n_pages,
       sum(CASE WHEN text IS NULL THEN 0 ELSE 1 END)::BIGINT AS n_with_text
FROM documents
GROUP BY CASE WHEN text IS NULL THEN 'null_html' ELSE 'ok' END
"""


# --- §2 row 20: metrics / counters readout ------------------------------------

def q_run_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-run progress metrics (ocr.py:84-109, gui.py:70-76) as a stats query
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("docs_done"),
        F.sum("n_chars").alias("chars_total"),
        F.round(F.avg("n_chars"), 4).alias("chars_per_doc"),
    )


QUERIES = {
    "flagship_extract": q_flagship_extract,
    "extract_spans": q_extract_spans,
    "scan_project": q_scan_project,
    "semi_join_ids": q_semi_join_ids,
    "filter_whitelist": q_filter_whitelist,
    "validity_filter": q_validity_filter,
    "explode_tokens": q_explode_tokens,
    "count_distinct_twophase": q_count_distinct_twophase,
    "error_report": q_error_report,
    "positional_rejoin": q_positional_rejoin,
    "broadcast_rejoin": q_broadcast_rejoin,
    "group_concat": q_group_concat,
    "filter_empty": q_filter_empty,
    "schema_evolution_add": q_schema_evolution_add,
    "schema_devolution_drop": q_schema_devolution_drop,
    "evolve_keep_existing": q_evolve_keep_existing,
    "extract_passthrough": q_extract_passthrough,
    "clean_text_sql": q_clean_text_sql,
    "remove_extracts": q_remove_extracts,
    "run_metrics": q_run_metrics,
}

ORACLE_SQL = {
    "flagship_extract": ORACLE_FLAGSHIP,
    "extract_spans": ORACLE_EXTRACT_SPANS,
    "scan_project": "SELECT doc_id, lang, n_chars FROM documents",
    "semi_join_ids": (
        "SELECT doc_id, lang, n_chars FROM documents "
        "WHERE doc_id IN (SELECT doc_id FROM documents WHERE doc_id % 17 = 0)"
    ),
    "filter_whitelist": (
        "SELECT event_type, count(*) AS n, round(sum(value), 4) AS total_value "
        "FROM events WHERE event_type IN ('click','view','purchase') "
        "GROUP BY event_type"
    ),
    "validity_filter": (
        "SELECT doc_id, n_chars FROM documents "
        "WHERE text IS NOT NULL AND length(text) > 0 "
        "AND n_chars = length(text) AND n_chars >= 100"
    ),
    "explode_tokens": (
        "SELECT token, count(*) AS cnt FROM ("
        "  SELECT unnest(str_split(text, ' ')) AS token FROM documents"
        ") WHERE token <> '' GROUP BY token"
    ),
    "count_distinct_twophase": ORACLE_COUNT_DISTINCT,
    "error_report": ORACLE_ERROR_REPORT,
    "positional_rejoin": (
        "SELECT doc_id, "
        "array_to_string(list_slice(str_split(text, ' '), 1, 5), ' ') AS first5 "
        "FROM documents"
    ),
    "broadcast_rejoin": (
        "SELECT d.doc_id, d.lang, s.lang_total FROM documents d "
        "JOIN (SELECT lang, count(*) AS lang_total FROM documents GROUP BY lang) s "
        "USING (lang)"
    ),
    "group_concat": (
        "SELECT lang, string_agg("
        "  replace('Doc: ' || doc_id || chr(10) || repeat('-', 20) || chr(10) "
        "          || substr(text, 1, 40), chr(10), '<br/>'), "
        "  '<br/>' ORDER BY doc_id) AS ocr_field "
        "FROM documents GROUP BY lang"
    ),
    "filter_empty": (
        # WHERE text IS NOT NULL: null docs quarantine with NULL
        # extracted_text, which the Spark side's != '' filter drops
        f"SELECT '{URL_PREFIX}' || doc_id AS url, "
        f"length({extract_case_sql()}) AS extract_len "
        "FROM documents WHERE text IS NOT NULL"
    ),
    "schema_evolution_add": (
        f"SELECT doc_id, lang, '{H1_TEXT}' || chr(10) || trim(text) AS extracted_text "
        "FROM documents"
    ),
    "schema_devolution_drop": "SELECT doc_id, text, lang FROM documents",
    "evolve_keep_existing": ORACLE_EVOLVE_KEEP,
    "extract_passthrough": ORACLE_EXTRACT_PASSTHROUGH,
    "clean_text_sql": (
        "SELECT doc_id, regexp_replace(array_to_string(list_filter(list_transform("
        "  str_split('  head::line  ' || chr(10) || chr(10) || "
        "            replace(text, ' ', chr(10)) || chr(10) || ':::' || chr(10), "
        "            chr(10)), x -> trim(x)), x -> x <> ''), chr(10)), "
        "  ':+', ':', 'g') AS cleaned "
        "FROM documents"
    ),
    "remove_extracts": (
        f"SELECT '{URL_PREFIX}' || doc_id AS url, "
        f"CASE WHEN doc_id % 7 = 0 THEN NULL "
        f"     ELSE {extract_case_sql()} END AS extracted_text "
        "FROM documents"
    ),
    "run_metrics": (
        "SELECT lang, count(*) AS docs_done, sum(n_chars)::BIGINT AS chars_total, "
        "round(avg(n_chars), 4) AS chars_per_doc FROM documents GROUP BY lang"
    ),
}
