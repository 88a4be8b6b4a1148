"""Structured extraction from page markup — head metadata and HTML tables.

Main-content text (the flagship kernel) is only half of what an
extraction tier ships at 100 TB: real pipelines also pull the page's
*structured* signals — ``<title>``, ``<meta name="description">``, the
canonical link — and tabular data (``<table>`` rows) for structured-data
mining. Both are regular-shaped regions of the markup, so they extract
with pure-codegen string/regex expressions fused into the scan: no
Python, no shuffle, no kernel invocation.

Pages are synthesized in-flight (deterministically from the
``documents`` table, same discipline as ``ops.docs_as_pages``) with a
richer head/table template than the flagship wrap, so the extraction is
value-oracled end-to-end without touching the flagship goldens.

Reference analog: AnkiOCR stores structured per-note results alongside
the raw text — the tooltip/span writeback (`api.py:28-47`) and the
per-note field metadata its tests assert on (`tests/test_ocr.py:46-60`);
here the structured face of a page is extracted relationally instead.

Scale notes:
  - page_metadata: encode→decode→3 regexp_extract, all whole-stage
    codegen in ONE projection over the scan; zero Exchange. At 10^12
    pages this is scan-bound — exactly what you want.
  - html_tables: one Generate (posexplode of the ``</tr>`` split, ~3 rows
    out per page) on top of the same codegen projection; zero Exchange.
    The row multiplier is bounded by rows-per-table, not corpus size.
  - Real crawl HTML is messier than any regex — the production kernel
    path (`kernel.py`) owns arbitrary markup; these operators own the
    regular-markup fast path (sitemaps, schema.org tables, templated
    pages) where a scan-fused extraction avoids the Python stage
    entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ops import URL_PREFIX, doc_url, load

#: characters stripped when text is embedded into attribute/element
#: context — the usual escape-on-write discipline, folded to a strip so
#: the extraction regexes below stay exact inverses of the template.
_STRIP_CLASS = '["<>&]'

_TITLE_WORDS = 4
_DESC_CHARS = 120
_TABLE_TOKENS = 3


def _meta_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (url, html BINARY) with a metadata-rich head and one
    3-row token table in the body. NULL-text rows are excluded up front
    (no page is synthesized for them — `test_null_text_rows_are_excluded`
    pins the row count), and every text fragment embedded in the template
    passes through the ``_STRIP_CLASS`` escape-on-write strip so the
    extraction regexes stay exact inverses of the template even for
    corpora whose text contains markup characters."""
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    toks = F.split(F.col("text"), " ")
    body = F.regexp_replace(F.col("text"), _STRIP_CLASS, "")
    title = F.regexp_replace(
        F.array_join(F.slice(toks, 1, _TITLE_WORDS), " "), _STRIP_CLASS, ""
    )
    desc = F.regexp_replace(
        F.substring("text", 1, _DESC_CHARS), _STRIP_CLASS, ""
    )
    tr = F.concat(
        *[
            F.concat(
                F.lit("<tr><td>"),
                F.col("doc_id").cast("string"),
                F.lit("</td><td>"),
                F.col("lang"),
                F.lit("</td><td>"),
                F.regexp_replace(
                    F.coalesce(F.element_at(toks, i + 1), F.lit("")),
                    _STRIP_CLASS,
                    "",
                ),
                F.lit("</td></tr>"),
            )
            for i in range(_TABLE_TOKENS)
        ]
    )
    html = F.concat(
        F.lit("<html><head><title>"),
        title,
        F.lit(' | example.org</title><meta name="description" content="'),
        desc,
        F.lit('"><link rel="canonical" href="'),
        doc_url(F.col("doc_id")),
        F.lit('"></head><body><h1>'),
        title,
        F.lit("</h1><p>"),
        body,
        F.lit("</p><table>"),
        tr,
        F.lit("</table></body></html>"),
    )
    return docs.select(
        doc_url(F.col("doc_id")).alias("url"),
        F.encode(html, "utf-8").alias("html"),
    )


def q_page_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-metadata extraction: title / meta description / canonical url
    from the binary html column, via three scan-fused regexes (decode →
    regexp_extract ×3 in one codegen projection; `.explain` shows zero
    Exchange). The canonical-vs-fetched-url equality bit is the dedup
    signal CDX pipelines key on before any content hash is computed."""
    pages = _meta_pages(spark, sf_dir)
    s = F.decode(F.col("html"), "utf-8")
    canonical = F.regexp_extract(s, '<link rel="canonical" href="([^"]*)"', 1)
    return pages.select(
        "url",
        F.regexp_extract(s, "<title>([^<]*)</title>", 1).alias("title"),
        F.regexp_extract(
            s, '<meta name="description" content="([^"]*)"', 1
        ).alias("meta_description"),
        canonical.alias("canonical_url"),
        (canonical == F.col("url")).cast("int").alias("is_canonical"),
    )


def q_html_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML table extraction: the body's ``<table>`` region split on
    ``</tr>`` and posexploded into one output row per table row —
    (url, row_idx, row_text, n_cells). One Generate over a codegen
    projection, zero Exchange; the multiplier is rows-per-table (3 here),
    never corpus-shaped. Cell markup collapses to a single-space-joined
    row_text (strip tags → squeeze spaces → trim), the usual relational
    landing shape for schema.org / wikitable mining."""
    pages = _meta_pages(spark, sf_dir)
    s = F.decode(F.col("html"), "utf-8")
    tbl = F.regexp_extract(s, "<table>(.*)</table>", 1)
    parts = F.filter(F.split(tbl, "</tr>"), lambda x: x != F.lit(""))
    exploded = pages.select(
        "url", F.posexplode(parts).alias("row_idx", "part")
    )
    row_text = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("part"), "<[^>]+>", " "), " +", " "
        )
    )
    n_cells = (
        (F.length("part") - F.length(F.replace(F.col("part"), F.lit("<td>"))))
        / F.lit(4)
    ).cast("int")
    return exploded.select(
        "url",
        F.col("row_idx").cast("int").alias("row_idx"),
        row_text.alias("row_text"),
        n_cells.alias("n_cells"),
    )


#: the oracle rebuilds the same template inline (CTE ``pages``), then
#: runs the same regex inverses DuckDB-side — template and extraction are
#: exercised end-to-end, not template-vs-itself.
_ORACLE_PAGES = f"""
pages AS (
  SELECT '{URL_PREFIX}' || doc_id AS url,
         '<html><head><title>'
         || regexp_replace(array_to_string(list_slice(str_split(text, ' '), 1, {_TITLE_WORDS}), ' '), '{_STRIP_CLASS}', '', 'g')
         || ' | example.org</title><meta name="description" content="'
         || regexp_replace(substr(text, 1, {_DESC_CHARS}), '{_STRIP_CLASS}', '', 'g')
         || '"><link rel="canonical" href="' || '{URL_PREFIX}' || doc_id
         || '"></head><body><h1>'
         || regexp_replace(array_to_string(list_slice(str_split(text, ' '), 1, {_TITLE_WORDS}), ' '), '{_STRIP_CLASS}', '', 'g')
         || '</h1><p>' || regexp_replace(text, '{_STRIP_CLASS}', '', 'g') || '</p><table>'
         || '<tr><td>' || doc_id || '</td><td>' || lang || '</td><td>' || regexp_replace(coalesce(str_split(text, ' ')[1], ''), '{_STRIP_CLASS}', '', 'g') || '</td></tr>'
         || '<tr><td>' || doc_id || '</td><td>' || lang || '</td><td>' || regexp_replace(coalesce(str_split(text, ' ')[2], ''), '{_STRIP_CLASS}', '', 'g') || '</td></tr>'
         || '<tr><td>' || doc_id || '</td><td>' || lang || '</td><td>' || regexp_replace(coalesce(str_split(text, ' ')[3], ''), '{_STRIP_CLASS}', '', 'g') || '</td></tr>'
         || '</table></body></html>' AS html
  FROM documents WHERE text IS NOT NULL)
"""

ORACLE_PAGE_METADATA = f"""
WITH {_ORACLE_PAGES}
SELECT url,
       regexp_extract(html, '<title>([^<]*)</title>', 1) AS title,
       regexp_extract(html, '<meta name="description" content="([^"]*)"', 1)
         AS meta_description,
       regexp_extract(html, '<link rel="canonical" href="([^"]*)"', 1)
         AS canonical_url,
       CASE WHEN regexp_extract(html, '<link rel="canonical" href="([^"]*)"', 1)
                 = url THEN 1 ELSE 0 END AS is_canonical
FROM pages
"""

ORACLE_HTML_TABLES = f"""
WITH {_ORACLE_PAGES},
rows_ AS (
  SELECT url,
         list_filter(str_split(regexp_extract(html, '<table>(.*)</table>', 1),
                               '</tr>'), x -> x <> '') AS parts
  FROM pages),
exploded AS (
  SELECT url,
         unnest(list_transform(range(len(parts)),
                i -> struct_pack(row_idx := CAST(i AS INT),
                                 part := parts[i + 1]))) AS e
  FROM rows_)
SELECT url, e.row_idx AS row_idx,
       trim(regexp_replace(regexp_replace(e.part, '<[^>]+>', ' ', 'g'),
                           ' +', ' ', 'g')) AS row_text,
       CAST((length(e.part) - length(replace(e.part, '<td>', ''))) / 4 AS INT)
         AS n_cells
FROM exploded
"""

QUERIES = {
    "page_metadata": q_page_metadata,
    "html_tables": q_html_tables,
}

ORACLE_SQL = {
    "page_metadata": ORACLE_PAGE_METADATA,
    "html_tables": ORACLE_HTML_TABLES,
}
