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
  - lang_mismatch: same zero-Exchange scan-fused shape as page_metadata.
  - canonical_collapse: ONE partial-aggregatable hash exchange on the
    canonical key (count/min/sum all map-side combined).
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
#: canonical-link fan-in: every _CANON_GROUP consecutive doc ids share one
#: canonical target (print/AMP/tracking variants of the same page), so the
#: canonical-collapse group shape is non-trivial and value-oracled.
_CANON_GROUP = 3
#: every _LANG_NOISE_MOD-th page declares a wrong html@lang — the ~10% of
#: real crawl pages whose lang attribute disagrees with detected language.
_LANG_NOISE_MOD = 7
_LANG_NOISE = "zxx"  # ISO 639-2: "no linguistic content"


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
    html_lang = F.when(
        F.pmod(F.col("doc_id"), _LANG_NOISE_MOD) == 0, F.lit(_LANG_NOISE)
    ).otherwise(F.col("lang"))
    canon_url = doc_url(F.col("doc_id") - F.pmod(F.col("doc_id"), _CANON_GROUP))
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
        F.lit('<html lang="'),
        html_lang,
        F.lit('"><head><title>'),
        title,
        F.lit(' | example.org</title><meta name="description" content="'),
        desc,
        F.lit('"><link rel="canonical" href="'),
        canon_url,
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
        F.col("lang").alias("corpus_lang"),
    )


def q_page_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-metadata extraction: title / meta description / canonical url
    from the binary html column, via three scan-fused regexes (decode →
    regexp_extract ×3 in one codegen projection; `.explain` shows zero
    Exchange). The canonical-vs-fetched-url equality bit is the dedup
    signal CDX pipelines key on before any content hash is computed —
    pages synthesize with _CANON_GROUP-way canonical fan-in, so
    ``is_canonical`` is 1 only for group leaders."""
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


def q_canonical_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-url collapse — THE pre-content-hash dedup CDX pipelines
    run: group fetched urls by their declared canonical target, count the
    variants, and pick a deterministic representative. Upstream of any
    MinHash/SimHash stage this removes the print/AMP/tracking-parameter
    copies for the cost of one partial-aggregatable exchange on the
    canonical key.

    Scale shape: the head extraction stays scan-fused (zero Exchange, see
    `q_page_metadata`); the collapse is ONE hash exchange with map-side
    combine (count / min / sum all partial-agg). Canonical keys follow
    host skew, which the corpus-level salting story (`diag.skew_report`)
    already owns; group fan-in is page-variant-shaped (small constant),
    never corpus-shaped.

    Reference analog: AnkiOCR keys OCR results per note id and collapses
    repeated media to one result row (`ocr.py:60-78` batching by note);
    here the 'same underlying page' key is the canonical link. The
    per-url canonical bits are a PROJECTION of `q_page_metadata`'s output
    (review find: a second copy of the canonical regex here could drift
    from the per-page metadata it aggregates); Catalyst's column pruning
    drops the title/description regexes from this lineage."""
    per_url = q_page_metadata(spark, sf_dir).select(
        "url",
        "canonical_url",
        F.col("is_canonical").alias("is_self"),
    )
    return per_url.groupBy("canonical_url").agg(
        F.count("*").cast("bigint").alias("n_urls"),
        F.min("url").alias("rep_url"),
        F.sum("is_self").cast("bigint").alias("n_self"),
    )


def q_lang_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-vs-detected language audit: extract the ``<html lang>``
    attribute and compare it to the corpus' detected language column —
    the standard crawl-quality signal (≈10% of real pages declare a wrong
    or empty lang attribute; curation pipelines trust the detector and
    use the disagreement rate to monitor template drift).

    Scale shape: one scan-fused codegen projection (decode →
    regexp_extract → comparison), zero Exchange — the same
    scan-bound-at-10^12-pages verdict as `q_page_metadata`.

    Reference analog: AnkiOCR validates its configured OCR languages
    against what the engine actually supports before running
    (`ocr.py:93-103` tesseract lang check); here the per-page declared
    language is audited against the detected one."""
    pages = _meta_pages(spark, sf_dir)
    s = F.decode(F.col("html"), "utf-8")
    html_lang = F.regexp_extract(s, '<html lang="([^"]*)"', 1)
    return pages.select(
        "url",
        html_lang.alias("html_lang"),
        F.col("corpus_lang"),
        (html_lang == F.col("corpus_lang")).cast("int").alias("is_match"),
    )


#: charset synthesis schedule (pmod(doc_id, 3)): 0 → UTF-8 with BOM and a
#: meta declaration, 1 → meta-declared legacy charset (the bytes are
#: ASCII-range, so the synthesized blob stays valid UTF-8 for both
#: engines' decoders), 2 → no BOM, no declaration (the fetch layer's
#: "sniff or default" case). Real crawls carry all three shapes.
_CS_LEGACY = "iso-8859-1"
_BOM_CHAR = "\ufeff"  # UTF-8-encodes to EF BB BF — the byte-level BOM


def q_charset_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset sniffing over the binary html column — the decision the
    fetch/extract boundary makes before ANY text operator can run on a
    real crawl: byte-level BOM detection (hex of the 3-byte prefix, so
    the projection never doubles the page bytes) plus the meta-declared
    charset, resolved to a verdict (BOM wins; then the declaration; then
    the unknown→default-utf-8 fallback).

    Scale shape: one codegen projection fused into the scan (substring →
    hex → starts_with, decode → regexp_extract), zero Exchange,
    plan-asserted. At 10^12 pages this runs at scan speed, exactly like
    `q_page_metadata`.

    Reference analog: AnkiOCR probes its Tesseract install for the
    available language packs before dispatching OCR (`ocr.py:93-103`);
    charset resolution is the same pre-flight the web-extraction kernel
    needs per page."""
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    v = F.pmod(F.col("doc_id"), 3)
    meta = (
        F.when(v == 0, F.lit('<meta charset="utf-8">'))
        .when(v == 1, F.lit(f'<meta charset="{_CS_LEGACY}">'))
        .otherwise(F.lit(""))
    )
    page = F.concat(
        F.when(v == 0, F.lit(_BOM_CHAR)).otherwise(F.lit("")),
        F.lit("<html><head>"),
        meta,
        F.lit("</head><body><p>"),
        F.regexp_replace(F.col("text"), _STRIP_CLASS, ""),
        F.lit("</p></body></html>"),
    )
    pages = docs.select(
        doc_url(F.col("doc_id")).alias("url"),
        F.encode(page, "utf-8").alias("html"),
    )
    has_bom = F.startswith(
        F.hex(F.substring(F.col("html"), 1, 3)), F.lit("EFBBBF")
    )
    declared = F.regexp_extract(
        F.decode(F.col("html"), "utf-8"), '<meta charset="([^"]*)"', 1
    )
    return pages.select(
        "url",
        declared.alias("declared_charset"),
        F.when(has_bom, F.lit("utf-8-bom"))
        .otherwise(F.coalesce(F.nullif(declared, F.lit("")), F.lit("unknown")))
        .alias("detected_charset"),
        has_bom.cast("int").alias("has_bom"),
    )


#: the oracle rebuilds the same template inline (CTE ``pages``), then
#: runs the same regex inverses DuckDB-side — template and extraction are
#: exercised end-to-end, not template-vs-itself.
_ORACLE_PAGES = f"""
pages AS (
  SELECT '{URL_PREFIX}' || doc_id AS url, lang AS corpus_lang,
         '<html lang="'
         || CASE WHEN ((doc_id % {_LANG_NOISE_MOD} + {_LANG_NOISE_MOD}) % {_LANG_NOISE_MOD}) = 0
                 THEN '{_LANG_NOISE}' ELSE lang END
         || '"><head><title>'
         || regexp_replace(array_to_string(list_slice(str_split(text, ' '), 1, {_TITLE_WORDS}), ' '), '{_STRIP_CLASS}', '', 'g')
         || ' | example.org</title><meta name="description" content="'
         || regexp_replace(substr(text, 1, {_DESC_CHARS}), '{_STRIP_CLASS}', '', 'g')
         || '"><link rel="canonical" href="' || '{URL_PREFIX}'
         || (doc_id - ((doc_id % {_CANON_GROUP} + {_CANON_GROUP}) % {_CANON_GROUP}))
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

ORACLE_CANONICAL_COLLAPSE = f"""
WITH {_ORACLE_PAGES},
per_url AS (
  SELECT url,
         regexp_extract(html, '<link rel="canonical" href="([^"]*)"', 1)
           AS canonical_url
  FROM pages)
SELECT canonical_url,
       count(*)::BIGINT AS n_urls,
       min(url) AS rep_url,
       sum(CASE WHEN canonical_url = url THEN 1 ELSE 0 END)::BIGINT AS n_self
FROM per_url GROUP BY canonical_url
"""

ORACLE_LANG_MISMATCH = f"""
WITH {_ORACLE_PAGES}
SELECT url,
       regexp_extract(html, '<html lang="([^"]*)"', 1) AS html_lang,
       corpus_lang,
       CASE WHEN regexp_extract(html, '<html lang="([^"]*)"', 1) = corpus_lang
            THEN 1 ELSE 0 END AS is_match
FROM pages
"""

ORACLE_CHARSET_SNIFF = f"""
WITH pages AS (
  SELECT '{URL_PREFIX}' || doc_id AS url,
         encode(
           CASE WHEN ((doc_id % 3 + 3) % 3) = 0 THEN chr(65279) ELSE '' END
           || '<html><head>'
           || CASE WHEN ((doc_id % 3 + 3) % 3) = 0 THEN '<meta charset="utf-8">'
                   WHEN ((doc_id % 3 + 3) % 3) = 1 THEN '<meta charset="{_CS_LEGACY}">'
                   ELSE '' END
           || '</head><body><p>'
           || regexp_replace(text, '{_STRIP_CLASS}', '', 'g')
           || '</p></body></html>') AS html
  FROM documents WHERE text IS NOT NULL),
sniffed AS (
  SELECT url,
         starts_with(hex(html), 'EFBBBF') AS has_bom,
         regexp_extract(decode(html), '<meta charset="([^"]*)"', 1) AS declared
  FROM pages)
SELECT url,
       declared AS declared_charset,
       CASE WHEN has_bom THEN 'utf-8-bom'
            ELSE coalesce(nullif(declared, ''), 'unknown') END
         AS detected_charset,
       CASE WHEN has_bom THEN 1 ELSE 0 END AS has_bom
FROM sniffed
"""

QUERIES = {
    "page_metadata": q_page_metadata,
    "html_tables": q_html_tables,
    "canonical_collapse": q_canonical_collapse,
    "lang_mismatch": q_lang_mismatch,
    "charset_sniff": q_charset_sniff,
}

ORACLE_SQL = {
    "page_metadata": ORACLE_PAGE_METADATA,
    "html_tables": ORACLE_HTML_TABLES,
    "canonical_collapse": ORACLE_CANONICAL_COLLAPSE,
    "lang_mismatch": ORACLE_LANG_MISMATCH,
    "charset_sniff": ORACLE_CHARSET_SNIFF,
}
