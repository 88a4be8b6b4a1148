"""Schema evolution + the inverse job — SURVEY.md §2 rows 13-14, 18.

Reference semantics being rebuilt:
  - ``create_OCR_notemodel`` clones the note schema and appends an ``OCR``
    field (/root/reference/src/anki_ocr/api.py:196-214) — ADD COLUMN;
  - ``create_orig_notemodel`` strips it back (api.py:216-223) — DROP COLUMN;
  - ``add_imgdata_to_note(method="new_field")`` merges per-image texts into
    the new field grouped per note (api.py:237-247) — MERGE on key;
  - ``remove_ocr_on_notes`` clears OCR data for a set of ids
    (ocr.py:263-273, api.py:160-194) — UPDATE ... SET NULL WHERE key IN (...).

With an Iceberg catalog these are literal `ALTER TABLE documents ADD/DROP
COLUMN` + `MERGE INTO` / row-level UPDATE — transactional, metadata-only
where possible. The sandbox has plain Parquet, so each operation is
expressed as the equivalent declarative plan + table rewrite; the plan
shapes (broadcast-able join on url, column projection) are what survive to
the Iceberg deployment unchanged.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


EXTRACT_COL = "extracted_text"


def add_extracted_column(
    documents: DataFrame, extracts: DataFrame, overwrite_existing: bool = True
) -> DataFrame:
    """ADD COLUMN + MERGE: attach per-url extracted text to the documents
    table (the "new_field" writeback, api.py:237-247).

    The extracts side is the small(er) output of the kernel keyed by url —
    a plain equi-join that AQE resolves to broadcast or sort-merge by size.
    ``overwrite_existing=False`` keeps pre-existing non-null extracts
    (config.md ``overwrite_existing`` analog).
    """
    right = extracts.select("url", F.col(EXTRACT_COL).alias("_new_extract"))
    joined = documents.join(right, "url", "left")
    if EXTRACT_COL in documents.columns and not overwrite_existing:
        merged = F.coalesce(F.col(EXTRACT_COL), F.col("_new_extract"))
    else:
        merged = F.col("_new_extract")
    out = joined.withColumn(EXTRACT_COL, merged).drop("_new_extract")
    # stable column order: original schema then the evolved column last,
    # like the reference appends the OCR field at the end (api.py:204-210)
    base = [c for c in documents.columns if c != EXTRACT_COL]
    return out.select(*base, EXTRACT_COL)


def evolve_with_config(documents: DataFrame, extracts: DataFrame, cfg) -> DataFrame:
    """ExtractConfig-driven writeback — consumes ``cfg.overwrite_existing``
    (the config.md knob end-to-end, not just the function parameter)."""
    return add_extracted_column(documents, extracts, cfg.overwrite_existing)


def drop_extracted_column(documents: DataFrame) -> DataFrame:
    """DROP COLUMN — schema devolution (create_orig_notemodel, api.py:216-223)."""
    return documents.drop(EXTRACT_COL)


def remove_extracts_for_urls(
    documents: DataFrame, urls=None
) -> DataFrame:
    """UPDATE ... SET extracted_text = NULL WHERE url IN (...) — the
    row-level inverse (remove_ocr_on_notes, ocr.py:263-273). ``urls=None``
    clears every row (full inverse); a small ``list`` inlines as an
    IN-list; a ``DataFrame`` of urls marks rows via a broadcast join —
    the only form that scales (r3 review: a 10^6-url Python list becomes
    10^6 literal children in the Catalyst expression tree, blowing up
    driver-side plan construction long before executor work starts)."""
    if EXTRACT_COL not in documents.columns:
        return documents
    if isinstance(urls, DataFrame):
        marked = (
            urls.select(F.col(urls.columns[0]).alias("url"))
            .distinct()
            .withColumn("__rm", F.lit(True))
        )
        return (
            documents.join(F.broadcast(marked), "url", "left")
            .withColumn(
                EXTRACT_COL,
                F.when(F.col("__rm"), F.lit(None).cast("string")).otherwise(
                    F.col(EXTRACT_COL)
                ),
            )
            .drop("__rm")
        )
    cond = F.lit(True) if urls is None else F.col("url").isin(urls)
    return documents.withColumn(
        EXTRACT_COL,
        F.when(cond, F.lit(None).cast("string")).otherwise(F.col(EXTRACT_COL)),
    )


def evolve_table(
    spark: SparkSession,
    documents_path: str,
    extracts_path: str,
    out_path: str,
    overwrite_existing: bool = True,
) -> None:
    """Job form: read documents + extracts, write the evolved table."""
    docs = spark.read.parquet(documents_path)
    extracts = spark.read.parquet(extracts_path)
    add_extracted_column(docs, extracts, overwrite_existing).write.mode(
        "overwrite"
    ).parquet(out_path)


def devolve_table(spark: SparkSession, documents_path: str, out_path: str) -> None:
    spark.read.parquet(documents_path).transform(drop_extracted_column).write.mode(
        "overwrite"
    ).parquet(out_path)
