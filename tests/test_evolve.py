"""Schema evolution round-trips — mirrors the reference's
add-then-remove tests (/root/reference/tests/test_ocr.py:111-125)."""

import pytest
from pyspark.sql import functions as F

from ankiocr_spark.config import ExtractConfig
from ankiocr_spark.evolve import (
    add_extracted_column,
    drop_extracted_column,
    remove_extracts_for_urls,
    evolve_table,
    devolve_table,
)
from ankiocr_spark.fixtures import pages_and_goldens
from ankiocr_spark.job import run_extract

N = 200


@pytest.fixture(scope="module")
def docs_and_extracts(spark):
    pages, _ = pages_and_goldens(spark, N, seed=42)
    extracts = run_extract(spark, pages, ExtractConfig(salt_buckets=4)).cache()
    return pages.cache(), extracts


def test_add_then_drop_roundtrip(spark, docs_and_extracts):
    docs, extracts = docs_and_extracts
    evolved = add_extracted_column(docs, extracts)
    assert evolved.columns == docs.columns + ["extracted_text"]
    assert evolved.count() == N
    restored = drop_extracted_column(evolved)
    assert restored.columns == docs.columns
    assert restored.exceptAll(docs).count() == 0
    assert docs.exceptAll(restored).count() == 0


def test_merge_semantics_overwrite_flag(spark, docs_and_extracts):
    docs, extracts = docs_and_extracts
    evolved = add_extracted_column(docs, extracts)
    # second evolution with overwrite_existing=False keeps existing non-null
    # extracts; only rows whose current extract is NULL take the new value
    # (the config.md overwrite_existing analog: fill missing, don't clobber)
    fake = extracts.withColumn("extracted_text", F.lit("SHOULD_NOT_APPEAR"))
    kept = add_extracted_column(evolved, fake, overwrite_existing=False)
    n_null_before = evolved.where(F.col("extracted_text").isNull()).count()
    assert (
        kept.where(F.col("extracted_text") == "SHOULD_NOT_APPEAR").count()
        == n_null_before
    )
    # with overwrite_existing=True the new values win
    replaced = add_extracted_column(evolved, fake, overwrite_existing=True)
    assert (
        replaced.where(F.col("extracted_text") == "SHOULD_NOT_APPEAR").count()
        == N
    )


def test_remove_for_urls(spark, docs_and_extracts):
    docs, extracts = docs_and_extracts
    evolved = add_extracted_column(docs, extracts).cache()
    some_urls = [r["url"] for r in evolved.limit(10).collect()]
    cleared = remove_extracts_for_urls(evolved, some_urls)
    assert (
        cleared.where(F.col("url").isin(some_urls) & F.col("extracted_text").isNotNull()).count()
        == 0
    )
    untouched = cleared.where(~F.col("url").isin(some_urls) & F.col("extracted_text").isNull())
    baseline_nulls = evolved.where(~F.col("url").isin(some_urls) & F.col("extracted_text").isNull())
    assert untouched.count() == baseline_nulls.count()
    # full inverse
    all_cleared = remove_extracts_for_urls(evolved, None)
    assert all_cleared.where(F.col("extracted_text").isNotNull()).count() == 0
    # DataFrame form (the scalable broadcast-join path, r3 review): same
    # result as the IN-list, no giant literal expression tree
    urls_df = spark.createDataFrame([(u,) for u in some_urls], "url string")
    cleared_df = remove_extracts_for_urls(evolved, urls_df)
    a = sorted(map(tuple, cleared.select("url", "extracted_text").collect()))
    b = sorted(map(tuple, cleared_df.select("url", "extracted_text").collect()))
    assert a == b


def test_evolve_devolve_jobs(spark, tmp_path, docs_and_extracts):
    docs, extracts = docs_and_extracts
    d_docs, d_ext = str(tmp_path / "docs"), str(tmp_path / "ext")
    d_v2, d_v3 = str(tmp_path / "v2"), str(tmp_path / "v3")
    docs.write.parquet(d_docs)
    extracts.write.parquet(d_ext)
    evolve_table(spark, d_docs, d_ext, d_v2)
    v2 = spark.read.parquet(d_v2)
    assert "extracted_text" in v2.columns and v2.count() == N
    devolve_table(spark, d_v2, d_v3)
    v3 = spark.read.parquet(d_v3)
    assert "extracted_text" not in v3.columns
    assert v3.count() == N
