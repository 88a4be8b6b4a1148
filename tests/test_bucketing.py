"""Bucketed co-located joins: result parity with the plain join AND a
physical-plan assertion that the bucket-key join has zero shuffles."""

import pytest
from pyspark.sql import functions as F

from ankiocr_spark.bucketing import colocated_join, count_exchanges, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    left = docs.select("doc_id", "lang", "n_chars")
    right = docs.select("doc_id", F.length("text").alias("text_len"))
    write_bucketed(left, "b_left", 4, "doc_id")
    write_bucketed(right, "b_right", 4, "doc_id")
    yield "b_left", "b_right"
    spark.sql("DROP TABLE IF EXISTS b_left")
    spark.sql("DROP TABLE IF EXISTS b_right")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # force SortMergeJoin so the Exchange question is meaningful
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, lt, rt, "doc_id")
        assert count_exchanges(joined) == 0, (
            joined._jdf.queryExecution().executedPlan().toString()[:2000]
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plain = (
        docs.select("doc_id", "lang", "n_chars")
        .join(docs.select("doc_id", F.length("text").alias("text_len")), "doc_id")
    )
    bucketed = colocated_join(spark, lt, rt, "doc_id")
    a = sorted(map(tuple, bucketed.collect()))
    b = sorted(map(tuple, plain.collect()))
    assert a == b and len(a) == docs.count()


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        joined = docs.select("doc_id", "lang").join(
            docs.select("doc_id", "n_chars"), "doc_id"
        )
        # at least one shuffle (the second side shows as ReusedExchange
        # since both scans read the same parquet)
        assert count_exchanges(joined) >= 1
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
