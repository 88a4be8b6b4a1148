"""Skew diagnostics: counts and salt sizing against an independent
pure-Python recomputation, and the plan contract (one pruned scan)."""

from collections import Counter

import duckdb

from ankiocr_spark.diag import skew_report


def test_skew_report_matches_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = skew_report(docs, "source", top_n=5, target_share=0.01)

    truth = Counter(
        s for (s,) in duckdb.sql(
            f"SELECT source FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
    )
    n_rows = sum(truth.values())
    assert rep.n_rows == n_rows
    assert rep.n_keys == len(truth)
    expected_top = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(k, c) for k, c, _ in rep.top] == expected_top
    max_c = max(truth.values())
    assert rep.max_share == round(max_c / n_rows, 6)
    # salt contract: suggested salt caps the heaviest key at target_share,
    # and half of it would not (minimality), and it is a power of two
    assert max_c / rep.suggested_salt <= 0.01 * n_rows
    assert rep.suggested_salt == 1 or max_c / (rep.suggested_salt // 2) > 0.01 * n_rows
    assert rep.suggested_salt & (rep.suggested_salt - 1) == 0


def test_skew_report_flags_injected_whale(spark, sf_dir):
    """A synthetic 40%-share whale key must dominate the report and force
    a salt that flattens it below the target."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    whale = docs.withColumn(
        "host",
        F.when(F.col("doc_id") % 5 < 2, F.lit("whale.example.com")).otherwise(
            F.col("source")
        ),
    )
    rep = skew_report(whale, "host", top_n=3, target_share=0.01)
    assert rep.top[0][0] == "whale.example.com"
    assert rep.top[0][2] > 0.3
    assert rep.suggested_salt >= 32
    assert rep.max_skew_factor > 5


def test_skew_report_reads_only_the_key_column(spark, sf_dir):
    """The report must prune to the key column — a diagnostic that scans
    the html payload would cost a full-corpus read at 10^12 rows."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from pyspark.sql import functions as F

    counts = docs.groupBy("source").agg(F.count("*").alias("c"))
    plan = counts._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<source:string>" in plan
