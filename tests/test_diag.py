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


def test_aqe_splits_the_whale_join_partition(spark):
    """north_star clause check: AQE skew-join splitting actually engages
    on a whale key. A 95%-share host key joined sort-merge (broadcast
    disabled, thresholds lowered to fixture scale) must execute as
    SortMergeJoin(skew=true) with a skewed AQEShuffleRead — the runtime
    re-plan that keeps one oversized host from stalling the join stage at
    10^12 rows — and the split must not change the row count."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        fact = spark.range(200000).select(
            F.when(F.col("id") < 190000, F.lit("whale.example.com"))
            .otherwise(
                F.concat(F.lit("host"), (F.col("id") % 50).cast("string"))
            )
            .alias("host"),
            # md5 payload: incompressible, so the whale's shuffle partition
            # SIZE (what skew detection measures) tracks its row count
            F.concat(
                F.md5(F.col("id").cast("string")),
                F.md5((F.col("id") + 7).cast("string")),
            ).alias("payload"),
        )
        dim = spark.range(51).select(
            F.when(F.col("id") == 0, F.lit("whale.example.com"))
            .otherwise(
                F.concat(F.lit("host"), (F.col("id") - 1).cast("string"))
            )
            .alias("host"),
            F.col("id").alias("host_meta"),
        )
        j = fact.join(dim, "host")
        # execute THIS dataframe: the adaptive plan only finalizes (and
        # the skew split only appears) on the executed QueryExecution
        assert len(j.collect()) == 200000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
        assert "AQEShuffleRead coalesced and skewed" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
