"""Bucketed (co-located) tables: shuffle-free joins on the bucket key.

At 100 TB the extract table is joined repeatedly on ``url`` (rejoin of
metadata, MERGE of re-crawls, dedup verdict application). Hash-bucketing
both sides ON WRITE makes every such join shuffle-free: Spark's bucketed
scan exposes the bucket hash-partitioning, so SortMergeJoin runs with ZERO
Exchange operators (asserted by tests/test_bucketing.py against the
physical plan). This is the plain-Spark analog of Iceberg's
``bucket(N, url)`` partition transform the north_star targets, and the
write-side complement of the job's post-kernel ``bucket`` column.

The reference has no analog (single SQLite file); this is pure Spark
machinery required by the scale target (SURVEY.md §2.1 last paragraph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    key: str,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-ordered) table.
    Sorting by the key lets SortMergeJoin skip its sort too."""
    writer = (
        df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planned with no
    Exchange when both sides share bucket count and key."""
    return spark.table(left_table).join(spark.table(right_table), key)


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the executed plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        line.strip().lstrip("+-*( 0123456789)").startswith("Exchange")
        for line in plan.splitlines()
    )
