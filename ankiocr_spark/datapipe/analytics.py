"""Event-stream analytics operators — windows, grouping sets, sampling.

The reference has NO sorts, limits, window functions, or grouping sets
(SURVEY.md §2.1); a crawl/training-data pipeline needs all of them for its
telemetry side (the ``events`` table: per-crawl fetch/extract events).
Each operator is expressed declaratively so Catalyst plans it (window
exchanges reuse partitioning where keys align), and each has an exact
DuckDB oracle.

Scale notes:
  - sessionize: two windows over the same (user_id) partitioning — ONE
    shuffle, reused (lag and running-sum share the partition key); state
    is per-row, not per-user, so no skew beyond a hot user's row count.
  - rollup: Spark expands grouping sets map-side; shuffle is the union of
    the grouping-set aggregates (3 levels here), still O(groups).
  - stratified sample: pure projection + filter — no shuffle at all; the
    hash is md5-derived so the oracle reproduces it (swap xxhash64 at
    production, same plan).
  - top-k per group: one window shuffle on the group key; k bounds the
    output per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .dedup import _md5int

SESSION_GAP_SEC = 1800
TOP_K = 3

#: per-stratum keep rates (%): rare strata oversampled — the usual
#: training-mix correction shape.
SAMPLE_RATES = {"purchase": 50, "signup": 50}
DEFAULT_RATE = 10


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's gap
    from the previous event exceeds SESSION_GAP_SEC. Two stacked windows
    over the same (user_id, ordered by ts/event_id) partitioning — the
    exchange is shared."""
    ev = _load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet lands ts as TIMESTAMP_NTZ; diff it WITHOUT a timezone:
    # timestampdiff against the NTZ epoch gives wall-clock micros, exactly
    # DuckDB's epoch_us(ntz). The previous cast-to-TIMESTAMP route read the
    # wall time in the (unpinned) session zone, so a gap spanning a DST
    # transition was off by the jump — verified 100 min wall → 40 min gap
    # under America/New_York (r3 review fix; 'same cast on both sides'
    # does NOT cancel across a discontinuity).
    ep = F.expr(
        "timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts)"
    )
    gap_us = ep - F.lag(ep).over(w)
    with_breaks = ev.withColumn(
        "is_new",
        F.when(gap_us.isNull() | (gap_us > SESSION_GAP_SEC * 1_000_000), 1)
        .otherwise(0),
    )
    with_sid = with_breaks.withColumn(
        "session_idx",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )
    return with_sid.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("started"),
        F.max("ts").alias("ended"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


ORACLE_SESSIONIZE = f"""
WITH g AS (
  SELECT user_id, event_id, ts, value,
         epoch_us(ts) - lag(epoch_us(ts))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events),
b AS (
  SELECT *, CASE WHEN gap_us IS NULL
                   OR gap_us > {SESSION_GAP_SEC} * 1000000
                 THEN 1 ELSE 0 END AS is_new
  FROM g),
s AS (
  SELECT *, (sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) - 1)::BIGINT
            AS session_idx
  FROM b)
SELECT user_id, session_idx, count(*) AS n_events,
       min(ts) AS started, max(ts) AS ended,
       round(sum(value), 4) AS total_value
FROM s GROUP BY user_id, session_idx
"""


def q_rollup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets aggregate: counts and value totals by
    (event_type, day), per-type subtotals, and the grand total in one
    pass (``ROLLUP``) — the telemetry dashboard query shape."""
    ev = _load_events(spark, sf_dir).withColumn(
        "d", F.to_date("ts").cast("string")
    )
    return (
        ev.rollup("event_type", "d")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("d", F.lit("ALL")).alias("d"),
            "n",
            "total_value",
        )
    )


ORACLE_ROLLUP = """
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(ts::date::varchar, 'ALL') AS d,
       count(*) AS n, round(sum(value), 4) AS total_value
FROM events GROUP BY ROLLUP (event_type, ts::date::varchar)
"""


def _rate_col():
    rate = F.lit(DEFAULT_RATE)
    for k, v in sorted(SAMPLE_RATES.items()):
        rate = F.when(F.col("event_type") == k, F.lit(v)).otherwise(rate)
    return rate


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff
    md5int(event_id) % 100 < rate(stratum), with rare strata kept at a
    higher rate (training-mix reweighting). Pure filter — zero shuffle,
    reproducible across runs/engines (no rand())."""
    ev = _load_events(spark, sf_dir)
    bucket = _md5int(F.col("event_id").cast("string")) % 100
    return ev.where(bucket < _rate_col()).select(
        "event_id", "event_type", "user_id"
    )


def _oracle_stratified() -> str:
    whens = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(SAMPLE_RATES.items())
    )
    return f"""
SELECT event_id, event_type, user_id FROM events
WHERE (('0x' || substr(md5(event_id::varchar), 1, 15))::bigint % 100)
      < (CASE event_type {whens} ELSE {DEFAULT_RATE} END)
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K events by value per event_type (ties broken by event_id for
    engine-independent ranks) — one window shuffle on the group key."""
    ev = _load_events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("event_type", "rank", "event_id", "value")
    )


ORACLE_TOPK = f"""
SELECT event_type, rank, event_id, value FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id ASC) AS rank
  FROM events)
WHERE rank <= {TOP_K}
"""


QUERIES = {
    "sessionize": q_sessionize,
    "rollup_report": q_rollup_report,
    "stratified_sample": q_stratified_sample,
    "topk_per_group": q_topk_per_group,
}

ORACLE_SQL = {
    "sessionize": ORACLE_SESSIONIZE,
    "rollup_report": ORACLE_ROLLUP,
    "stratified_sample": _oracle_stratified(),
    "topk_per_group": ORACLE_TOPK,
}
