"""Skew diagnostics: the pre-flight a 100-TB job runs BEFORE picking its
partitioning (salt buckets, AQE skew thresholds, broadcast decisions).

The north rule demands explicit skew handling; `job.salted` and the BENCH
skew ablation are the *mechanisms*, and this module is the *measurement*
that sizes them: which keys are heavy, how heavy, and what salt factor
flattens them. At 10^12 rows the report itself must be cheap — it is one
map-side-combined aggregation over the key column only (ReadSchema prunes
everything else) with a top-N heap collect, never a sort of the corpus.

Reference analog: AnkiOCR sizes its worker pool once from `num_threads`
(`ocr.py:62-74`) with no data-dependent balancing; this is the
data-dependent sizing step a distributed engine needs instead.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class SkewReport:
    """Heavy-hitter summary for one candidate partition/group key."""

    n_rows: int
    n_keys: int
    top: list  # [(key, count, share)] descending, length <= requested N
    max_share: float
    #: rows of the heaviest key divided by the mean key size — how many
    #: times larger than average the worst partition-group would be
    max_skew_factor: float
    #: smallest power-of-two salt that caps the heaviest key's expected
    #: per-partition share at `target_share` of total rows
    suggested_salt: int


def skew_report(
    df: DataFrame, key: str, top_n: int = 10, target_share: float = 0.01
) -> SkewReport:
    """Measure key skew for a prospective groupBy/join/repartition on
    ``key``. One aggregation (map-side partials shrink every executor's
    contribution to its distinct-key count), one TakeOrdered top-N, and
    a 1-row global fold — the corpus is scanned once, key column only.

    ``suggested_salt`` answers the operational question directly: the
    smallest power of two ``s`` such that the heaviest key divided by
    ``s`` is at or below ``target_share`` of the table. Feed it to
    ``ExtractConfig.salt_buckets`` / ``job.salted`` (clamped by caller
    policy; 1 means no salting needed)."""
    counts = df.groupBy(key).agg(F.count("*").alias("c"))
    totals = counts.agg(
        F.sum("c").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("c").alias("max_c"),
    ).first()
    n_rows, n_keys, max_c = (
        int(totals["n_rows"] or 0),
        int(totals["n_keys"]),
        int(totals["max_c"] or 0),
    )
    if n_rows == 0:
        return SkewReport(0, 0, [], 0.0, 0.0, 1)
    top_rows = counts.orderBy(F.col("c").desc(), F.col(key).asc()).limit(top_n)
    top = [
        (r[key], int(r["c"]), round(int(r["c"]) / n_rows, 6))
        for r in top_rows.collect()
    ]
    mean = n_rows / n_keys
    salt = 1
    while max_c / salt > target_share * n_rows:
        salt *= 2
    return SkewReport(
        n_rows=n_rows,
        n_keys=n_keys,
        top=top,
        max_share=round(max_c / n_rows, 6),
        max_skew_factor=round(max_c / mean, 3),
        suggested_salt=salt,
    )
