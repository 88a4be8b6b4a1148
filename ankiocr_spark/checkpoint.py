"""Per-partition checkpoint ledger — resumable extraction with lineage.

The reference LOSES all work on cancel (/root/reference/src/anki_ocr/
ocr.py:102-107 raises RuntimeError mid-loop; nothing is saved until
col.save() at ocr.py:248-251). The north_rule requires the opposite:
"resumable from checkpoint with per-partition lineage + metrics".

Design: the unit of resume is the salt bucket (= output partition).
A run processes pending buckets in groups; after each group's output
commits (dynamic partition overwrite → idempotent), one ledger row per
bucket is appended:

    run_id, kernel_version, bucket, status, rows_in, rows_out,
    n_errors, n_empty, bytes_in, started, finished

On restart, completed buckets (same kernel_version) are anti-joined away
and only pending buckets recompute. A kernel change invalidates the ledger
(different kernel_version → full recompute), so stale extracts can never
survive a kernel upgrade — the lineage guarantee.

At 100 TB the ledger stays tiny (one row per bucket per run: 10^4-10^5
rows), the anti-join is a driver-side set difference (collected bucket
ids), and each group job reads only its buckets' files when the input is
partitioned/bucketed by the same key — partition-local resume.
"""

from __future__ import annotations

import datetime as _dt
import os
import uuid
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import ExtractConfig
from .job import run_extract
from .kernel import KERNEL_VERSION

LEDGER_SCHEMA = (
    "run_id string, kernel_version string, bucket int, status string, "
    "rows_in long, rows_out long, n_errors long, n_empty long, bytes_in long, "
    "started timestamp, finished timestamp"
)


def read_ledger(spark: SparkSession, ledger_dir: str) -> Optional[DataFrame]:
    try:
        return spark.read.parquet(ledger_dir)
    except Exception:
        return None  # first run — no ledger yet


def completed_buckets(spark: SparkSession, ledger_dir: str) -> List[int]:
    """Buckets already extracted by the CURRENT kernel version."""
    ledger = read_ledger(spark, ledger_dir)
    if ledger is None:
        return []
    rows = (
        ledger.where(
            (F.col("status") == "done")
            & (F.col("kernel_version") == KERNEL_VERSION)
        )
        .select("bucket")
        .distinct()
        .collect()
    )
    return sorted(r["bucket"] for r in rows)


def _append_ledger(spark: SparkSession, ledger_dir: str, rows: Sequence[tuple]) -> None:
    spark.createDataFrame(list(rows), LEDGER_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(ledger_dir)


def resumable_extract(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    cfg: Optional[ExtractConfig] = None,
    bucket_groups: int = 4,
    fail_after_groups: Optional[int] = None,
) -> dict:
    """Run (or resume) the extraction job with per-bucket checkpointing.

    ``fail_after_groups`` simulates a mid-run kill for tests (the analog of
    the reference's cancel path, ocr.py:104-105 — except here completed
    work survives). Returns a summary dict of this invocation.
    """
    cfg = cfg or ExtractConfig()
    ledger_dir = cfg.checkpoint_dir or os.path.join(output_path + "_ledger")
    run_id = uuid.uuid4().hex[:16]

    all_buckets = list(range(cfg.salt_buckets))
    done = set(completed_buckets(spark, ledger_dir))
    pending = [b for b in all_buckets if b not in done]

    pages = spark.read.parquet(input_path)
    pages = pages.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("url")), F.lit(cfg.salt_buckets)).cast("int")
    )

    groups: List[List[int]] = [
        pending[i::bucket_groups] for i in range(bucket_groups)
    ]
    groups = [g for g in groups if g]

    processed_groups = 0
    for group in groups:
        started = _dt.datetime.now()
        subset = pages.where(F.col("bucket").isin(group))
        in_stats = {
            r["bucket"]: (r["rows_in"], r["bytes_in"])
            for r in subset.groupBy("bucket")
            .agg(
                F.count("*").alias("rows_in"),
                F.coalesce(F.sum(F.length("html")), F.lit(0)).alias("bytes_in"),
            )
            .collect()
        }
        result = run_extract(spark, subset.drop("bucket"), cfg)
        # commit output first (compute-then-commit, CHANGELOG.md:83 analog):
        # the ledger row is written only after the partition data is durable.
        result.write.mode("overwrite").partitionBy("bucket").parquet(output_path)
        out_stats = {
            r["bucket"]: (r["rows_out"], r["n_errors"], r["n_empty"])
            for r in spark.read.parquet(output_path)
            .where(F.col("bucket").isin(group))
            .groupBy("bucket")
            .agg(
                F.count("*").alias("rows_out"),
                F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("n_errors"),
                F.sum(
                    F.when(F.col("extracted_text") == "", 1).otherwise(0)
                ).alias("n_empty"),
            )
            .collect()
        }
        finished = _dt.datetime.now()
        ledger_rows = []
        for b in group:
            rows_in, bytes_in = in_stats.get(b, (0, 0))
            rows_out, n_err, n_empty = out_stats.get(b, (0, 0, 0))
            ledger_rows.append(
                (run_id, KERNEL_VERSION, b, "done", rows_in, rows_out,
                 n_err, n_empty, bytes_in, started, finished)
            )
        _append_ledger(spark, ledger_dir, ledger_rows)
        processed_groups += 1
        if fail_after_groups is not None and processed_groups >= fail_after_groups:
            raise RuntimeError(
                f"simulated failure after {processed_groups} group(s)"
            )

    return {
        "run_id": run_id,
        "kernel_version": KERNEL_VERSION,
        "buckets_total": len(all_buckets),
        "buckets_skipped": len(done),
        "buckets_processed": len(pending),
        "ledger_dir": ledger_dir,
    }
