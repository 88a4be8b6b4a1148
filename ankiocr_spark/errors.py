"""Typed job errors, environment preflight, and cooperative cancellation.

SURVEY.md §2 rows 21 + 23. The reference validates its environment before
launching (tesseract binary resolution + version/language discovery,
/root/reference/src/anki_ocr/ocr.py:275-296, pytesseract.py:284-337) and
raises typed errors (TesseractNotFoundError, TesseractError(status, msg),
pytesseract.py:53-65); it polls ``progress.want_cancel()`` between batches
and aborts with a RuntimeError, LOSING all work (ocr.py:102-107).

The rebuild's analogs:
  - ``preflight(spark, pages)``      — validate engine versions + input
    schema BEFORE any executor work; returns the version facts for run
    lineage (recorded next to the checkpoint ledger's kernel_version).
  - typed exceptions                 — PreflightError / SchemaMismatchError
    / JobCancelled instead of stringly RuntimeErrors.
  - ``CancellableRun``               — Spark-native cancellation via job
    groups (``sc.cancelJobGroup``); unlike the reference, cancelling loses
    only in-flight buckets — completed buckets survive in the checkpoint
    ledger and are skipped on resume (checkpoint.resumable_extract).
Per-row failures are NOT exceptions at all: the kernel quarantines them
into the ``error`` column (kernel.extract_record), replacing the
reference's log-and-skip (api.py:50-62).
"""

from __future__ import annotations

import threading
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


class ExtractJobError(Exception):
    """Base class for typed engine errors."""


class PreflightError(ExtractJobError):
    """Environment validation failed before any executor work started."""


class SchemaMismatchError(PreflightError):
    """Input table does not have the required (url, html) shape."""


class JobCancelled(ExtractJobError):
    """The run was cancelled via CancellableRun.cancel()."""


#: (column, required type prefix) — the input_hint contract. Extra columns
#: are fine (they are pruned by the kernel projection).
REQUIRED_COLUMNS = (("url", "string"), ("html", "binary"))

MIN_PYSPARK = (3, 5)


def preflight(spark: SparkSession, pages: Optional[DataFrame] = None) -> dict:
    """Validate engine + input before launching (fail fast, driver-side
    only — no executor work). Returns version facts for run lineage."""
    import pyspark

    facts: dict = {"pyspark": pyspark.__version__}
    parts = tuple(int(p) for p in pyspark.__version__.split(".")[:2])
    if parts < MIN_PYSPARK:
        raise PreflightError(
            f"pyspark {pyspark.__version__} < required "
            f"{'.'.join(map(str, MIN_PYSPARK))} (mapInPandas + Arrow "
            "large-var-types contract)"
        )
    try:
        import pyarrow
        import pandas
        facts["pyarrow"] = pyarrow.__version__
        facts["pandas"] = pandas.__version__
    except ImportError as exc:  # pragma: no cover - env is fixed in CI
        raise PreflightError(f"Arrow stack missing: {exc}") from exc

    # mapInPandas is Arrow-batched regardless of this conf (it only gates
    # toPandas/createDataFrame conversion), but engine entry points DO use
    # those conversions for ledger/fixture frames — set it rather than
    # reject externally built sessions where it defaults to false.
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")

    if pages is not None:
        typed = {f.name: f.dataType.simpleString() for f in pages.schema.fields}
        for col, want in REQUIRED_COLUMNS:
            if col not in typed:
                raise SchemaMismatchError(
                    f"input missing required column '{col}' "
                    f"(have: {sorted(typed)})"
                )
            if not typed[col].startswith(want):
                raise SchemaMismatchError(
                    f"column '{col}' is {typed[col]}, expected {want}"
                )
        facts["input_columns"] = sorted(typed)
    return facts


class CancellableRun:
    """Run a Spark action under a job group so it can be cancelled from
    another thread — the rebuild of the reference's between-batch
    ``want_cancel`` poll (ocr.py:102-107), except cancellation is
    immediate (Spark interrupts running tasks) and composes with the
    checkpoint ledger: completed buckets are never lost.

    The action thread MUST be a ``pyspark.InheritableThread`` — plain
    ``threading.Thread`` does not reliably map to a JVM thread carrying
    the job-group local property, so the cancel silently no-ops:

        run = CancellableRun(spark, "extract-2026-08-17")
        t = InheritableThread(lambda: run(lambda: df.count()), session=spark)
        t.start(); ...; run.cancel(); t.join()
    """

    def __init__(self, spark: SparkSession, group_id: str,
                 description: str = "ankiocr_spark extract"):
        self.spark = spark
        self.group_id = group_id
        self.description = description
        self._cancelled = threading.Event()

    def __call__(self, action):
        """Execute ``action()`` inside the job group; raise JobCancelled if
        cancel() was requested (Spark surfaces the kill as a Py4J error).

        The flag is ALSO checked at entry and after a successful action:
        ``cancelJobGroup`` only kills jobs that are already active, so a
        cancel() landing before the action submits its first Spark job (or
        between jobs) would otherwise silently no-op and the run would
        complete despite the request (r3 review fix)."""
        if self._cancelled.is_set():
            raise JobCancelled(self.group_id)
        sc = self.spark.sparkContext
        sc.setJobGroup(self.group_id, self.description,
                       interruptOnCancel=True)
        try:
            result = action()
        except Exception as exc:
            if self._cancelled.is_set():
                raise JobCancelled(self.group_id) from exc
            raise
        finally:
            sc.setJobGroup("", "")
        if self._cancelled.is_set():
            raise JobCancelled(self.group_id)
        return result

    def cancel(self) -> None:
        self._cancelled.set()
        self.spark.sparkContext.cancelJobGroup(self.group_id)
