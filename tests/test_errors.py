"""Typed errors, preflight validation, and cooperative cancellation
(SURVEY.md §2 rows 21 + 23; reference analogs in errors.py docstring)."""

import time

import pytest
from pyspark import InheritableThread

from ankiocr_spark.errors import (
    CancellableRun,
    JobCancelled,
    PreflightError,
    SchemaMismatchError,
    preflight,
)


def _pages(spark):
    return spark.createDataFrame(
        [("u1", b"<p>hello world</p>", "eng")],
        schema="url string, html binary, lang string",
    )


def test_preflight_ok(spark):
    facts = preflight(spark, _pages(spark))
    assert facts["pyspark"] and facts["pyarrow"] and facts["pandas"]
    assert facts["input_columns"] == ["html", "lang", "url"]


def test_preflight_missing_column(spark):
    bad = spark.createDataFrame([("u1",)], schema="url string")
    with pytest.raises(SchemaMismatchError, match="html"):
        preflight(spark, bad)


def test_preflight_wrong_type(spark):
    bad = spark.createDataFrame(
        [("u1", "<p>not bytes</p>")], schema="url string, html string"
    )
    with pytest.raises(SchemaMismatchError, match="binary"):
        preflight(spark, bad)


def test_preflight_enables_arrow(spark):
    """An externally built session (conf defaults to false in OSS Spark)
    must not be rejected — preflight sets the conversion conf itself
    (mapInPandas is Arrow-batched regardless; the conf only gates
    toPandas/createDataFrame)."""
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    try:
        preflight(spark)
        assert (
            spark.conf.get("spark.sql.execution.arrow.pyspark.enabled")
            == "true"
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")


def test_cancellable_run_cancels_promptly(spark):
    """A deliberately slow distributed action must abort as JobCancelled in
    a fraction of its natural runtime (reference analog: ocr.py:102-107,
    except no completed work is lost — see test_checkpoint.py for resume)."""

    def slow_batches(batches):
        import time as _t

        for pdf in batches:
            _t.sleep(0.5)
            yield pdf[["id"]]

    df = spark.range(0, 64, 1, 64)  # 64 partitions x 0.5s on local[4] ~ 8s
    plan = df.mapInPandas(slow_batches, "id long")

    run = CancellableRun(spark, "test-cancel-group")
    state = {}

    def target():
        try:
            run(lambda: plan.count())
            state["outcome"] = "completed"
        except JobCancelled:
            state["outcome"] = "cancelled"
        except Exception as exc:  # pragma: no cover
            state["outcome"] = f"other: {exc}"

    t0 = time.perf_counter()
    th = InheritableThread(target, session=spark)
    th.start()
    time.sleep(1.5)  # let a couple of task waves start
    run.cancel()
    th.join(timeout=30)
    elapsed = time.perf_counter() - t0

    assert state["outcome"] == "cancelled"
    assert elapsed < 6, f"cancel was not prompt ({elapsed:.1f}s)"
