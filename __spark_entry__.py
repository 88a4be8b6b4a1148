"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship main-content extraction over the
sf0.001 documents table (wrapped deterministically into the input_hint
page shape); ``queries()``/``oracle_sql()`` expose the full operator
inventory (SURVEY.md §2 + the training-data pipeline ops) with DuckDB
oracles at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ankiocr_spark import bucketing, checkpoint, links, ops, pdftext, streaming, warc  # noqa: E402
from ankiocr_spark.datapipe import (  # noqa: E402
    analytics, dedup, multimodal, relational, similarity, textstats,
)
from ankiocr_spark.session import ensure_workers_can_import  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: wrap documents into
    (url, html BINARY) pages and run the fused extraction kernel."""
    ensure_workers_can_import(spark)
    return ops.q_flagship_extract(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (ops, pdftext, warc, links, streaming, bucketing, checkpoint,
                dedup, similarity, textstats, multimodal, analytics, relational):
        for name, fn in mod.QUERIES.items():
            def wrapped(spark, sf_dir, _fn=fn):
                ensure_workers_can_import(spark)
                return _fn(spark, sf_dir)
            out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in (ops, pdftext, warc, links, streaming, bucketing, checkpoint,
                dedup, similarity, textstats, multimodal, analytics, relational):
        out.update(mod.ORACLE_SQL)
    return out
