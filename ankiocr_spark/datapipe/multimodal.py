"""Multimodal binary-column plumbing.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata (the same shape as the pages table's ``html binary``). The
Spark-side machinery — schema, partitioning, Arrow batch shape, mapInPandas
signature — is real and tested; the actual media decode is STUBBED with a
deterministic fake (the decode libraries are not in this container), marked
by ``FAKE_DECODE = True``. Swapping the stub for a real decoder changes
nothing upstream of the UDF body.

``multimodal_meta`` (metadata over binary columns) is fully JVM-side and
oracle-checked; ``multimodal_features`` (the decode path) is mapInPandas
and gets the driver's rows-only check.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FAKE_DECODE = True  # no real image/audio libs in this container

FEATURE_DIM = 4


def _docs_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → a media-shaped table: (media_id, payload BINARY, kind)."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
    )


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column — byte length, content
    hash, magic-prefix — all JVM-side (no decode needed)."""
    media = _docs_as_media(spark, sf_dir)
    return media.select(
        "media_id",
        "kind",
        F.octet_length("payload").alias("byte_len"),
        F.md5("payload").alias("content_md5"),
        F.upper(F.substring(F.hex("payload"), 1, 8)).alias("magic_hex"),
    )


ORACLE_MULTIMODAL_META = """
SELECT doc_id AS media_id,
       ['image', 'audio', 'video'][(doc_id % 3 + 1)::int] AS kind,
       octet_length(encode(text)) AS byte_len,
       md5(text) AS content_md5,
       upper(substr(hex(encode(text)), 1, 8)) AS magic_hex
FROM documents
"""


def _fake_decode_features(payload: bytes) -> list:
    """Deterministic stand-in for image/audio decode + feature extraction.
    Replace with e.g. PIL/librosa in a real deployment; everything around
    this function (schema, batching, null handling) stays identical."""
    if not FAKE_DECODE:  # pragma: no cover
        raise NotImplementedError("real decoder not wired in this environment")
    n = len(payload)
    head = payload[:8]
    return [
        float(n),
        float(sum(head) % 997),
        float(payload[0]) if n else 0.0,
        float(payload[-1]) if n else 0.0,
    ]


FEATURES_SCHEMA = "media_id long, kind string, n_bytes long, features array<float>, error string"


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for mid, kind, payload in zip(
            pdf["media_id"].tolist(), pdf["kind"].tolist(), pdf["payload"].tolist()
        ):
            if payload is None:
                out.append((mid, kind, 0, None, "null_payload"))
                continue
            try:
                feats = _fake_decode_features(bytes(payload))
                out.append((mid, kind, len(payload), feats, None))
            except Exception as exc:
                out.append((mid, kind, len(payload), None, f"{type(exc).__name__}: {exc}"[:200]))
        yield pd.DataFrame(
            out, columns=["media_id", "kind", "n_bytes", "features", "error"]
        )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode/feature-extract path: Arrow-batched mapInPandas over the
    binary payload, same partition/batch shape as the HTML kernel. The
    decode itself is a deterministic stub (FAKE_DECODE)."""
    media = _docs_as_media(spark, sf_dir)
    return media.repartition(8, "media_id").mapInPandas(
        _feature_batches, FEATURES_SCHEMA
    )


QUERIES = {
    "multimodal_meta": q_multimodal_meta,
    "multimodal_features": q_multimodal_features,
}

ORACLE_SQL = {
    "multimodal_meta": ORACLE_MULTIMODAL_META,
    # multimodal_features: rows-only check (decode stub is not SQL-expressible)
}
