"""Multimodal binary-column plumbing.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata (the same shape as the pages table's ``html binary``). The
Spark-side machinery — schema, partitioning, Arrow batch shape, mapInPandas
signature — is real and tested; the actual media decode is STUBBED with a
deterministic fake (the decode libraries are not in this container), marked
by ``FAKE_DECODE = True``. Swapping the stub for a real decoder changes
nothing upstream of the UDF body.

``multimodal_meta`` (metadata over binary columns) is fully JVM-side;
``multimodal_features`` (the decode path) is mapInPandas with scalar
feature columns. Every query here is full-value oracle-checked — the fake
decode is deliberately SQL-expressible so even the UDF path gets a real
value check, not rows-only.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FAKE_DECODE = True  # no real image/audio libs in this container


def _docs_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → a media-shaped table: (media_id, payload BINARY, kind)."""
    from ankiocr_spark.ops import load

    return load(spark, sf_dir, "documents").select(
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


# Feature vector flattened to scalar f0..f3 columns: the driver's pandas
# canonicalizer cannot hash array<float> cells (round-1 CORRECTNESS err
# "unhashable type: 'list'"), and scalar doubles also make the query fully
# DuckDB-expressible — a real value oracle instead of rows-only. Library
# consumers wanting the vector shape: F.array("f0","f1","f2","f3").
FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes long, "
    "f0 double, f1 double, f2 double, f3 double, error string"
)


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for mid, kind, payload in zip(
            pdf["media_id"].tolist(), pdf["kind"].tolist(), pdf["payload"].tolist()
        ):
            if payload is None:
                out.append((mid, kind, 0, None, None, None, None, "null_payload"))
                continue
            try:
                feats = _fake_decode_features(bytes(payload))
                out.append((mid, kind, len(payload), *feats, None))
            except Exception as exc:
                out.append((mid, kind, len(payload), None, None, None, None,
                            f"{type(exc).__name__}: {exc}"[:200]))
        yield pd.DataFrame(
            out,
            columns=["media_id", "kind", "n_bytes", "f0", "f1", "f2", "f3",
                     "error"],
        )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode/feature-extract path: Arrow-batched mapInPandas over the
    binary payload, same MAP-ONLY shape as the HTML kernel (no pre-kernel
    payload shuffle — the r3 review caught a hard-coded repartition(8)
    that both shuffled every payload byte and capped the expensive decode
    stage at 8 tasks regardless of cluster width; input splits parallelize
    the scan naturally, exactly like job.run_extract's default path). The
    decode itself is a deterministic stub (FAKE_DECODE)."""
    media = _docs_as_media(spark, sf_dir)
    return media.mapInPandas(_feature_batches, FEATURES_SCHEMA)


# Full-value oracle for the fake decode (/root/reference/tests/test_ocr.py:46-60
# is the per-item kernel contract this mirrors): over the ASCII corpus the
# byte features are char features — f0=length, f1=sum(first 8 bytes)%997,
# f2/f3=first/last byte. Same ASCII note as ORACLE_MULTIMODAL_RESIZE.
ORACLE_MULTIMODAL_FEATURES = """
WITH media AS (
  SELECT doc_id AS media_id,
         ['image', 'audio', 'video'][(doc_id % 3 + 1)::int] AS kind,
         text AS payload
  FROM documents),
head AS (
  SELECT media_id, sum(ord(substr(payload, i::int, 1))) AS head_sum
  FROM media, generate_series(1, 8) AS g(i)
  WHERE i <= length(payload)
  GROUP BY media_id)
SELECT m.media_id, m.kind,
       CASE WHEN m.payload IS NULL THEN 0
            ELSE length(m.payload) END::BIGINT AS n_bytes,
       CASE WHEN m.payload IS NULL THEN NULL
            ELSE length(m.payload)::double END AS f0,
       CASE WHEN m.payload IS NULL THEN NULL
            ELSE (coalesce(h.head_sum, 0) % 997)::double END AS f1,
       CASE WHEN m.payload IS NULL THEN NULL
            WHEN length(m.payload) = 0 THEN 0.0
            ELSE ord(substr(m.payload, 1, 1))::double END AS f2,
       CASE WHEN m.payload IS NULL THEN NULL
            WHEN length(m.payload) = 0 THEN 0.0
            ELSE ord(substr(m.payload, -1, 1))::double END AS f3,
       CASE WHEN m.payload IS NULL THEN 'null_payload' END AS error
FROM media m LEFT JOIN head h USING (media_id)
"""


# --- resize (deterministic fake: byte-downsample) ---------------------------

RESIZE_NUM, RESIZE_DEN = 1, 2  # "resize to 1/2" = keep the first ceil(n/2) bytes

RESIZE_SCHEMA = (
    "media_id long, kind string, orig_bytes long, resized_bytes long, "
    "resized_md5 string"
)


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    for pdf in batches:
        out = []
        for mid, kind, payload in zip(
            pdf["media_id"].tolist(), pdf["kind"].tolist(), pdf["payload"].tolist()
        ):
            raw = bytes(payload)
            k = -(-len(raw) * RESIZE_NUM // RESIZE_DEN)  # ceil
            resized = raw[:k]
            out.append((mid, kind, len(raw), len(resized),
                        hashlib.md5(resized).hexdigest()))
        yield pd.DataFrame(
            out,
            columns=["media_id", "kind", "orig_bytes", "resized_bytes",
                     "resized_md5"],
        )


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: Arrow-batched byte transform of the payload. The
    deterministic fake keeps a byte prefix (a real resize swaps only the
    UDF body); the oracle reproduces the output bytes via blob substr, so
    this path gets a FULL value check, not rows-only."""
    media = _docs_as_media(spark, sf_dir).where(F.col("payload").isNotNull())
    return media.mapInPandas(_resize_batches, RESIZE_SCHEMA)


# NOTE: this DuckDB build has no BLOB substring/md5, so the oracle slices
# the VARCHAR — byte-identical to the Spark-side byte slice because the
# corpus is pure ASCII (asserted: octet_length(encode(text)) == length(text)
# for every row at every sf).
ORACLE_MULTIMODAL_RESIZE = f"""
SELECT doc_id AS media_id,
       ['image', 'audio', 'video'][(doc_id % 3 + 1)::int] AS kind,
       length(text) AS orig_bytes,
       length(substr(text, 1,
           ceil(length(text) * {RESIZE_NUM} / {RESIZE_DEN})::int)) AS resized_bytes,
       md5(substr(text, 1,
           ceil(length(text) * {RESIZE_NUM} / {RESIZE_DEN})::int)) AS resized_md5
FROM documents WHERE text IS NOT NULL
"""


# --- frame sampling (video payloads) -----------------------------------------

FRAME_BYTES = 32   # fixed-size byte window = one "frame" of the fake codec
SAMPLE_EVERY = 4   # keep every 4th frame
#: hard cap on frames read per payload — part of the OPERATOR CONTRACT,
#: enforced on BOTH the Spark side and the oracle's series bound (r3
#: review: the cap was oracle-only, so a corpus with a >32 KiB payload
#: would have produced a false engine-mismatch). The bound is also the
#: scale guard: one corrupt multi-GB "video" can emit at most MAX_FRAMES
#: rows, not millions.
MAX_FRAMES = 1024

FRAMES_SCHEMA = "media_id long, frame_idx int, frame_bytes int, frame_md5 string"


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    for pdf in batches:
        out = []
        for mid, payload in zip(
            pdf["media_id"].tolist(), pdf["payload"].tolist()
        ):
            raw = bytes(payload)
            n_frames = min(-(-len(raw) // FRAME_BYTES), MAX_FRAMES)
            for idx in range(0, n_frames, SAMPLE_EVERY):
                frame = raw[idx * FRAME_BYTES:(idx + 1) * FRAME_BYTES]
                out.append((mid, idx, len(frame),
                            hashlib.md5(frame).hexdigest()))
        yield pd.DataFrame(
            out, columns=["media_id", "frame_idx", "frame_bytes", "frame_md5"]
        )


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample plumbing over 'video' payloads: one output row per
    sampled fixed-size byte window (a real decoder swaps the windowing for
    codec frame extraction; schema, explode shape, and batching are the
    production shape). Full value oracle via blob substr."""
    media = (
        _docs_as_media(spark, sf_dir)
        .where((F.col("kind") == "video") & F.col("payload").isNotNull())
        .select("media_id", "payload")
    )
    return media.mapInPandas(_frame_batches, FRAMES_SCHEMA)


# Same ASCII equivalence note as ORACLE_MULTIMODAL_RESIZE.
ORACLE_MULTIMODAL_FRAMES = f"""
WITH media AS (
  SELECT doc_id AS media_id, text AS payload
  FROM documents
  WHERE ['image', 'audio', 'video'][(doc_id % 3 + 1)::int] = 'video'
    AND text IS NOT NULL),
frames AS (
  -- DuckDB's generate_series takes only constants (no lateral column, no
  -- subquery); MAX_FRAMES is the shared operator contract, enforced on
  -- the Spark side too, so the series bound is exact — not a corpus
  -- assumption
  SELECT media_id, idx AS frame_idx,
         substr(payload, (idx * {FRAME_BYTES} + 1)::int, {FRAME_BYTES}) AS frame
  FROM media, generate_series(0, {MAX_FRAMES - 1}) AS g(idx)
  WHERE idx * {FRAME_BYTES} < length(payload)
    AND idx % {SAMPLE_EVERY} = 0)
SELECT media_id, frame_idx::int AS frame_idx,
       length(frame)::int AS frame_bytes, md5(frame) AS frame_md5
FROM frames
"""


QUERIES = {
    "multimodal_meta": q_multimodal_meta,
    "multimodal_features": q_multimodal_features,
    "multimodal_resize": q_multimodal_resize,
    "multimodal_frame_sample": q_multimodal_frame_sample,
}

ORACLE_SQL = {
    "multimodal_meta": ORACLE_MULTIMODAL_META,
    "multimodal_features": ORACLE_MULTIMODAL_FEATURES,
    "multimodal_resize": ORACLE_MULTIMODAL_RESIZE,
    "multimodal_frame_sample": ORACLE_MULTIMODAL_FRAMES,
}
