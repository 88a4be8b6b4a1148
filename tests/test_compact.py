"""Compaction: many small appended files → files_per_bucket, rows exact."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from ankiocr_spark.compact import compact_bucketed, _count_data_files
from ankiocr_spark.config import ExtractConfig
from ankiocr_spark.fixtures import gen_rows
from ankiocr_spark.streaming import run_stream_extract_available_now

CFG = ExtractConfig(salt_buckets=4, batch_rows=64)


def _dump(input_dir, name, n, start, seed):
    os.makedirs(input_dir, exist_ok=True)
    rows = list(gen_rows(n, seed=seed, start=start))
    pq.write_table(pa.table({
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
        "html": pa.array([r["html"] for r in rows], pa.binary()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
    }), os.path.join(input_dir, name))


def test_compaction_consolidates_streaming_output(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    raw_out = str(tmp_path / "raw")
    ckpt = str(tmp_path / "ck")
    compacted = str(tmp_path / "compacted")

    # three triggers -> three appended file sets per touched bucket
    for i in range(3):
        _dump(input_dir, f"d{i}.parquet", 40, start=i * 1000, seed=7 + i)
        run_stream_extract_available_now(spark, input_dir, raw_out, ckpt, CFG)

    before = _count_data_files(spark, raw_out)
    assert before > CFG.salt_buckets  # genuinely fragmented

    summary = compact_bucketed(spark, raw_out, compacted)
    assert summary["rows"] == 120
    assert summary["files_after"] <= CFG.salt_buckets < before

    a = sorted(map(tuple, spark.read.parquet(raw_out)
                   .select("url", "extracted_text", "error").collect()))
    b = sorted(map(tuple, spark.read.parquet(compacted)
                   .select("url", "extracted_text", "error").collect()))
    assert a == b
