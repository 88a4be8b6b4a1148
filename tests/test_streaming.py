"""Incremental streaming ingest: correctness + exactly-once resume.

Mirrors the batch e2e contract (per-url golden equality, the recast of
/root/reference/tests/test_ocr.py:46-60) but driven through Structured
Streaming's file source with availableNow triggers, and asserts the
streaming checkpoint's incremental guarantee: a second dump processes
ONLY the new files.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ankiocr_spark.config import ExtractConfig
from ankiocr_spark.fixtures import gen_rows
from ankiocr_spark.streaming import run_stream_extract_available_now

CFG = ExtractConfig(salt_buckets=8, batch_rows=64)


def _write_dump(input_dir: str, name: str, n: int, start: int, seed: int):
    """One 'crawl segment' file landing in the ingest dir. Returns goldens."""
    os.makedirs(input_dir, exist_ok=True)
    rows = list(gen_rows(n, seed=seed, start=start))
    table = pa.table({
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
        "html": pa.array([r["html"] for r in rows], pa.binary()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
    })
    pq.write_table(table, os.path.join(input_dir, name))
    return {r["url"]: r["expected_text"] for r in rows}


def _read_extracts(spark, output_dir):
    df = spark.read.parquet(output_dir).select("url", "extracted_text")
    return {r["url"]: r["extracted_text"] for r in df.collect()}


@pytest.fixture()
def dirs(tmp_path):
    return (str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt"))


def test_stream_extract_matches_goldens(spark, dirs):
    input_dir, output_dir, ckpt = dirs
    goldens = _write_dump(input_dir, "dump-000.parquet", 60, start=0, seed=7)
    run_stream_extract_available_now(spark, input_dir, output_dir, ckpt, CFG)

    got = _read_extracts(spark, output_dir)
    assert len(got) == 60
    for url, expected in goldens.items():
        if expected is None:  # null-html rows pass through as error rows
            continue
        assert got[url] == expected, url


def test_stream_resume_processes_only_new_files(spark, dirs):
    input_dir, output_dir, ckpt = dirs
    g1 = _write_dump(input_dir, "dump-000.parquet", 40, start=0, seed=7)
    run_stream_extract_available_now(spark, input_dir, output_dir, ckpt, CFG)
    assert len(_read_extracts(spark, output_dir)) == 40

    # second segment lands; re-trigger from the same checkpoint
    g2 = _write_dump(input_dir, "dump-001.parquet", 25, start=1000, seed=8)
    run_stream_extract_available_now(spark, input_dir, output_dir, ckpt, CFG)

    got = _read_extracts(spark, output_dir)
    # exactly-once: 40 + 25, no reprocessing duplicates of dump-000
    assert len(got) == 65
    for url, expected in {**g1, **g2}.items():
        if expected is not None:
            assert got[url] == expected, url

    # third trigger with nothing new is a no-op
    run_stream_extract_available_now(spark, input_dir, output_dir, ckpt, CFG)
    assert len(_read_extracts(spark, output_dir)) == 65
