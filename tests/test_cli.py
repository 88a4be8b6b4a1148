"""Smoke test for the spark-submit entry (scripts/run_extract.py) — the
analog of the reference's headless script path (run_ocr.py:9-20).
Runs in a subprocess because the CLI owns its SparkSession lifecycle
(it calls spark.stop(), which must not kill the suite's shared session)."""

import os
import subprocess
import sys

from ankiocr_spark.fixtures import gen_rows, write_pages_parquet

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_extract_end_to_end(tmp_path, spark):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    write_pages_parquet(pages_dir, 300, seed=42)

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_extract.py"),
         "--input", pages_dir, "--output", out_dir,
         "--salt-buckets", "4", "--master", "local[2]"],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "done: 300 rows" in proc.stdout

    got = {r["url"]: r["extracted_text"]
           for r in spark.read.parquet(out_dir).collect()}
    golden = {r["url"]: r["expected_text"] for r in gen_rows(300, seed=42)}
    assert len(got) == 300
    for url, expected in golden.items():
        if expected is not None:
            assert got[url] == expected, url


def test_cli_warc_source_format(tmp_path, spark):
    """--source-format warc: a .warc.gz delivery is staged as canonical
    pages parquet, then extracted — the Common-Crawl ingestion flow."""
    from ankiocr_spark.warc import write_warc_dump

    warc_dir = str(tmp_path / "warcs")
    out_dir = str(tmp_path / "warc_out")
    rows = [r for r in gen_rows(80, seed=42) if r["html"] is not None]
    write_warc_dump(
        [(r["url"], "2026-01-01T00:00:00Z", r["html"]) for r in rows],
        warc_dir, n_files=3,
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_extract.py"),
         "--input", warc_dir, "--output", out_dir,
         "--source-format", "warc",
         "--salt-buckets", "4", "--master", "local[2]"],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "staged warc delivery" in proc.stdout

    got = {r["url"]: r["extracted_text"]
           for r in spark.read.parquet(out_dir).collect()}
    assert len(got) == len(rows)
    for r in rows:
        assert got[r["url"]] == r["expected_text"], r["url"]
