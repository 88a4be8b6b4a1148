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
