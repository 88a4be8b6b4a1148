"""Source adapters: JSONL/CSV deliveries coerce to the canonical pages
schema and extract byte-identically to the parquet path."""

import base64
import csv
import json
import os

from ankiocr_spark.config import ExtractConfig
from ankiocr_spark.fixtures import gen_rows, write_pages_parquet
from ankiocr_spark.job import run_extract
from ankiocr_spark.sources import PAGES_SCHEMA, read_pages


def _rows(n=80):
    return [r for r in gen_rows(n, seed=21)]


def test_json_source_roundtrip(spark, tmp_path):
    rows = _rows()
    jl = tmp_path / "dump.jsonl"
    with open(jl, "w") as f:
        for r in rows:
            f.write(json.dumps({
                "url": r["url"],
                "warc_ts": r["warc_ts"].isoformat(sep=" "),
                "html_b64": base64.b64encode(r["html"]).decode()
                if r["html"] is not None else None,
                "text": r["text"],
                "lang": r["lang"],
            }) + "\n")
    df = read_pages(spark, str(jl), "json")
    assert df.schema == PAGES_SCHEMA or [f.name for f in df.schema] == [
        f.name for f in PAGES_SCHEMA]
    got = {r["url"]: r["html"] for r in df.collect()}
    for r in rows:
        want = bytes(r["html"]) if r["html"] is not None else None
        have = bytes(got[r["url"]]) if got[r["url"]] is not None else None
        assert have == want, r["url"]


def test_csv_source_extracts_identically_to_parquet(spark, tmp_path):
    rows = _rows()
    cv = tmp_path / "dump.csv"
    with open(cv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["url", "warc_ts", "html_b64", "text", "lang"])
        for r in rows:
            w.writerow([
                r["url"],
                r["warc_ts"].isoformat(sep=" "),
                base64.b64encode(r["html"]).decode()
                if r["html"] is not None else "",
                r["text"] or "",
                r["lang"],
            ])
    pq_dir = str(tmp_path / "pq")
    write_pages_parquet(pq_dir, 80, seed=21)

    cfg = ExtractConfig(salt_buckets=4)
    via_csv = {
        r["url"]: r["extracted_text"]
        for r in run_extract(
            spark, read_pages(spark, str(cv), "csv"), cfg
        ).collect()
    }
    via_pq = {
        r["url"]: r["extracted_text"]
        for r in run_extract(
            spark, read_pages(spark, pq_dir, "parquet"), cfg
        ).collect()
    }
    # csv cannot carry NULL html (empty string -> empty bytes), so compare
    # on the rows that have a payload in both
    for url, text in via_pq.items():
        if text is not None:
            assert via_csv[url] == text, url


def test_json_plain_string_html(spark, tmp_path):
    """Regression (r3 review): a JSONL delivery carrying raw HTML under a
    plain-string 'html' key previously landed EVERY row html=NULL (the
    fixed text schema omitted the field, so the string branch was dead) —
    silent total data loss at ingest. Both spellings must land, with
    per-row precedence base64 > plain when a delivery mixes them."""
    jl = tmp_path / "plain.jsonl"
    with open(jl, "w") as f:
        f.write(json.dumps({"url": "u1", "html": "<p>plain html</p>"}) + "\n")
        f.write(json.dumps({
            "url": "u2",
            "html": "<p>loser</p>",
            "html_b64": base64.b64encode(b"<p>winner</p>").decode(),
        }) + "\n")
    got = {r["url"]: bytes(r["html"])
           for r in read_pages(spark, str(jl), "json").collect()}
    assert got["u1"] == b"<p>plain html</p>"
    assert got["u2"] == b"<p>winner</p>"
