"""Bench harness — per-round driver contract.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

The flagship metric of this engine is documents/sec through the fused
HTML→extracted-text kernel (BASELINE.json), reported as extra keys
(docs, docs_per_sec) alongside the required seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry  # noqa: E402
from ankiocr_spark.session import get_spark  # noqa: E402

#: headline set: the flagship extraction hot path + the heaviest
#: shuffle/join/kernel representatives of the inventory.
HEADLINE = [
    "flagship_extract",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_topk_bruteforce",
    "token_count",
    "quality_score",
    "group_concat",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")
    qs = entry.queries()

    # warm the JVM + Python workers once, outside timed runs
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    timings: dict[str, float] = {}
    n_docs = 0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        rows = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        if name == "flagship_extract":
            n_docs = rows

    total = round(sum(timings.values()), 3)
    flagship_s = timings.get("flagship_extract", 0.0) or 1e-9
    out = {
        "metric": "headline query wall time (sf%.3g, local[%s])"
        % (sf, os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "docs": n_docs,
        "docs_per_sec": round(n_docs / flagship_s, 1),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
