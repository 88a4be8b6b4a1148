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

#: headline set: the flagship extraction hot path, the composed
#: end-to-end training pipeline (the query a real 100-TB user runs), and
#: the heaviest SCALE-PATH shuffle/join/kernel representatives.
HEADLINE = [
    "flagship_extract",
    "training_pipeline_e2e",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_topk_bruteforce",
    "token_count",
    "quality_score",
    "group_concat",
]

#: labeled oracle paths — correct but intentionally quadratic-bounded
#: (df-capped pairwise Jaccard), NOT the shape that ships at 100 TB
#: (MinHash-LSH is). Timed once and reported separately so the headline
#: wall reflects the scale paths (VERDICT r3 #4: Jaccard alone was 47%
#: of the r3 headline).
SECONDARY = [
    "dedup_ngram_jaccard",
    # the delta-economics showcase: value-equals a full re-extract but the
    # kernel sees only the added/changed slice. Timed for visibility; not
    # headline because the sf-table fixture must synthesize BOTH snapshots
    # (two kernel passes) — production reads the old extract table.
    "incremental_extract",
    # r4 additions, timed for visibility; kept off the headline so the
    # round-over-round wall stays comparable (same 8-query basket).
    "seq_pack",
    "crossdedup_lsh",
    "train_val_split",
    "boilerplate_strip",
    # cluster_keeper is NOT timed: at sf0.1 it re-runs the whole
    # simhash-pair + CC-propagation chain (~69 s, dominated by stages the
    # pair/cluster queries already characterize); the keeper itself adds
    # one broadcast join + one cluster-partitioned window.
    "vocab_topn",
    "bm25_topk",
    "hybrid_rrf",
    "classifier_score",
    "url_latest",
    "dsir_weight",
    "c4_filter",
    "badwords_filter",
    "token_entropy",
    "signal_correlation",
]


#: cached fixture corpus for the kernel-throughput figure — the sf tables
#: top out at 5000 docs, far too small to measure the hot path. Layout and
#: seeds are IDENTICAL to scripts/bench_scaling.py's uniform dataset, so
#: the two harnesses share one cached corpus; sizing gives the scan ~30
#: parallelism-derived splits (>= cores) — smaller corpora under-split
#: and idle half the box.
KERNEL_BENCH_DIR = "/tmp/bench_pages_uniform"
KERNEL_BENCH_DOCS = 600_000
KERNEL_SHARD = 25_000


def _gen_kernel_shard(shard: int) -> int:
    # module-level so ProcessPoolExecutor can pickle it
    from ankiocr_spark.fixtures import write_pages_parquet

    sub = os.path.join(KERNEL_BENCH_DIR, f"shard={shard:03d}")
    if not os.path.exists(os.path.join(sub, "_OK")):
        write_pages_parquet(
            sub, KERNEL_SHARD, seed=42 + shard, start=shard * KERNEL_SHARD
        )
        open(os.path.join(sub, "_OK"), "w").close()
    return shard


def _ensure_kernel_corpus() -> None:
    from concurrent.futures import ProcessPoolExecutor

    with ProcessPoolExecutor(max_workers=8) as ex:
        list(ex.map(_gen_kernel_shard, range(KERNEL_BENCH_DOCS // KERNEL_SHARD)))


def _kernel_rep_seconds(spark, reps: int) -> list[float]:
    """Timed reps of the fused extraction over the cached fixture corpus
    (BASELINE.json headline metric). Caller spreads calls across TIME
    WINDOWS and takes the global best: host contention here is one-sided
    (a rep can only be slowed) and arrives in multi-minute bursts that a
    single back-to-back best-of-N sits entirely inside — the r02 driver
    bench read 27% low exactly that way while a two-window measurement of
    the same build did not (BENCH/BASELINE.md header)."""
    from ankiocr_spark.config import ExtractConfig
    from ankiocr_spark.job import run_extract

    pages = spark.read.parquet(KERNEL_BENCH_DIR)
    plan = lambda: run_extract(spark, pages, ExtractConfig(salt_buckets=128))  # noqa: E731
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        plan().write.format("noop").mode("overwrite").save()
        out.append(time.perf_counter() - t0)
    return out


def _headline_pass(qs, spark, sf_dir) -> tuple[dict[str, float], int]:
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
    return timings, n_docs


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")
    qs = entry.queries()

    # warm the JVM + Python workers once, outside timed runs
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    _ensure_kernel_corpus()
    from ankiocr_spark.config import ExtractConfig
    from ankiocr_spark.job import run_extract
    run_extract(
        spark, spark.read.parquet(KERNEL_BENCH_DIR), ExtractConfig()
    ).limit(2000).write.format("noop").mode("overwrite").save()

    # round-robin windows: kernel reps and headline passes interleaved so
    # each capability samples ≥2 windows separated by tens of seconds;
    # per-query and per-rep minima defeat the one-sided noise
    kernel_secs = _kernel_rep_seconds(spark, 3)
    t1, n_docs = _headline_pass(qs, spark, sf_dir)
    kernel_secs += _kernel_rep_seconds(spark, 2)
    t2, _ = _headline_pass(qs, spark, sf_dir)
    timings = {k: min(t1[k], t2[k]) for k in t1}

    secondary: dict[str, float] = {}
    for name in SECONDARY:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        secondary[name] = round(time.perf_counter() - t0, 3)

    kernel_dps = round(KERNEL_BENCH_DOCS / min(kernel_secs), 1)

    total = round(sum(timings.values()), 3)
    flagship_s = timings.get("flagship_extract", 0.0) or 1e-9
    out = {
        "metric": "headline query wall time (sf%.3g, local[%s])"
        % (sf, os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "value": total,
        "unit": "sec",
        "queries": timings,
        # oracle-path queries, deliberately off the headline (see SECONDARY)
        "secondary_queries": secondary,
        "sf": sf,
        "docs": n_docs,
        "docs_per_sec": round(n_docs / flagship_s, 1),
        # the BASELINE.json headline: fused-kernel docs/sec over a 600k-page
        # fixture corpus (the sf tables are too small to saturate the box)
        "kernel_bench_docs": KERNEL_BENCH_DOCS,
        "kernel_docs_per_sec": kernel_dps,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
