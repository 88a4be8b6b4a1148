"""Similarity-search invariants: the scale-shaped (bucketed) near-dup query
must be exactly precise (every emitted pair verified by exact cosine), have
useful recall vs the brute-force all-pairs oracle, and carry an equi-join
physical plan — no cartesian anywhere (round-1 VERDICT perf item #1)."""

from pyspark.sql import functions as F

from ankiocr_spark.datapipe.similarity import (
    COSINE_THRESHOLD,
    neardup_cosine_bruteforce,
    q_ann_lsh_buckets,
    q_neardup_cosine,
)


def _pairs(df):
    return {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in df.collect()
    }


def test_neardup_bucketed_precision_and_recall(spark, sf_dir):
    exact = _pairs(neardup_cosine_bruteforce(spark, sf_dir))
    got = _pairs(q_neardup_cosine(spark, sf_dir))
    # precision is EXACT: every emitted pair is a true near-dup with the
    # same rounded cosine (the bucket join only prunes candidates)
    for pair, cos in got.items():
        assert pair in exact and exact[pair] == cos, pair
    # recall: banded LSH must recover a useful fraction of the true pairs
    # (deterministic corpus + deterministic hyperplanes → a fixed number)
    if exact:
        recall = len(got) / len(exact)
        assert recall >= 0.3, f"recall {recall:.2f} over {len(exact)} pairs"


def test_neardup_plan_has_no_cartesian(spark, sf_dir):
    plan = q_neardup_cosine(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_buckets_pure_projection(spark, sf_dir):
    """The bucket assignment must be a shuffle-free codegen projection —
    no Exchange, no explode-driven row amplification."""
    df = q_ann_lsh_buckets(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert df.count() == n_vecs
    assert df.where((F.col("bucket") < 0) | (F.col("bucket") > 255)).count() == 0


def test_ann_recall_consistent_with_component_queries(spark, sf_dir):
    """recall@k recomputed driver-side from the two component operators'
    own outputs must equal the composed query's report (independent of
    the join/agg path), and IVF must find a nonzero fraction overall."""
    from ankiocr_spark.datapipe.similarity import (
        TOP_K,
        q_ann_ivf_topk,
        q_ann_recall,
        q_ann_topk_bruteforce,
    )

    truth = {}
    for r in q_ann_topk_bruteforce(spark, sf_dir).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx = {}
    for r in q_ann_ivf_topk(spark, sf_dir).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = {r["query_id"]: r for r in q_ann_recall(spark, sf_dir).collect()}
    assert set(got) == set(truth)
    for qid, t in truth.items():
        hits = len(t & approx.get(qid, set()))
        assert got[qid]["n_hits"] == hits
        assert got[qid]["recall_at_k"] == round(hits / TOP_K, 6)
        assert 0 <= got[qid]["n_hits"] <= TOP_K
    assert sum(r["n_hits"] for r in got.values()) > 0
