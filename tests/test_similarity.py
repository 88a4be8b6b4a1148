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


def test_hybrid_rrf_matches_python(spark, sf_dir):
    import math

    import duckdb

    from ankiocr_spark.datapipe.similarity import (
        DENSE_QUERY_ID,
        HYBRID_K,
        RRF_C,
        q_hybrid_rrf,
    )
    from ankiocr_spark.datapipe.textstats import q_bm25_topk

    # sparse list: rank the (already value-oracled) BM25 output
    sparse_rows = sorted(
        ((r["bm25"], r["doc_id"]) for r in q_bm25_topk(spark, sf_dir).collect()),
        key=lambda t: (-t[0], t[1]),
    )
    sparse_rank = {doc: i + 1 for i, (_, doc) in enumerate(sparse_rows)}
    # dense list: independent cosine in Python (same 6dp rounding contract)
    vecs = {
        vid: [float(x) for x in emb]
        for vid, emb in duckdb.sql(
            f"SELECT vec_id, embedding FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet')"
        ).fetchall()
    }
    q = vecs[DENSE_QUERY_ID]
    qn = math.sqrt(sum(x * x for x in q))
    cos = {
        vid: round(
            sum(a * b for a, b in zip(q, v))
            / (qn * math.sqrt(sum(x * x for x in v))),
            6,
        )
        for vid, v in vecs.items()
        if vid != DENSE_QUERY_ID
    }
    dense_sorted = sorted(cos, key=lambda d: (-cos[d], d))
    dense_rank = {d: i + 1 for i, d in enumerate(dense_sorted[:HYBRID_K])}
    fused = {}
    for d in set(sparse_rank) | set(dense_rank):
        s = 1.0 / (RRF_C + sparse_rank[d]) if d in sparse_rank else 0.0
        dn = 1.0 / (RRF_C + dense_rank[d]) if d in dense_rank else 0.0
        fused[d] = s + dn
    top = sorted(fused, key=lambda d: (-fused[d], d))[:HYBRID_K]
    expected = [
        (d, sparse_rank.get(d, 0), dense_rank.get(d, 0), round(fused[d], 6))
        for d in top
    ]
    got = [
        (r["doc_id"], r["sparse_rank"], r["dense_rank"], round(r["rrf"], 6))
        for r in q_hybrid_rrf(spark, sf_dir).collect()
    ]
    assert got == expected
    # fusion sanity: any doc on BOTH lists outranks rank-equivalent
    # single-list docs
    both = [r for r in got if r[1] > 0 and r[2] > 0]
    for r in both:
        assert r[3] > 1.0 / (RRF_C + min(r[1], r[2])) - 1e-9


def test_semdedup_pairwise_rule_and_plan(spark, sf_dir):
    """SemDeDup invariants, recomputed driver-side from the raw embeddings
    (margin-tolerant so Spark's HALF_UP rounding can't flake the check):
    (1) no two KEPT members of a cell are τ-close; (2) every DROPPED
    member is dominated by a higher-priority τ-close cellmate; (3) the
    priority-minimum of every cell survives; (4) the corpus splits (some
    docs dropped, most kept); (5) no unguarded cartesian in the plan
    (the only nested-loop join is the broadcast 8-row centroid probe)."""
    import math

    from ankiocr_spark.datapipe.similarity import SEMDEDUP_TAU, q_semdedup

    df = q_semdedup(spark, sf_dir)
    rows = df.collect()
    emb = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    assert len(rows) == len(emb)
    n_dropped = sum(r["dropped"] for r in rows)
    assert 0 < n_dropped < len(rows) * 0.5, n_dropped

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    by_cell = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell, members in by_cell.items():
        # (3) the (cc asc, vec_id asc) minimum is never dropped
        prio_min = min(members, key=lambda r: (r["cc"], r["vec_id"]))
        assert not prio_min["dropped"], (cell, prio_min)
        for i, a in enumerate(members):
            dominated = False
            for b in members:
                if a["vec_id"] == b["vec_id"]:
                    continue
                c = cos(emb[a["vec_id"]], emb[b["vec_id"]])
                higher_prio = (b["cc"], b["vec_id"]) < (a["cc"], a["vec_id"])
                if not a["dropped"] and not b["dropped"]:
                    # (1) kept pairs are never clearly over threshold
                    assert c < SEMDEDUP_TAU + 1e-6, (a["vec_id"], b["vec_id"], c)
                if higher_prio and c >= SEMDEDUP_TAU - 1e-6:
                    dominated = True
            if a["dropped"]:
                assert dominated, a  # (2)

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
