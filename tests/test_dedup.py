"""Dedup operator properties beyond oracle parity: SimHash byte-band
blocking must be EXACT at the pigeonhole radius (hamming ≤ 3 over 4 bands),
i.e. equal to brute-force pair enumeration over the sketches."""

from itertools import combinations

from pyspark.sql import functions as F

from ankiocr_spark.datapipe.dedup import (
    SIMHASH_HAMMING_MAX,
    q_dedup_simhash_pairs,
    simhash_sketch,
)


def test_simhash_pairs_blocking_is_exact(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    neardups = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" neardup")).alias("text"),
    )
    sk = {
        r["doc_id"]: r["simhash"]
        for r in simhash_sketch(docs.unionByName(neardups)).collect()
    }
    want = {
        (a, b, bin(sk[a] ^ sk[b]).count("1"))
        for a, b in combinations(sorted(sk), 2)
        if bin(sk[a] ^ sk[b]).count("1") <= SIMHASH_HAMMING_MAX
    }
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in q_dedup_simhash_pairs(spark, sf_dir).collect()
    }
    # byte-band blocking at r ≤ 3 is pigeonhole-exact: identical to the
    # all-pairs enumeration, with zero recall loss
    assert got == want and len(got) > 0
    # and the planted near-dup slice actually produces surfaced pairs
    assert any(b == a + 1000000 for a, b, _ in got)


def test_minhash_permutations_are_independent(spark):
    """Regression (r3 review): the universal-hash MinHash family must
    actually wrap its modulus. An affine transform that never exceeds P is
    order-preserving, so every signature coordinate becomes a monotone
    function of min(base_hash) — all docs order identically under every
    seed and all bands collapse to one (degenerate LSH that the oracle,
    computing the same degenerate math, cannot catch). With a real family
    the per-coordinate doc orderings must differ between seeds."""
    from pyspark.sql import functions as F

    from ankiocr_spark.datapipe.dedup import (
        MINHASH_AB, MINHASH_K, MINHASH_P, minhash_signatures, shingles,
    )

    # wraps: A*h+B must exceed P for typical h, else order-preserving
    assert all(a > MINHASH_P // (1 << 20) for a, _ in MINHASH_AB)

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(30))) for i in range(40)],
        "doc_id long, text string",
    )
    sig = minhash_signatures(shingles(docs, distinct=False)).collect()
    orderings = {
        s: tuple(r["doc_id"] for r in sorted(sig, key=lambda r: r[f"m{s}"]))
        for s in range(MINHASH_K)
    }
    assert len(set(orderings.values())) > 1, (
        "all minhash coordinates induce the SAME doc ordering — the "
        "permutation family is degenerate"
    )


def test_decontaminate_flags_eval_docs(spark, sf_dir):
    """Intent check beyond oracle agreement: every eval-slice doc must be
    flagged (a doc trivially shares all its own n-grams with the eval set
    it belongs to), with n_shared equal to its full distinct-8-gram count."""
    from pyspark.sql import functions as F

    from ankiocr_spark.datapipe.dedup import (
        DECONTAM_NGRAM, EVAL_DOC_MOD, q_decontaminate, shingles,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {r["doc_id"]: r["n_shared"]
           for r in q_decontaminate(spark, sf_dir).collect()}
    eval_ids = [r["doc_id"] for r in
                docs.where(F.col("doc_id") % EVAL_DOC_MOD == 0).collect()]
    own = {
        r["doc_id"]: r["n"]
        for r in shingles(
            docs.where(F.col("doc_id") % EVAL_DOC_MOD == 0), n=DECONTAM_NGRAM
        ).groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert eval_ids and all(got.get(i) == own[i] for i in eval_ids)


def test_substring_spans_match_python_island_merge(spark, sf_dir):
    """Independent reimplementation: count every 16-token window, mark
    corpus-repeated ones, merge overlapping/adjacent starts per doc with
    a plain scan — the engine's window/gaps-and-islands plan must agree
    exactly, and spans must be maximal (no two spans of one doc touch)."""
    from collections import Counter

    import duckdb

    from ankiocr_spark.datapipe.dedup import SUBSTR_W, q_dedup_substring

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') "
        "WHERE text IS NOT NULL"
    ).fetchall()
    counts = Counter()
    doc_windows = {}
    for doc_id, text in rows:
        toks = text.split(" ")
        wins = [
            " ".join(toks[i : i + SUBSTR_W])
            for i in range(len(toks) - SUBSTR_W + 1)
        ]
        doc_windows[doc_id] = wins
        counts.update(wins)
    want = set()
    for doc_id, wins in doc_windows.items():
        starts = [i for i, w in enumerate(wins) if counts[w] >= 2]
        spans = []
        for s in starts:
            if spans and s <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], s + SUBSTR_W)
                spans[-1][2] += 1
            else:
                spans.append([s, s + SUBSTR_W, 1])
        for a, b, n in spans:
            want.add((doc_id, a, b, n))
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in q_dedup_substring(spark, sf_dir).collect()
    }
    assert got == want
    assert want  # natural repeats exist at every shipped sf
    # maximality: spans of one doc never touch or overlap
    by_doc = {}
    for doc_id, a, b, _ in got:
        by_doc.setdefault(doc_id, []).append((a, b))
    for spans in by_doc.values():
        spans.sort()
        for (a1, b1), (a2, b2) in zip(spans, spans[1:]):
            assert a2 > b1


def test_cluster_keeper_staged_equals_inline_and_stays_lean(spark, sf_dir):
    """The materialized-artifact variant (VERDICT r4 #9) must be
    value-identical to the inline composition, while its OWN plan reads
    the staged cluster parquet instead of re-deriving the SimHash →
    pair → propagation chain — the staging economics every cluster
    consumer relies on at 100 TB."""
    from ankiocr_spark.datapipe.dedup import (
        q_cluster_keeper,
        q_cluster_keeper_staged,
    )

    staged = q_cluster_keeper_staged(spark, sf_dir)
    plan = staged._jdf.queryExecution().executedPlan().toString()
    # keeper plan: the two corpus branches of the augmented union + the
    # staged-cluster scan, nothing else — in particular none of the
    # sketch pipeline's md5/bit-band machinery
    assert plan.count("Scan parquet") == 3
    assert "md5" not in plan
    key = lambda rows: sorted(tuple(r) for r in rows)  # noqa: E731
    assert key(staged.collect()) == key(q_cluster_keeper(spark, sf_dir).collect())
