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
