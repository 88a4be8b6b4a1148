"""Similarity search over the embeddings table (vec_id, embedding float[64], label).

Brute-force cosine top-k is the correctness baseline; sign-random-projection
LSH bucketing is the scale path (bucket join instead of the full cross
product — at 10^9 vectors the cross join is impossible, the bucket join is
O(vectors × bucket collision rate)).

Float math parity with the DuckDB oracle: embeddings are float32 on disk;
both engines cast to double BEFORE any arithmetic, and every emitted score
is rounded to 6 dp (accumulation-order differences are ~1e-15, far below
the rounding grain). Hyperplanes are md5-derived pseudo-random weights so
the oracle reproduces them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _load_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return df.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
        "label",
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


N_QUERIES = 10   # vec_id < 10 are the query vectors
TOP_K = 5
COSINE_THRESHOLD = 0.45  # near-dup threshold (synthetic embeddings are
# near-orthogonal — max pairwise cosine ≈0.6 — so 0.45 marks the tail)
N_PLANES = 8


def q_ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for the query vectors. The cross join
    is broadcast (queries are tiny); ordering ties broken by neighbor id
    so ranks are engine-independent."""
    emb = _load_emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    pairs = F.broadcast(q).crossJoin(
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("n_emb"))
    ).where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("q_emb"), F.col("n_emb"))
            / (
                F.sqrt(_dot(F.col("q_emb"), F.col("q_emb")))
                * F.sqrt(_dot(F.col("n_emb"), F.col("n_emb")))
            ),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


ORACLE_ANN_TOPK = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
pairs AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         round(list_sum(list_transform(list_zip(q.emb, n.emb), x -> x[1] * x[2]))
               / (sqrt(list_sum(list_transform(q.emb, x -> x * x)))
                * sqrt(list_sum(list_transform(n.emb, x -> x * x)))),
         6) AS cosine
  FROM e q, e n
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> n.vec_id),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM pairs)
SELECT query_id, rank, neighbor_id, cosine FROM ranked WHERE rank <= {TOP_K}
"""


def q_neardup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine ≥ threshold) over all
    pairs. Correctness baseline only — the LSH bucket join below is what
    runs at scale."""
    emb = _load_emb(spark, sf_dir)
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("emb").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("emb").alias("eb"))
    pairs = a.crossJoin(b).where(F.col("vec_a") < F.col("vec_b"))
    scored = pairs.select(
        "vec_a",
        "vec_b",
        F.round(
            _dot(F.col("ea"), F.col("eb"))
            / (
                F.sqrt(_dot(F.col("ea"), F.col("ea")))
                * F.sqrt(_dot(F.col("eb"), F.col("eb")))
            ),
            6,
        ).alias("cosine"),
    )
    return scored.where(F.col("cosine") >= COSINE_THRESHOLD)


ORACLE_NEARDUP = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
scored AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round(list_sum(list_transform(list_zip(a.emb, b.emb), x -> x[1] * x[2]))
               / (sqrt(list_sum(list_transform(a.emb, x -> x * x)))
                * sqrt(list_sum(list_transform(b.emb, x -> x * x)))),
         6) AS cosine
  FROM e a, e b WHERE a.vec_id < b.vec_id)
SELECT vec_a, vec_b, cosine FROM scored WHERE cosine >= {COSINE_THRESHOLD}
"""


def q_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-random-projection LSH: 8 md5-derived hyperplanes → 8-bit bucket
    per vector. Near vectors collide; candidate pairs come from a bucket
    equi-join instead of a cross product (the ANN scale path)."""
    emb = _load_emb(spark, sf_dir)
    dims = emb.select(
        "vec_id", F.posexplode("emb").alias("d", "val")
    )
    planes = dims.select(
        "vec_id",
        "d",
        "val",
        F.explode(F.sequence(F.lit(0), F.lit(N_PLANES - 1))).alias("j"),
    )
    # w(j, d) = ((md5int(j || ',' || d) % 2001) - 1000) / 1000  ∈ [-1, 1]
    w = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("j").cast("string"), F.lit(","), F.col("d").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 2001
        - 1000
    ) / 1000.0
    proj = planes.select("vec_id", "j", (F.col("val") * w).alias("contrib"))
    sums = proj.groupBy("vec_id", "j").agg(
        F.round(F.sum("contrib"), 6).alias("s")
    )
    return (
        sums.groupBy("vec_id")
        .agg(
            F.sum(
                F.when(F.col("s") >= 0, F.expr("shiftleft(1, j)")).otherwise(0)
            ).alias("bucket")
        )
        .select("vec_id", F.col("bucket").cast("int").alias("bucket"))
    )


#: embeddings are 64-d at every sf (asserted in tests); the oracle needs the
#: constant because DuckDB 1.0 cannot lateral-join generate_series on len(emb)
EMB_DIM = 64

ORACLE_ANN_LSH = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
proj AS (
  SELECT vec_id, j,
         round(list_sum(list_transform(
             list_zip(emb, generate_series(0, {EMB_DIM - 1})),
             x -> x[1] * ((((('0x' || substr(md5(j || ',' || x[2]), 1, 15))::bigint % 2001) - 1000)::DOUBLE) / 1000.0)
         )), 6) AS s
  FROM e, generate_series(0, {N_PLANES - 1}) AS gj(j))
SELECT vec_id,
       (sum(CASE WHEN s >= 0 THEN (1 << j) ELSE 0 END))::int AS bucket
FROM proj GROUP BY vec_id
"""


# --- IVF-style two-stage ANN --------------------------------------------------

#: IVF parameters: the coarse quantizer is K fixed "pseudo-centroids" (the
#: embeddings of vec_ids CENTROID_LO..CENTROID_LO+K-1 — deterministic, no
#: k-means training needed for a correctness-checkable plan shape); each
#: vector is assigned to its nearest centroid cell, queries probe the
#: NPROBE nearest cells and rank candidates only inside them.
IVF_K = 8
CENTROID_LO = 10  # disjoint from the query ids (vec_id < N_QUERIES)
NPROBE = 2


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k: broadcast the K centroids, assign every vector to its
    argmax-cosine cell (K-row amplification then reduce — never a full
    cross product), probe the NPROBE best cells per query, and rank
    candidates within the probed cells only.

    Scale shape: at 10^9 vectors the per-vector work is K broadcast-join
    rows + one window reduce; the candidate join is an equi-join on
    ``cell``, so shuffle volume is O(vectors), not O(vectors x queries).
    Recall is approximate by design; the oracle runs the SAME algorithm,
    so the check is exact."""
    emb = _load_emb(spark, sf_dir)
    cents = F.broadcast(
        emb.where(
            (F.col("vec_id") >= CENTROID_LO)
            & (F.col("vec_id") < CENTROID_LO + IVF_K)
        ).select(F.col("vec_id").alias("cent_id"), F.col("emb").alias("c_emb"))
    )

    def _cos(a, b):
        return F.round(
            _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b))), 6
        )

    scored = emb.crossJoin(cents).select(
        "vec_id", "emb", "cent_id", _cos(F.col("emb"), F.col("c_emb")).alias("cc")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("cc").desc(), F.col("cent_id").asc()
    )
    ranked = scored.withColumn("r", F.row_number().over(w_assign))
    cells = ranked.where(F.col("r") == 1).select(
        "vec_id", "emb", F.col("cent_id").alias("cell")
    )
    probes = (
        ranked.where(
            (F.col("r") <= NPROBE) & (F.col("vec_id") < N_QUERIES)
        )
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("q_emb"),
            F.col("cent_id").alias("cell"),
        )
    )
    cand = probes.join(cells, "cell").where(
        F.col("query_id") != F.col("vec_id")
    )
    scored_c = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        _cos(F.col("q_emb"), F.col("emb")).alias("cosine"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w_top = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored_c.withColumn("rank", F.row_number().over(w_top))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


ORACLE_ANN_IVF = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
cents AS (
  SELECT vec_id AS cent_id, emb AS c_emb FROM e
  WHERE vec_id >= {CENTROID_LO} AND vec_id < {CENTROID_LO + IVF_K}),
scored AS (
  SELECT e.vec_id, e.emb, c.cent_id,
         round(list_sum(list_transform(list_zip(e.emb, c.c_emb), x -> x[1] * x[2]))
               / (sqrt(list_sum(list_transform(e.emb, x -> x * x)))
                * sqrt(list_sum(list_transform(c.c_emb, x -> x * x)))),
         6) AS cc
  FROM e, cents c),
ranked AS (
  SELECT vec_id, emb, cent_id, cc,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cc DESC, cent_id ASC) AS r
  FROM scored),
cells AS (SELECT vec_id, emb, cent_id AS cell FROM ranked WHERE r = 1),
probes AS (
  SELECT vec_id AS query_id, emb AS q_emb, cent_id AS cell
  FROM ranked WHERE r <= {NPROBE} AND vec_id < {N_QUERIES}),
cand AS (
  SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id,
         round(list_sum(list_transform(list_zip(p.q_emb, c.emb), x -> x[1] * x[2]))
               / (sqrt(list_sum(list_transform(p.q_emb, x -> x * x)))
                * sqrt(list_sum(list_transform(c.emb, x -> x * x)))),
         6) AS cosine
  FROM probes p JOIN cells c USING (cell)
  WHERE p.query_id <> c.vec_id),
topk AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM cand)
SELECT query_id, rank, neighbor_id, cosine FROM topk WHERE rank <= {TOP_K}
"""


QUERIES = {
    "ann_topk_bruteforce": q_ann_topk_bruteforce,
    "neardup_cosine": q_neardup_cosine,
    "ann_lsh_buckets": q_ann_lsh_buckets,
    "ann_ivf_topk": q_ann_ivf_topk,
}

ORACLE_SQL = {
    "ann_topk_bruteforce": ORACLE_ANN_TOPK,
    "neardup_cosine": ORACLE_NEARDUP,
    "ann_lsh_buckets": ORACLE_ANN_LSH,
    "ann_ivf_topk": ORACLE_ANN_IVF,
}
