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


QUERIES = {
    "ann_topk_bruteforce": q_ann_topk_bruteforce,
    "neardup_cosine": q_neardup_cosine,
    "ann_lsh_buckets": q_ann_lsh_buckets,
}

ORACLE_SQL = {
    "ann_topk_bruteforce": ORACLE_ANN_TOPK,
    "neardup_cosine": ORACLE_NEARDUP,
    "ann_lsh_buckets": ORACLE_ANN_LSH,
}
