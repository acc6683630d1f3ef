"""Similarity search over the ``embeddings`` table (``array<float>``, 64-d).

LLM-pipeline operators: brute-force cosine top-k (the exactness
baseline), LSH-bucketed near-duplicate detection (the scale path), and
an IVF-style partitioned search using centroid pre-assignment.

Dot products use the *relational* formulation — explode with position,
join, sum of double products — because it is expressible identically in
Spark and DuckDB (hash-stable after rounding). The engine ALSO ships a
vectorized ``F.aggregate``/``zip_with`` form (functions/vectors.py) used
by bench, where the oracle parity constraint doesn't apply.

Scale notes: queries broadcast (small side), corpus never shuffles for
brute force; LSH buckets / IVF cells turn all-pairs into per-bucket
joins — the 100 TB strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pravega_spark.sources import load_table

_TOP_K = 3
_N_QUERIES = 5  # vec_id < 5 are the query vectors


def _pairs_cosine(spark: SparkSession, sf_dir: str, queries_df: DataFrame, corpus_df: DataFrame) -> DataFrame:
    """Cosine similarity for (query × corpus) via positional explode-join.

    One shuffle on (vec pair); products summed as double.
    """
    q = queries_df.select(
        F.col("vec_id").alias("q_id"),
        F.posexplode(F.col("embedding")).alias("pos", "q_val"),
    )
    c = corpus_df.select(
        F.col("vec_id").alias("c_id"),
        F.posexplode(F.col("embedding")).alias("pos", "c_val"),
    )
    return (
        q.join(c, "pos")
        .groupBy("q_id", "c_id")
        .agg(
            F.sum(F.col("q_val").cast("double") * F.col("c_val").cast("double")).alias("dot"),
            F.sum(F.col("q_val").cast("double") * F.col("q_val").cast("double")).alias("qq"),
            F.sum(F.col("c_val").cast("double") * F.col("c_val").cast("double")).alias("cc"),
        )
        .withColumn("cosine", F.round(F.col("dot") / F.sqrt(F.col("qq") * F.col("cc")), 6))
    )


def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k: for each query vector, the 3 nearest corpus vectors
    by cosine (excluding itself), rounded for hash stability."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < _N_QUERIES)
    sims = _pairs_cosine(spark, sf_dir, queries_df, emb).filter(F.col("q_id") != F.col("c_id"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOP_K)
        .select("q_id", "c_id", "cosine", "rk")
        .orderBy("q_id", "rk")
    )


TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id AS q_id, unnest(embedding) AS q_val,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings WHERE vec_id < {_N_QUERIES}
),
c AS (
  SELECT vec_id AS c_id, unnest(embedding) AS c_val,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings
),
sims AS (
  SELECT q_id, c_id,
         round(sum(CAST(q_val AS DOUBLE) * CAST(c_val AS DOUBLE))
               / sqrt(sum(CAST(q_val AS DOUBLE) * CAST(q_val AS DOUBLE))
                      * sum(CAST(c_val AS DOUBLE) * CAST(c_val AS DOUBLE))), 6) AS cosine
  FROM q JOIN c USING (pos)
  WHERE q_id != c_id
  GROUP BY q_id, c_id
)
SELECT q_id, c_id, cosine, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rk
  FROM sims
)
WHERE rk <= {_TOP_K}
ORDER BY q_id, rk
"""


def similarity_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF building block: per-label centroid norms + sizes (the coarse
    quantizer cells an IVF index probes instead of the full corpus)."""
    emb = load_table(spark, sf_dir, "embeddings")
    vals = emb.select("label", F.posexplode(F.col("embedding")).alias("pos", "v"))
    cent = vals.groupBy("label", "pos").agg(F.avg(F.col("v").cast("double")).alias("c"))
    return (
        cent.groupBy("label")
        .agg(
            F.round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 6).alias("centroid_norm"),
            F.count("*").alias("dims"),
        )
        .join(
            load_table(spark, sf_dir, "embeddings").groupBy("label").agg(F.count("*").alias("n_vectors")),
            "label",
        )
        .select("label", "centroid_norm", "dims", "n_vectors")
        .orderBy("label")
    )


CENTROIDS_SQL = """
WITH vals AS (
  SELECT label, generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS v
  FROM embeddings
),
cent AS (
  SELECT label, pos, avg(CAST(v AS DOUBLE)) AS c FROM vals GROUP BY label, pos
),
norms AS (
  SELECT label, round(sqrt(sum(c * c)), 6) AS centroid_norm, count(*) AS dims
  FROM cent GROUP BY label
)
SELECT n.label, n.centroid_norm, n.dims, s.n_vectors
FROM norms n JOIN (SELECT label, count(*) AS n_vectors FROM embeddings GROUP BY label) s
  ON n.label = s.label
ORDER BY n.label
"""


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: within each label cell (the bucketed /
    IVF-style candidate set), pairs with cosine ≥ 0.35."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("a_id"), F.col("label"), F.posexplode("embedding").alias("pos", "a_val"))
    b = emb.select(F.col("vec_id").alias("b_id"), F.col("label"), F.posexplode("embedding").alias("pos", "b_val"))
    sims = (
        a.join(b, ["label", "pos"])
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("label", "a_id", "b_id")
        .agg(
            F.sum(F.col("a_val").cast("double") * F.col("b_val").cast("double")).alias("dot"),
            F.sum(F.col("a_val").cast("double") * F.col("a_val").cast("double")).alias("aa"),
            F.sum(F.col("b_val").cast("double") * F.col("b_val").cast("double")).alias("bb"),
        )
        .withColumn("cosine", F.round(F.col("dot") / F.sqrt(F.col("aa") * F.col("bb")), 6))
    )
    return sims.filter(F.col("cosine") >= 0.35).select("label", "a_id", "b_id", "cosine").orderBy("a_id", "b_id")


NEAR_DUP_SQL = """
WITH v AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
),
sims AS (
  SELECT a.label, a.vec_id AS a_id, b.vec_id AS b_id,
         round(sum(a.val * b.val) / sqrt(sum(a.val * a.val) * sum(b.val * b.val)), 6) AS cosine
  FROM v a JOIN v b ON a.label = b.label AND a.pos = b.pos AND a.vec_id < b.vec_id
  GROUP BY a.label, a.vec_id, b.vec_id
)
SELECT label, a_id, b_id, cosine FROM sims WHERE cosine >= 0.35 ORDER BY a_id, b_id
"""


_LSH_DIMS = (0, 8, 16, 24)  # sign-bit hyperplanes (axis-aligned projections)


def similarity_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (the 100 TB scale path): vectors hash to a
    16-cell bucket by the sign pattern of 4 fixed dimensions (random-
    hyperplane LSH with axis-aligned planes — deterministic, so the
    oracle can reproduce it). Top-k cosine runs only WITHIN the query's
    bucket: the corpus-wide all-pairs shuffle becomes per-bucket joins
    that stay co-partitioned at any scale. Approximate by construction —
    candidates outside the bucket are unseen (recall < 1), which is the
    documented LSH trade."""
    emb = load_table(spark, sf_dir, "embeddings")
    bucket = sum(
        (
            F.when(F.col("embedding").getItem(d) >= 0, F.lit(1 << i)).otherwise(0)
            for i, d in enumerate(_LSH_DIMS)
        ),
        F.lit(0),
    ).alias("bucket")
    with_b = emb.select("vec_id", "embedding", bucket)
    queries_df = with_b.filter(F.col("vec_id") < _N_QUERIES)
    q = queries_df.select(
        F.col("vec_id").alias("q_id"), "bucket", F.posexplode("embedding").alias("pos", "q_val")
    )
    c = with_b.select(
        F.col("vec_id").alias("c_id"), "bucket", F.posexplode("embedding").alias("pos", "c_val")
    )
    sims = (
        q.join(c, ["bucket", "pos"])
        .filter(F.col("q_id") != F.col("c_id"))
        .groupBy("bucket", "q_id", "c_id")
        .agg(
            F.sum(F.col("q_val").cast("double") * F.col("c_val").cast("double")).alias("dot"),
            F.sum(F.col("q_val").cast("double") * F.col("q_val").cast("double")).alias("qq"),
            F.sum(F.col("c_val").cast("double") * F.col("c_val").cast("double")).alias("cc"),
        )
        .withColumn("cosine", F.round(F.col("dot") / F.sqrt(F.col("qq") * F.col("cc")), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOP_K)
        .select("q_id", "bucket", "c_id", "cosine", "rk")
        .orderBy("q_id", "rk")
    )


_LSH_BUCKET_SQL = " + ".join(
    f"(CASE WHEN embedding[{d + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
    for i, d in enumerate(_LSH_DIMS)
)

LSH_TOPK_SQL = f"""
WITH b AS (
  SELECT vec_id, embedding, {_LSH_BUCKET_SQL} AS bucket FROM embeddings
),
q AS (
  SELECT vec_id AS q_id, bucket, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS q_val
  FROM b WHERE vec_id < {_N_QUERIES}
),
c AS (
  SELECT vec_id AS c_id, bucket, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS c_val
  FROM b
),
sims AS (
  SELECT q.bucket, q_id, c_id,
         round(sum(q_val * c_val) / sqrt(sum(q_val * q_val) * sum(c_val * c_val)), 6) AS cosine
  FROM q JOIN c ON q.bucket = c.bucket AND q.pos = c.pos AND q_id != c_id
  GROUP BY 1, 2, 3
)
SELECT q_id, bucket, c_id, cosine, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rk
  FROM sims
)
WHERE rk <= {_TOP_K}
ORDER BY q_id, rk
"""


QUERIES = {
    "similarity_topk_bruteforce": similarity_topk_bruteforce,
    "similarity_lsh_bucketed": similarity_lsh_bucketed,
    "similarity_label_centroids": similarity_label_centroids,
    "embedding_near_dup": embedding_near_dup,
}

ORACLES = {
    "similarity_topk_bruteforce": TOPK_SQL,
    "similarity_lsh_bucketed": LSH_TOPK_SQL,
    "similarity_label_centroids": CENTROIDS_SQL,
    "embedding_near_dup": NEAR_DUP_SQL,
}
