"""Similarity search over the ``embeddings`` table (``array<float>``, 64-d).

LLM-pipeline operators: brute-force cosine top-k (the exactness
baseline), LSH-bucketed near-duplicate detection (the scale path), and
an IVF-style partitioned search using centroid pre-assignment.

Dot products run the VECTORIZED kernels (functions/vectors.py:
``zip_with``/``aggregate`` higher-order functions — JVM-side, inside
whole-stage codegen, no explode). The DuckDB oracles keep the
positional-unnest formulation, which computes the same doubles; both
sides round to 6 dp so summation-order noise (~1e-15 relative) cannot
flip the hash.

Scale notes: queries broadcast (small side), so the corpus NEVER
shuffles for brute force — top-k uses a two-stage window (local per
partition, then global over k×P survivors); LSH buckets / label cells
turn all-pairs into per-bucket joins carrying whole vectors (64× less
shuffle volume than a positional explode) — the 100 TB strategy.

Data contract: embeddings are non-null, equal-length float arrays. A
NULL element (or ragged lengths) makes the Spark kernels propagate
NULL through zip_with/aggregate (row dropped) while the positional
explode-join oracles sum over the remaining shared positions — the
engines only agree on well-formed vectors, so malformed rows are
outside the parity contract (validate upstream with
size(embedding) = dim AND NOT exists(embedding, x -> x IS NULL)).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pravega_spark.caching import register_result_cache

from pravega_spark.sources import load_table

_TOP_K = 3
_N_QUERIES = 5  # vec_id < 5 are the query vectors


def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k: for each query vector, the 3 nearest corpus vectors
    by cosine (excluding itself), rounded for hash stability.

    Runs the vectorized kernel (broadcast queries × streaming corpus,
    two-stage top-k window) — zero corpus shuffle, no explode."""
    from pravega_spark.functions.vectors import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < _N_QUERIES)
    # round_to=6 BEFORE the top-k windows: the oracle ranks rounded
    # cosines, so ranking raw doubles here could order a 6-dp tie
    # differently at the rk<=k boundary and emit different rows
    topk = cosine_topk(emb, queries_df, k=_TOP_K, exclude_self=True, round_to=6)
    return topk.select("q_id", "c_id", "cosine", "rk").orderBy("q_id", "rk")


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
            emb.groupBy("label").agg(F.count("*").alias("n_vectors")),
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
    IVF-style candidate set), pairs with cosine ≥ 0.35.

    The label join carries WHOLE vectors through the vectorized cosine —
    64× less shuffle volume than a positional explode; AQE skew-join
    splits any hot label cell.

    Exact-collapse pre-pass (same argument as the MinHash paths):
    bit-identical vectors in the same cell pair with each other at
    cosine exactly 1.0 and with everything else at identical values, so
    the quadratic within-cell join runs on one representative per
    distinct (label, embedding) and member pairs are reconstructed
    afterwards. The groupBy uses the raw array as the key (exact binary
    equality, no hashing heuristics); its one linear shuffle replaces
    quadratic growth in the cell's duplicate mass. round(·, 6) absorbs
    the ≤1-ulp x/sqrt(x·x) wobble, so the intra-pair 1.0 is exactly
    what both engines compute for identical vectors."""
    from pravega_spark.functions.vectors import cosine as v_cosine

    emb = load_table(spark, sf_dir, "embeddings")
    g = (
        emb.groupBy("label", "embedding")
        .agg(
            F.min("vec_id").alias("rep"),
            F.array_sort(F.collect_list("vec_id")).alias("members"),
        )
        # expand_pairs requires UNIQUE reps; min(vec_id) is NOT unique
        # when an input reuses a vec_id with two different embeddings
        # (it can be the min of both groups, cross-attaching cosines).
        # A content-derived key is unique by construction (= the group
        # key) and deterministic across re-evaluation.
        .withColumn("gkey", F.md5(F.to_json(F.struct("label", "embedding"))))
        .persist()
    )
    # the intra-pair cosine is the group's SELF-cosine, computed through
    # the same kernel — not a hardcoded 1.0. For unit vectors the
    # x/sqrt(x·x) wobble is ≤1 ulp and round(·,6) lands on exactly 1.0;
    # for degenerate groups (zero vector → NaN, NULL → NULL) the value
    # and the ≥-threshold filter behave exactly as the uncollapsed join
    # and the oracle do (NaN sorts above numbers in both engines; NULL
    # rows drop), so parity holds on any input.
    from pravega_spark.functions.dedup import expand_pairs, member_pairs

    intra = member_pairs(
        g.withColumn("cosine", F.round(v_cosine("embedding", "embedding"), 6)).filter(
            F.col("cosine") >= 0.35
        ),
        a_name="a_id",
        b_name="b_id",
        carry=("label", "cosine"),
    ).select("label", "a_id", "b_id", "cosine")
    a = g.select(F.col("gkey").alias("a_id"), "label", F.col("embedding").alias("vec_a"))
    b = g.select(F.col("gkey").alias("b_id"), "label", F.col("embedding").alias("vec_b"))
    rep_pairs = (
        a.join(b, "label")
        # strict key order dedupes the two join directions, exactly as
        # rep-id order did; the emitted MEMBER ids come from the
        # expansion, so output is unchanged
        .filter(F.col("a_id") < F.col("b_id"))
        .select("label", "a_id", "b_id", F.round(v_cosine("vec_a", "vec_b"), 6).alias("cosine"))
        .filter(F.col("cosine") >= 0.35)
    )
    # expand across both groups' members (groups are disjoint within a
    # label; least/greatest restores a_id < b_id over MEMBER ids)
    expanded = expand_pairs(rep_pairs, g, a_col="a_id", b_col="b_id", rep_col="gkey")
    out = (
        intra.unionByName(expanded)
        # contract: never a self-pair even if the input carries duplicate
        # vec_ids (the oracle's a.vec_id < b.vec_id is strict)
        .filter(F.col("a_id") != F.col("b_id"))
        .select("label", "a_id", "b_id", "cosine")
        .orderBy("a_id", "b_id")
    )
    out = register_result_cache(out.persist())
    out.count()
    g.unpersist()
    return out


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
    from pravega_spark.functions.vectors import cosine as v_cosine

    with_b = emb.select("vec_id", "embedding", bucket)
    queries_df = with_b.filter(F.col("vec_id") < _N_QUERIES)
    q = queries_df.select(
        F.col("vec_id").alias("q_id"), "bucket", F.col("embedding").alias("q_vec")
    )
    c = with_b.select(
        F.col("vec_id").alias("c_id"), "bucket", F.col("embedding").alias("c_vec")
    )
    # broadcast the query side: the corpus streams through its bucket
    # filter + vectorized cosine without ever shuffling
    sims = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .select("bucket", "q_id", "c_id", F.round(v_cosine("q_vec", "c_vec"), 6).alias("cosine"))
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


_N_PROBE = 2


def _ivf_centroids(emb: DataFrame) -> DataFrame:
    """The coarse quantizer: one centroid vector per label cell."""
    vals = emb.select("label", F.posexplode(F.col("embedding")).alias("pos", "v"))
    return (
        vals.groupBy("label", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
            ).alias("centroid")
        )
    )


def similarity_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe search (the ANN scale path): label cells are the coarse
    quantizer; each query ranks cells by centroid cosine and searches
    top-k ONLY inside its ``nprobe`` nearest cells — the corpus outside
    probed cells is never touched (approximate by construction, the IVF
    trade). Centroid ranking and the in-cell search both run the
    vectorized kernels; the broadcast probe list keeps the corpus from
    shuffling.

    The quantizer PERSISTS as a maintained catalog table (content-keyed
    name + stale-sibling GC, the same pattern as the dedup fingerprint/
    band indexes) — real IVF systems train the coarse quantizer once,
    offline; recomputing it per query was measured to dominate the
    whole search at sf10 (~2.3 s of a ~9 s run, paid twice through the
    broadcast lineage). Values are identical either way (one Spark
    aggregation, materialized), so the oracle is unchanged."""
    from pravega_spark.functions.vectors import cosine as v_cosine
    from pravega_spark.sources.bucketed import _source_fingerprint
    from pravega_spark.sources.bucketing import ensure_bucketed_index

    emb = load_table(spark, sf_dir, "embeddings")
    tbl = f"pvs_ivf_cent_{_source_fingerprint(sf_dir, 'embeddings')}"
    if ensure_bucketed_index(
        spark, "pvs_ivf_cent_", tbl, lambda: _ivf_centroids(emb), ["label"], 2,
        source_path=os.path.join(os.path.abspath(sf_dir), "embeddings.parquet"),
    ):
        cent = spark.table(tbl)
    else:
        cent = _ivf_centroids(emb)  # unwritable warehouse: in-flight twin
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    # rank cells per query by centroid cosine (rounded so both engines
    # rank identically), probe the nearest _N_PROBE cells
    cell_rank = Window.partitionBy("q_id").orderBy(F.desc("cell_cos"), F.asc("label"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select("q_id", "q_vec", "label", F.round(v_cosine("q_vec", "centroid"), 6).alias("cell_cos"))
        .withColumn("cell_rk", F.row_number().over(cell_rank))
        .filter(F.col("cell_rk") <= _N_PROBE)
    )
    c = emb.select(F.col("vec_id").alias("c_id"), "label", F.col("embedding").alias("c_vec"))
    sims = (
        c.join(F.broadcast(probes), "label")
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "label", "c_id", F.round(v_cosine("q_vec", "c_vec"), 6).alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOP_K)
        .select("q_id", "label", "c_id", "cosine", "rk")
        .orderBy("q_id", "rk")
    )


IVF_SEARCH_SQL = f"""
WITH vals AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
cent AS (
  SELECT label, pos, avg(v) AS c FROM vals GROUP BY label, pos
),
q AS (SELECT * FROM vals WHERE vec_id < {_N_QUERIES}),
cellcos AS (
  SELECT q.vec_id AS q_id, cent.label,
         round(sum(q.v * cent.c) / sqrt(sum(q.v * q.v) * sum(cent.c * cent.c)), 6) AS cell_cos
  FROM q JOIN cent ON q.pos = cent.pos
  GROUP BY 1, 2
),
probes AS (
  SELECT q_id, label FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cell_cos DESC, label ASC) AS cell_rk
    FROM cellcos
  ) WHERE cell_rk <= {_N_PROBE}
),
sims AS (
  SELECT p.q_id, c.label, c.vec_id AS c_id,
         round(sum(qq.v * c.v) / sqrt(sum(qq.v * qq.v) * sum(c.v * c.v)), 6) AS cosine
  FROM probes p
  JOIN vals c  ON c.label = p.label
  JOIN q  qq   ON qq.vec_id = p.q_id AND qq.pos = c.pos
  WHERE c.vec_id != p.q_id
  GROUP BY 1, 2, 3
)
SELECT q_id, label, c_id, cosine, rk FROM (
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
    "similarity_ivf_search": similarity_ivf_search,
    "embedding_near_dup": embedding_near_dup,
}

ORACLES = {
    "similarity_topk_bruteforce": TOPK_SQL,
    "similarity_lsh_bucketed": LSH_TOPK_SQL,
    "similarity_label_centroids": CENTROIDS_SQL,
    "similarity_ivf_search": IVF_SEARCH_SQL,
    "embedding_near_dup": NEAR_DUP_SQL,
}
