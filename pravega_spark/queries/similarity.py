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
    from pravega_spark.functions.vectors import cosine_pre, norm2

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
        # squared norm once per distinct (label, vec) — every in-cell
        # pair reuses it (norm2/cosine_pre: identical arithmetic, one
        # dot per pair instead of three)
        .withColumn("_n2", norm2("embedding"))
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
        g.withColumn(
            "cosine", F.round(cosine_pre("embedding", "embedding", "_n2", "_n2"), 6)
        ).filter(F.col("cosine") >= 0.35),
        a_name="a_id",
        b_name="b_id",
        carry=("label", "cosine"),
    ).select("label", "a_id", "b_id", "cosine")
    a = g.select(
        F.col("gkey").alias("a_id"), "label", F.col("embedding").alias("vec_a"),
        F.col("_n2").alias("_an2"),
    )
    b = g.select(
        F.col("gkey").alias("b_id"), "label", F.col("embedding").alias("vec_b"),
        F.col("_n2").alias("_bn2"),
    )
    rep_pairs = (
        a.join(b, "label")
        # strict key order dedupes the two join directions, exactly as
        # rep-id order did; the emitted MEMBER ids come from the
        # expansion, so output is unchanged
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "label", "a_id", "b_id",
            F.round(cosine_pre("vec_a", "vec_b", "_an2", "_bn2"), 6).alias("cosine"),
        )
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


def _lsh_bucket(vec_col: str = "embedding"):
    """The sign-plane bucket id as a Column — ONE definition shared by
    the bucketed search, the recall evaluator and the k-NN graph, so a
    plane change can never desynchronize an index from its evaluator
    (keep in lockstep with _LSH_BUCKET_SQL below and the maintained
    family's string-expr twin _ann_bucket)."""
    return sum(
        (
            F.when(F.col(vec_col).getItem(d) >= 0, F.lit(1 << i)).otherwise(0)
            for i, d in enumerate(_LSH_DIMS)
        ),
        F.lit(0),
    ).alias("bucket")


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
    bucket = _lsh_bucket()
    from pravega_spark.functions.vectors import cosine_pre, norm2

    with_b = emb.select("vec_id", "embedding", bucket)
    queries_df = with_b.filter(F.col("vec_id") < _N_QUERIES)
    # squared norms once per SIDE row (norm2/cosine_pre: identical
    # arithmetic, one dot per candidate pair instead of three)
    q = queries_df.select(
        F.col("vec_id").alias("q_id"), "bucket", F.col("embedding").alias("q_vec"),
        norm2("embedding").alias("_qn2"),
    )
    c = with_b.select(
        F.col("vec_id").alias("c_id"), "bucket", F.col("embedding").alias("c_vec"),
        norm2("embedding").alias("_cn2"),
    )
    # broadcast the query side: the corpus streams through its bucket
    # filter + vectorized cosine without ever shuffling
    sims = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "bucket", "q_id", "c_id",
            F.round(cosine_pre("q_vec", "c_vec", "_qn2", "_cn2"), 6).alias("cosine"),
        )
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


def _ivf_quantizer(spark: SparkSession, sf_dir: str, emb: DataFrame) -> DataFrame:
    """The persisted coarse quantizer (content-keyed maintained table,
    stale-sibling GC) — shared by the IVF search and the recall
    evaluation so both probe the SAME cells a production index would."""
    from pravega_spark.sources.bucketed import _source_fingerprint
    from pravega_spark.sources.bucketing import ensure_bucketed_index

    tbl = f"pvs_ivf_cent_{_source_fingerprint(sf_dir, 'embeddings')}"
    if ensure_bucketed_index(
        spark, "pvs_ivf_cent_", tbl, lambda: _ivf_centroids(emb), ["label"], 2,
        source_path=os.path.join(os.path.abspath(sf_dir), "embeddings.parquet"),
    ):
        return spark.table(tbl)
    return _ivf_centroids(emb)  # unwritable warehouse: in-flight twin


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
    from pravega_spark.functions.vectors import cosine_pre, norm2

    emb = load_table(spark, sf_dir, "embeddings")
    cent = _ivf_quantizer(spark, sf_dir, emb).withColumn("_ctn2", norm2("centroid"))
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"),
        norm2("embedding").alias("_qn2"),
    )
    # rank cells per query by centroid cosine (rounded so both engines
    # rank identically), probe the nearest _N_PROBE cells
    cell_rank = Window.partitionBy("q_id").orderBy(F.desc("cell_cos"), F.asc("label"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "q_id", "q_vec", "_qn2", "label",
            F.round(cosine_pre("q_vec", "centroid", "_qn2", "_ctn2"), 6).alias("cell_cos"),
        )
        .withColumn("cell_rk", F.row_number().over(cell_rank))
        .filter(F.col("cell_rk") <= _N_PROBE)
    )
    c = emb.select(
        F.col("vec_id").alias("c_id"), "label", F.col("embedding").alias("c_vec"),
        norm2("embedding").alias("_cn2"),
    )
    sims = (
        c.join(F.broadcast(probes), "label")
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id", "label", "c_id",
            F.round(cosine_pre("q_vec", "c_vec", "_qn2", "_cn2"), 6).alias("cosine"),
        )
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


# ------------------------------------------- ANN recall evaluation (r10)
_EVAL_K = 10  # recall@10: wide enough that bucket/cell truncation shows


def similarity_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of both approximate indexes (sign-plane LSH buckets and
    IVF probe search) against the exact brute-force ranking — the
    evaluation harness that decides whether an ANN configuration is
    deployable. A 100 TB corpus cannot be brute-forced, so the recall
    measurement runs on a bounded query sample (here the standard 5
    query vectors) while the INDEX sides scan exactly what production
    would scan: the query's LSH bucket, or its ``nprobe`` nearest IVF
    cells from the SAME persisted quantizer ``similarity_ivf_search``
    maintains. Output per (q_id, method): candidates scanned (the cost
    axis), top-k hits against exact, and recall (the quality axis) —
    the two numbers a tuning loop trades against each other.

    Scale shape: three broadcast-query passes over the corpus, zero
    corpus shuffle (same kernel family as the underlying searches);
    the only shuffles are the per-query top-k windows over ≤ |queries|
    × |bucket| rows. Reference parity: the reference ships no ANN —
    this evaluates the repo's own scale-path indexes the way FAISS-
    style recall sweeps do (a published, standard methodology)."""
    from pravega_spark.functions.vectors import cosine_pre, cosine_topk, norm2

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < _N_QUERIES)
    exact = (
        cosine_topk(emb, queries_df, k=_EVAL_K, exclude_self=True, round_to=6)
        .select("q_id", "c_id")
    )

    # ---- LSH candidates: the query's sign-plane bucket (side norms
    # once per row — norm2/cosine_pre, identical arithmetic)
    bucket = _lsh_bucket()
    with_b = emb.select("vec_id", "embedding", bucket)
    q_b = with_b.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "bucket", F.col("embedding").alias("q_vec"),
        norm2("embedding").alias("_qn2"),
    )
    lsh_cand = (
        with_b.select(
            F.col("vec_id").alias("c_id"), "bucket", F.col("embedding").alias("c_vec"),
            norm2("embedding").alias("_cn2"),
        )
        .join(F.broadcast(q_b), "bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id", "c_id",
            F.round(cosine_pre("q_vec", "c_vec", "_qn2", "_cn2"), 6).alias("cosine"),
        )
    )

    # ---- IVF candidates: the nprobe nearest cells by centroid cosine
    cent = _ivf_quantizer(spark, sf_dir, emb).withColumn("_ctn2", norm2("centroid"))
    q_v = queries_df.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    q_n = q_v.withColumn("_qn2", norm2("q_vec"))
    cell_rank = Window.partitionBy("q_id").orderBy(F.desc("cell_cos"), F.asc("label"))
    probes = (
        q_n.crossJoin(F.broadcast(cent))
        .select(
            "q_id", "q_vec", "_qn2", "label",
            F.round(cosine_pre("q_vec", "centroid", "_qn2", "_ctn2"), 6).alias("cell_cos"),
        )
        .withColumn("cell_rk", F.row_number().over(cell_rank))
        .filter(F.col("cell_rk") <= _N_PROBE)
    )
    ivf_cand = (
        emb.select(
            F.col("vec_id").alias("c_id"), "label", F.col("embedding").alias("c_vec"),
            norm2("embedding").alias("_cn2"),
        )
        .join(F.broadcast(probes), "label")
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id", "c_id",
            F.round(cosine_pre("q_vec", "c_vec", "_qn2", "_cn2"), 6).alias("cosine"),
        )
    )

    def _stats(cand: DataFrame, method: str) -> DataFrame:
        w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
        top = cand.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= _EVAL_K)
        hits = (
            top.join(exact, ["q_id", "c_id"]).groupBy("q_id").agg(F.count("*").alias("n_hits"))
        )
        scanned = cand.groupBy("q_id").agg(F.count("*").alias("n_scanned"))
        return (
            q_v.select("q_id")
            .join(scanned, "q_id", "left")
            .join(hits, "q_id", "left")
            .select(
                "q_id",
                F.lit(method).alias("method"),
                F.coalesce("n_scanned", F.lit(0).cast("bigint")).alias("n_scanned"),
                F.coalesce("n_hits", F.lit(0).cast("bigint")).alias("n_hits"),
            )
        )

    out = (
        _stats(lsh_cand, "lsh")
        .unionByName(_stats(ivf_cand, "ivf"))
        .withColumn("recall", F.round(F.col("n_hits") / F.lit(float(_EVAL_K)), 6))
        .orderBy("q_id", "method")
    )
    return out


ANN_RECALL_SQL = f"""
WITH q AS (
  SELECT vec_id AS q_id, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings WHERE vec_id < {_N_QUERIES}
),
c AS (
  SELECT vec_id AS c_id, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
allsims AS (
  SELECT q_id, c_id,
         round(sum(q.v * c.v) / sqrt(sum(q.v * q.v) * sum(c.v * c.v)), 6) AS cosine
  FROM q JOIN c USING (pos) WHERE q_id != c_id GROUP BY 1, 2
),
exact AS (
  SELECT q_id, c_id FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rk
    FROM allsims
  ) WHERE rk <= {_EVAL_K}
),
b AS (SELECT vec_id, {_LSH_BUCKET_SQL} AS bucket FROM embeddings),
lshcand AS (
  SELECT s.q_id, s.c_id, s.cosine
  FROM allsims s
  JOIN b bq ON bq.vec_id = s.q_id
  JOIN b bc ON bc.vec_id = s.c_id AND bc.bucket = bq.bucket
),
vals AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
cent AS (SELECT label, pos, avg(v) AS c FROM vals GROUP BY label, pos),
cellcos AS (
  SELECT q.q_id, cent.label,
         round(sum(q.v * cent.c) / sqrt(sum(q.v * q.v) * sum(cent.c * cent.c)), 6) AS cell_cos
  FROM q JOIN cent ON q.pos = cent.pos GROUP BY 1, 2
),
probes AS (
  SELECT q_id, label FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cell_cos DESC, label ASC) AS cell_rk
    FROM cellcos
  ) WHERE cell_rk <= {_N_PROBE}
),
ivfcand AS (
  SELECT s.q_id, s.c_id, s.cosine
  FROM allsims s
  JOIN (SELECT DISTINCT vec_id, label FROM vals) cl ON cl.vec_id = s.c_id
  JOIN probes p ON p.q_id = s.q_id AND p.label = cl.label
),
methods AS (
  SELECT 'lsh' AS method, * FROM lshcand
  UNION ALL
  SELECT 'ivf' AS method, * FROM ivfcand
),
tops AS (
  SELECT method, q_id, c_id FROM (
    SELECT *, row_number() OVER (PARTITION BY method, q_id ORDER BY cosine DESC, c_id ASC) AS rk
    FROM methods
  ) WHERE rk <= {_EVAL_K}
),
hits AS (
  SELECT t.method, t.q_id, count(*) AS n_hits
  FROM tops t JOIN exact e ON e.q_id = t.q_id AND e.c_id = t.c_id
  GROUP BY 1, 2
),
scans AS (SELECT method, q_id, count(*) AS n_scanned FROM methods GROUP BY 1, 2),
scaffold AS (
  SELECT vec_id AS q_id, m.method
  FROM embeddings, (SELECT 'lsh' AS method UNION ALL SELECT 'ivf') m
  WHERE vec_id < {_N_QUERIES}
)
SELECT sc.q_id, sc.method,
       coalesce(s.n_scanned, 0) AS n_scanned,
       coalesce(h.n_hits, 0) AS n_hits,
       round(coalesce(h.n_hits, 0) / {float(_EVAL_K)}, 6) AS recall
FROM scaffold sc
LEFT JOIN scans s ON s.method = sc.method AND s.q_id = sc.q_id
LEFT JOIN hits h ON h.method = sc.method AND h.q_id = sc.q_id
ORDER BY sc.q_id, sc.method
"""


# --------------------------------------------- bucketed k-NN graph (r10)
_KNN_K = 3


def similarity_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed k-NN graph over DISTINCT embeddings: each distinct
    vector's top-3 cosine neighbors within its sign-plane bucket — the
    edge list graph-based near-dup clustering consumes (pair with
    ``dedup_clusters``' union-find: edges in, components out).

    Defined on distinct vectors (grouped by the embedding array
    itself, exact float equality in both engines; ``rep_id`` = min
    vec_id, ``n_members`` = multiplicity) because exact duplicates add
    no graph structure — only degenerate cosine-1.0 self-cluster
    edges — and because the collapse is what bounds the per-bucket
    quadratic: at any corpus duplication factor the pair stage runs on
    distinct vectors only (the same exact-collapse law the LSH dedup
    paths follow, SCALING.md). Buckets cap it further: n_distinct²/16
    per box of the hash space, and each bucket's pairs stay
    co-partitioned at any scale. Approximate by construction —
    cross-bucket edges are unseen, the documented LSH trade
    (similarity_ann_recall measures exactly that loss)."""
    from pravega_spark.functions.vectors import cosine_pre, norm2

    emb = load_table(spark, sf_dir, "embeddings")
    reps = emb.groupBy("embedding").agg(
        F.min("vec_id").alias("rep_id"), F.count("*").alias("n_members")
    )
    bucket = _lsh_bucket()
    # persist: BOTH pair-join sides consume this frame — unpersisted,
    # each side re-ran the corpus scan + exact-collapse shuffle. The
    # squared norm rides each rep row once (norm2/cosine_pre: identical
    # arithmetic, one dot per candidate pair instead of three across
    # the n²/16-per-bucket pair stage).
    with_b = reps.select(
        "rep_id", "n_members", "embedding", bucket, norm2("embedding").alias("_n2")
    ).persist()
    register_result_cache(with_b)
    a = with_b.select(
        F.col("rep_id").alias("src"), "n_members", "bucket",
        F.col("embedding").alias("a_vec"), F.col("_n2").alias("_an2"),
    )
    c = with_b.select(
        F.col("rep_id").alias("dst"), "bucket", F.col("embedding").alias("c_vec"),
        F.col("_n2").alias("_cn2"),
    )
    sims = (
        a.join(c, "bucket")
        .filter(F.col("src") != F.col("dst"))
        .select(
            "src", "n_members", "dst",
            F.round(cosine_pre("a_vec", "c_vec", "_an2", "_cn2"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KNN_K)
        .select("src", "dst", "cosine", "rk", "n_members")
        .orderBy("src", "rk")
    )


KNN_GRAPH_SQL = f"""
WITH reps AS (
  SELECT min(vec_id) AS rep_id, count(*) AS n_members, embedding
  FROM embeddings GROUP BY embedding
),
b AS (
  SELECT rep_id, n_members, embedding, {_LSH_BUCKET_SQL} AS bucket FROM reps
),
a AS (
  SELECT rep_id AS src, n_members, bucket, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM b
),
c AS (
  SELECT rep_id AS dst, bucket, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM b
),
sims AS (
  SELECT a.src, a.n_members, c.dst,
         round(sum(a.v * c.v) / sqrt(sum(a.v * a.v) * sum(c.v * c.v)), 6) AS cosine
  FROM a JOIN c ON a.bucket = c.bucket AND a.pos = c.pos AND a.src != c.dst
  GROUP BY 1, 2, 3
)
SELECT src, dst, cosine, rk, n_members FROM (
  SELECT *, row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst ASC) AS rk
  FROM sims
)
WHERE rk <= {_KNN_K}
ORDER BY src, rk
"""


# --------------------------------------------- k-means refinement (r11)
_KM_ITERS = 2  # unrolled Lloyd iterations (the oracle unrolls the same 2)


def _py_norm2(vec: list[float]) -> float:
    """Driver-side twin of ``norm2`` (dot(v, v)) for a collected
    centroid: a plain left fold of ``acc + x*x`` over IEEE doubles — the
    exact operation sequence Spark's zip_with+aggregate performs — so
    the folded-in literal is bit-identical to evaluating dot(cv, cv)
    per row (which the old assignment did k times per row)."""
    n2 = 0.0
    for x in vec:
        x = float(x)
        n2 += x * x
    return n2


def _km_literal(cents: list[tuple[int, list[float]]]):
    """The collected (cluster, centroid, |centroid|²) list as ONE
    literal array-of-structs column — assignment against it is a
    per-row codegen expression, cheaper than even a broadcast join (no
    build side). The squared norm is folded in driver-side
    (``_py_norm2``) so scoring evaluates one dot per (row, centroid)
    instead of three."""
    return F.array(
        *[
            F.struct(
                F.lit(int(cl)).alias("cl"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("cv"),
                F.lit(_py_norm2(vec)).alias("cn2"),
            )
            for cl, vec in cents
        ]
    )


def _km_assign(df: DataFrame, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """argmax-cosine assignment vs literal centroids: best = array_max
    over (rounded cosine, -cluster) structs — lexicographic struct
    ordering IS the (cosine DESC, cluster ASC) tie-break the oracle's
    row_number uses. The row's squared norm is computed ONCE per row
    (norm2) rather than once per centroid — identical arithmetic
    (cosine_pre keeps cosine's operand order), k× fewer dot passes."""
    from pravega_spark.functions.vectors import cosine_pre, norm2

    scored = F.transform(
        _km_literal(cents),
        lambda s: F.struct(
            F.round(
                cosine_pre(F.col("embedding"), s["cv"], F.col("_kmn2"), s["cn2"]), 6
            ).alias("cos"),
            (-s["cl"]).alias("ncl"),
        ),
    )
    best = F.array_max(scored)
    return (
        df.withColumn("_kmn2", norm2("embedding"))
        .withColumn("cluster", (-best["ncl"]).cast("bigint"))
        .withColumn("cos", best["cos"])
        .drop("_kmn2")
    )


def _km_centroids(df: DataFrame, by: str) -> list[tuple[int, list[float]]]:
    """Positional-explode mean per cluster, ROUNDED to 6 dp — the
    rounding is what makes the next iteration's assignments identical
    across engines (raw avg doubles differ in summation order). The
    k×dim result is driver-collected: the canonical Lloyd sync point,
    kilobytes at any corpus scale.

    The (cluster, pos, c) rows are collected directly and assembled
    into per-cluster arrays driver-side: the former second groupBy
    (collect_list into arrays) was one more full Exchange + stage per
    call purely to reshape k×dim scalar rows the driver is about to
    flatten anyway (guide §2.4 — remove shuffles outright)."""
    rows = (
        df.select(by, F.posexplode("embedding").alias("pos", "v"))
        .groupBy(by, "pos")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("c"))
        .collect()
    )
    acc: dict[int, dict[int, float]] = {}
    for r in rows:
        acc.setdefault(r[0], {})[r[1]] = r[2]
    return sorted((cl, [d[p] for p in sorted(d)]) for cl, d in acc.items())


def similarity_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical k-means over the embeddings (2 Lloyd iterations from
    the label-centroid init): the clustering pass a curation pipeline
    runs to balance/cap a training mix by semantic region, and the
    refinement that turns the IVF coarse quantizer's metadata cells
    (``_ivf_quantizer`` inherits labels as-is) into data-driven ones.

    Per final cluster: member count, members whose assignment moved off
    their initial label, and mean member-to-centroid cosine (the
    spherical-k-means objective; its rise across iterations is the
    convergence signal).

    Scale shape: assignment is a PER-ROW codegen expression against the
    k×dim centroid literal — the corpus never shuffles and there is no
    join, not even a broadcast build side; each recompute is one
    positional-explode aggregation that map-side-combines to k×dim rows
    before its (tiny) shuffle. Between iterations the k×dim centroids
    sync through the driver — the canonical Lloyd sync point, kB-sized
    at any corpus scale. Total: 2 linear corpus passes + 1 linear
    explode pass; iteration count is a constant, not data-dependent.
    Determinism contract: centroid components and cosines round to 6 dp
    at every iteration boundary, so both engines compute identical
    assignments (summation-order noise cannot accumulate across
    iterations); ties break toward the smaller cluster id in both.

    Reference parity: no analogue in pravega (stream store); pipeline
    tooling per the build brief (spherical k-means per Dhillon & Modha
    2001; the curation use is the SemDeDup/doc-cluster-balance shape).

    Empty-cluster contract: a cell that loses all members mid-iteration
    simply stops existing (both engines drop it from the avg); the
    label-centroid init over non-degenerate data keeps k stable here."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    c0 = _km_centroids(emb, "label")
    # persist each NON-FINAL assignment: the next iteration's centroid
    # collect and its re-assignment both consume it, and without the
    # cache each consumer re-runs the corpus scan plus every
    # accumulated k×dim cosine-assignment pass from scratch (assignment
    # is narrow, so nothing else materializes it) — one corpus pass per
    # iteration instead of a growing recompute chain (guide §5).
    # Loop-internal persists stay FUNCTION-LOCAL (not in the shared
    # result-cache registry): at one registration per Lloyd iteration a
    # deep run would blow past the registry's eviction cap and silently
    # re-trigger the recompute chain mid-training (VERDICT r11 item 7).
    # The k-row rollup is localCheckpoint'ed so every chain cache can be
    # freed before returning, at any iteration count.
    a = _km_assign(emb, c0)
    chain: list[DataFrame] = []
    try:
        for _ in range(_KM_ITERS - 1):
            a = a.persist()
            chain.append(a)
            c1 = _km_centroids(a, "cluster")
            a = _km_assign(a.drop("cluster", "cos"), c1)
        return (
            a.groupBy("cluster")
            .agg(
                F.count("*").cast("bigint").alias("n_members"),
                F.sum(F.when(F.col("cluster") != F.col("label"), 1).otherwise(0))
                .cast("bigint")
                .alias("n_moved"),
                F.round(F.avg("cos"), 6).alias("avg_cos"),
            )
            .orderBy("cluster")
            .localCheckpoint()
        )
    finally:
        for df in chain:
            df.unpersist()


KMEANS_REFINE_SQL = """
WITH vals AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
cent0 AS (
  SELECT label AS cl, pos, round(avg(v), 6) AS c FROM vals GROUP BY label, pos
),
cos1 AS (
  SELECT v.vec_id, c.cl,
         round(sum(v.v * c.c) / sqrt(sum(v.v * v.v) * sum(c.c * c.c)), 6) AS cos
  FROM vals v JOIN cent0 c USING (pos) GROUP BY 1, 2
),
a1 AS (
  SELECT vec_id, cl AS cluster FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cl ASC) AS rk
    FROM cos1
  ) WHERE rk = 1
),
cent1 AS (
  SELECT a1.cluster AS cl, v.pos, round(avg(v.v), 6) AS c
  FROM vals v JOIN a1 USING (vec_id) GROUP BY 1, 2
),
cos2 AS (
  SELECT v.vec_id, c.cl,
         round(sum(v.v * c.c) / sqrt(sum(v.v * v.v) * sum(c.c * c.c)), 6) AS cos
  FROM vals v JOIN cent1 c USING (pos) GROUP BY 1, 2
),
a2 AS (
  SELECT vec_id, cl AS cluster, cos FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cl ASC) AS rk
    FROM cos2
  ) WHERE rk = 1
)
SELECT a2.cluster,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(CASE WHEN a2.cluster != e.label THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
       round(avg(a2.cos), 6) AS avg_cos
FROM a2 JOIN embeddings e USING (vec_id)
GROUP BY a2.cluster
ORDER BY a2.cluster
"""


# --------------------------------------------- semantic dedup (r11)
_SEM_THRESHOLD = 0.35  # same natural-pair threshold the near-dup op uses


def similarity_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    corpus into SEMANTIC cells (cosine assignment to the label-centroid
    quantizer — a vector labeled 3 lands wherever it actually points,
    unlike the label-cell near-dup), then inside each cell drop every
    vector that has a >= 0.35-cosine neighbor with a smaller id — the
    curation pass that removes semantically redundant training data
    near-verbatim dedup can't see.

    Drop rule (documented contract): greedy-by-id, one pass — a rep is
    dropped iff SOME smaller-id rep in its cell clears the threshold.
    Chains a<b<c with cos(a,b) and cos(b,c) over but cos(a,c) under
    the bar drop BOTH b and c (b's dropper is a, c's is b — already
    dropped). That over-drops vs connected-component dedup keeping one
    per component only in the sense of keeping FEWER; it needs no
    iteration, which is why SemDeDup-scale systems use exactly this
    shape.

    Exact-collapse pre-pass (the near-dup/MinHash law): the quadratic
    in-cell join runs on one representative per DISTINCT embedding;
    multiplicity rides the rep, so exact-duplicate mass is reported
    (n_vectors vs n_reps) but never re-paired. Per final cell: total
    vectors, distinct reps, dropped reps, dropped vector mass.

    Scale shape: quantizer = one positional-explode aggregation
    (map-side combined to k×dim); assignment = per-row codegen against
    the k×dim literal (zero shuffle, no build side); collapse = one
    linear shuffle on the embedding key; the in-cell pair join carries
    whole vectors through the vectorized cosine (64x less volume than
    positional explode) and AQE skew-splits any hot cell; the dropped
    flag joins back rep-to-rep (post-collapse grain, both sides tiny
    relative to the corpus).

    Reference parity: no analogue in pravega (stream store); pipeline
    tooling per the build brief."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    c0 = _km_centroids(emb, "label")
    reps = emb.groupBy("embedding").agg(
        F.min("vec_id").alias("rep"), F.count("*").alias("nm")
    )
    # persist: THREE consumers (both pair-join sides + the final
    # rollup) each re-ran the corpus scan, the exact-collapse shuffle
    # and the k×dim assignment pass — the plan held three copies of
    # the Scan→HashAggregate→Exchange subtree (guide §5; plan diff in
    # plans/r11/similarity_semantic_dedup_{before,after}.txt). The
    # squared norm rides each cached rep row once (norm2/cosine_pre:
    # identical arithmetic, one dot per in-cell pair instead of three).
    from pravega_spark.functions.vectors import cosine_pre, norm2

    assigned = (
        _km_assign(reps, c0).drop("cos").withColumn("_n2", norm2("embedding")).persist()
    )
    register_result_cache(assigned)
    a = assigned.select(
        "cluster", F.col("rep").alias("a_rep"), F.col("embedding").alias("a_vec"),
        F.col("_n2").alias("_an2"),
    )
    b = assigned.select(
        "cluster", F.col("rep").alias("b_rep"), F.col("embedding").alias("b_vec"),
        F.col("_n2").alias("_bn2"),
    )
    dropped = (
        a.join(b, "cluster")
        .filter(F.col("a_rep") < F.col("b_rep"))
        .filter(F.round(cosine_pre("a_vec", "b_vec", "_an2", "_bn2"), 6) >= _SEM_THRESHOLD)
        .select(F.col("b_rep").alias("rep"))
        .distinct()
        .withColumn("is_dropped", F.lit(1))
    )
    return (
        assigned.join(dropped, "rep", "left")
        .groupBy("cluster")
        .agg(
            F.sum("nm").cast("bigint").alias("n_vectors"),
            F.count("*").cast("bigint").alias("n_reps"),
            F.sum(F.coalesce("is_dropped", F.lit(0))).cast("bigint").alias("n_dropped_reps"),
            F.sum(F.when(F.col("is_dropped").isNotNull(), F.col("nm")).otherwise(0))
            .cast("bigint")
            .alias("n_dropped_vectors"),
        )
        .orderBy("cluster")
    )


SEMANTIC_DEDUP_SQL = f"""
WITH vals AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
cent0 AS (
  SELECT label AS cl, pos, round(avg(v), 6) AS c FROM vals GROUP BY label, pos
),
reps AS (
  SELECT embedding, min(vec_id) AS rep, count(*) AS nm
  FROM embeddings GROUP BY embedding
),
rvals AS (
  SELECT rep, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM reps
),
rcos AS (
  SELECT r.rep, c.cl,
         round(sum(r.v * c.c) / sqrt(sum(r.v * r.v) * sum(c.c * c.c)), 6) AS cos
  FROM rvals r JOIN cent0 c USING (pos) GROUP BY 1, 2
),
ra AS (
  SELECT rep, cl AS cluster FROM (
    SELECT *, row_number() OVER (PARTITION BY rep ORDER BY cos DESC, cl ASC) AS rk
    FROM rcos
  ) WHERE rk = 1
),
rv2 AS (SELECT ra.cluster, v.rep, v.pos, v.v FROM rvals v JOIN ra USING (rep)),
pairs AS (
  SELECT a.cluster, a.rep AS a_rep, b.rep AS b_rep,
         round(sum(a.v * b.v) / sqrt(sum(a.v * a.v) * sum(b.v * b.v)), 6) AS cosine
  FROM rv2 a JOIN rv2 b
    ON a.cluster = b.cluster AND a.pos = b.pos AND a.rep < b.rep
  GROUP BY 1, 2, 3
  HAVING cosine >= {_SEM_THRESHOLD}
),
dropped AS (SELECT DISTINCT b_rep AS rep FROM pairs)
SELECT ra.cluster,
       CAST(sum(r.nm) AS BIGINT) AS n_vectors,
       CAST(count(*) AS BIGINT) AS n_reps,
       CAST(sum(CASE WHEN d.rep IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_reps,
       CAST(sum(CASE WHEN d.rep IS NOT NULL THEN r.nm ELSE 0 END) AS BIGINT) AS n_dropped_vectors
FROM reps r
JOIN ra ON ra.rep = r.rep
LEFT JOIN dropped d ON d.rep = r.rep
GROUP BY ra.cluster
ORDER BY ra.cluster
"""


# --------------------------------------- maintained ANN index loop (r9)
_DAY1_VID_OFFSET = 10_000_000
_ANN_THRESHOLD = 0.9
_ANN_IDENT = "transform(embedding, x -> cast(x AS DOUBLE))"
_ANN_NEG = "transform(embedding, x -> -cast(x AS DOUBLE))"
# perturb element index 1 — NOT an LSH plane dimension (_LSH_DIMS), so
# the perturbed copy keeps its original's bucket and the candidate join
# finds it (a plane-dimension perturbation could flip the bucket, which
# is legitimate LSH recall loss but would weaken the fixture)
_ANN_PERT = "transform(embedding, (x, i) -> cast(x AS DOUBLE) + IF(i = 1, 0.125D, 0D))"
_ANN_NEG_PERT = "transform(prev_emb, (x, i) -> -cast(x AS DOUBLE) + IF(i = 1, 0.125D, 0D))"


def _ann_bucket(col: str):
    """Sign-pattern bucket of a DERIVED double vector (same axis-aligned
    planes as similarity_lsh_bucketed, reproducible in SQL)."""
    return sum(
        (
            F.when(F.element_at(F.col(col), d + 1) >= 0, F.lit(1 << i)).otherwise(0)
            for i, d in enumerate(_LSH_DIMS)
        ),
        F.lit(0),
    )


def _ann_day1(emb: DataFrame) -> DataFrame:
    """Day-1 vector increment (two-day ANN maintenance fixture): vec_id
    % 4 == 1 in three classes by vec_id % 3 — NEGATED vector (% 3 == 0:
    cosine -1 vs its original, ≤0.52 vs everything else at sf0.01 →
    genuinely new, the survivor class), exact copy (% 3 == 1: dup at
    1.0), perturbed copy (% 3 == 2: +0.125 on a non-plane element →
    near-dup ~0.99). All arithmetic is exact-float-in-double, identical
    in DuckDB. Ids offset 10M to disambiguate from corpus ids."""
    e = emb.filter(F.col("vec_id") % 4 == 1)
    vec = (
        F.when(F.col("vec_id") % 3 == 0, F.expr(_ANN_NEG))
        .when(F.col("vec_id") % 3 == 1, F.expr(_ANN_IDENT))
        .otherwise(F.expr(_ANN_PERT))
    )
    return e.select((F.col("vec_id") + _DAY1_VID_OFFSET).alias("vec_id"), vec.alias("vec"))


def _ann_day2(emb: DataFrame) -> DataFrame:
    """Day-2 increment: vec_id % 4 == 2 — exact corpus copy (% 3 == 0),
    RE-CRAWL of day-1 survivor (vec_id-1)'s negated vector, perturbed
    (% 3 == 1: near-dup ONLY against the maintained increment — its
    cosine vs the corpus original is ≈ -0.99), and its own negation
    (% 3 == 2: new)."""
    prev = emb.select((F.col("vec_id") + 1).alias("vec_id"), F.col("embedding").alias("prev_emb"))
    e = emb.filter(F.col("vec_id") % 4 == 2).join(prev, "vec_id")
    vec = (
        F.when(F.col("vec_id") % 3 == 0, F.expr(_ANN_IDENT))
        .when(F.col("vec_id") % 3 == 1, F.expr(_ANN_NEG_PERT))
        .otherwise(F.expr(_ANN_NEG))
    )
    return e.select("vec_id", vec.alias("vec"))


def _ann_index_rows(vectors: DataFrame, id_col: str = "vec_id", vec_expr: str | None = None) -> DataFrame:
    v = F.expr(vec_expr) if vec_expr else F.col("vec")
    out = vectors.select(F.col(id_col).alias("c_id"), v.alias("c_vec"))
    return out.withColumn("bucket", _ann_bucket("c_vec")).select("bucket", "c_id", "c_vec")


def _ann_classify(inc: DataFrame, index_df: DataFrame) -> DataFrame:
    """Best match per increment vector against the standing bucket
    index: bucket-join candidates → vectorized cosine ≥ threshold →
    max cosine, ties to the smallest index id."""
    from pravega_spark.functions.vectors import cosine_pre, norm2

    # squared norms once per SIDE row, below the bucket join — the join
    # multiplies rows (candidates per bucket), the norms don't change
    # (norm2/cosine_pre: identical arithmetic, one dot per candidate)
    i = inc.withColumn("bucket", _ann_bucket("vec")).withColumn("_qn2", norm2("vec"))
    sims = (
        i.join(index_df.withColumn("_cn2", norm2("c_vec")), "bucket")
        .withColumn("cosine", F.round(cosine_pre("vec", "c_vec", "_qn2", "_cn2"), 6))
        .filter(F.col("cosine") >= _ANN_THRESHOLD)
        .select("vec_id", "c_id", "cosine")
    )
    best = sims.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.col("c_id"))),
    ).filter(F.col("rn") == 1)
    return inc.select("vec_id").join(best, "vec_id", "left").select(
        "vec_id",
        F.col("c_id").isNotNull().alias("is_near_dup"),
        F.col("c_id").alias("matched_vec"),
        "cosine",
    )


def similarity_incremental_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-day incremental ANN near-dup with the index-maintenance loop
    closed — the VECTOR twin of dedup_minhash_incremental_maintained:
    the standing corpus persists as a bucketed LSH-bucket catalog table
    (sign-pattern planes, same construction as similarity_lsh_bucketed);
    day 1 classifies its increment against it and APPENDS the surviving
    vectors' postings bucket-aligned (append_bucketed_index, exactly-
    once increment marker, no rebuild); day 2 classifies against the
    MAINTAINED index, so a re-crawl of a day-1 vector flags with
    matched_tier='increment' — the signal that only exists because the
    maintenance step ran.

    100 TB shape: both passes are O(increment) — the index side is a
    bucketed scan co-located on the bucket key (candidates never
    reshuffle the corpus), cosine runs vectorized on whole arrays, and
    the append writes O(survivors) rows. Both sides EXACT-COLLAPSE to
    one representative per distinct vector first (min id — r9 sweep
    lesson, same as the MinHash family: the 16-cell bucket space makes
    the candidate join quadratic in per-bucket mass, and the synthetic
    sf10 corpus is ~100 copies per distinct vector; collapse is
    output-identical because identical vectors have identical cosines
    everywhere and the best-match tie-break IS min id — which the
    uncollapsed oracle reproduces with its min-id row_number). Reruns
    are output-stable: on a rerun the appended day-1 postings make
    day-1 vectors match themselves at 1.0, so survivors are empty and
    the marker no-ops — the maintained table and day-2's
    classification are unchanged.

    Reference parity: no vector plane in the reference; extends the
    engine's similarity layer (SURVEY §6) with the daily-ingest ANN
    shape the r8 verdict's dedup loop established for text."""
    from pravega_spark.sources.bucketed import _source_fingerprint
    from pravega_spark.sources.bucketing import (
        append_bucketed_index,
        ensure_bucketed_index,
        increment_applied,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    src = os.path.join(os.path.abspath(sf_dir), "embeddings.parquet")
    # exact-collapse the corpus (group on the raw float array — binary
    # equality, the embedding_near_dup precedent)
    corpus_reps = emb.groupBy("embedding").agg(F.min("vec_id").alias("vec_id"))
    # v2: the name versions the FIXTURE semantics too — the appended
    # day-1 survivor rows are derived by this module's code, so a
    # semantic change must mint a new table or a persisted index keeps
    # serving survivors computed by the old derivation (same-prefix +
    # same-source siblings GC on rebuild)
    tbl = f"pvs_annmaint_v2_{_source_fingerprint(sf_dir, 'embeddings')}"
    indexed = ensure_bucketed_index(
        spark, "pvs_annmaint_", tbl,
        lambda: _ann_index_rows(corpus_reps, vec_expr=_ANN_IDENT), ["bucket"], 16,
        source_path=src,
    )
    base = spark.table(tbl) if indexed else _ann_index_rows(corpus_reps, vec_expr=_ANN_IDENT)

    day1_reps = None
    if indexed and increment_applied(spark, tbl, "day1"):
        # rerun: day-1 survivors already merged into the standing index
        # — the classify-day-1 lineage's only consumer is the append
        # (which would marker-no-op), so skip building it (guide §1.2)
        maintained = spark.table(tbl)
    else:
        day1 = _ann_day1(emb)
        day1_reps = day1.groupBy("vec").agg(F.min("vec_id").alias("vec_id")).persist()
        day1_cls = _ann_classify(day1_reps, base)
        survivors = day1_reps.join(
            day1_cls.filter(~F.col("is_near_dup")).select("vec_id"), "vec_id"
        )
        surv_rows = _ann_index_rows(survivors)
        if indexed:
            append_bucketed_index(spark, tbl, surv_rows, ["bucket"], 16, increment_id="day1")
            maintained = spark.table(tbl)
        else:
            maintained = base.unionByName(surv_rows)

    day2 = _ann_day2(emb)
    day2_reps = day2.groupBy("vec").agg(F.min("vec_id").alias("vec_id")).persist()
    rep_out = _ann_classify(day2_reps, maintained)
    # expand representative results back over the vector-content key:
    # every day-2 row sharing a vector gets its representative's match
    # (content key = md5 of the serialized vector, the gkey precedent)
    rep_tk = rep_out.join(day2_reps, "vec_id").select(
        F.md5(F.to_json(F.struct("vec"))).alias("_tk"),
        "is_near_dup", "matched_vec", "cosine",
    )
    out = (
        day2.select("vec_id", F.md5(F.to_json(F.struct("vec"))).alias("_tk"))
        .join(rep_tk, "_tk")
        .select(
            "vec_id",
            "is_near_dup",
            "matched_vec",
            F.when(F.col("matched_vec") >= _DAY1_VID_OFFSET, F.lit("increment"))
            .when(F.col("matched_vec").isNotNull(), F.lit("corpus"))
            .alias("matched_tier"),
            "cosine",
        )
        .orderBy("vec_id")
    )
    out = register_result_cache(out.persist())
    out.count()
    if day1_reps is not None:
        day1_reps.unpersist()
    day2_reps.unpersist()
    return out


_ANN_SQL_IDENT = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
_ANN_SQL_NEG = "list_transform(embedding, x -> -CAST(x AS DOUBLE))"
_ANN_SQL_PERT = (
    "list_transform(range(1, len(embedding) + 1), "
    "i -> CAST(embedding[i] AS DOUBLE) + CASE WHEN i = 2 THEN 0.125 ELSE 0 END)"
)
_ANN_SQL_NEG_PERT = (
    "list_transform(range(1, len(prev_emb) + 1), "
    "i -> -CAST(prev_emb[i] AS DOUBLE) + CASE WHEN i = 2 THEN 0.125 ELSE 0 END)"
)
_ANN_SQL_BUCKET = " + ".join(
    f"(CASE WHEN vec[{d + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
    for i, d in enumerate(_LSH_DIMS)
)

ANN_MAINTAINED_SQL = f"""
WITH corpus AS MATERIALIZED (
  SELECT vec_id AS c_id, {_ANN_SQL_IDENT} AS vec FROM embeddings
),
day1 AS MATERIALIZED (
  SELECT orig_id + {_DAY1_VID_OFFSET} AS vec_id,
         CASE WHEN orig_id % 3 = 0 THEN {_ANN_SQL_NEG}
              WHEN orig_id % 3 = 1 THEN {_ANN_SQL_IDENT}
              ELSE {_ANN_SQL_PERT} END AS vec
  FROM (SELECT vec_id AS orig_id, embedding FROM embeddings WHERE vec_id % 4 = 1)
),
day2 AS MATERIALIZED (
  SELECT orig_id AS vec_id,
         CASE WHEN orig_id % 3 = 0 THEN {_ANN_SQL_IDENT}
              WHEN orig_id % 3 = 1 THEN {_ANN_SQL_NEG_PERT}
              ELSE {_ANN_SQL_NEG} END AS vec
  FROM (SELECT e.vec_id AS orig_id, e.embedding, p.embedding AS prev_emb
        FROM embeddings e JOIN embeddings p ON p.vec_id = e.vec_id - 1
        WHERE e.vec_id % 4 = 2)
),
-- day-1 classification vs the CORPUS index (bucket join + cosine)
d1_matched AS MATERIALIZED (
  SELECT DISTINCT s.vec_id FROM (
    SELECT i.vec_id, round(
      list_sum(list_transform(range(1, len(i.vec) + 1), k -> i.vec[k] * c.vec[k])) /
      sqrt(list_sum(list_transform(i.vec, x -> x * x)) *
           list_sum(list_transform(c.vec, x -> x * x))), 6) AS cosine
    FROM (SELECT vec_id, vec, {_ANN_SQL_BUCKET} AS bucket FROM day1) i
    JOIN (SELECT c_id, vec, {_ANN_SQL_BUCKET} AS bucket FROM corpus) c
      ON i.bucket = c.bucket
  ) s WHERE s.cosine >= {_ANN_THRESHOLD}
),
index_rows AS MATERIALIZED (
  SELECT c_id, vec FROM corpus
  UNION ALL
  SELECT vec_id AS c_id, vec FROM day1
  WHERE vec_id NOT IN (SELECT vec_id FROM d1_matched)
),
d2_sims AS (
  SELECT i.vec_id, c.c_id, round(
    list_sum(list_transform(range(1, len(i.vec) + 1), k -> i.vec[k] * c.vec[k])) /
    sqrt(list_sum(list_transform(i.vec, x -> x * x)) *
         list_sum(list_transform(c.vec, x -> x * x))), 6) AS cosine
  FROM (SELECT vec_id, vec, {_ANN_SQL_BUCKET} AS bucket FROM day2) i
  JOIN (SELECT c_id, vec, {_ANN_SQL_BUCKET} AS bucket FROM index_rows) c
    ON i.bucket = c.bucket
),
d2_best AS (
  SELECT vec_id, c_id, cosine,
         row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, c_id) AS rn
  FROM d2_sims WHERE cosine >= {_ANN_THRESHOLD}
)
SELECT d.vec_id,
       b.c_id IS NOT NULL AS is_near_dup,
       b.c_id AS matched_vec,
       CASE WHEN b.c_id >= {_DAY1_VID_OFFSET} THEN 'increment'
            WHEN b.c_id IS NOT NULL THEN 'corpus' END AS matched_tier,
       b.cosine
FROM day2 d LEFT JOIN (SELECT * FROM d2_best WHERE rn = 1) b ON b.vec_id = d.vec_id
ORDER BY d.vec_id
"""


# ------------------------------------------- product quantization (r11)
_PQ_M = 4  # subspaces
_PQ_SUB = 16  # dims per subspace (64-d embeddings)
_PQ_TOP = 20


def _l2sq(x, c) -> "F.Column":
    """Squared L2 distance between two array columns — JVM-side
    zip_with + sequential fold, same shape as functions.vectors.dot."""
    return F.aggregate(
        F.zip_with(
            x,
            c,
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def similarity_pq_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization encode (Jegou et al. 2011, the FAISS PQ
    building block): each 64-d embedding is split into 4 subvectors of
    16 dims; each subvector is assigned to its nearest codeword, and
    the (c0,c1,c2,c3) code tuple is the vector's compressed cell. The
    output is the inverted-file cell census — the top cells by
    population and how many coarse labels each cell cuts across (PQ
    cells are finer than, and orthogonal to, the IVF label cells).

    Codebooks: the label-centroid quantizer restricted to each
    subspace (real PQ trains a k-means per subspace; reusing the
    maintained deterministic quantizer keeps the construction
    closed-form and oracle-checkable while exercising the exact
    encode/cell machinery — the k-means twin is
    similarity_kmeans_refine). Distances round to 6 dp before the
    argmin and ties break by codeword id — the same mitigation (not
    a guarantee) the cosine kernels document: the pre-round doubles
    differ only in summation-order ulps, which a 6-dp round absorbs
    unless a distance sits within ~1e-15 of a rounding boundary;
    argmin = array_min over (distance, codeword) structs, the
    lexicographic trick _km_assign pins.

    Scale shape: the ENCODE IS A PER-ROW CODEGEN EXPRESSION against
    the k x dim literal — no join, no shuffle, no build side; the
    corpus is touched once and the only exchange is the final tiny
    groupBy over code tuples. This is why PQ scales to 100 TB: the
    compressed code is produced in the scan.

    Reference parity: no analogue in pravega (stream store);
    similarity layer per the build brief."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    cents = _km_centroids(emb, "label")
    codes = []
    for s in range(_PQ_M):
        lo = s * _PQ_SUB
        sub_cents = [(cl, vec[lo : lo + _PQ_SUB]) for cl, vec in cents]
        scored = F.transform(
            _km_literal(sub_cents),
            lambda c: F.struct(
                F.round(
                    _l2sq(F.slice(F.col("embedding"), lo + 1, _PQ_SUB), c["cv"]), 6
                ).alias("d"),
                c["cl"].alias("cl"),
            ),
        )
        codes.append(F.array_min(scored)["cl"].cast("bigint").alias(f"c{s}"))
    encoded = emb.select("vec_id", "label", *codes)
    return (
        encoded.groupBy(*[f"c{s}" for s in range(_PQ_M)])
        .agg(
            F.count("*").cast("bigint").alias("n_vectors"),
            F.countDistinct("label").cast("bigint").alias("n_labels"),
        )
        .orderBy(F.desc("n_vectors"), *[f"c{s}" for s in range(_PQ_M)])
        .limit(_PQ_TOP)
    )


PQ_CELLS_SQL = f"""
WITH vals AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
cent AS (
  SELECT label, pos, round(avg(v), 6) AS c FROM vals GROUP BY 1, 2
),
dist AS (
  SELECT v.vec_id, (v.pos - 1) // {_PQ_SUB} AS sub, c.label AS cl,
         round(sum((v.v - c.c) * (v.v - c.c)), 6) AS d
  FROM vals v JOIN cent c ON c.pos = v.pos
  GROUP BY 1, 2, 3
),
codes AS (
  SELECT vec_id, sub, cl FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cl) AS rn
    FROM dist
  ) WHERE rn = 1
),
cells AS (
  SELECT c.vec_id,
         {", ".join(f"max(CASE WHEN c.sub = {s} THEN c.cl END) AS c{s}" for s in range(_PQ_M))}
  FROM codes c GROUP BY 1
)
SELECT {", ".join(f"CAST(ce.c{s} AS BIGINT) AS c{s}" for s in range(_PQ_M))},
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(count(DISTINCT e.label) AS BIGINT) AS n_labels
FROM cells ce JOIN (SELECT vec_id, label FROM embeddings) e USING (vec_id)
GROUP BY {", ".join(f"ce.c{s}" for s in range(_PQ_M))}
ORDER BY n_vectors DESC, {", ".join(f"c{s}" for s in range(_PQ_M))}
LIMIT {_PQ_TOP}
"""


QUERIES = {
    "similarity_topk_bruteforce": similarity_topk_bruteforce,
    "similarity_lsh_bucketed": similarity_lsh_bucketed,
    "similarity_label_centroids": similarity_label_centroids,
    "similarity_ivf_search": similarity_ivf_search,
    "similarity_ann_recall": similarity_ann_recall,
    "similarity_knn_graph": similarity_knn_graph,
    "similarity_kmeans_refine": similarity_kmeans_refine,
    "similarity_semantic_dedup": similarity_semantic_dedup,
    "similarity_pq_cells": similarity_pq_cells,
    "similarity_incremental_maintained": similarity_incremental_maintained,
    "embedding_near_dup": embedding_near_dup,
}

ORACLES = {
    "similarity_ann_recall": ANN_RECALL_SQL,
    "similarity_knn_graph": KNN_GRAPH_SQL,
    "similarity_kmeans_refine": KMEANS_REFINE_SQL,
    "similarity_semantic_dedup": SEMANTIC_DEDUP_SQL,
    "similarity_pq_cells": PQ_CELLS_SQL,
    "similarity_incremental_maintained": ANN_MAINTAINED_SQL,
    "similarity_topk_bruteforce": TOPK_SQL,
    "similarity_lsh_bucketed": LSH_TOPK_SQL,
    "similarity_label_centroids": CENTROIDS_SQL,
    "similarity_ivf_search": IVF_SEARCH_SQL,
    "embedding_near_dup": NEAR_DUP_SQL,
}
