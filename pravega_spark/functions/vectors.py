"""Vector math over ``array<float>`` columns — the fast path.

The oracle-parity queries (queries/similarity.py) use a relational
explode-join formulation so DuckDB can verify them. THIS module is the
performance path the engine actually recommends: JVM-side higher-order
functions (``zip_with`` + ``aggregate``) that never explode rows and
stay inside whole-stage codegen, plus an Arrow-batched Pandas-UDF
variant (numpy matmul) for very wide corpora where per-element lambda
evaluation loses to BLAS.

Scale shape for top-k search: broadcast the (small) query set, compute
per-row best-k with a window — corpus never shuffles; for all-pairs
near-dup, LSH-bucket first (lsh_bucket) so the join is per-bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pravega_spark.caching import register_result_cache


def dot(a: Column | str, b: Column | str) -> Column:
    """JVM-side dot product of two array columns (no UDF, no explode)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def norm2(a: Column | str) -> Column:
    """Squared L2 norm — ``dot(a, a)``. Compute it ONCE per row before a
    pair join and feed it to ``cosine_pre``: a pair join recomputes each
    side's norm per PAIR otherwise (cosine() is three dot passes), and
    candidate multiplicity makes that the dominant per-task work in the
    bucketed kernels (guide §1.2)."""
    return dot(a, a)


def cosine_pre(a: Column | str, b: Column | str,
               a_n2: Column | str, b_n2: Column | str) -> Column:
    """``cosine(a, b)`` with both sides' squared norms precomputed (see
    ``norm2``) and carried through the join. Arithmetic is IDENTICAL to
    ``cosine`` bit for bit: dot(x, x) yields the same double wherever it
    is evaluated, and the ``a_n2 * b_n2`` multiply keeps cosine's
    dot(a,a)·dot(b,b) operand order — only the number of evaluations
    changes (one dot per pair instead of three)."""
    a_n2 = F.col(a_n2) if isinstance(a_n2, str) else a_n2
    b_n2 = F.col(b_n2) if isinstance(b_n2, str) else b_n2
    return dot(a, b) / F.nullif(F.sqrt(a_n2 * b_n2), F.lit(0.0))


def cosine(a: Column | str, b: Column | str) -> Column:
    # sqrt(|a|² · |b|²) rather than sqrt(|a|²)·sqrt(|b|²): one rounding
    # step instead of two, and bit-compatible with the SQL oracles'
    # `/ sqrt(sum(a*a) * sum(b*b))` denominator — a 1-ulp denominator
    # difference can flip a fixed-dp round at a tie boundary.
    # Zero-norm (degenerate) vectors yield NULL, never a division: under
    # Spark 4's default ANSI mode 0.0/0.0 RAISES DIVIDE_BY_ZERO, and
    # DuckDB's x/0 is NULL — the when-guard gives both engines the same
    # dropped-row semantics on degenerate inputs.
    # nullif, not when(denom != 0, ...): the when-form duplicates the
    # denominator expression (condition + value) and costs ~2 extra dot
    # evaluations per row — measured +15-35% on the top-k hot path.
    # x / NULL is NULL under ANSI too, so the semantics are identical.
    return dot(a, b) / F.nullif(F.sqrt(dot(a, a) * dot(b, b)), F.lit(0.0))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    round_to: int | None = None,
) -> DataFrame:
    """Brute-force exact top-k: broadcast queries × corpus, one window.

    Returns (q_id, c_id, cosine, rk). The corpus side streams through
    codegen without shuffling; the only shuffle is the per-query top-k
    window over q_id (tiny: |queries| × |corpus| rows reduced map-side
    is not possible for row_number, so keep |queries| modest or use
    lsh_bucket first).

    ``round_to`` rounds the cosine BEFORE ranking: ranking raw doubles
    while a parity oracle ranks rounded values would let a rounded tie
    order differently at a rank boundary and emit different rows.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("_qn2", norm2("q_vec"))
    c = corpus.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
    ).withColumn("_cn2", norm2("c_vec"))
    pairs = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.filter(F.col("q_id") != F.col("c_id"))
    cos = cosine_pre("q_vec", "c_vec", "_qn2", "_cn2")
    if round_to is not None:
        cos = F.round(cos, round_to)
    sims = pairs.select("q_id", "c_id", cos.alias("cosine"))
    # two-stage top-k: per-(query, input-partition) local top-k first, so
    # the big shuffle spreads over |queries|×P keys and the final window
    # over q_id alone sees only k×P rows per query — a handful of query
    # ids never becomes the reducer bottleneck at corpus scale.
    w_local = Window.partitionBy("q_id", "_pid").orderBy(F.desc("cosine"), F.asc("c_id"))
    local = (
        sims.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lrk", F.row_number().over(w_local))
        .filter(F.col("_lrk") <= k)
        .drop("_pid", "_lrk")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return local.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def cosine_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """BLAS path: numpy matmul per Arrow batch via mapInPandas.

    The query matrix rides inside the closure (broadcast pickle);
    each partition computes a (batch × queries) similarity matrix and
    emits its local top-k, then a global window finishes — a two-stage
    top-k so only k·|queries| rows per partition shuffle.
    """
    import numpy as np

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[id_col] for r in q_rows])
    q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)

    def compute(batches):
        import pandas as pd

        for pdf in batches:
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            if len(c_mat) == 0:
                continue
            c_norm = np.linalg.norm(c_mat, axis=1)
            sims = (c_mat @ q_mat.T) / np.outer(c_norm, q_norm)
            for qi, q_id in enumerate(q_ids):
                col = sims[:, qi]
                take = min(k + 1, len(col))
                idx = np.argpartition(-col, take - 1)[:take]
                out = pd.DataFrame(
                    {
                        "q_id": int(q_id),
                        "c_id": pdf["_cid"].iloc[idx].to_numpy(),
                        "cosine": col[idx],
                    }
                )
                yield out[out.c_id != out.q_id]

    prepped = corpus.select(F.col(id_col).alias("_cid"), vec_col)
    local = prepped.mapInPandas(compute, schema="q_id long, c_id long, cosine double")
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return local.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def lsh_bucket(vec_col: Column | str, n_planes: int = 8, seed: int = 42) -> Column:
    """Sign-random-projection LSH bucket id (JVM-side, deterministic).

    Hyperplane components are derived from md5(seed, plane, dim) — no
    stored model, reproducible across engines/runs. Vectors in the same
    bucket are cosine-similar candidates; join per bucket for near-dup.
    """
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        # pseudo-random ±1 plane from hash of (seed, plane, index)
        proj = F.aggregate(
            F.zip_with(
                v,
                F.transform(
                    F.sequence(F.lit(0), F.size(v) - 1),
                    lambda i: F.when(
                        F.conv(
                            F.substring(F.md5(F.concat_ws(":", F.lit(seed), F.lit(p), i)), 1, 4),
                            16,
                            10,
                        ).cast("int")
                        % 2
                        == 0,
                        1.0,
                    ).otherwise(-1.0),
                ),
                lambda x, h: x.cast("double") * h,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(0)
    return bucket


def embedding_near_dup_lsh(
    df: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    bands: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs via banded LSH + exact verify inside buckets.

    OR-construction: ``bands`` independent bucketings of ``n_planes``
    hyperplanes each; a pair is a candidate if ANY band collides
    (recall ≈ 1-(1-p^planes)^bands), then the exact cosine filters.
    All-pairs is quadratic; the band join is per-bucket — the 100 TB
    path (same shape as the MinHash band join for text).

    Exact-collapse pre-pass (same argument as the MinHash kernel):
    bit-identical vectors share every bucket and every cosine, so the
    band join runs on one representative per distinct vector; intra
    pairs carry the group's SELF-cosine (≈1.0 for real vectors; NaN/
    NULL degenerate vectors behave exactly as uncollapsed) and rep
    pairs expand through group membership. The quadratic stage shrinks
    by the corpus's duplicate mass.
    """
    from pravega_spark.functions.dedup import expand_pairs, member_pairs

    # expand_pairs requires UNIQUE reps: an id reused with two different
    # vectors would land in two groups and could become the rep (min id)
    # of both, cross-attaching one group's cosine to the other's members
    # in the expansion join. Collapse to one deterministic (id, vec) row
    # per id first (min over the array's lexicographic order) — for the
    # well-formed unique-id corpus this is a no-op aggregation.
    df = df.groupBy(F.col(id_col).alias(id_col)).agg(F.min(vec_col).alias(vec_col))
    g = (
        df.groupBy(F.col(vec_col).alias("vec"))
        .agg(
            F.min(id_col).alias("rep"),
            F.array_sort(F.collect_list(id_col)).alias("members"),
        )
        # squared norm once per distinct vector; every pair downstream
        # reuses it instead of recomputing per candidate (norm2 contract)
        .withColumn("_n2", norm2("vec"))
        .persist()
    )
    intra = member_pairs(
        g.withColumn("cosine", cosine_pre("vec", "vec", "_n2", "_n2")).filter(
            F.col("cosine") >= threshold
        ),
        carry=("cosine",),
    ).select("id_a", "id_b", "cosine")
    with_buckets = g.select(
        F.col("rep").alias("id"),
        "vec",
        "_n2",
        F.explode(
            F.array(
                *[
                    F.concat_ws("#", F.lit(b), lsh_bucket("vec", n_planes, seed=42 + b))
                    for b in range(bands)
                ]
            )
        ).alias("bucket"),
    )
    a = with_buckets.select(
        F.col("id").alias("id_a"), F.col("vec").alias("vec_a"),
        F.col("_n2").alias("_n2a"), "bucket",
    )
    b = with_buckets.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vec_b"),
        F.col("_n2").alias("_n2b"), "bucket",
    )
    rep_pairs = (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "vec_a", "vec_b", "_n2a", "_n2b")
        .distinct()  # a pair may collide in several bands (_n2 is vec-derived)
        .select("id_a", "id_b", cosine_pre("vec_a", "vec_b", "_n2a", "_n2b").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
    # duplicate ids in the INPUT (same vec_id twice) can reach here as
    # same-id members of one group or as same-id reps of two groups; the
    # pre-collapse id_a < id_b formulation never emitted a self-pair, so
    # drop them to keep the contract
    out = (
        intra.unionByName(expand_pairs(rep_pairs, g, rep_col="rep"))
        .filter(F.col("id_a") != F.col("id_b"))
    )
    out = register_result_cache(out.persist())
    out.count()
    g.unpersist()
    return out
