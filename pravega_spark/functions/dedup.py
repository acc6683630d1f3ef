"""Near-duplicate detection kernels — the production-parameter API.

The gated oracle queries (queries/text.py) keep tiny MinHash parameters
(k=4, single-hash bands) so DuckDB can mirror them cell-for-cell. THIS
module is the engine's recommended path at corpus scale: banded MinHash
LSH with the classic b×r construction (default 128 permutations in
16 bands × 8 rows — the parameterization real dedup pipelines run),
candidate pruning by set-size ratio, and exact-Jaccard verification so
emitted pairs are never false positives.

Recall math (why these defaults): a pair with true Jaccard J collides in
one band with probability J^r, hence anywhere with p = 1-(1-J^r)^b.
At b=16, r=8: J=0.8 → 0.947, J=0.9 → 0.999; the S-curve midpoint sits
near (1/b)^(1/r) ≈ 0.707, well below the usual 0.8 threshold. A
property test (tests/test_dedup_recall.py) asserts ≥0.9 recall on
planted near-dups at J ≥ 0.8.

Everything is JVM-side (md5 / higher-order array functions): no Python
UDFs, full whole-stage codegen; the band join is the only quadratic-ish
step and it is per-(band, key) bucket — the 100 TB shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pravega_spark.caching import register_result_cache


def shingle(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(id, shingle) pairs: distinct word n-grams per document."""
    w = F.split(F.trim(F.col(text_col)), " +")
    df = df.select(F.col(id_col).alias("doc_id"), w.alias("w"))
    parts = ", ".join(f"w[i + {j}]" for j in range(n))
    sh = F.expr(
        f"CASE WHEN size(w) >= {n} "
        f"THEN transform(sequence(0, size(w) - {n}), i -> concat_ws(' ', {parts})) "
        "ELSE array(concat_ws(' ', w)) END"
    )
    return df.select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))


def minhash_signatures(
    shingles: DataFrame,
    n_hashes: int = 128,
    id_col: str = "doc_id",
    shingle_col: str = "shingle",
) -> DataFrame:
    """(id, n_sh, sig ARRAY<STRING>[n_hashes]) — one aggregation pass.

    Permutation k = md5("seed<k>:" || shingle); the signature element is
    the minimum over the doc's shingle set. ``n_sh`` is the DISTINCT-set
    size (``size(sh_set)``, not the input row count) so the size-ratio
    prune and the Jaccard denominator stay correct and deterministic
    even when a caller passes duplicate (doc, shingle) rows.
    """
    mins = [
        F.min(F.md5(F.concat(F.lit(f"seed{k}:"), F.col(shingle_col)))).alias(f"_mh{k}")
        for k in range(n_hashes)
    ]
    sigs = shingles.groupBy(F.col(id_col).alias("doc_id")).agg(
        F.collect_set(shingle_col).alias("sh_set"), *mins
    )
    return sigs.select(
        "doc_id",
        F.size("sh_set").alias("n_sh"),
        "sh_set",
        F.array(*[F.col(f"_mh{k}") for k in range(n_hashes)]).alias("sig"),
    )


def member_pairs(groups: DataFrame, a_name: str = "id_a", b_name: str = "id_b",
                 carry: tuple = ()) -> DataFrame:
    """All ordered pairs within each group's sorted ``members`` array.

    ``members`` must be sorted ascending, so ``members[i]`` is smaller
    than every element of the tail it is paired with — the (a, b)
    ordering holds by construction. ``carry`` lists group columns to
    pass through onto every emitted pair.
    """
    return (
        groups.filter(F.size("members") > 1)
        .select(
            *carry,
            F.explode(
                F.expr(
                    "flatten(transform(sequence(0, size(members)-2), "
                    "i -> transform(slice(members, i+2, size(members)-i-1), "
                    f"y -> struct(members[i] AS {a_name}, y AS {b_name}))))"
                )
            ).alias("_p"),
        )
        .select(*carry, f"_p.{a_name}", f"_p.{b_name}")
    )


def expand_pairs(pairs: DataFrame, groups: DataFrame, a_col: str = "id_a",
                 b_col: str = "id_b", rep_col: str = "doc_id") -> DataFrame:
    """Representative-level pairs → member-level pairs via ``groups``'
    membership lists (cross product of both sides' members).

    PRECONDITION: ``rep_col`` values are UNIQUE across ``groups`` rows
    (one group per representative). A rep shared by two groups would
    join both membership lists onto the same pair and cross-attach one
    group's carried columns (e.g. cosine) to the other's members.
    Callers must therefore collapse duplicate ids BEFORE grouping —
    both kernels here do (minhash groups by set_key with min(doc_id)
    rep over a per-doc signature table; embedding_near_dup_lsh dedups
    (id, vec) rows first).

    Groups partition the id space, so the expansion never emits a
    self-pair or a duplicate; least/greatest restores a < b. All other
    ``pairs`` columns are carried through unchanged.
    """
    carry = [c for c in pairs.columns if c not in (a_col, b_col)]
    reserved = {"_a", "_b", "_ms_a", "_ms_b"}
    if reserved & set(pairs.columns):
        raise ValueError(f"pairs may not carry reserved columns {reserved & set(pairs.columns)}")
    return (
        pairs.join(
            groups.select(F.col(rep_col).alias(a_col), F.col("members").alias("_ms_a")), a_col
        )
        .join(groups.select(F.col(rep_col).alias(b_col), F.col("members").alias("_ms_b")), b_col)
        .select(*carry, F.explode("_ms_a").alias("_a"), "_ms_b")
        .select(*carry, "_a", F.explode("_ms_b").alias("_b"))
        .select(
            *carry,
            F.least("_a", "_b").alias(a_col),
            F.greatest("_a", "_b").alias(b_col),
        )
    )


def minhash_lsh_pairs(
    shingles: DataFrame,
    threshold: float = 0.8,
    n_hashes: int = 128,
    bands: int = 16,
    id_col: str = "doc_id",
    shingle_col: str = "shingle",
) -> DataFrame:
    """Near-dup pairs (id_a, id_b, jaccard) with jaccard ≥ threshold.

    Banded LSH (b=bands, r=n_hashes//bands): a pair becomes a candidate
    iff some band's r-row slice matches exactly; candidates are pruned
    by the size-ratio bound J ≤ min/max and verified with exact Jaccard
    over the shingle sets, so precision is 1.0 and recall follows the
    1-(1-J^r)^b curve. All joins are per-bucket or per-candidate —
    nothing is all-pairs.
    """
    if n_hashes % bands:
        raise ValueError(f"n_hashes={n_hashes} must divide into bands={bands}")
    r = n_hashes // bands
    sh = shingles.select(F.col(id_col).alias("doc_id"), F.col(shingle_col).alias("shingle"))
    # one pass over the shingle table: signatures + sizes + the set
    # itself; verification is array_intersect against this doc-level
    # table, never a re-join over raw shingles
    sigs = minhash_signatures(sh, n_hashes=n_hashes)
    # EXACT-COLLAPSE pre-pass (the standard pipeline order: exact dedup
    # before near-dedup). Docs with identical shingle SETS have identical
    # signatures, identical band keys and Jaccard 1.0 with each other, so
    # the LSH + verify stages only ever need ONE representative per set;
    # member pairs are reconstructed afterwards. Output is provably
    # identical to running LSH over the full corpus — identical sets ⇒
    # identical candidacy and identical verified Jaccard — but the
    # quadratic stages (band self-join, exact verification) shrink by the
    # corpus's duplication factor, which is exactly the factor that blows
    # up on real crawl data. Beware: a degenerate mass-duplicate group
    # still emits O(|group|²) pairs, because those pairs ARE the answer.
    groups = (
        # per-shingle md5 before sort/concat: hex digests contain no "|",
        # so the concatenation is prefix-unambiguous for any text
        sigs.withColumn(
            "set_key",
            F.md5(F.concat_ws("|", F.array_sort(F.transform("sh_set", F.md5)))),
        )
        .groupBy("set_key")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.first("n_sh").alias("n_sh"),
            F.first("sig").alias("sig"),
            F.first("sh_set").alias("sh_set"),
            F.array_sort(F.collect_list("doc_id")).alias("members"),
        )
        .persist()
    )
    # all-pairs within one exact group at Jaccard exactly 1.0
    intra = member_pairs(groups).withColumn("jaccard", F.lit(1.0))
    sigs = groups  # representatives only, one per distinct shingle set
    band_keys = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", F.slice(F.col("sig"), b * r + 1, r))).alias("key"),
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select("doc_id", "n_sh", F.explode(band_keys).alias("bk")).select(
        "doc_id", "n_sh", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(
            F.least(F.col("a.n_sh"), F.col("b.n_sh"))
            >= F.lit(threshold) * F.greatest(F.col("a.n_sh"), F.col("b.n_sh"))
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .distinct()
    )
    inter = (
        cand.join(sigs.select(F.col("doc_id").alias("id_a"), F.col("sh_set").alias("set_a")), "id_a")
        .join(sigs.select(F.col("doc_id").alias("id_b"), F.col("sh_set").alias("set_b")), "id_b")
        .select(
            "id_a", "id_b", "n_a", "n_b",
            F.size(F.array_intersect("set_a", "set_b")).alias("n_common"),
        )
    )
    rep_pairs = (
        inter.withColumn(
            "jaccard", F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # expand rep-level near-dup pairs back to member pairs: every member
    # of group(rep_a) pairs with every member of group(rep_b) at the same
    # Jaccard (identical sets per side). Most groups are singletons —
    # both joins hit the persisted groups table and the explosion is the
    # duplicate mass itself, not a blow-up.
    out = intra.unionByName(expand_pairs(rep_pairs, groups), allowMissingColumns=False)
    # materialize the (small) verified-pairs result while groups is hot,
    # then free the cache: groups carries the corpus's distinct shingle
    # sets — leaving it persisted would pin O(corpus) executor storage
    # for the session. If the cached result is ever evicted, lineage
    # recompute is still correct, just slower.
    out = register_result_cache(out.persist())
    out.count()
    groups.unpersist()
    return out


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """(id, cluster_id) for every vertex of the pair graph; cluster_id =
    min vertex id in the connected component.

    The dedup pipeline's final step: near-dup PAIRS become duplicate
    CLUSTERS, and keep-min-id per cluster picks the canonical document.
    Two tiers, mirroring the store's hot/distributed write split:

    * small edge sets (≤ ``PRAVEGA_SPARK_CC_LOCAL_MAX_EDGES``, default
      2M — a few tens of MB) collect once and run union-find on the
      driver: microseconds of CPU instead of 3 shuffle jobs per round
      whose task-scheduling floor dwarfs the data at this size.
    * larger graphs run iterative smallest-label propagation — per
      round each vertex takes the min of its own label and its
      neighbors' labels; converges in O(component diameter) rounds
      (driver loop, distributed joins, no collect of the graph).
      Near-dup clusters are dense (diameter 2-3) so the round count
      stays tiny; pointer-doubling variants were measured SLOWER here
      (the extra self-join per round costs more than the rounds it
      saves on low-diameter graphs). Each round persists its labels
      and drops the previous round's cache, so lineage and storage
      stay O(1) in rounds.
    """
    import os

    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .persist()
    )
    local_max = int(os.environ.get("PRAVEGA_SPARK_CC_LOCAL_MAX_EDGES", str(2_000_000)))
    # tier probe: bounded limit-scan instead of a full count() — on the
    # distributed path this avoids one full materialization job ahead of
    # the iteration loop (the loop's round 1 fills the persisted cache)
    n_probe = edges.limit(local_max + 1).count()
    if n_probe <= local_max:
        spark = pairs.sparkSession
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        rows = edges.toArrow()
        id_type = edges.schema["src"].dataType.simpleString()
        edges.unpersist()
        srcs, dsts = rows["src"].to_pylist(), rows["dst"].to_pylist()
        for s, d in zip(srcs, dsts):
            rs, rd = find(s), find(d)
            if rs != rd:
                # union by min so cluster_id = min vertex id, matching
                # the distributed path and the recursive-CTE oracle
                lo, hi = (rs, rd) if rs < rd else (rd, rs)
                parent[hi] = lo
        verts = set(srcs) | set(dsts)
        # Arrow fast path back to the JVM: a plain list-of-tuples
        # createDataFrame pickles row by row (~1.4 s for ~50k vertices
        # measured at sf0.1); the pandas frame rides the session's
        # arrow.pyspark.enabled batch transfer with the same schema
        import pandas as pd

        ids = list(verts)  # one materialization: both columns index it
        out = pd.DataFrame({"id": ids, "cluster_id": [find(v) for v in ids]})
        return spark.createDataFrame(out, f"id {id_type}, cluster_id {id_type}")
    labels = (
        edges.select(F.col("src").alias("id")).distinct().withColumn("cluster", F.col("id"))
    ).persist()
    labels.count()
    changed = 0
    for i in range(max_iters):
        nbr = (
            edges.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("cluster").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr, "id", "left")
            .select("id", F.least("cluster", F.coalesce("nbr_min", "cluster")).alias("cluster"))
        ).persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.cluster") != F.col("o.cluster"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
        if (i + 1) % 5 == 0:
            # cut lineage periodically: persist caches DATA but the
            # logical plan still nests one level per round, so a
            # high-diameter graph (rare for near-dup clusters, but the
            # path exists) would pay exponential plan-compilation blowup
            # past ~10 rounds. localCheckpoint materializes the labels
            # and restarts the plan from the stored partitions.
            cut = new_labels.localCheckpoint(eager=True)
            new_labels.unpersist()
            labels = cut
    edges.unpersist()
    register_result_cache(labels)  # persisted result: released by harnesses
    if changed:
        # labels flow one direction per round (edges are pre-doubled, so
        # both directions arrive over successive rounds): a component
        # whose diameter exceeds max_iters would silently come back
        # SPLIT. Make that loud; PRAVEGA_SPARK_CC_STRICT=1 escalates to
        # an error for pipelines where a split cluster corrupts dedup.
        import os as _os
        import warnings

        msg = (
            f"connected_components did not converge in max_iters={max_iters} "
            f"rounds ({changed} labels still changing) — components wider "
            "than max_iters are split; raise max_iters"
        )
        if _os.environ.get("PRAVEGA_SPARK_CC_STRICT", "") == "1":
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels.select("id", F.col("cluster").alias("cluster_id"))
