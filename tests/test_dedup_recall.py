"""Recall property test for the production-parameter MinHash LSH.

Plants near-duplicate pairs at true Jaccard ≥ ~0.8 inside a corpus of
unrelated documents, computes ground truth by exact all-pairs Jaccard
(feasible at test size), and asserts the banded LSH (128 perms, 16×8)
surfaces ≥ 90% of true pairs with zero false positives — the guarantee
the 1-(1-J^r)^b curve promises at these parameters.
"""

import random

import pytest
from pyspark.sql import functions as F

from pravega_spark.functions.dedup import minhash_lsh_pairs, shingle

THRESHOLD = 0.8


def _corpus(n_docs=60, doc_len=120, n_dups=15, seed=7):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(800)]
    docs = []
    for i in range(n_docs):
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(doc_len))))
    # planted near-dups: replace ~3% of tokens -> bigram Jaccard ~0.85+
    for j in range(n_dups):
        base_id, text = docs[j]
        toks = text.split()
        for _ in range(max(1, int(len(toks) * 0.03))):
            toks[rng.randrange(len(toks))] = rng.choice(vocab)
        docs.append((1000 + base_id, " ".join(toks)))
    return docs


def test_lsh_recall_at_production_params(spark):
    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sh = shingle(df, n=2).cache()
    sh.count()

    # ground truth: exact all-pairs jaccard (small corpus, test only)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    truth = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("c"))
        .join(sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .withColumn("j", F.col("c") / (F.col("na") + F.col("nb") - F.col("c")))
        .filter(F.col("j") >= THRESHOLD)
    )
    true_pairs = {(r["id_a"], r["id_b"]) for r in truth.collect()}
    assert len(true_pairs) >= 10  # the planting worked

    found = minhash_lsh_pairs(sh, threshold=THRESHOLD, n_hashes=128, bands=16)
    found_pairs = {(r["id_a"], r["id_b"]) for r in found.collect()}

    # precision 1.0 by construction (exact verify)
    assert found_pairs <= true_pairs
    recall = len(found_pairs & true_pairs) / len(true_pairs)
    assert recall >= 0.9, f"recall {recall:.2f} over {len(true_pairs)} true pairs"
    sh.unpersist()


def test_lsh_params_validated(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        minhash_lsh_pairs(shingle(df), n_hashes=100, bands=16)


@pytest.mark.parametrize("seed", [11, 29, 83])
def test_exact_collapse_preserves_pairs(spark, seed):
    """The r5 exact-collapse pre-pass must be output-invisible: planted
    EXACT duplicate groups yield every intra-group pair at jaccard 1.0,
    and near-dup pairs expand across both groups' members — identical to
    brute-force all-pairs Jaccard over the full (uncollapsed) corpus.
    Parametrized over corpora (deterministic seeds): the equivalence is
    an algebraic claim, so any seed must pass."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(500)]
    docs = []
    for i in range(30):
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(80))))
    # exact-duplicate groups: 3 copies of doc 0..4 (group size 4 incl. original)
    nid = 1000
    for base in range(5):
        for _ in range(3):
            docs.append((nid, docs[base][1]))
            nid += 1
    # a near-dup of doc 0 (~3% token flip) -> its pair must expand to ALL
    # of doc 0's exact copies as well
    toks = docs[0][1].split()
    for _ in range(2):
        toks[rng.randrange(len(toks))] = rng.choice(vocab)
    docs.append((2000, " ".join(toks)))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    sh = shingle(df, n=2).cache()
    sh.count()

    # brute-force ground truth over the FULL corpus (no collapse)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    truth = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("c"))
        .join(sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .withColumn("j", F.col("c") / (F.col("na") + F.col("nb") - F.col("c")))
        .filter(F.col("j") >= THRESHOLD)
    )
    true_map = {(r["id_a"], r["id_b"]): r["j"] for r in truth.collect()}
    # the planting worked: 5 groups x C(4,2)=6 intra pairs = 30 exact
    # pairs (a seed could add accidental exact dups; never fewer)
    exact_true = {p for p, j in true_map.items() if j == 1.0}
    assert len(exact_true) >= 30

    found = minhash_lsh_pairs(sh, threshold=THRESHOLD, n_hashes=128, bands=16)
    found_map = {(r["id_a"], r["id_b"]): r["jaccard"] for r in found.collect()}

    # every exact pair present at exactly 1.0 (identical sigs -> always candidates)
    for p in exact_true:
        assert found_map.get(p) == 1.0, f"missing/wrong exact pair {p}"
    # near-dup expansion: doc 2000 pairs with doc 0 AND all 3 exact copies
    near_true = {p for p in true_map if 2000 in p and p not in exact_true}
    near_found = {p for p in found_map if 2000 in p}
    assert near_found == near_true, (near_found, near_true)
    # jaccard values must match brute force exactly on every emitted pair
    for p, j in found_map.items():
        assert p in true_map and abs(true_map[p] - j) < 1e-12, (p, j)
    sh.unpersist()


def test_vector_lsh_recall(spark):
    """Recall property for the random-hyperplane LSH kernel (the ANN
    analogue of the MinHash recall test): planted near-dup vectors at
    cosine ≥ ~0.99 must surface with recall ≥ 0.9 under the banded
    OR-construction, with zero false positives (exact cosine verify).
    Deterministic: hyperplanes derive from md5(seed, plane, dim) and the
    corpus from a fixed numpy seed."""
    import numpy as np

    from pravega_spark.functions.vectors import embedding_near_dup_lsh

    rng = np.random.default_rng(23)
    base = rng.normal(size=(200, 32))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].tolist()) for i in range(200)]
    for j in range(30):  # planted: tiny perturbation -> cosine ~0.999
        v = base[j] + 0.03 * rng.normal(size=32)
        v /= np.linalg.norm(v)
        rows.append((1000 + j, v.tolist()))
    for j in range(5):  # exact copies: must ALWAYS surface (collapse path)
        rows.append((2000 + j, base[j].tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # brute-force ground truth
    ids = [r[0] for r in rows]
    mat = np.array([r[1] for r in rows])
    sims = mat @ mat.T
    truth = {
        (ids[i], ids[j])
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if sims[i, j] >= 0.9
    }
    assert len(truth) >= 30  # the planting worked

    found = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_lsh(
            emb, threshold=0.9, n_planes=8, bands=6
        ).collect()
    }
    assert found <= truth  # precision 1.0 by construction
    recall = len(found & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall:.2f} over {len(truth)} true pairs"
    # exact duplicates are deterministic finds (identical buckets), not
    # subject to the LSH recall curve
    exact_pairs = {(j, 2000 + j) for j in range(5)}
    assert exact_pairs <= found
