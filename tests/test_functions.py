"""functions/: vector math fast path, serializers, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from pravega_spark.functions import multimodal, serializers, vectors
from pravega_spark.sources import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").cache()


def test_dot_cosine_match_numpy(spark, emb):
    import numpy as np

    rows = emb.limit(10).collect()
    got = (
        emb.limit(10)
        .select("vec_id", vectors.cosine(F.col("embedding"), F.col("embedding")).alias("self_cos"))
        .collect()
    )
    for r in got:
        assert r["self_cos"] == pytest.approx(1.0, abs=1e-9)
    a, b = np.array(rows[0]["embedding"], dtype=float), np.array(rows[1]["embedding"], dtype=float)
    want = float(a @ b)
    pair = (
        spark.createDataFrame(
            [(rows[0]["embedding"], rows[1]["embedding"])], "x array<float>, y array<float>"
        )
        .select(vectors.dot("x", "y").alias("d"))
        .collect()[0]["d"]
    )
    assert pair == pytest.approx(want, rel=1e-9)


def test_topk_jvm_and_pandas_agree(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3)
    jvm = {
        (r["q_id"], r["rk"]): r["c_id"]
        for r in vectors.cosine_topk(emb, queries, k=5).collect()
    }
    blas = {
        (r["q_id"], r["rk"]): r["c_id"]
        for r in vectors.cosine_topk_pandas(emb, queries, k=5).collect()
    }
    assert jvm == blas


def test_lsh_near_dup_recall(spark, emb):
    """LSH candidates must contain the truly-similar pairs that share a
    bucket with high probability; verify against brute force at a
    threshold where pairs exist."""
    brute = vectors.cosine_topk(emb, emb.limit(30), k=1, exclude_self=True)
    top_pairs = {(min(r["q_id"], r["c_id"]), max(r["q_id"], r["c_id"])) for r in brute.collect()}
    lsh = vectors.embedding_near_dup_lsh(emb, threshold=0.0, n_planes=2, bands=4)
    lsh_pairs = {(r["id_a"], r["id_b"]) for r in lsh.collect()}
    # banded OR-construction: nearest neighbors collide in some band with
    # high probability even on weakly-similar synthetic vectors
    hits = len(top_pairs & lsh_pairs)
    assert hits >= len(top_pairs) * 0.5
    assert lsh.count() < 500 * 499 / 2  # far fewer than all pairs
    # contract: never a self-pair, even when the INPUT carries duplicate
    # ids (collapse groups are keyed by vector, so a duplicated row or an
    # id reused with two vectors could otherwise pair with itself)
    dup_in = emb.limit(5).unionByName(emb.limit(5))
    dup_pairs = vectors.embedding_near_dup_lsh(dup_in, threshold=0.0, n_planes=2, bands=4)
    assert dup_pairs.filter("id_a = id_b").count() == 0


def test_json_serializer_roundtrip(spark):
    df = spark.createDataFrame([(1, "a", 2.5)], "id long, name string, x double")
    packed = df.select(serializers.json_serialize("id", "name", "x").alias("payload"))
    lifted = serializers.lift_json(packed, "id long, name string, x double")
    row = lifted.collect()[0]
    assert (row["id"], row["name"], row["x"]) == (1, "a", 2.5)


def test_utf8_serializer(spark):
    df = spark.createDataFrame([("héllo",)], "s string")
    rt = df.select(
        serializers.utf8_deserialize(serializers.utf8_serialize("s")).alias("out")
    ).collect()[0]["out"]
    assert rt == "héllo"


def test_multimodal_pipeline(spark):
    docs = load_table(spark, SF, "documents").limit(20)
    media = multimodal.attach_media(
        docs.withColumn("blob", F.col("text").cast("binary")), "doc_id", "blob", "image", "image/fake"
    )
    assert media.schema.simpleString().startswith("struct<media_id:bigint,modality:string")
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r["feature"]) == 8
        assert r["n_bytes"] > 0
        assert len(r["checksum"]) == 32
    # deterministic: same input -> same checksum
    again = {r["media_id"]: r["checksum"] for r in multimodal.extract_features(media).collect()}
    assert all(again[r["media_id"]] == r["checksum"] for r in rows)
    frames = multimodal.sample_frames(media, every_n_bytes=50)
    per_media = frames.groupBy("media_id").count().collect()
    assert all(r["count"] >= 1 for r in per_media)
    resized = multimodal.resize_stub(media, 224, 224)
    assert resized.select("width").distinct().collect()[0]["width"] == 224


def test_typed_serializer_degrades_to_json(spark):
    """Avro connector absent in this build -> typed_serializer must hand
    back the JSON codec (same struct contract) instead of deferring an
    analysis-time failure; if the connector IS present, the avro path
    must round-trip."""
    from pyspark.sql import functions as F

    schema = "id long, name string"
    fmt, ser, de = serializers.typed_serializer(spark, schema)
    assert fmt == ("avro" if serializers.avro_available(spark) else "json")
    df = spark.createDataFrame([(7, "seven")], schema)
    packed = df.select(ser(F.struct("id", "name")).alias("payload"))
    assert packed.schema["payload"].dataType.typeName() == "binary"
    if fmt == "json":
        out = packed.select(de("payload").alias("d")).select("d.*").collect()[0]
    else:
        avro_schema = (
            '{"type":"record","name":"r","fields":'
            '[{"name":"id","type":"long"},{"name":"name","type":"string"}]}'
        )
        out = packed.select(de("payload", avro_schema).alias("d")).select("d.*").collect()[0]
    assert (out["id"], out["name"]) == (7, "seven")


def test_bucketized_join_eliminates_exchange(spark):
    """Co-located big/big join: bucketed tables on the join key produce
    a SortMergeJoin with no shuffle Exchange — the 100 TB fact-join
    strategy (broadcast covers dims; bucketing covers fact-fact)."""
    from pyspark.sql import functions as F

    from pravega_spark.sources import load_table
    from pravega_spark.sources.bucketing import bucketize, is_shuffle_free_join

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
        od = load_table(spark, "/root/testdata/sf0.001", "orders")
        plain = li.join(od, li.l_orderkey == od.o_orderkey)
        assert not is_shuffle_free_join(plain)
        bucketize(spark, li, "t_li_b", ["l_orderkey"], 4)
        bucketize(spark, od, "t_od_b", ["o_orderkey"], 4)
        j = spark.table("t_li_b").join(
            spark.table("t_od_b"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        assert is_shuffle_free_join(j)
        assert j.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_li_b")
        spark.sql("DROP TABLE IF EXISTS t_od_b")


def test_bpe_ish_tokenizer_matches_python_twin(spark):
    from pravega_spark.functions.text import (
        bpe_ish_token_count,
        bpe_ish_tokens,
        bpe_ish_tokens_py,
    )

    samples = [
        "don't stop!",
        "GPT-2 has 1.5B params... right?",
        "  spaced   out\ttabs\nnewlines  ",
        "unicode naïve café 北京 42km",
        "",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    rows = df.select(
        "s", bpe_ish_tokens("s").alias("toks"), bpe_ish_token_count("s").alias("n")
    ).collect()
    for r in rows:
        expect = bpe_ish_tokens_py(r["s"])
        assert list(r["toks"]) == expect, r["s"]
        assert r["n"] == len(expect)
    # shape sanity: punctuation splits, whitespace doesn't count
    one = {r["s"]: list(r["toks"]) for r in rows}
    assert one["don't stop!"] == ["don", "'", "t", "stop", "!"]


def test_connected_components(spark):
    from pravega_spark.functions.dedup import connected_components

    # two components: {1,2,3,4} (a chain, diameter 3) and {10,11}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {r["id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_member_pairs_and_expand_pairs(spark):
    """Unit pins for the shared exact-collapse helpers: ordered intra
    pairs from sorted member lists; member-level expansion of rep pairs
    with carried columns and a<b restoration."""
    from pravega_spark.functions.dedup import expand_pairs, member_pairs
    import pyspark.sql.functions as F

    groups = spark.createDataFrame(
        [(1, [1, 5, 9]), (2, [2]), (3, [3, 4])],
        "doc_id long, members array<long>",
    )
    intra = {(r["id_a"], r["id_b"]) for r in member_pairs(groups).collect()}
    assert intra == {(1, 5), (1, 9), (5, 9), (3, 4)}

    pairs = spark.createDataFrame([(1, 3, 0.75)], "id_a long, id_b long, score double")
    got = {
        (r["id_a"], r["id_b"], r["score"])
        for r in expand_pairs(pairs, groups).collect()
    }
    # every member of group(1) x every member of group(3), a<b restored
    assert got == {
        (1, 3, 0.75), (1, 4, 0.75),
        (3, 5, 0.75), (4, 5, 0.75),
        (3, 9, 0.75), (4, 9, 0.75),
    }
    # carry column preserved on intra too
    carried = member_pairs(
        groups.withColumn("tag", F.lit("x")), carry=("tag",)
    ).select("tag").distinct().collect()
    assert [r["tag"] for r in carried] == ["x"]
