"""SQL views over streams/KVTs (net-new §2.12 surface)."""

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from pravega_spark.config import ScalingPolicy, StreamConfiguration
from pravega_spark.kvt import KeyValueTableManager
from pravega_spark.schemas import SchemaRegistry, write_typed
from pravega_spark.sql import attach_kvt, attach_scope, attach_stream


def test_sql_over_streams_and_kvt(store, events):
    store.create_scope("prod")
    store.create_stream("prod", "clicks", StreamConfiguration(scaling=ScalingPolicy.fixed(2)))
    store.create_stream("prod", "raw", StreamConfiguration(scaling=ScalingPolicy.fixed(2)))
    SchemaRegistry(store.meta).register(
        "prod", "clicks",
        StructType([StructField("event_id", LongType()), StructField("value", DoubleType())]),
    )
    src = events.orderBy("event_id").limit(60).select(
        "event_id", "value", F.col("user_id").cast("string").alias("rk")
    )
    write_typed(store, "prod", "clicks", src, routing_key_col="rk")
    store.write_events(
        "prod", "raw",
        events.limit(10).select(F.col("user_id").cast("string").alias("routing_key")),
    )

    views = attach_scope(store, "prod")
    assert set(views) == {"prod_clicks", "prod_raw"}
    # typed view: schema-lifted columns queryable in plain SQL
    row = store.spark.sql(
        "SELECT count(*) AS n, round(sum(value), 4) AS s FROM prod_clicks WHERE event_id < 30"
    ).collect()[0]
    assert row["n"] == 30
    want = src.filter("event_id < 30").agg(F.round(F.sum("value"), 4)).collect()[0][0]
    assert abs(row["s"] - want) < 1e-6
    # untyped stream still queryable via envelope columns
    assert store.spark.sql("SELECT count(*) AS n FROM prod_raw").collect()[0]["n"] == 10

    mgr = KeyValueTableManager(store.spark, store.root)
    mgr.create_key_value_table("prod", "dims")
    t = mgr.open("prod", "dims")
    t.put("a", "1"); t.put("b", "2"); t.put("a", "10")
    attach_kvt(store.spark, store.root, "prod", "dims")
    rows = store.spark.sql(
        "SELECT pk, value FROM prod_dims_kv ORDER BY pk"
    ).collect()
    assert [(r["pk"], r["value"]) for r in rows] == [("a", "10"), ("b", "2")]
    # join a stream view against the KVT view
    joined = store.spark.sql(
        "SELECT count(*) AS n FROM prod_raw r JOIN prod_dims_kv d ON d.pk = 'a'"
    ).collect()[0]["n"]
    assert joined == 10
