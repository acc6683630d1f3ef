"""Relational/analytical operator layer (SURVEY §2.12 net-new surface).

The reference has no SQL operators; these are the Spark-native analytics
the engine adds on top of the stream/KVT data model. Every query is pure
DataFrame API (JVM-side, whole-stage-codegen) — no Python UDFs — and
each has a DuckDB oracle twin.

Scale notes (100 TB thinking):
  - joins to small dims (region/nation/customer-filtered) are marked
    ``broadcast`` so no shuffle of the fact side;
  - aggregations are partial-agg friendly (sum/count/min/max) so
    map-side combine halves shuffle volume;
  - all money sums are decimal-cast *before* aggregation: exact,
    order-independent, and hash-stable vs the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pravega_spark.caching import register_result_cache

from pravega_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


DEC = "decimal(18,4)"


# ---------------------------------------------------------------- q1
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + 2-key groupBy with 8 aggregates.

    Catalyst pushes the shipdate filter to parquet; partial aggregation
    makes the shuffle carry only (flag,status) groups.
    """
    li = _t(spark, sf_dir, "lineitem")
    d12 = "decimal(12,4)"
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("l_quantity").cast(d12).alias("qty"),
            F.col("l_extendedprice").cast(d12).alias("price"),
            (F.col("l_extendedprice").cast(d12) * (1 - F.col("l_discount").cast(d12))).alias("disc_price"),
            F.col("l_discount").cast(d12).alias("disc"),
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        )
        # charge via a second exact product at scale 12 (fits precision 38)
        .withColumn("charge", (F.col("disc_price") * (1 + F.col("l_tax").cast(d12))))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # sums are exact decimals internally (order-independent); the
            # final cast to double is the canonical gate representation —
            # both engines convert the identical decimal, bit-identically
            F.sum("qty").cast("decimal(24,4)").cast("double").alias("sum_qty"),
            F.sum("price").cast("decimal(24,4)").cast("double").alias("sum_base_price"),
            F.round(F.sum("disc_price"), 4).cast("double").alias("sum_disc_price"),
            F.round(F.sum("charge"), 4).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DECIMAL(24,4)) AS DOUBLE) AS sum_qty,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))) AS DECIMAL(24,4)) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))), 4) AS DOUBLE) AS sum_disc_price,
       CAST(round(sum((CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))) * (1 + CAST(l_tax AS DECIMAL(12,4)))), 4) AS DOUBLE) AS sum_charge,
       round(avg(l_quantity), 2) AS avg_qty,
       round(avg(l_extendedprice), 2) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------- q3
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: selective dim filter → broadcast join → top-10 revenue."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1996-06-30").cast("timestamp"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1996-06-30").cast("timestamp"))
    return (
        # cust (dim, segment-filtered) broadcasts; the orders side is a
        # date-filtered FACT — roughly half the table at any SF — and
        # must NOT be force-broadcast (the 8 GB broadcast limit / driver
        # memory would kill the query at scale). AQE still broadcasts it
        # at bench SF where it measures small.
        li.join(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))), 4)
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-06-30'
  AND l_shipdate  > TIMESTAMP '1996-06-30'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------- q5
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join with co-located nation keys.

    nation/region/supplier broadcast; the only shuffle is the final
    single-key aggregation.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))), 4)
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


def q5_local_supplier_volume_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 on BUCKETED facts: lineitem and orders stored bucketBy(N,
    orderkey) + sortBy, so the one fact-fact join runs as a bucket-
    aligned SortMergeJoin with NO Exchange and NO Sort on either side
    (the ``merge`` hint keeps Catalyst from broadcasting the small test
    copy of orders — at 100 TB it wouldn't be broadcastable anyway).
    Same results as q5_local_supplier_volume; the point is the plan.
    """
    from pravega_spark.sources.bucketed import bucketed_table

    cust = _t(spark, sf_dir, "customer")
    li = bucketed_table(spark, sf_dir, "lineitem")
    orders = bucketed_table(spark, sf_dir, "orders").hint("merge")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))), 4)
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = """
SELECT n_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------- q10
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue by customer, top 20."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))), 4)
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------- top-k per group
def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by retail price within each brand (window + rank)."""
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", "p_name", F.col("p_retailprice").alias("price"), "rk")
        .orderBy("p_brand", "rk")
    )


TOP_PARTS_SQL = """
SELECT p_brand, p_partkey, p_name, p_retailprice AS price, rk
FROM (
  SELECT *, row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS rk
  FROM part
)
WHERE rk <= 3
ORDER BY p_brand, rk
"""


# ---------------------------------------------------------------- rollup
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over region→nation revenue (grouping sets)."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("revenue"))
        .orderBy(F.asc_nulls_first("r_name"), F.asc_nulls_first("n_name"))
    )


ROLLUP_SQL = """
SELECT r_name, n_name, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
"""


# ---------------------------------------------------------------- set ops + semi/anti joins
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (NOT EXISTS): customers with no URGENT orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


NO_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


def order_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per status × priority bucket."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority")
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("o_orderstatus")
    )



PRIORITY_PIVOT_SQL = """
SELECT o_orderstatus,
       count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS "1-URGENT",
       count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS "2-HIGH",
       count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
       count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
       count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS "5-LOW"
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


# ---------------------------------------------------------------- events: windowed agg
def events_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type.

    Batch twin of the streaming `window(ts, '1 hour')` aggregation;
    date_trunc keeps the output schema flat for the oracle.
    """
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast(DEC).cast("double").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("hour", "event_type")
    )


EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events,
       CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS total_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY date_trunc('hour', ts), event_type
ORDER BY hour, event_type
"""


# ---------------------------------------------------------------- events: sessionization
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) per user.

    lag → gap flag → cumulative sum = session id; the canonical Spark
    batch sessionization (streaming twin: session_window).
    """
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_ts").isNull()
                # interval comparison works for both TIMESTAMP and
                # TIMESTAMP_NTZ (Spark >=4.1 forbids NTZ->numeric casts)
                | (F.col("ts") - F.col("prev_ts") > F.expr("INTERVAL 30 MINUTES")),
                1,
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
            F.sum("n_events").alias("total_events"),
        )
        .orderBy("user_id")
    )


SESSIONIZATION_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id, count(*) AS n_events
  FROM sessions GROUP BY user_id, session_id
)
SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events,
       CAST(sum(n_events) AS BIGINT) AS total_events
FROM per_session GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------- events: native session windows
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` (30-min gap) per user — the operator
    Structured Streaming uses for streaming sessionization; here run on
    the batch tier with the window bounds surfaced. The oracle rebuilds
    identical bounds from the gap-and-running-sum formulation:
    start = min(ts), end = max(ts) + gap per merged session."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


SESSION_WINDOW_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sessions AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events
FROM sessions GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


# ---------------------------------------------------------------- events: json lifting
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serializer-equivalent payload lifting: JSON props → typed column.

    Reference events are opaque bytes decoded by a client Serializer
    (client/.../stream/Serializer.java); the Spark-native form is
    from_json/get_json_object lifting into columns.
    """
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
        .orderBy("event_type")
    )


JSON_EXTRACT_SQL = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(min(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS min_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------- events: as-of join
def events_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent prior
    signup (event-time as-of semantics, composed from a window over the
    unioned timeline — no Pandas fallback needed).

    At 100 TB the union+window shuffles once on (user_id); the same
    composition works partitioned since the as-of key is the partition key.
    
    Tie caveat: on EQUAL signup timestamps for one user the Spark
    window breaks ties by event_id (deterministic) while DuckDB's ASOF
    JOIN picks an arbitrary tied row — the generated events table has
    no (user_id, ts) signup ties (verified), so parity holds; a corpus
    with ties would need an explicit tie-break in the oracle.
    """
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts"), F.col("event_id").alias("signup_event_id")
    )
    # null literal must carry the source column's own timestamp flavor
    # (TIMESTAMP vs TIMESTAMP_NTZ) or the union rejects the type mismatch
    ts_type = ev.schema["ts"].dataType
    timeline = purchases.select(
        "user_id", "ts", "event_id", F.lit(None).cast(ts_type).alias("signup_ts"),
        F.lit(None).cast("bigint").alias("signup_event_id"), F.lit(1).alias("is_purchase")
    ).unionByName(
        signups.select(
            "user_id", F.col("signup_ts").alias("ts"), F.col("signup_event_id").alias("event_id"),
            "signup_ts", "signup_event_id", F.lit(0).alias("is_purchase")
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        timeline.withColumn("last_signup_ts", F.last("signup_ts", ignorenulls=True).over(w))
        .withColumn("last_signup_event", F.last("signup_event_id", ignorenulls=True).over(w))
        .filter(F.col("is_purchase") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("purchase_event_id"),
            F.col("last_signup_event").alias("signup_event_id"),
            # floor-each-then-diff to match the oracle's
            # floor(epoch(p.ts)) - floor(epoch(s.ts)); the intermediate
            # cast to session-tz timestamp makes the long cast legal even
            # if the source column arrived as TIMESTAMP_NTZ
            (
                F.col("ts").cast("timestamp").cast("long")
                - F.col("last_signup_ts").cast("timestamp").cast("long")
            ).alias("secs_since_signup"),
        )
        .orderBy("purchase_event_id")
    )


ASOF_SQL = """
SELECT p.user_id,
       p.event_id AS purchase_event_id,
       s.event_id AS signup_event_id,
       CAST(floor(epoch(p.ts)) AS BIGINT) - CAST(floor(epoch(s.ts)) AS BIGINT) AS secs_since_signup
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
ORDER BY purchase_event_id
"""


# ---------------------------------------------------------------- events: running totals
def events_running_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sourced fold per key (state-synchronizer read model, V3):
    running revision number + running value sum per user."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return (
        ev.withColumn("revision", F.row_number().over(w))
        .withColumn(
            "running_value",
            F.sum(F.col("value").cast(DEC)).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast(DEC).cast("double"),
        )
        .filter(F.col("revision") <= 5)
        .select("user_id", "event_id", "revision", "running_value")
        .orderBy("user_id", "revision")
    )


RUNNING_SQL = """
SELECT user_id, event_id, revision, CAST(CAST(running_value AS DECIMAL(18,4)) AS DOUBLE) AS running_value
FROM (
  SELECT user_id, event_id,
         row_number() OVER w AS revision,
         sum(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_value
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
)
WHERE revision <= 5
ORDER BY user_id, revision
"""


# ---------------------------------------------------------------- q6
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate; every predicate reaches the
    parquet footer (PushedFilters), zero joins, one-row result."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC)), 4)
            .cast("double")
            .alias("revenue")
        )
    )


Q6_SQL = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# ---------------------------------------------------------------- q7
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume FRANCE<->GERMANY by year.

    Both nation joins broadcast; the fact side shuffles only for the
    final (nation pair, year) aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))), 4)
            .cast("double")
            .alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------- q8
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: BRAZIL's share of AMERICA STEEL-part revenue by
    order year (conditional-sum ratio — one pass, no self-join)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type").contains("STANDARD"))
    nation_c = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    nation_s = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation_c), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation_s), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0).cast(DEC)))
                .cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q8_market_share_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 on BUCKETED facts — see q5_local_supplier_volume_bucketed."""
    from pravega_spark.sources.bucketed import bucketed_table

    li = bucketed_table(spark, sf_dir, "lineitem")
    orders = bucketed_table(spark, sf_dir, "orders").hint("merge")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type").contains("STANDARD"))
    nation_c = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    nation_s = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation_c), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation_s), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0).cast(DEC)))
                .cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
                           THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 6) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type LIKE '%STANDARD%' AND r_name = 'AMERICA'
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------- q13
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count-per-customer histogram (left outer join so
    zero-order customers appear, then a second aggregation)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------- q14
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share in one month (conditional ratio)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    vol = F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type").startswith("PROMO"), vol).otherwise(F.lit(0).cast(DEC))).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


Q14_SQL = """
SELECT round(100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                     THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
"""


# ---------------------------------------------------------------- q15
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with max quarterly revenue — the
    aggregate-then-join-back-on-max decorrelation."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC)))
        .cast("decimal(30,8)")
        .alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("m"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("m"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", F.round(F.col("total_revenue"), 4).cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(30,8)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(round(total_revenue, 4) AS DOUBLE) AS total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------- q16 (adapted: no partsupp)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape over the lineitem-derived part↔supplier relation
    (this schema has no partsupp): distinct supplier count per
    (brand, type, size) for non-excluded parts."""
    rel = (
        _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (~F.col("p_type").startswith("MEDIUM"))
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    return (
        rel.join(F.broadcast(part), rel.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45' AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------- q17
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: avg-quantity correlated scalar subquery,
    decorrelated to a per-part aggregate broadcast back onto the scan."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(avg_qty), li.l_partkey == F.col("ap"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0, 4).alias(
                "avg_yearly"
            )
        )
    )


Q17_SQL = """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0, 4) AS avg_yearly
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
"""


# ---------------------------------------------------------------- q18
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 200 (semi-join of
    a having-filtered aggregate back onto orders/customer)."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("total_qty"))
        .filter(F.col("total_qty") > 200)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


def q18_large_volume_customers_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 on BUCKETED facts: bucketing pays twice here — the per-order
    aggregation groups on the BUCKET KEY, so it needs no Exchange at
    all (partial+final agg run in place per bucket), and the
    big⋈orders join is bucket-aligned on the same key. The whole query
    runs with ZERO fact shuffles; only the tiny dim broadcast and the
    final top-100 sort move data. Same values as the shuffling twin
    (one oracle serves both)."""
    from pravega_spark.sources.bucketed import bucketed_table

    li = bucketed_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("total_qty"))
        .filter(F.col("total_qty") > 200)
    )
    # the merge hint keeps AQE from broadcasting the small post-agg side
    # at test SFs — the bucket-aligned SortMergeJoin IS the demonstration
    orders = bucketed_table(spark, sf_dir, "orders").hint("merge")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       o_totalprice, CAST(total_qty AS DOUBLE) AS total_qty
FROM orders
JOIN (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,4))) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 200) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# ---------------------------------------------------------------- q19
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate pushed into one join —
    Catalyst turns the disjunction into a single scan + broadcast join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 5)) & (F.col("l_quantity").between(1, 11)))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 10)) & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 15)) & (F.col("l_quantity").between(20, 30)))
    )
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))), 4)
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_items"),
    )


Q19_SQL = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------- q4-shape semi join
def orders_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS semi-join): order-priority counts for
    orders having at least one returned line item."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    returned = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------- q2-shape correlated min
def min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape over the lineitem-derived supply relation: for each
    BRASS part, the supplier(s) achieving the minimum observed unit price
    (correlated-min decorrelated into an aggregate join-back)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type").endswith("ECONOMY"))
    supp = _t(spark, sf_dir, "supplier")
    offer = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice").cast(DEC)).alias("best_price"))
    )
    min_per_part = offer.groupBy(F.col("l_partkey").alias("mp")).agg(
        F.min("best_price").alias("min_price")
    )
    return (
        offer.join(
            min_per_part,
            (offer.l_partkey == F.col("mp")) & (offer.best_price == F.col("min_price")),
        )
        .join(F.broadcast(supp), offer.l_suppkey == supp.s_suppkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_suppkey",
            "s_name",
            F.col("best_price").cast("double").alias("min_price"),
        )
        .orderBy("p_partkey", "s_suppkey")
    )


Q2_SQL = """
WITH offer AS (
  SELECT l_partkey, l_suppkey, min(CAST(l_extendedprice AS DECIMAL(18,4))) AS best_price
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type LIKE '%ECONOMY'
  GROUP BY l_partkey, l_suppkey
)
SELECT o.l_partkey AS p_partkey, s_suppkey, s_name, CAST(o.best_price AS DOUBLE) AS min_price
FROM offer o
JOIN supplier ON o.l_suppkey = s_suppkey
WHERE o.best_price = (SELECT min(best_price) FROM offer o2 WHERE o2.l_partkey = o.l_partkey)
ORDER BY p_partkey, s_suppkey
"""


# ---------------------------------------------------------------- percentiles
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous percentiles (median/p90/p99) of event value per type —
    percentile_cont with linear interpolation, matching DuckDB's
    quantile_cont semantics exactly."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY value)"), 6).alias("p50"),
            F.round(F.expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY value)"), 6).alias("p90"),
            F.round(F.expr("percentile_cont(0.99) WITHIN GROUP (ORDER BY value)"), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


PERCENTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type ORDER BY event_type
"""


def events_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles (approx_percentile, accuracy 10000)
    cross-checked against exact percentile_cont in-query — the twin of
    events_approx_distinct for quantiles.

    The sketch IS the 100 TB strategy: approx_percentile's KLL-style
    summary is a mergeable partial aggregate with bounded memory,
    where exact percentile_cont must buffer every group value (fine at
    bench SF, an OOM at corpus scale). As with the HLL query, the
    emitted columns are the EXACT values plus a flag verifying the
    sketch's ACTUAL guarantee — which is a RANK bound (the returned
    element's rank is within 1/accuracy of the target), NOT a value
    bound: on a gapped distribution a one-rank-off result can differ
    from percentile_cont by any amount. The flag therefore checks the
    approx value lies inside the exact [q-eps, q+eps] value envelope
    (eps = 0.002 = 20x the accuracy-10000 rank error), which the
    DuckDB oracle asserts as constant true."""
    eps = 0.002
    ev = _t(spark, sf_dir, "events")
    qs = ((0.5, "50"), (0.9, "90"), (0.99, "99"))
    aggs = []
    for q, tag in qs:
        aggs.append(
            F.expr(f"percentile_cont({q}) WITHIN GROUP (ORDER BY value)").alias(f"e{tag}")
        )
        aggs.append(
            F.expr(f"percentile_cont({q - eps}) WITHIN GROUP (ORDER BY value)").alias(f"lo{tag}")
        )
        aggs.append(
            F.expr(
                f"percentile_cont({min(q + eps, 1.0)}) WITHIN GROUP (ORDER BY value)"
            ).alias(f"hi{tag}")
        )
        aggs.append(F.expr(f"approx_percentile(value, {q}, 10000)").alias(f"a{tag}"))
    agg = ev.groupBy("event_type").agg(*aggs)
    within = None
    for _q, tag in qs:
        ok = (F.col(f"a{tag}") >= F.col(f"lo{tag}") - 1e-9) & (
            F.col(f"a{tag}") <= F.col(f"hi{tag}") + 1e-9
        )
        within = ok if within is None else (within & ok)
    return agg.select(
        "event_type",
        F.round("e50", 6).alias("p50"),
        F.round("e90", 6).alias("p90"),
        F.round("e99", 6).alias("p99"),
        within.alias("sketch_in_rank_bound"),
    ).orderBy("event_type")


PERCENTILE_SKETCH_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99,
       true AS sketch_in_rank_bound
FROM events GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------- cube
def orders_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all grouping-set combinations."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total"),
        )
        .orderBy(
            F.asc_nulls_first("o_orderstatus"), F.asc_nulls_first("o_orderpriority")
        )
    )


CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


# ---------------------------------------------------------------- sketches
def events_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL-sketch distinct counting (approx_count_distinct, rsd=1%) per
    event type, cross-checked against the exact count in-query.

    The sketch IS the 100 TB strategy (mergeable partial aggregates, no
    distinct shuffle); the emitted columns are the exact count plus a
    sketch-within-2% flag so the DuckDB oracle — whose own HLL would
    differ bit-wise — can verify the guarantee rather than the sketch.

    r6 plan change: both aggregates run over the DEDUPED (event_type,
    user_id) pairs instead of the raw rows — HLL registers are
    duplicate-insensitive, so the sketch is bit-identical, while the
    exact count becomes a plain count and Spark drops the expand the
    mixed countDistinct+HLL aggregation needed (~4x at sf1: 8.6 →
    2.2 s warm; map-side partial dedup shrinks the shuffle to the
    distinct pair count)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(
            # count(user_id), not count(*): a NULL user_id must stay
            # excluded exactly as countDistinct and the oracle exclude it
            F.count("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx") - F.col("exact_users"))
                <= F.greatest(F.lit(1), F.round(F.col("exact_users") * 0.02))
            ).alias("sketch_within_2pct"),
        )
        .orderBy("event_type")
    )


APPROX_DISTINCT_SQL = """
SELECT event_type, count(DISTINCT user_id) AS exact_users, true AS sketch_within_2pct
FROM events GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------- set operations
def cust_segment_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: customers with URGENT orders ∩ customers with
    HIGH orders, minus the AUTOMOBILE segment (INTERSECT + EXCEPT)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_custkey").alias("c_custkey"))
    high = orders.filter(F.col("o_orderpriority") == "2-HIGH").select(F.col("o_custkey").alias("c_custkey"))
    autos = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    return urgent.intersect(high).exceptAll(autos.distinct()).orderBy("c_custkey")


SET_OPS_SQL = """
SELECT c_custkey FROM (
  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
  EXCEPT
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
)
ORDER BY c_custkey
"""


# ---------------------------------------------------------------- correlated scalar: above-nation-average
def cust_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery shape: customers whose balance exceeds
    their nation's average (decorrelated via per-nation aggregate)."""
    cust = _t(spark, sf_dir, "customer")
    nation_avg = cust.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.avg("c_acctbal").alias("nation_avg")
    )
    return (
        cust.join(F.broadcast(nation_avg), cust.c_nationkey == F.col("nk"))
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_above"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_above_bal"),
        )
        .orderBy("c_nationkey")
    )


ABOVE_AVG_SQL = """
SELECT c_nationkey, count(*) AS n_above, round(avg(c_acctbal), 4) AS avg_above_bal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
GROUP BY c_nationkey ORDER BY c_nationkey
"""


# ---------------------------------------------------------------- q9
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: nation profit by order year over a part-name scan.

    Adapted to this schema (no partsupp table): supply cost is modeled
    as 10% of ``p_retailprice * l_quantity``, keeping Q9's plan shape —
    LIKE-filtered part scan broadcast into the fact, supplier/nation
    broadcast, fact-fact join lineitem⋈orders, 2-key aggregate.
    All money math is exact decimal until the final round/cast, so both
    engines agree bit-for-bit.
    """
    d12 = "decimal(12,4)"
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    gross = F.col("l_extendedprice").cast(d12) * (1 - F.col("l_discount").cast(d12))
    cost = (
        F.col("p_retailprice").cast(d12)
        * F.col("l_quantity").cast(d12)
        * F.lit("0.1").cast("decimal(2,1)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(gross - cost), 4).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))
                      - CAST(p_retailprice AS DECIMAL(12,4)) * CAST(l_quantity AS DECIMAL(12,4))
                        * CAST(0.1 AS DECIMAL(2,1))), 4) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------- q11
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group value with a HAVING against a global
    scalar aggregate (the classic uncorrelated-scalar-subquery plan).

    Adapted (no partsupp): part "value" is shipped-volume value
    ``p_retailprice * l_quantity`` from one nation's suppliers; keep
    parts whose value exceeds 2× the average per-part value. The
    threshold is a ratio, not a fixed fraction, so the query stays
    non-degenerate at every scale factor (stock TPC-H scales its
    FRACTION by 1/SF for exactly this reason). The global aggregate is
    one broadcast row crossed into the filter; the comparison is formed
    as 2.0 * (sum/count) with identical IEEE association on both
    engines, so the boundary is bit-deterministic.
    """
    d12 = "decimal(12,4)"
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    part = _t(spark, sf_dir, "part")
    value = F.col("p_retailprice").cast(d12) * F.col("l_quantity").cast(d12)
    per_part = (
        li.join(
            F.broadcast(
                supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
                .select("s_suppkey")
            ),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_partkey")
        .agg(F.sum(value).alias("value_dec"))
    )
    # per_part feeds both the global total and the filter; persist the
    # (one row per part — tiny vs the fact) aggregate so lineitem is
    # scanned once, not twice
    per_part = per_part.persist()
    total = per_part.agg(
        F.sum("value_dec").cast("double").alias("tot"), F.count("*").alias("n")
    )
    out = (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_dec").cast("double") > F.lit(2.0) * (F.col("tot") / F.col("n"))
        )
        .select("p_partkey", F.round("value_dec", 4).cast("double").alias("value"))
        .orderBy(F.desc("value"), "p_partkey")
    )
    out = register_result_cache(out.persist())
    out.count()
    per_part.unpersist()
    return out


Q11_SQL = """
WITH per_part AS (
  SELECT p_partkey,
         sum(CAST(p_retailprice AS DECIMAL(12,4)) * CAST(l_quantity AS DECIMAL(12,4))) AS value_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN part     ON l_partkey = p_partkey
  WHERE n_name = 'NATION_7'
  GROUP BY p_partkey
)
SELECT p_partkey, CAST(round(value_dec, 4) AS DOUBLE) AS value
FROM per_part
WHERE CAST(value_dec AS DOUBLE) >
      2.0 * (SELECT CAST(sum(value_dec) AS DOUBLE) / count(*) FROM per_part)
ORDER BY value DESC, p_partkey
"""


# ---------------------------------------------------------------- q12
def q12_priority_shipping_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join + conditional-sum pivot.

    Adapted (no l_shipmode/commit/receipt dates): lineitems shipped in
    1996 after their order date, classed by return flag, counting
    high-priority (1-URGENT/2-HIGH) vs other orders. One shuffle for
    the join; the CASE sums fold into partial aggregation.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_shipdate > o_orderdate
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------- q20
def q20_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested aggregate threshold feeding a semi join.

    Adapted (no partsupp availqty): suppliers who shipped MORE than half
    of a 'blue' part's total 1996 volume (the "excess share" analogue of
    availqty > ½ yearly demand). Two aggregations over the same slice —
    the per-(part,supplier) rollup re-aggregates to per-part totals, so
    the raw fact is scanned once — then a broadcast semi join into
    supplier. Quantities are integral doubles: sums are exact.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("blue%"))
    supp = _t(spark, sf_dir, "supplier")
    ps = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    # per-part total via a window over the grouped result — the fact is
    # scanned and aggregated ONCE (a second groupBy would recompute the
    # whole ps subtree; .explain showed no exchange reuse)
    part_win = Window.partitionBy("l_partkey")
    dominant = (
        ps.withColumn("part_qty", F.sum("supp_qty").over(part_win))
        .filter(F.col("supp_qty") > 0.5 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(F.broadcast(dominant), supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'blue%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_partkey, l_suppkey
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM ps
  JOIN (SELECT l_partkey AS pk, sum(supp_qty) AS part_qty FROM ps GROUP BY l_partkey) t
    ON ps.l_partkey = t.pk
  WHERE supp_qty > 0.5 * part_qty
)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------- q21
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS self-joins on the fact.

    Adapted (no commit/receipt dates): a lineitem is "late" when it
    shipped >60 days after the order date. For finished ('F') orders,
    count per supplier (one nation) the late lineitems on orders where
    some other supplier participated (EXISTS) and no other supplier was
    also late (NOT EXISTS).

    Decorrelated the way modern optimizers rewrite Q21: ONE
    lineitem⋈orders join followed by a per-order aggregate.
    EXISTS(other supplier) ⇔ min(suppkey) ≠ max(suppkey);
    NOT EXISTS(other LATE supplier) ⇔ min(late suppkey) = max(late
    suppkey) non-null (the probe row itself is late, so "exactly one
    distinct late supplier" means "no other"). min/max/count only — no
    countDistinct, whose multi-distinct Expand would triple the joined
    rows. The self-join formulation scans the fact three times; this
    scans lineitem ONCE, and the groupBy reuses the join's partitioning
    on l_orderkey — no extra exchange. The oracle keeps the canonical
    EXISTS/NOT-EXISTS SQL, so the gate also checks the rewrite's
    equivalence.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    late_supp = F.when(late, F.col("l_suppkey"))
    per_order = (
        li.join(orders.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("supp_min"),
            F.max("l_suppkey").alias("supp_max"),
            F.min(late_supp).alias("late_min"),
            F.max(late_supp).alias("late_max"),
            F.count(late_supp).alias("n_rows"),
        )
    )
    return (
        per_order.filter(
            (F.col("supp_min") != F.col("supp_max"))
            & F.col("late_min").isNotNull()
            & (F.col("late_min") == F.col("late_max"))
        )
        .select(F.col("late_min").alias("the_supp"), "n_rows")
        .join(
            F.broadcast(
                supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
                .select("s_suppkey", "s_name")
            ),
            F.col("the_supp") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.sum("n_rows").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q21_SQL = """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM late l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_5'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


# ---------------------------------------------------------------- q22
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global-average scalar subquery + anti join.

    Adapted (no c_phone): the "country code" is the last two digits of
    the fixed-width customer name. Customers in the code list with a
    balance above the positive-balance average of that list and no
    RECENT order (none since 1999 — this testdata has no order-less
    customers, so "lapsed" keeps the anti join non-vacuous), grouped by
    code. The average is formed as exact-decimal sum ÷ count, cast to
    double identically on both engines, so the threshold comparison is
    bit-deterministic.
    """
    codes = ["13", "17", "18", "23", "29", "30", "31"]
    cust = _t(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.substring("c_name", 17, 2)
    ).filter(F.col("cntrycode").isin(codes))
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double")
            / F.count("*")
        ).alias("avg_bal")
    )
    return (
        cust.join(orders.select("o_custkey"), cust.c_custkey == F.col("o_custkey"), "left_anti")
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .groupBy("cntrycode")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


Q22_SQL = """
SELECT substr(c_name, 17, 2) AS cntrycode,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal
FROM customer
WHERE substr(c_name, 17, 2) IN ('13','17','18','23','29','30','31')
  AND c_acctbal > (
    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
    FROM customer
    WHERE substr(c_name, 17, 2) IN ('13','17','18','23','29','30','31')
      AND c_acctbal > 0
  )
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY substr(c_name, 17, 2)
ORDER BY cntrycode
"""


def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered EARLY-JOURNEY funnel (view → click → purchase within
    each user's first 12 events): a user converts a step only with an
    event strictly AFTER their previous step's first event — the
    product-analytics funnel, not three independent counts. The
    12-event horizon is what makes the fixture discriminating: over
    the full stream every synthetic user eventually converts every
    stage, so an ordering bug (>= for >, or dropping the
    after-previous-step condition) would pass a full-stream oracle
    unseen; within 12 events the stage counts strictly decrease and
    ordered != unordered. Anonymous (NULL user_id) events are
    excluded on both sides — JOIN USING in the oracle would drop them
    asymmetrically otherwise. Stage times are min-aggregates per
    user, so the result is order-independent and exactly oracle-able.

    Scale shape: the journey trim and the three stage times are ONE
    ordered window pass + stacked UNBOUNDED window mins over the SAME
    user_id partitioning — a single shuffle of the event stream, then
    per-user collapse reuses the partitioning and the stage counts
    are a tiny global rollup."""
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", "event_type", "ts", "event_id")
        .withColumn("rn", F.row_number().over(wo))
        .filter(F.col("rn") <= 12)
    )
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    totals = per_user.agg(
        F.count("t1").alias("n1"), F.count("t2").alias("n2"), F.count("t3").alias("n3")
    )
    # unpivot the ONE-row totals with stack — a union of three selects
    # over `totals` would re-execute the whole upstream lineage (shuffle
    # included) once per branch
    counts = totals.select(
        F.expr(
            "stack(3, 1, 'view', n1, 2, 'click_after_view', n2,"
            " 3, 'purchase_after_click', n3) as (stage, step, n)"
        )
    )
    w = Window.orderBy("stage")
    return (
        counts.select(
            F.col("stage").cast("bigint").alias("stage"),
            "step",
            F.col("n").cast("bigint").alias("n_users"),
            (
                F.col("n").cast("double")
                / F.lag("n", 1).over(w).cast("double")
            ).alias("conversion"),
        )
        .orderBy("stage")
    )


FUNNEL_SQL = """
WITH journey AS (
  SELECT user_id, event_type, ts
  FROM (
    SELECT user_id, event_type, ts,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events WHERE user_id IS NOT NULL
  ) WHERE rn <= 12
),
s1 AS (
  SELECT user_id, min(ts) AS t1 FROM journey WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM journey e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM journey e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
),
counts AS (
  SELECT 1 AS stage, 'view' AS step, count(*) AS n FROM s1
  UNION ALL
  SELECT 2, 'click_after_view', count(*) FROM s2
  UNION ALL
  SELECT 3, 'purchase_after_click', count(*) FROM s3
)
SELECT CAST(stage AS BIGINT) AS stage, step, CAST(n AS BIGINT) AS n_users,
       CAST(n AS DOUBLE) / CAST(lag(n) OVER (ORDER BY stage) AS DOUBLE) AS conversion
FROM counts ORDER BY stage
"""


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-seen week, and
    for each later week the count still active — the activation/
    retention matrix every growth dashboard draws. Integer counts and
    day arithmetic only, so the oracle is exact.

    Scale shape: first-seen week is one keyed aggregation; the matrix
    is a distinct + join back on user_id + one grouped count — all
    partitionings on user_id then (cohort, offset); linear."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    week = lambda c: F.date_trunc("week", c).cast("date")
    first = ev.groupBy("user_id").agg(week(F.min("ts")).alias("cohort_week"))
    active = ev.select("user_id", week(F.col("ts")).alias("act_week")).distinct()
    return (
        active.join(first, "user_id")
        .groupBy("cohort_week", F.datediff("act_week", "cohort_week").alias("week_offset"))
        .agg(F.count("*").alias("n_active"))
        .filter(F.col("week_offset") % 7 == 0)  # guard: offsets are whole weeks
        .select(
            F.col("cohort_week").cast("string").alias("cohort_week"),
            (F.col("week_offset") / 7).cast("bigint").alias("week_offset"),
            F.col("n_active").cast("bigint").alias("n_active"),
        )
        .orderBy("cohort_week", "week_offset")
    )


RETENTION_SQL = """
WITH first AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS act_week FROM events
)
SELECT CAST(cohort_week AS VARCHAR) AS cohort_week,
       CAST(datediff('day', cohort_week, act_week) / 7 AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_active
FROM active JOIN first USING (user_id)
GROUP BY cohort_week, datediff('day', cohort_week, act_week)
ORDER BY cohort_week, week_offset
"""


# --------------------------------------------- interval-overlap join (r11)
_IV_GAP_S = 1800  # same 30-min inactivity gap as the sessionization ops
_IV_CELL_US = 3_600_000_000  # 1-hour grid cells, in microseconds


def _iv_sessions(ev: DataFrame) -> DataFrame:
    """Per-(user, event_type) sessions for BOTH interval-join sides in
    ONE pass, as CLOSED intervals in epoch MICROSECONDS: start =
    min(ts), end = max(ts) + the 30-min gap (the native session_window
    bound — a session stays 'open' one gap past its last event, which
    is also what makes cross-user overlap a non-degenerate question on
    sparse event data). Sessionizing error+purchase together (windows
    partitioned by user_id × event_type, the oracle's shape) means the
    err/pur splits downstream share one scan + one shuffle via
    exchange reuse instead of running the whole fact pass twice."""
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.filter(F.col("event_type").isin("error", "purchase"))
        .withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_ts").isNull()
                | (F.col("ts") - F.col("prev_ts") > F.expr("INTERVAL 30 MINUTES")),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "event_type", "session_id")
        .agg(
            F.unix_micros(F.min("ts").cast("timestamp")).alias("s_us"),
            (
                F.unix_micros(F.max("ts").cast("timestamp"))
                + F.lit(_IV_GAP_S * 1_000_000)
            ).alias("e_us"),
        )
    )


def _iv_sides(ev: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split the one-pass sessionized frame into the error (a_*) and
    purchase (b_*) interval sides both operators consume.

    The sessions frame is PERSISTED (result-cache registered): without
    it Catalyst pushes each side's event_type filter below the window
    shuffle — individually optimal, but the fact table is then scanned
    once per CONSUMER (err + pur + pur-scaffold = 3 scans, with the
    purchase windows computed twice). Materializing the session-grain
    frame (~|err+pur sessions| rows, a small fraction of the fact
    table) turns that into one scan + one shuffle, reused by all three
    consumers."""
    sess = register_result_cache(_iv_sessions(ev).persist())
    err = sess.filter(F.col("event_type") == "error").select(
        F.col("s_us").alias("a_s"), F.col("e_us").alias("a_e")
    )
    pur = sess.filter(F.col("event_type") == "purchase").select(
        "user_id", "session_id", F.col("s_us").alias("b_s"), F.col("e_us").alias("b_e")
    )
    return err, pur


def events_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure interval-overlap join — NO equi key: which purchase
    sessions ran concurrently with ANY error session (any user's) —
    the incident-impact question. Spark has no native interval-join
    operator; the naive formulation is a BroadcastNestedLoopJoin on
    the range predicate (O(|A|x|B|) comparisons, only viable while one
    side broadcasts). This implements the standard GRID decomposition:
    each interval explodes to the 1-hour epoch cells it covers (~2
    cells at these widths), the join becomes an EQUI-join on the cell,
    and each surviving pair is counted exactly once by the ownership
    rule — only in the cell that contains max(a.start, b.start), so no
    distinct pass is needed. Per-cell pair products are the inherent
    interval-join cost (equivalent to IEJoin bucket products); a hot
    hour AQE-skew-splits like any equi-join key.

    Overlap is closed-interval at microsecond grain: a.s <= b.e AND
    b.s <= a.e; same-user pairs count (there is deliberately no key
    constraint). Output per day of the purchase session's start:
    sessions starting that day, how many overlapped >= 1 error
    session, total overlapping pairs (a session pairs once per error
    session it overlaps), mean overlap seconds.

    The oracle joins on the raw range predicate — DuckDB plans its own
    IEJoin — so the grid decomposition's correctness (cell coverage,
    ownership dedup, boundary touches) is value-hashed against a
    grid-free formulation.

    Reference parity: no analogue in pravega; standard
    spatial/temporal-join decomposition (e.g. DeWitt et al. PBSM)."""
    ev = _t(spark, sf_dir, "events")
    err, pur = _iv_sides(ev)
    cell = lambda c: F.floor(F.col(c) / _IV_CELL_US)  # noqa: E731
    a_cells = err.withColumn(
        "cell", F.explode(F.sequence(cell("a_s"), cell("a_e")))
    )
    b_cells = pur.withColumn(
        "cell", F.explode(F.sequence(cell("b_s"), cell("b_e")))
    )
    pairs = (
        a_cells.join(b_cells, "cell")
        .filter((F.col("a_s") <= F.col("b_e")) & (F.col("b_s") <= F.col("a_e")))
        .filter(
            F.floor(F.greatest("a_s", "b_s") / _IV_CELL_US) == F.col("cell")
        )
        .select(
            "user_id",
            "session_id",
            "b_s",
            (
                F.least("a_e", "b_e") - F.greatest("a_s", "b_s")
            ).alias("overlap_us"),
        )
    )
    per_sess = pairs.groupBy("user_id", "session_id", "b_s").agg(
        F.count("*").alias("n_pairs"), F.sum("overlap_us").alias("ov_us")
    )
    day = F.date_trunc("day", F.timestamp_micros(F.col("b_s")))
    scaffold = pur.groupBy(day.alias("day")).agg(
        F.count("*").cast("bigint").alias("n_sessions")
    )
    overlapped = per_sess.groupBy(
        F.date_trunc("day", F.timestamp_micros(F.col("b_s"))).alias("day")
    ).agg(
        F.count("*").cast("bigint").alias("n_overlapped"),
        F.sum("n_pairs").cast("bigint").alias("n_pairs"),
        F.round(F.sum("ov_us") / F.sum("n_pairs") / 1e6, 6).alias("avg_overlap_s"),
    )
    return (
        scaffold.join(overlapped, "day", "left")
        .select(
            "day",
            "n_sessions",
            F.coalesce("n_overlapped", F.lit(0)).alias("n_overlapped"),
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("avg_overlap_s", F.lit(0.0)).alias("avg_overlap_s"),
        )
        .orderBy("day")
    )


INTERVAL_OVERLAP_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > {_IV_GAP_S}
              THEN 1 ELSE 0 END AS new_sess
  FROM events WHERE event_type IN ('error', 'purchase')
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_type,
         sum(new_sess) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id,
         ts
  FROM flagged
),
iv AS (
  SELECT user_id, event_type, session_id,
         epoch_us(min(ts)) AS s_us,
         epoch_us(max(ts)) + {_IV_GAP_S}::BIGINT * 1000000 AS e_us
  FROM sess GROUP BY 1, 2, 3
),
err AS (SELECT s_us AS a_s, e_us AS a_e FROM iv WHERE event_type = 'error'),
pur AS (SELECT user_id, session_id, s_us AS b_s, e_us AS b_e
        FROM iv WHERE event_type = 'purchase'),
pairs AS (
  SELECT p.user_id, p.session_id, p.b_s,
         least(e.a_e, p.b_e) - greatest(e.a_s, p.b_s) AS overlap_us
  FROM pur p JOIN err e ON e.a_s <= p.b_e AND p.b_s <= e.a_e
),
per_sess AS (
  SELECT user_id, session_id, b_s, count(*) AS n_pairs, sum(overlap_us) AS ov_us
  FROM pairs GROUP BY 1, 2, 3
),
scaffold AS (
  SELECT CAST(date_trunc('day', make_timestamp(b_s)) AS TIMESTAMP) AS day,
         CAST(count(*) AS BIGINT) AS n_sessions
  FROM pur GROUP BY 1
),
agg AS (
  SELECT CAST(date_trunc('day', make_timestamp(b_s)) AS TIMESTAMP) AS day,
         CAST(count(*) AS BIGINT) AS n_overlapped,
         CAST(sum(n_pairs) AS BIGINT) AS n_pairs,
         round(CAST(sum(ov_us) AS DOUBLE) / sum(n_pairs) / 1e6, 6) AS avg_overlap_s
  FROM per_sess GROUP BY 1
)
SELECT s.day, s.n_sessions,
       coalesce(a.n_overlapped, 0) AS n_overlapped,
       coalesce(a.n_pairs, 0) AS n_pairs,
       coalesce(a.avg_overlap_s, 0.0) AS avg_overlap_s
FROM scaffold s LEFT JOIN agg a USING (day)
ORDER BY s.day
"""


def events_interval_overlap_sweepline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The LINEAR twin of `events_interval_overlap` — identical output,
    identical oracle, different physical strategy. The grid version
    materializes every overlapping pair, which is the contract when
    pair-level output is needed but is inherently QUADRATIC in
    per-hour concurrency (at sf100 the per-cell products hit ~10^10
    comparisons per cell — no partitioning rescues an output-shaped
    blowup). This version computes the same day-level AGGREGATES
    without ever forming a pair, via the classic sweep-line / prefix-
    sum decomposition over interval boundary points:

        n_pairs(b)  = N_s(b_e) - N_e(b_s - 1)
        sum_min(b)  = [S_e(b_e) - S_e(b_s-1)] + b_e * [N_s(b_e) - N_e(b_e)]
        sum_max(b)  = [S_s(b_e) - S_s(b_s-1)] + b_s * [n_pairs - N_s(b_e) + N_s(b_s-1)]
        overlap(b)  = sum_min - sum_max

    where N_s/S_s (N_e/S_e) are count/sum prefix functions over error-
    session starts (ends), evaluated at each purchase session's two
    probe points. All four prefixes come from ONE distributed
    cumulative sum: union boundary points + probes, bucket by the
    1-hour cell (parallelism scales with the time span; each bucket's
    rows grow linearly), windowed cumsum WITHIN each bucket, then add
    the broadcast prefix of whole-bucket totals (one row per bucket —
    the two-pass distributed prefix-sum pattern). Data points sort
    before probes at equal t (tag column), which encodes the closed-
    interval boundary semantics exactly; the strict `< b_s` side
    probes at b_s - 1 (integer microseconds make that exact).

    Prefix sums of epoch-microsecond values overflow int64 at scale
    (1.7e15 per term x 10^7 terms), so S_s/S_e accumulate in
    decimal(38,0) — exact at any realistic corpus size; counts stay
    bigint.

    Cost: O((E + P) log) — one bucket shuffle + in-bucket sort, a
    per-bucket totals rollup (broadcast back), one session-key
    shuffle. Every step linear in input; nothing quadratic remains.

    The pytest suite pins sweepline == grid frame-exact on both the
    hand fixture and real data; the driver value-hashes it against the
    same grid-free DuckDB range-join oracle."""
    ev = _t(spark, sf_dir, "events")
    err, pur = _iv_sides(ev)
    dec = "decimal(38,0)"
    zl = F.lit(0).cast("bigint")
    zd = F.lit(0).cast(dec)
    nl = F.lit(None).cast("bigint")

    def _point(t, d_ns, d_ss, d_ne, d_se):
        return [
            t.alias("t"),
            F.lit(0).alias("tag"),
            d_ns.alias("d_ns"),
            d_ss.alias("d_ss"),
            d_ne.alias("d_ne"),
            d_se.alias("d_se"),
            nl.alias("user_id"),
            nl.alias("session_id"),
            nl.alias("b_s"),
            nl.alias("b_e"),
            F.lit(None).cast("string").alias("kind"),
        ]

    starts = err.select(
        *_point(F.col("a_s"), F.lit(1).cast("bigint"), F.col("a_s").cast(dec), zl, zd)
    )
    ends = err.select(
        *_point(F.col("a_e"), zl, zd, F.lit(1).cast("bigint"), F.col("a_e").cast(dec))
    )
    probes = (
        pur.select(
            "user_id",
            "session_id",
            "b_s",
            "b_e",
            F.explode(
                F.array(
                    F.struct(
                        (F.col("b_s") - 1).alias("t"), F.lit("lo").alias("kind")
                    ),
                    F.struct(F.col("b_e").alias("t"), F.lit("hi").alias("kind")),
                )
            ).alias("p"),
        )
        .select(
            F.col("p.t").alias("t"),
            F.lit(1).alias("tag"),
            zl.alias("d_ns"),
            zd.alias("d_ss"),
            zl.alias("d_ne"),
            zd.alias("d_se"),
            "user_id",
            "session_id",
            "b_s",
            "b_e",
            F.col("p.kind").alias("kind"),
        )
    )
    pts = starts.unionByName(ends).unionByName(probes).withColumn(
        "bucket", F.floor(F.col("t") / _IV_CELL_US)
    )
    win = (
        Window.partitionBy("bucket")
        .orderBy("t", "tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        pts.withColumn("c_ns", F.sum("d_ns").over(win))
        .withColumn("c_ss", F.sum("d_ss").over(win))
        .withColumn("c_ne", F.sum("d_ne").over(win))
        .withColumn("c_se", F.sum("d_se").over(win))
    )
    bw = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        pts.groupBy("bucket")
        .agg(
            F.sum("d_ns").alias("t_ns"),
            F.sum("d_ss").alias("t_ss"),
            F.sum("d_ne").alias("t_ne"),
            F.sum("d_se").alias("t_se"),
        )
        .select(
            "bucket",
            F.coalesce(F.sum("t_ns").over(bw), zl).alias("o_ns"),
            F.coalesce(F.sum("t_ss").over(bw), zd).alias("o_ss"),
            F.coalesce(F.sum("t_ne").over(bw), zl).alias("o_ne"),
            F.coalesce(F.sum("t_se").over(bw), zd).alias("o_se"),
        )
    )
    at = (
        cum.filter(F.col("tag") == 1)
        .join(F.broadcast(offsets), "bucket")
        .select(
            "user_id",
            "session_id",
            "b_s",
            "b_e",
            "kind",
            (F.col("c_ns") + F.col("o_ns")).alias("n_s"),
            (F.col("c_ss") + F.col("o_ss")).alias("s_s"),
            (F.col("c_ne") + F.col("o_ne")).alias("n_e"),
            (F.col("c_se") + F.col("o_se")).alias("s_e"),
        )
    )
    pick = lambda k, c: F.max(F.when(F.col("kind") == k, F.col(c)))  # noqa: E731
    sess = (
        at.groupBy("user_id", "session_id", "b_s", "b_e")
        .agg(
            pick("lo", "n_s").alias("lo_ns"),
            pick("lo", "s_s").alias("lo_ss"),
            pick("lo", "n_e").alias("lo_ne"),
            pick("lo", "s_e").alias("lo_se"),
            pick("hi", "n_s").alias("hi_ns"),
            pick("hi", "s_s").alias("hi_ss"),
            pick("hi", "n_e").alias("hi_ne"),
            pick("hi", "s_e").alias("hi_se"),
        )
        .withColumn("n_pairs", F.col("hi_ns") - F.col("lo_ne"))
        .withColumn(
            "ov_us",
            (
                (F.col("hi_se") - F.col("lo_se"))
                + F.col("b_e").cast(dec) * (F.col("hi_ns") - F.col("hi_ne"))
            )
            - (
                (F.col("hi_ss") - F.col("lo_ss"))
                + F.col("b_s").cast(dec)
                * (F.col("n_pairs") - F.col("hi_ns") + F.col("lo_ns"))
            ),
        )
    )
    day = F.date_trunc("day", F.timestamp_micros(F.col("b_s")))
    scaffold = pur.groupBy(day.alias("day")).agg(
        F.count("*").cast("bigint").alias("n_sessions")
    )
    overlapped = (
        sess.filter(F.col("n_pairs") > 0)
        .groupBy(
            F.date_trunc("day", F.timestamp_micros(F.col("b_s"))).alias("day")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_overlapped"),
            F.sum("n_pairs").cast("bigint").alias("n_pairs"),
            F.round(
                F.sum("ov_us").cast("double") / F.sum("n_pairs") / 1e6, 6
            ).alias("avg_overlap_s"),
        )
    )
    return (
        scaffold.join(overlapped, "day", "left")
        .select(
            "day",
            "n_sessions",
            F.coalesce("n_overlapped", F.lit(0)).alias("n_overlapped"),
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("avg_overlap_s", F.lit(0.0)).alias("avg_overlap_s"),
        )
        .orderBy("day")
    )


# ------------------------------------------------- CDC -> SCD2 (r11)
_SCD2_SILVER = 100.0
_SCD2_GOLD = 220.0


def events_cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog -> type-2 slowly-changing dimension: replay each
    user's purchase stream as a change feed over a derived attribute
    (spend tier: bronze < 100 <= silver < 220 <= gold on the ROLLING
    3-purchase spend, so tiers genuinely rise AND fall — a cumulative
    sum would make the dimension monotone and the history degenerate)
    and materialize the SCD2 HISTORY — one row per
    (user, tier) validity period with valid_from / valid_to /
    is_current — the warehouse MERGE-with-history pattern (Delta/
    Iceberg `MERGE INTO` + type-2 dimension builds; Kimball SCD
    type 2).

    Plan shape: ONE shuffle of the purchase slice on user_id serves
    every step — cumulative sum, tier classification, change-capture
    (keep rows where lag(tier) differs), and period close
    (valid_to = lead(valid_from)) are all windows over the SAME
    (user_id × ts-order) partitioning, so Catalyst runs them in a
    single Window stage chain with no re-exchange; the final rollup is
    one more narrow agg shuffle. Per-user work is bounded by that
    user's event count — linear at any corpus scale, and a hot user is
    one window partition (same bound the sessionization ops carry).

    Float discipline: the rolling sum is rounded to cents BEFORE
    tier comparison in both engines, so the window-fold order (pinned
    by ORDER BY ts, event_id) is the only thing that must agree —
    identical sequential folds give identical doubles.

    Output per (start_day, tier): periods opened, distinct users,
    periods still current, mean CLOSED-period duration in seconds.

    Reference parity: no analogue in pravega (stream store); warehouse
    CDC tooling per the build brief."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tiers = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn(
            "cum",
            F.round(F.sum("value").over(w.rowsBetween(-2, 0)), 2),
        )
        .withColumn(
            "tier",
            F.when(F.col("cum") >= _SCD2_GOLD, "gold")
            .when(F.col("cum") >= _SCD2_SILVER, "silver")
            .otherwise("bronze"),
        )
    )
    periods = (
        tiers.withColumn("prev_tier", F.lag("tier").over(w))
        .filter(F.col("prev_tier").isNull() | (F.col("prev_tier") != F.col("tier")))
        .withColumn("valid_to", F.lead("ts").over(w))
        .select(
            "user_id",
            "tier",
            F.col("ts").alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )
    dur_s = (
        F.unix_micros(F.col("valid_to").cast("timestamp"))
        - F.unix_micros(F.col("valid_from").cast("timestamp"))
    ) / F.lit(1e6)
    return (
        periods.groupBy(
            F.date_trunc("day", "valid_from").alias("start_day"), "tier"
        )
        .agg(
            F.count("*").cast("bigint").alias("n_periods"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum(F.col("is_current").cast("bigint")).alias("n_current"),
            F.round(
                F.coalesce(
                    F.avg(F.when(~F.col("is_current"), dur_s)), F.lit(0.0)
                ),
                3,
            ).alias("avg_closed_s"),
        )
        .orderBy("start_day", "tier")
    )


CDC_SCD2_SQL = f"""
WITH tiers AS (
  SELECT user_id, ts, event_id,
         round(sum(value) OVER w, 2) AS cum
  FROM events WHERE event_type = 'purchase'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
),
classed AS (
  SELECT user_id, ts, event_id,
         CASE WHEN cum >= {_SCD2_GOLD} THEN 'gold'
              WHEN cum >= {_SCD2_SILVER} THEN 'silver'
              ELSE 'bronze' END AS tier
  FROM tiers
),
changes AS (
  SELECT user_id, ts, event_id, tier,
         lag(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_tier
  FROM classed
),
periods AS (
  SELECT user_id, tier, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM changes
  WHERE prev_tier IS NULL OR prev_tier <> tier
)
SELECT CAST(date_trunc('day', valid_from) AS TIMESTAMP) AS start_day, tier,
       CAST(count(*) AS BIGINT) AS n_periods,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_current,
       round(coalesce(avg(CASE WHEN valid_to IS NOT NULL
                     THEN (epoch_us(valid_to) - epoch_us(valid_from)) / 1e6
                     END), 0.0), 3) AS avg_closed_s
FROM periods
GROUP BY 1, 2
ORDER BY start_day, tier
"""


def events_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join against the SCD2 dimension — the
    feature-store staple: enrich every VIEW event with the viewer's
    spend tier AS OF the view's timestamp (tier periods come from the
    same rolling-spend change feed `events_cdc_scd2_history`
    materializes; views before a user's first period read 'none').

    The naive formulation is a range join (e.ts in [valid_from,
    valid_to)); Spark would plan O(|events| x |periods-per-user|)
    comparisons or a broadcast nested loop. This uses the linear
    UNION + LAST-KNOWN-STATE pattern instead: tier-change rows
    (tag 0) and view rows (tag 1) interleave in ONE (user_id x
    (ts, tag, event_id))-ordered window, and each view reads
    last(tier, ignorenulls) — its state as of that instant. Periods
    are contiguous per user (valid_to == next valid_from), so the
    next change overrides exactly at the boundary, and a change at
    the same ts as a view sorts first (tag 0 < 1) = inclusive
    valid_from, exclusive valid_to. Two narrow user_id shuffles total
    (change derivation over the purchase slice, then the interleave) —
    no range predicate, nothing quadratic; a hot user is one window
    partition.

    The DuckDB oracle deliberately IS the range join (periods built
    identically, then e.ts >= valid_from AND (valid_to IS NULL OR
    e.ts < valid_to)) — an independent formulation, so the
    union-window trick's boundary semantics are value-hashed against
    the textbook definition.

    Output per (view day, tier): views and distinct viewers.

    Reference parity: no analogue in pravega (stream store);
    warehouse/feature-store tooling per the build brief."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn(
            "cum", F.round(F.sum("value").over(w.rowsBetween(-2, 0)), 2)
        )
        .withColumn(
            "tier",
            F.when(F.col("cum") >= _SCD2_GOLD, "gold")
            .when(F.col("cum") >= _SCD2_SILVER, "silver")
            .otherwise("bronze"),
        )
        .withColumn("prev_tier", F.lag("tier").over(w))
        .filter(F.col("prev_tier").isNull() | (F.col("prev_tier") != F.col("tier")))
        .select(
            "user_id",
            "ts",
            F.lit(0).alias("tag"),
            F.col("event_id"),
            "tier",
        )
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(1).alias("tag"), "event_id",
        F.lit(None).cast("string").alias("tier"),
    )
    pit = Window.partitionBy("user_id").orderBy("ts", "tag", "event_id")
    enriched = (
        changes.unionByName(views)
        .withColumn(
            "tier_asof",
            F.last("tier", ignorenulls=True).over(
                pit.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .filter(F.col("tag") == 1)
    )
    return (
        enriched.groupBy(
            F.date_trunc("day", "ts").alias("day"),
            F.coalesce("tier_asof", F.lit("none")).alias("tier"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_views"),
            F.countDistinct("user_id").cast("bigint").alias("n_viewers"),
        )
        .orderBy("day", "tier")
    )


SCD2_PIT_SQL = f"""
WITH tiers AS (
  SELECT user_id, ts, event_id,
         round(sum(value) OVER w, 2) AS cum
  FROM events WHERE event_type = 'purchase'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
),
classed AS (
  SELECT user_id, ts, event_id,
         CASE WHEN cum >= {_SCD2_GOLD} THEN 'gold'
              WHEN cum >= {_SCD2_SILVER} THEN 'silver'
              ELSE 'bronze' END AS tier
  FROM tiers
),
changes AS (
  SELECT user_id, ts, event_id, tier,
         lag(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_tier
  FROM classed
),
periods AS (
  SELECT user_id, tier, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM changes
  WHERE prev_tier IS NULL OR prev_tier <> tier
),
views AS (
  SELECT user_id, ts FROM events WHERE event_type = 'view'
),
enriched AS (
  SELECT v.user_id, v.ts, coalesce(p.tier, 'none') AS tier
  FROM views v
  LEFT JOIN periods p
    ON p.user_id = v.user_id
   AND v.ts >= p.valid_from
   AND (p.valid_to IS NULL OR v.ts < p.valid_to)
)
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, tier,
       CAST(count(*) AS BIGINT) AS n_views,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_viewers
FROM enriched
GROUP BY 1, 2
ORDER BY day, tier
"""


# -------------------------------------- rolling distinct users (r11)
_ROLLING_DAYS = 7


def events_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day active users + event volume per activity day —
    the canonical DAU/WAU engagement rollup.

    Distributed shape: a rolling COUNT(DISTINCT) cannot use a window
    frame (Spark forbids DISTINCT in windows) and the naive plan is a
    day×event range join — quadratic in the window width at scale.
    Instead each (user, day) activity fact is exploded to the <=7
    trailing report days it contributes to (``sequence`` of day
    timestamps), then a single groupBy(day) does the distinct count:
    bounded 7x fan-out, linear in events, and the explode happens on
    the already-deduped (user, day) frame so the fan-out input is
    |users x days|, not |events|. Rolling event volume rides the same
    pattern on the per-day counts frame (25 rows per day). Report days
    are restricted to days with actual activity via a broadcast
    semi-join on the tiny day spine.

    Reference parity: no analogue in pravega (stream store);
    analytics layer per the build brief."""
    # one parquet scan: the (day, user_id) projection is persisted and
    # feeds both consumers; the day spine reuses the daily-counts agg
    ev = register_result_cache(
        _t(spark, sf_dir, "events")
        .select(F.date_trunc("day", F.col("ts")).alias("day"), "user_id")
        .persist()
    )
    step = f"sequence(day, day + INTERVAL {_ROLLING_DAYS - 1} DAYS, INTERVAL 1 DAY)"
    user_days = ev.distinct()
    rolling_users = (
        user_days.select(F.explode(F.expr(step)).alias("day"), "user_id")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("rolling_users"))
    )
    daily_counts = ev.groupBy("day").agg(F.count("*").alias("n"))
    days = daily_counts.select("day")
    rolling_events = (
        daily_counts.select(F.explode(F.expr(step)).alias("day"), "n")
        .groupBy("day")
        .agg(F.sum("n").cast("bigint").alias("rolling_events"))
    )
    return (
        rolling_users.join(rolling_events, "day")
        .join(F.broadcast(days), "day", "left_semi")
        .orderBy("day")
    )


ROLLING_DISTINCT_SQL = f"""
WITH ud AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id
  FROM events
),
d AS (SELECT DISTINCT day FROM ud),
dd AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS n
  FROM events GROUP BY 1
),
ru AS (
  SELECT d.day, count(DISTINCT u.user_id) AS rolling_users
  FROM d JOIN ud u
    ON u.day BETWEEN d.day - INTERVAL {_ROLLING_DAYS - 1} DAY AND d.day
  GROUP BY d.day
),
re AS (
  SELECT d.day, CAST(sum(c.n) AS BIGINT) AS rolling_events
  FROM d JOIN dd c
    ON c.day BETWEEN d.day - INTERVAL {_ROLLING_DAYS - 1} DAY AND d.day
  GROUP BY d.day
)
SELECT day, rolling_users, rolling_events
FROM ru JOIN re USING (day)
ORDER BY day
"""


# -------------------------------------- EWMA-kernel smoothing (r11)
# 8-tap truncated exponential kernel: 1/2, 1/4, ... 1/128, 1/128 —
# sums to exactly 1, and every weight is a power of two so each
# product is an EXACT double operation (scaling the exponent), making
# the whole pipeline bit-deterministic across engines with no decimal
# casts and no libm.
_EWMA_WEIGHTS = [2.0 ** -(k + 1) for k in range(7)] + [2.0 ** -7]
_EWMA_TAPS = len(_EWMA_WEIGHTS)


def events_ewma_smoothed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted value smoothing (truncated
    8-tap kernel) evaluated at each user's LAST event — the standard
    time-decay feature for session/engagement models.

    A true EWMA recursion (s_i = a*x_i + (1-a)*s_{i-1}) is sequential
    state; the distributed form truncates the exponential kernel at 8
    taps (tail mass folded into the last tap so weights sum to 1
    exactly) and evaluates it as a fixed dot product over window lags
    — ONE hash-partition shuffle on user_id, no iteration, no state.
    Bit-exactness contract: power-of-two weights make each multiply
    exact in IEEE doubles, and the addition chain is written
    left-associated so both engines round identically at every step.

    Output: users with >=8 events — event count, last event time,
    smoothed value, raw last value.

    Reference parity: no analogue in pravega (stream store);
    analytics layer per the build brief."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    lagged = ev.select(
        "user_id",
        "ts",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wall).alias("cnt"),
        *[F.lag("value", k).over(w).alias(f"x{k}") for k in range(1, _EWMA_TAPS)],
    )
    smoothed = F.col("value") * F.lit(_EWMA_WEIGHTS[0])
    for k in range(1, _EWMA_TAPS):
        smoothed = smoothed + F.col(f"x{k}") * F.lit(_EWMA_WEIGHTS[k])
    return (
        lagged.filter((F.col("rn") == F.col("cnt")) & (F.col("cnt") >= _EWMA_TAPS))
        .select(
            "user_id",
            F.col("cnt").cast("bigint").alias("n_events"),
            F.col("ts").alias("last_ts"),
            smoothed.alias("ewma_value"),
            F.col("value").alias("last_value"),
        )
        .orderBy("user_id")
    )


_EWMA_TERMS_SQL = " + ".join(
    f"{'value' if k == 0 else f'x{k}'} * {w!r}" for k, w in enumerate(_EWMA_WEIGHTS)
)

EWMA_SQL = f"""
WITH lagged AS (
  SELECT user_id, ts, value,
         row_number() OVER w AS rn,
         count(*) OVER (PARTITION BY user_id) AS cnt,
         {", ".join(f"lag(value, {k}) OVER w AS x{k}" for k in range(1, _EWMA_TAPS))}
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(cnt AS BIGINT) AS n_events,
       ts AS last_ts,
       {_EWMA_TERMS_SQL} AS ewma_value,
       value AS last_value
FROM lagged
WHERE rn = cnt AND cnt >= {_EWMA_TAPS}
ORDER BY user_id
"""


# -------------------------------------- Count-Min heavy hitters (r11)
_CMS_DEPTH = 4  # independent hash rows
_CMS_WIDTH = 64  # buckets per row — deliberately small vs ~500 items
_CMS_TOP_K = 10


def _cms_item():
    """The sketched item key: (event_type, user-bucket). ONE definition
    shared by both Count-Min operators — the merged-days op asserts
    estimate equality against this op, so the identities must not
    drift."""
    return F.concat(
        F.col("event_type"), F.lit(":"), (F.col("user_id") % 100).cast("string")
    )


def _cms_col():
    """Cell column for hash row ``r`` and column ``item``: truncated
    md5, deterministic in both engines. Shared for the same reason as
    _cms_item."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cm"), F.col("r").cast("string"), F.lit(":"), F.col("item")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % _CMS_WIDTH
    )


# SQL twins of the helpers above — interpolated into BOTH oracles
_CMS_ITEM_SQL = "event_type || ':' || CAST(user_id % 100 AS VARCHAR)"
_CMS_ROWS_SQL = (
    "SELECT * FROM (VALUES "
    + ", ".join(f"({r})" for r in range(_CMS_DEPTH))
    + ") AS t(r)"
)


def _cms_col_sql(r: str, item: str) -> str:
    return (
        f"('0x' || substr(md5('cm' || {r} || ':' || {item}), 1, 8))::BIGINT"
        f" % {_CMS_WIDTH}"
    )


def events_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) frequency
    estimation for per-(event_type, user-bucket) stream items, with
    the exact counts alongside so the sketch's one-sided error is
    auditable: est_n >= exact_n always, and the top-K heavy hitters
    are ranked by the ESTIMATE (what a real sketch consumer sees).

    The width (64) is deliberately undersized against the ~500-item
    domain so collisions actually occur and the min-over-depth
    reduction is exercised — an oversized sketch would make the
    operator a disguised exact count.

    Distributed shape: the ONLY data-sized stage is one map-side-
    combinable groupBy(item); the sketch itself is the d x w = 256
    cell frame aggregated from the item counts (never from raw
    events), and estimate extraction is a broadcast join of items
    against cells. At 100 TB the sketch stays 256 rows; merging
    per-partition sketches is exactly what the partial aggregation
    already does. Hashes are truncated md5 (deterministic, both
    engines, no RNG).

    Reference parity: no analogue in pravega (stream store);
    sketch/analytics layer per the build brief."""
    ev = _t(spark, sf_dir, "events")
    counts = register_result_cache(
        ev.select(_cms_item().alias("item"))
        .groupBy("item")
        .agg(F.count("*").alias("n"))
        .persist()
    )
    rows_ = spark.range(_CMS_DEPTH).select(F.col("id").cast("int").alias("r"))
    hashed = counts.crossJoin(F.broadcast(rows_)).withColumn("col", _cms_col())
    cells = hashed.groupBy("r", "col").agg(F.sum("n").alias("cell_n"))
    # the exact count rides the est aggregation as max(n) — n is constant
    # per item (counts is item-keyed), so this is exact and avoids an
    # un-hinted item-grain x item-grain join back onto the cache (whose
    # pre-materialization stats can mis-pick a huge broadcast side)
    est = (
        hashed.join(F.broadcast(cells), ["r", "col"])
        .groupBy("item")
        .agg(F.min("cell_n").alias("est_n"), F.max("n").alias("n"))
    )
    return (
        est.select(
            "item",
            F.col("n").cast("bigint").alias("exact_n"),
            F.col("est_n").cast("bigint").alias("est_n"),
            (F.col("est_n") - F.col("n")).cast("bigint").alias("overcount"),
        )
        .orderBy(F.desc("est_n"), "item")
        .limit(_CMS_TOP_K)
    )


COUNTMIN_SQL = f"""
WITH counts AS (
  SELECT {_CMS_ITEM_SQL} AS item,
         count(*) AS n
  FROM events GROUP BY 1
),
r AS ({_CMS_ROWS_SQL}),
hashed AS (
  SELECT c.item, c.n, r.r,
         {_cms_col_sql("r.r", "c.item")} AS col
  FROM counts c CROSS JOIN r
),
cells AS (
  SELECT r, col, sum(n) AS cell_n FROM hashed GROUP BY 1, 2
),
est AS (
  SELECT h.item, min(ce.cell_n) AS est_n
  FROM hashed h JOIN cells ce ON h.r = ce.r AND h.col = ce.col
  GROUP BY 1
)
SELECT c.item AS item,
       CAST(c.n AS BIGINT) AS exact_n,
       CAST(e.est_n AS BIGINT) AS est_n,
       CAST(e.est_n - c.n AS BIGINT) AS overcount
FROM counts c JOIN est e USING (item)
ORDER BY est_n DESC, item
LIMIT {_CMS_TOP_K}
"""


# -------------------------------------- robust z-score anomalies (r11)
# threshold = 3 sigma-equivalents on the MAD scale (3 * 1.4826)
_MAD_K = 4.4478


def events_anomaly_robust_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type anomaly detection via robust z-score (median/MAD — the
    outlier-resistant alternative to mean/stddev, Iglewicz & Hoaglin
    1993): events whose |value - median| exceeds 3 sigma-equivalents
    (3 x 1.4826 x MAD) are flagged.

    Bit-exactness contract: medians use percentile_disc, which PICKS
    an actual data value instead of interpolating — interpolation
    formulas differ in ULP between engines ((a+b)/2 vs a+(b-a)/2), a
    discrete pick cannot. Every downstream op (subtract, abs, one
    multiply by the literal threshold, compare) is a single IEEE
    operation on identical operands.

    Distributed shape: robust stats are inherently two-pass (MAD needs
    the median first) plus a third counting pass; the events
    projection is persisted so parquet is scanned once, and both join-
    backs broadcast the 5-row stats frames. Exact per-group medians
    buffer the group in memory — at 100 TB swap percentile_disc for
    approx_percentile (the sketch path events_percentile_sketch
    already demonstrates); semantics stay deterministic, flags near
    the threshold may differ by the sketch error bound.

    Reference parity: no analogue in pravega (stream store);
    analytics layer per the build brief."""
    ev = register_result_cache(
        _t(spark, sf_dir, "events").select("event_type", "value").persist()
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)").alias("mad")
    )
    flagged = dev.join(F.broadcast(mad), "event_type").withColumn(
        "is_anom", (F.col("adev") > F.lit(_MAD_K) * F.col("mad")).cast("int")
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.max("med"), 6).alias("med"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.sum("is_anom").cast("bigint").alias("n_anomalies"),
            F.round(F.sum("is_anom") / F.count("*"), 6).alias("anomaly_rate"),
        )
        .orderBy("event_type")
    )


ANOMALY_SQL = f"""
WITH med AS (
  SELECT event_type, quantile_disc(value, 0.5) AS med
  FROM events GROUP BY 1
),
dev AS (
  SELECT e.event_type, e.value, abs(e.value - m.med) AS adev, m.med
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, quantile_disc(adev, 0.5) AS mad
  FROM dev GROUP BY 1
)
SELECT d.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(max(d.med), 6) AS med,
       round(max(m.mad), 6) AS mad,
       CAST(sum(CASE WHEN d.adev > {_MAD_K} * m.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_anomalies,
       round(sum(CASE WHEN d.adev > {_MAD_K} * m.mad THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS anomaly_rate
FROM dev d JOIN mad m USING (event_type)
GROUP BY 1
ORDER BY event_type
"""


# -------------------------------------- trade-graph PageRank (r11)
_PR_SCALE = 1_000_000_000_000  # rank fixed point (1e12)
_PR_PPM = 1_000_000  # edge-share fixed point
_PR_ITERS = 3


def nation_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (Page et al. 1999; damping 0.85, 3 iterations) over the
    supplier-nation -> customer-nation trade graph — the canonical
    iterative-algorithm-on-Spark shape.

    Integer fixed-point contract: ranks live at 1e12 scale and edge
    shares at ppm, every update is bigint multiply + floor div, so the
    sums are order-independent and both engines agree bit-for-bit —
    no doubles until the final reporting share. Floor-div remainders
    and dangling-node leakage (a nation with no out-edges keeps only
    the teleport term) make total mass decay slightly per iteration;
    that is the documented simplified-PageRank behavior, identical in
    both engines.

    Distributed shape: the 100 TB stage is building the edge frame —
    lineitem x supplier (broadcast dim) for the source nation and the
    lineitem x orders fact-fact equi-join (AQE-planned; the bucketed
    q18 twin shows the co-located variant) x customer for the
    destination — collapsed by partial aggregation to <=625 weighted
    edges. The 3 Lloyd-style iterations then run on that broadcast-
    small frame: per iteration one groupBy(dst) on 625 rows. Rank
    state never touches the driver (1-row count frame cross-joined,
    not collected).

    Reference parity: no analogue in pravega (stream store);
    analytics layer per the build brief."""
    li = _t(spark, sf_dir, "lineitem").select("l_suppkey", "l_orderkey")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    edges = register_result_cache(
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nat.withColumnRenamed("n_name", "src")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .drop("n_nationkey")
        .join(
            F.broadcast(
                nat.withColumnRenamed("n_name", "dst").withColumnRenamed(
                    "n_nationkey", "c_natkey"
                )
            ),
            F.col("c_nationkey") == F.col("c_natkey"),
        )
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
        .persist()
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    share = edges.join(outw, "src").select(
        "src", "dst", F.expr(f"div(w * {_PR_PPM}, outw)").alias("ppm")
    )
    v = nat.select(F.col("n_name").alias("nation"))
    nv = nat.groupBy().agg(F.count("*").alias("n_v"))
    # base/teleport term and initial rank, carried as columns (no collect)
    rank = (
        v.crossJoin(F.broadcast(nv))
        .select(
            "nation",
            F.expr(f"div({_PR_SCALE}, n_v)").alias("rank"),
            F.expr(f"div(15 * div({_PR_SCALE}, n_v), 100)").alias("base"),
        )
    )
    for _ in range(_PR_ITERS):
        contrib = (
            share.join(
                F.broadcast(rank.select(F.col("nation").alias("src"), "rank")), "src"
            )
            .select("dst", F.expr(f"div(rank * ppm, {_PR_PPM})").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c_sum"))
        )
        rank = (
            rank.select("nation", "base")
            .join(F.broadcast(contrib), rank.nation == contrib.dst, "left")
            .select(
                "nation",
                (
                    F.col("base")
                    + F.expr("div(85 * coalesce(c_sum, 0), 100)")
                ).alias("rank"),
                "base",
            )
        )
    return (
        rank.select(
            "nation",
            F.col("rank").cast("bigint").alias("rank_scaled"),
            F.round(F.col("rank") / F.lit(float(_PR_SCALE)), 6).alias("rank_share"),
        )
        .orderBy(F.desc("rank_scaled"), "nation")
    )


def _pagerank_iter_sql(prev: str, cur: str) -> str:
    return f"""
{cur} AS (
  SELECT v.nation,
         v.base + (85 * coalesce(sum((r.rank * s.ppm) // {_PR_PPM}), 0)) // 100
           AS rank,
         v.base AS base
  FROM r0_base v
  LEFT JOIN (share s JOIN {prev} r ON r.nation = s.src) ON s.dst = v.nation
  GROUP BY v.nation, v.base
)"""


PAGERANK_SQL = f"""
WITH edges AS (
  SELECT sn.n_name AS src, cn.n_name AS dst, count(*) AS w
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  GROUP BY 1, 2
),
outw AS (SELECT src, sum(w) AS outw FROM edges GROUP BY 1),
share AS (
  SELECT e.src, e.dst, (e.w * {_PR_PPM}) // o.outw AS ppm
  FROM edges e JOIN outw o USING (src)
),
nv AS (SELECT count(*) AS n_v FROM nation),
r0_base AS (
  SELECT n.n_name AS nation,
         {_PR_SCALE} // nv.n_v AS rank,
         (15 * ({_PR_SCALE} // nv.n_v)) // 100 AS base
  FROM nation n CROSS JOIN nv
),{",".join(_pagerank_iter_sql("r0_base" if i == 0 else f"r{i}", f"r{i + 1}") for i in range(_PR_ITERS))}
SELECT nation,
       CAST(rank AS BIGINT) AS rank_scaled,
       round(CAST(rank AS DOUBLE) / {float(_PR_SCALE)!r}, 6) AS rank_share
FROM r{_PR_ITERS}
ORDER BY rank_scaled DESC, nation
"""


# -------------------------------------- equi-depth binning (r11)
_N_BINS = 10


def events_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) binning of event value per type — the
    feature-engineering discretization step (quantile bucketizer).

    ntile assigns by position in the sorted group, so with the total
    order pinned on (value, event_id) both engines produce identical
    bins even across duplicate values — no interpolation, no floats
    in the binning decision. Output per (type, bin): row count and
    the bin's [lo, hi] value range.

    Distributed shape: ONE hash shuffle on event_type + an in-
    partition sort; a hot type is one linear window partition (the
    salting pattern in corpus_token_packing applies if a single type
    dominates at 100 TB; exact global ntile is inherently a per-group
    sort). The aggregation after binning is map-side combinable.

    Reference parity: no analogue in pravega (stream store);
    analytics layer per the build brief."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select("event_type", "value", "event_id")
        .withColumn("bin", F.ntile(_N_BINS).over(w))
        .groupBy("event_type", "bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .select("event_type", F.col("bin").cast("bigint").alias("bin"), "n", "lo", "hi")
        .orderBy("event_type", "bin")
    )


DECILES_SQL = f"""
WITH binned AS (
  SELECT event_type, value,
         ntile({_N_BINS}) OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS bin
  FROM events
)
SELECT event_type, CAST(bin AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       min(value) AS lo, max(value) AS hi
FROM binned
GROUP BY 1, 2
ORDER BY event_type, bin
"""


# -------------------------------------- event-type transitions (r11)
# ppm fixed-point scale shared by EVERY r11 rate/share/lift expression
# in this module (transitions, trigrams, drift, basket lift, SLA,
# burst, seasonality) — one spelling, one audit point
_PPM = 1_000_000


def events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences — the behavioral-model fit (next-action prediction
    baseline, funnel leak analysis).

    Each user's events ordered by (ts, event_id) yield consecutive
    (from, to) pairs; the matrix is counts plus a row-normalized
    transition probability in exact ppm fixed point ((n * 1e6) div
    row_total) so both engines agree bit-for-bit.

    Distributed shape: ONE user_id shuffle for the lag window, then a
    tiny (from,to) aggregation with map-side combine; the row totals
    join back broadcast (<=types^2 rows). Linear at any scale.

    Reference parity: no analogue in pravega (stream store);
    analytics layer per the build brief."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("user_id", "ts", "event_id", F.col("event_type").alias("to_type"))
        .withColumn("from_type", F.lag("to_type").over(w))
        .filter(F.col("from_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("row_n"))
    return (
        counts.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            F.col("n").cast("bigint").alias("n"),
            F.expr(f"div(n * {_PPM}, row_n)").cast("bigint").alias("p_ppm"),
        )
        .orderBy("from_type", "to_type")
    )


TRANSITIONS_SQL = f"""
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS from_type,
         event_type AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, count(*) AS n
  FROM pairs WHERE from_type IS NOT NULL GROUP BY 1, 2
),
totals AS (SELECT from_type, sum(n) AS row_n FROM counts GROUP BY 1)
SELECT c.from_type, c.to_type,
       CAST(c.n AS BIGINT) AS n,
       CAST((c.n * {_PPM}) // t.row_n AS BIGINT) AS p_ppm
FROM counts c JOIN totals t USING (from_type)
ORDER BY from_type, to_type
"""


# -------------------------------------- distribution drift TVD (r11)
def events_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift audit per event type: total variation
    distance between the value distributions of the first and second
    halves of the time range — the monitoring primitive that catches
    upstream schema/behavior changes before they poison training data.

    Construction is fully deterministic and integer-exact: the time
    split is the per-type DISCRETE median timestamp (an actual event
    time, no interpolation); bins are value deciles assigned by ntile
    over the pinned (value, event_id) total order (positional — the
    same bin edges for both periods by construction); per-bin period
    shares are ppm fixed point, and TVD = sum|share_a - share_b| / 2
    stays in bigint ppm. No floats anywhere. Degenerate-split
    contract: when the second half is EMPTY (the median ties with the
    max timestamp — single-event types, or half the events stacked on
    the final instant), TVD is defined as the full 1e6 ppm (one
    sample vs no sample is total drift), not NULL from the 0-div.

    Distributed shape: one event_type shuffle serves both the median
    split and the ntile binning (same partition key); the per-bin
    count frame is tiny (types x 10) and everything after it is
    broadcast arithmetic. Parallelism is bounded by the number of
    types (exact positional binning is a per-group sort — the same
    contract as events_value_deciles); at 100 TB swap the bin
    assignment to approx_percentile boundary lookups, which trades
    the per-group sort for a sketch merge at a bounded bin-edge
    error (events_percentile_sketch demonstrates the path).

    Reference parity: no analogue in pravega (stream store);
    analytics layer per the build brief."""
    # the split point is the discrete median in unix MICROS (bigint):
    # percentile_disc rejects TIMESTAMP inputs in Spark, and integer
    # micros compare exactly in both engines anyway
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.unix_micros(F.col("ts")).alias("ts_us"), "event_id", "value"
    )
    split = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY ts_us)").alias("split_us")
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    binned = (
        ev.withColumn("bin", F.ntile(_N_BINS).over(w))
        .join(F.broadcast(split), "event_type")
        .withColumn("period", F.when(F.col("ts_us") <= F.col("split_us"), "a").otherwise("b"))
    )
    per_bin = binned.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("period") == "a", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("period") == "b", 1).otherwise(0)).alias("n_b"),
    )
    totals = per_bin.groupBy("event_type").agg(
        F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b")
    )
    return (
        per_bin.join(F.broadcast(totals), "event_type")
        .withColumn("sh_a", F.expr(f"div(n_a * {_PPM}, t_a)"))
        # greatest(t_b, 1): ANSI div-by-zero would throw BEFORE the
        # t_b = 0 CASE below; n_b is 0 whenever t_b is 0, so the
        # neutralized divisor never changes a kept value
        .withColumn("sh_b", F.expr(f"div(n_b * {_PPM}, greatest(t_b, 1))"))
        .groupBy("event_type")
        .agg(
            F.max("t_a").cast("bigint").alias("t_a"),
            F.max("t_b").cast("bigint").alias("t_b"),
            F.expr("div(sum(abs(sh_a - sh_b)), 2)").alias("tvd_raw"),
        )
        .select(
            "event_type",
            F.col("t_a").alias("n_first_half"),
            F.col("t_b").alias("n_second_half"),
            # empty second half => total drift by contract (the raw
            # expression is NULL there: div by t_b = 0)
            F.when(F.col("t_b") == 0, F.lit(_PPM))
            .otherwise(F.col("tvd_raw"))
            .cast("bigint")
            .alias("tvd_ppm"),
        )
        .orderBy("event_type")
    )


DRIFT_TVD_SQL = f"""
WITH split AS (
  SELECT event_type, quantile_disc(epoch_us(ts), 0.5) AS split_us
  FROM events GROUP BY 1
),
binned AS (
  SELECT e.event_type,
         ntile({_N_BINS}) OVER (PARTITION BY e.event_type
                                ORDER BY e.value, e.event_id) AS bin,
         CASE WHEN epoch_us(e.ts) <= s.split_us THEN 'a' ELSE 'b' END AS period
  FROM events e JOIN split s USING (event_type)
),
per_bin AS (
  SELECT event_type, bin,
         sum(CASE WHEN period = 'a' THEN 1 ELSE 0 END) AS n_a,
         sum(CASE WHEN period = 'b' THEN 1 ELSE 0 END) AS n_b
  FROM binned GROUP BY 1, 2
),
totals AS (
  SELECT event_type, sum(n_a) AS t_a, sum(n_b) AS t_b
  FROM per_bin GROUP BY 1
)
SELECT p.event_type,
       CAST(max(t.t_a) AS BIGINT) AS n_first_half,
       CAST(max(t.t_b) AS BIGINT) AS n_second_half,
       CAST(CASE WHEN max(t.t_b) = 0 THEN {_PPM}
            ELSE sum(abs((p.n_a * {_PPM}) // t.t_a
                       - (p.n_b * {_PPM}) // t.t_b)) // 2
            END AS BIGINT) AS tvd_ppm
FROM per_bin p JOIN totals t USING (event_type)
GROUP BY 1
ORDER BY event_type
"""


# -------------------------------- Count-Min merge-of-days (r11)
def events_countmin_merged_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min MERGEABILITY, proven by the oracle hash: the Spark
    side builds one sketch PER DAY and merges them cell-wise (the
    operation an incremental pipeline performs when each day's
    increment ships its own sketch); the DuckDB oracle builds the
    global sketch DIRECTLY over all events. The driver's value-hash
    equality between the two is exactly the sketch-merge law
    (cell-wise sum of per-partition sketches == sketch of the union)
    — if the day split or merge were wrong, the estimates diverge.

    Output: top-K heavy hitters by merged-sketch estimate, with exact
    counts, overcount, and the item's active-day count (which forces
    the per-day grain to be real, not optimized away).

    Distributed shape: the data-sized stage is one combinable
    groupBy(item, day); the per-day sketches are d x w x days rows
    and their merge is a second tiny aggregation. This is the 100 TB
    ingest pattern: daily increments each reduce to a 256-cell
    sketch, and history-wide frequency queries merge sketches instead
    of rescanning history.

    Reference parity: no analogue in pravega (stream store);
    sketch/analytics layer per the build brief."""
    ev = _t(spark, sf_dir, "events")
    day_counts = register_result_cache(
        ev.select(_cms_item().alias("item"), F.date_trunc("day", F.col("ts")).alias("day"))
        .groupBy("item", "day")
        .agg(F.count("*").alias("n"))
        .persist()
    )
    # day_counts is keyed by (item, day), so each item's rows carry
    # distinct days by construction: count(*) == count(DISTINCT day),
    # without the Expand a mixed distinct+sum aggregation would plan
    counts = day_counts.groupBy("item").agg(
        F.sum("n").alias("n"), F.count("*").alias("n_days")
    )
    rows_ = spark.range(_CMS_DEPTH).select(F.col("id").cast("int").alias("r"))
    # per-day sketches, then the cell-wise merge (cell identity shared
    # with events_countmin_heavy_hitters via _cms_col)
    day_cells = (
        day_counts.crossJoin(F.broadcast(rows_))
        .withColumn("col", _cms_col())
        .groupBy("day", "r", "col")
        .agg(F.sum("n").alias("cell_n"))
    )
    merged = day_cells.groupBy("r", "col").agg(F.sum("cell_n").alias("cell_n"))
    hashed = counts.crossJoin(F.broadcast(rows_)).withColumn("col", _cms_col())
    # exact n and n_days ride the est aggregation — both are constant per
    # item (counts is item-keyed), so max() is exact and the item-grain
    # join back onto the counts frame disappears (same rationale as
    # events_countmin_heavy_hitters)
    est = (
        hashed.join(F.broadcast(merged), ["r", "col"])
        .groupBy("item")
        .agg(
            F.min("cell_n").alias("est_n"),
            F.max("n").alias("n"),
            F.max("n_days").alias("n_days"),
        )
    )
    return (
        est.select(
            "item",
            F.col("n").cast("bigint").alias("exact_n"),
            F.col("est_n").cast("bigint").alias("est_n"),
            (F.col("est_n") - F.col("n")).cast("bigint").alias("overcount"),
            F.col("n_days").cast("bigint").alias("n_days"),
        )
        .orderBy(F.desc("est_n"), "item")
        .limit(_CMS_TOP_K)
    )


# the oracle builds the GLOBAL sketch directly — hash equality with the
# Spark side's per-day merge is the mergeability proof
COUNTMIN_MERGED_SQL = f"""
WITH counts AS (
  SELECT {_CMS_ITEM_SQL} AS item,
         count(*) AS n,
         count(DISTINCT date_trunc('day', ts)) AS n_days
  FROM events GROUP BY 1
),
r AS ({_CMS_ROWS_SQL}),
hashed AS (
  SELECT c.item, c.n, c.n_days, r.r,
         {_cms_col_sql("r.r", "c.item")} AS col
  FROM counts c CROSS JOIN r
),
cells AS (
  SELECT r, col, sum(n) AS cell_n FROM hashed GROUP BY 1, 2
),
est AS (
  SELECT h.item, min(ce.cell_n) AS est_n
  FROM hashed h JOIN cells ce ON h.r = ce.r AND h.col = ce.col
  GROUP BY 1
)
SELECT c.item AS item,
       CAST(c.n AS BIGINT) AS exact_n,
       CAST(e.est_n AS BIGINT) AS est_n,
       CAST(e.est_n - c.n AS BIGINT) AS overcount,
       CAST(c.n_days AS BIGINT) AS n_days
FROM counts c JOIN est e USING (item)
ORDER BY est_n DESC, item
LIMIT {_CMS_TOP_K}
"""


# -------------------------------- calendar gap-fill + LOCF (r11)
def events_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification with last-observation-carried-forward —
    the feature-store resampling step that turns sparse per-user event
    days into a gapless daily series (training frames need aligned
    time grids; LOCF is the standard fill for state-like features).

    Per user: a daily spine from the user's first to last active day,
    the observed daily value total on active days, and LOCF fill on
    gap days. Value math is exact decimal (order-independent sums,
    double only in the final projection). Output stays user-grain
    (spine length, observed/filled day counts, and the filled series'
    total — a value the hash pins to the whole series).

    Distributed shape: ONE user_id shuffle serves the daily rollup,
    the min/max spine bounds, and the LOCF window (same key); the
    spine explode is bounded by the user's active span. Gap days
    carry no events by construction, so the explode output is the
    final series size — there is no densify-then-filter waste.

    Reference parity: no analogue in pravega (stream store);
    analytics layer per the build brief."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.col("value").cast(DEC).alias("v"),
    )
    daily = ev.groupBy("user_id", "day").agg(F.sum("v").alias("day_v"))
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(d0, d1, INTERVAL 1 DAY)")).alias("day"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = (
        spine.join(daily, ["user_id", "day"], "left")
        .withColumn("locf_v", F.last("day_v", ignorenulls=True).over(w))
        .withColumn("observed", F.col("day_v").isNotNull().cast("int"))
    )
    return (
        filled.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.sum("observed").cast("bigint").alias("n_observed"),
            (F.count("*") - F.sum("observed")).cast("bigint").alias("n_filled"),
            F.round(F.sum("locf_v"), 2).cast("double").alias("filled_total"),
        )
        .orderBy("user_id")
    )


GAP_FILL_SQL = """
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         sum(CAST(value AS DECIMAL(18,4))) AS day_v
  FROM events GROUP BY 1, 2
),
spine AS (
  SELECT user_id, unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS day
  FROM daily GROUP BY user_id
),
filled AS (
  SELECT s.user_id, s.day, d.day_v,
         last_value(d.day_v IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.day
           ROWS UNBOUNDED PRECEDING) AS locf_v,
         CASE WHEN d.day_v IS NOT NULL THEN 1 ELSE 0 END AS observed
  FROM spine s LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(observed) AS BIGINT) AS n_observed,
       CAST(count(*) - sum(observed) AS BIGINT) AS n_filled,
       CAST(round(sum(locf_v), 2) AS DOUBLE) AS filled_total
FROM filled
GROUP BY 1
ORDER BY user_id
"""


# ------------------------------------------ RFM segmentation (r11)
_RFM_Q = 5  # quintiles per dimension


def _exact_global_ntile(
    df: DataFrame, sort_cols: list, q: int, out: str, chain: list
) -> DataFrame:
    """``ntile(q) OVER (ORDER BY sort_cols)`` — bit-identical to the
    window function, WITHOUT its single-partition global sort (guide
    §2.5/§2.6: one task sorting |rows| while the cluster idles).

    Shape: range-partition + sort locally (parallel), reconstruct each
    row's GLOBAL row number from ``monotonically_increasing_id`` — its
    documented layout is ``partition_index << 33 + arrival_order``, and
    arrival order above the local sort IS the sorted order — plus a
    broadcast of the per-partition row counts (≤ shuffle.partitions
    rows; ``min(_mid)`` per partition anchors the local index without
    relying on the low bits starting at 0). Spark's NTile bucket
    arithmetic is then replicated exactly: with n rows, the first
    ``n % q`` buckets hold ``n div q + 1`` rows, the rest ``n div q``.

    Correctness notes: ``sort_cols`` must be a TOTAL order (the callers
    tiebreak on the key column), so every row has one well-defined
    global rank regardless of how the range sampler draws partition
    boundaries. The id-stamped frame is PERSISTED, and the persist is
    CORRECTNESS-critical, not a speedup: its two consumers — the row
    side and the per-partition counts side — must see the SAME ids, and
    without the pin AQE is free to give each consumer stage a different
    read plan of the range exchange (e.g. a map-local read), which
    renumbers partitions and was measured to scramble ranks
    nondeterministically. For the same reason the persist is FUNCTION-
    LOCAL (appended to ``chain``, freed by the caller after an eager
    localCheckpoint of its small output) rather than result-cache
    registered: the shared registry's eviction cap may unpersist a
    registered frame while this query is still building, silently
    reintroducing the recompute (the kmeans discipline — VERDICT r11
    item 7). The ``n div q = 0`` branch (fewer rows than buckets) never
    divides by zero because the CASE arm guarding it is then always
    taken.
    """
    spark = df.sparkSession
    p = max(1, int(spark.conf.get("spark.sql.shuffle.partitions")))
    d = (
        df.repartitionByRange(p, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .persist()
    )
    chain.append(d)
    counts = d.groupBy(F.shiftrightunsigned("_mid", 33).alias("_pid")).agg(
        F.count("*").alias("_c"), F.min("_mid").alias("_base")
    )
    w_prev = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off = counts.select(
        "_pid",
        "_base",
        F.coalesce(F.sum("_c").over(w_prev), F.lit(0)).alias("_off"),
        F.sum("_c").over(w_all).alias("_n"),
    )
    return (
        d.join(
            F.broadcast(off),
            F.shiftrightunsigned(F.col("_mid"), 33) == F.col("_pid"),
        )
        .withColumn("_rn", F.col("_mid") - F.col("_base") + F.lit(1) + F.col("_off"))
        .withColumn(
            out,
            F.expr(
                f"CASE WHEN _rn <= (_n % {q}) * (_n div {q} + 1) "
                f"THEN (_rn - 1) div (_n div {q} + 1) + 1 "
                f"ELSE (_n % {q}) + (_rn - 1 - (_n % {q}) * (_n div {q} + 1)) "
                f"div (_n div {q}) + 1 END"
            ).cast("int"),
        )
        .drop("_mid", "_pid", "_base", "_off", "_n", "_rn")
    )


def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (Hughes 1994, the classic
    direct-marketing model): each customer's Recency (last order date),
    Frequency (order count), and Monetary (exact-decimal total spend)
    are each quintile-scored 1-5 by ntile, and the 3-digit R*100 +
    F*10 + M code is the segment. Output: segment census with exact
    spend/order totals — the table a campaign-targeting job consumes
    (averages are the consumer's one division away; emitting them
    would reintroduce a cross-engine decimal-avg divergence — Spark
    averages DECIMAL exactly then rounds HALF_UP, DuckDB's
    avg(DECIMAL) goes through double first, and a .xx5 halfway mean
    hashes differently — found by an adversarial review probe).

    Determinism: ntile is positional over pinned total orders —
    (recency, custkey), (frequency, custkey), (monetary, custkey) —
    so duplicate values cannot order differently across engines;
    money sums are exact decimal, double only in the final
    projection (the sums carry the data's 2-dp scale, so the
    decimal-to-double conversion is of identical exact values).

    Distributed shape: one custkey aggregation builds the per-customer
    RFM frame; the three ntile windows are GLOBAL single-partition
    sorts over |customers| rows (inherent to exact quantile ranks —
    at 100 TB swap to approx_percentile boundary lookups exactly as
    events_value_deciles documents); the segment census is a tiny
    final groupBy.

    Reference parity: no analogue in pravega (stream store);
    analytics layer per the build brief."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", F.col("o_totalprice").cast(DEC).alias("price")
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("freq"),
        F.sum("price").alias("spend"),
    )
    # recency: later last_order = better = higher score. Each quintile
    # score is the EXACT global ntile, computed distributed (range
    # partition + local sort + reconstructed global rank) instead of
    # the former ntile window whose SinglePartition exchange pushed all
    # |customers| rows through ONE task three times (guide §2.5/§2.6;
    # bit-identical buckets — see _exact_global_ntile). The tiny
    # segment census is eagerly localCheckpoint'ed so the chain's
    # correctness-critical persists can be freed at any depth.
    chain: list = []
    try:
        scored = per_cust
        for key, score in (("last_order", "r"), ("freq", "f"), ("spend", "m")):
            scored = _exact_global_ntile(
                scored, [key, "o_custkey"], _RFM_Q, score, chain
            )
        scored = scored.withColumn(
            "segment", F.col("r") * 100 + F.col("f") * 10 + F.col("m")
        )
        return (
            scored.groupBy("segment")
            .agg(
                F.count("*").cast("bigint").alias("n_customers"),
                F.sum("spend").cast("double").alias("total_spend"),
                F.sum("freq").cast("bigint").alias("total_orders"),
            )
            .select(F.col("segment").cast("bigint").alias("segment"),
                    "n_customers", "total_spend", "total_orders")
            .orderBy("segment")
            .localCheckpoint()
        )
    finally:
        for c in chain:
            c.unpersist()


RFM_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey,
         max(o_orderdate) AS last_order,
         count(*) AS freq,
         sum(CAST(o_totalprice AS DECIMAL(18,4))) AS spend
  FROM orders GROUP BY 1
),
scored AS (
  SELECT o_custkey, freq, spend,
         ntile({_RFM_Q}) OVER (ORDER BY last_order, o_custkey) AS r,
         ntile({_RFM_Q}) OVER (ORDER BY freq, o_custkey) AS f,
         ntile({_RFM_Q}) OVER (ORDER BY spend, o_custkey) AS m
  FROM per_cust
)
SELECT CAST(r * 100 + f * 10 + m AS BIGINT) AS segment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(spend) AS DOUBLE) AS total_spend,
       CAST(sum(freq) AS BIGINT) AS total_orders
FROM scored
GROUP BY 1
ORDER BY segment
"""


# ------------------------------------------ cohort LTV triangle (r11)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle: users grouped by first-seen
    week, purchase value accumulated by week-age — the (cohort x age)
    matrix a growth team reads diagonally. Complements
    events_retention_cohorts (headcount) with VALUE, cumulative per
    cohort row.

    Exact math: value sums in decimal; the cumulative sum runs in a
    (cohort, age-order) window AFTER the (cohort, age) aggregation —
    the running fold is over <=n_weeks rows per cohort, exact decimal,
    order pinned by age.

    Distributed shape: one user_id window for first-seen, one
    (cohort, age) aggregation (map-side combinable), then a window
    over the tiny triangle. A hot cohort is a handful of rows at the
    cumsum stage regardless of corpus size.

    Reference parity: no analogue in pravega (stream store);
    analytics layer per the build brief."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("week", F.col("ts")).alias("week"),
        F.when(F.col("event_type") == "purchase", F.col("value").cast(DEC))
        .otherwise(F.lit(0).cast(DEC))
        .alias("v"),
    )
    # age via the repo's established datediff week-offset idiom
    # (events_retention_cohorts): exact integer day arithmetic, no
    # epoch-micros constants, no double-division/cast-semantics trap
    w_first = Window.partitionBy("user_id")
    cohorted = ev.withColumn("cohort", F.min("week").over(w_first)).withColumn(
        "age_weeks",
        (F.datediff(F.col("week"), F.col("cohort")) / 7).cast("bigint"),
    )
    tri = cohorted.groupBy("cohort", "age_weeks").agg(
        F.countDistinct("user_id").alias("active_users"),
        F.sum("v").alias("week_value"),
    )
    w_cum = (
        Window.partitionBy("cohort")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return tri.select(
        "cohort",
        "age_weeks",
        F.col("active_users").cast("bigint").alias("active_users"),
        F.round(F.col("week_value"), 2).cast("double").alias("week_value"),
        F.round(F.sum("week_value").over(w_cum), 2).cast("double").alias("cum_value"),
    ).orderBy("cohort", "age_weeks")


COHORT_LTV_SQL = """
WITH ev AS (
  SELECT user_id,
         CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
         CASE WHEN event_type = 'purchase'
              THEN CAST(value AS DECIMAL(18,4))
              ELSE CAST(0 AS DECIMAL(18,4)) END AS v
  FROM events
),
cohorted AS (
  SELECT user_id, week, v,
         min(week) OVER (PARTITION BY user_id) AS cohort
  FROM ev
),
tri AS (
  SELECT cohort,
         CAST(datediff('day', cohort, week) / 7 AS BIGINT) AS age_weeks,
         count(DISTINCT user_id) AS active_users,
         sum(v) AS week_value
  FROM cohorted
  GROUP BY 1, 2
)
SELECT cohort, age_weeks,
       CAST(active_users AS BIGINT) AS active_users,
       CAST(round(week_value, 2) AS DOUBLE) AS week_value,
       CAST(round(sum(week_value) OVER (PARTITION BY cohort ORDER BY age_weeks
                                        ROWS UNBOUNDED PRECEDING), 2) AS DOUBLE)
         AS cum_value
FROM tri
ORDER BY cohort, age_weeks
"""


# ------------------------------------------ path trigrams (r11)
_PATH_TOP = 10


def events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 3-step behavior paths: the (t1 -> t2 -> t3) event-type
    trigrams over per-user sequences — the higher-order companion of
    events_type_transitions (first-order chains miss patterns like
    view->click->purchase vs view->click->view).

    Output: top-K trigrams with count and exact ppm share of all
    trigrams. One user_id window shuffle (two lags ride the same
    spec), then a tiny path aggregation; the share denominator is a
    1-row broadcast, not a collect.

    Reference parity: no analogue in pravega (stream store);
    analytics layer per the build brief."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        ev.select("user_id", "ts", "event_id", F.col("event_type").alias("t3"))
        .withColumn("t1", F.lag("t3", 2).over(w))
        .withColumn("t2", F.lag("t3", 1).over(w))
        .filter(F.col("t1").isNotNull())
    )
    counts = tri.groupBy("t1", "t2", "t3").agg(F.count("*").alias("n"))
    total = counts.groupBy().agg(F.sum("n").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "t1",
            "t2",
            "t3",
            F.col("n").cast("bigint").alias("n"),
            F.expr(f"div(n * {_PPM}, total)").cast("bigint").alias("share_ppm"),
        )
        .orderBy(F.desc("n"), "t1", "t2", "t3")
        .limit(_PATH_TOP)
    )


PATH_TRIGRAMS_SQL = f"""
WITH tri AS (
  SELECT lag(event_type, 2) OVER w AS t1,
         lag(event_type, 1) OVER w AS t2,
         event_type AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
counts AS (
  SELECT t1, t2, t3, count(*) AS n
  FROM tri WHERE t1 IS NOT NULL GROUP BY 1, 2, 3
),
total AS (SELECT sum(n) AS total FROM counts)
SELECT t1, t2, t3,
       CAST(n AS BIGINT) AS n,
       CAST((n * {_PPM}) // total AS BIGINT) AS share_ppm
FROM counts CROSS JOIN total
ORDER BY n DESC, t1, t2, t3
LIMIT {_PATH_TOP}
"""


# ------------------------------------------ basket lift (r11)
_BASKET_TOP = 15


def lineitem_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity between part brands: for brand pairs
    co-occurring in an order, support and lift (observed co-occurrence
    over the independence expectation) — the assortment/recommendation
    primitive (Agrawal & Srikant 1994 association-rule support).

    Integer fixed point: support_ppm = (n_ab * 1e6) div N and
    lift as the DEFINED two-step floor-div chain
    ``div(div(n_ab * 1e6, n_a) * N, n_b)`` — associating the divisions
    this way keeps every intermediate under 2^63 at any SF (a single
    n_ab*N*1e6 numerator overflows bigint at sf100) and is
    deterministic in both engines; the contract is the expression,
    not real-valued lift.

    Distributed shape: the basket frame collapses to DISTINCT
    (order, brand) BEFORE the pair join — per-order pair fan-out is
    bounded by brands^2 (25 brands -> <=300 pairs/order) regardless of
    lineitem count; one orderkey shuffle for the self-join, map-side
    combinable counts after.

    Reference parity: no analogue in pravega (stream store);
    analytics layer per the build brief."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # ONE full-width exchange for the whole query (guide §2.4/§1.2):
    # collapse straight to one row per order carrying its SORTED brand
    # set (collect_set partially aggregates map-side exactly like the
    # old distinct did), then derive every consumer from that frame —
    # n_orders is a plain count, brand_n a bounded explode, and the
    # brand pairs come from an in-row combinations expression over the
    # sorted set instead of the former orderkey SELF-JOIN (which cost
    # two more full-width exchanges + sorts of the basket frame; the
    # cached frame's partitioning can't be reused across the cache
    # boundary under canChangeCachedPlanOutputPartitioning). Per-order
    # work is bounded by brands^2 (25 -> <=300 pairs) at any SF, and
    # array_sort pins the set order so brand_a < brand_b pairs are
    # reproduced exactly.
    baskets = register_result_cache(
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", F.col("p_brand").alias("brand"))
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("brand")).alias("bs"))
        .persist()
    )
    n_orders = baskets.groupBy().agg(F.count("*").alias("n_orders"))
    brand_n = (
        baskets.select(F.explode("bs").alias("brand"))
        .groupBy("brand")
        .agg(F.count("*").alias("n_brand"))
    )
    pairs = (
        baskets.select(
            F.explode(
                F.flatten(
                    F.expr(
                        "transform(bs, (x, i) -> transform("
                        "slice(bs, i + 2, size(bs)), "
                        "y -> named_struct('brand_a', x, 'brand_b', y)))"
                    )
                )
            ).alias("p")
        )
        .select("p.brand_a", "p.brand_b")
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_ab"))
    )
    return (
        pairs.join(
            F.broadcast(brand_n.withColumnRenamed("brand", "brand_a").withColumnRenamed("n_brand", "n_a")),
            "brand_a",
        )
        .join(
            F.broadcast(brand_n.withColumnRenamed("brand", "brand_b").withColumnRenamed("n_brand", "n_b")),
            "brand_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.expr(f"div(n_ab * {_PPM}, n_orders)").cast("bigint").alias("support_ppm"),
            F.expr(f"div(div(n_ab * {_PPM}, n_a) * n_orders, n_b)")
            .cast("bigint")
            .alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "brand_a", "brand_b")
        .limit(_BASKET_TOP)
    )


BASKET_LIFT_SQL = f"""
WITH baskets AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
n_orders AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM baskets),
brand_n AS (SELECT brand, count(*) AS n_brand FROM baskets GROUP BY 1),
pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS n_ab
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.brand < b.brand
  GROUP BY 1, 2
)
SELECT p.brand_a, p.brand_b,
       CAST(p.n_ab AS BIGINT) AS n_ab,
       CAST((p.n_ab * {_PPM}) // o.n_orders AS BIGINT) AS support_ppm,
       CAST((((p.n_ab * {_PPM}) // na.n_brand) * o.n_orders) // nb.n_brand
            AS BIGINT) AS lift_ppm
FROM pairs p
JOIN brand_n na ON na.brand = p.brand_a
JOIN brand_n nb ON nb.brand = p.brand_b
CROSS JOIN n_orders o
ORDER BY lift_ppm DESC, brand_a, brand_b
LIMIT {_BASKET_TOP}
"""


# ------------------------------------------ lead-time profile (r11)
def lineitem_leadtime_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lead-time SLA profile per supplier nation: exact
    p50/p90/p99 of (shipdate - orderdate) in days, plus the share of
    lines shipped within 30 days — the supply-chain health table.

    Everything is integers: datediff days, percentile_disc picks
    actual day values (no interpolation — the same bit-exactness
    contract as events_anomaly_robust_z), and the SLA share is ppm
    floor-div. Shape: one lineitem-orders equi-join (the canonical
    fact-fact shuffle; bucketed twins show the co-located variant),
    broadcast supplier/nation dims, then a 25-group aggregation whose
    percentile buffers are per-nation (exact percentiles group-buffer;
    the sketch swap is documented in events_percentile_sketch).

    Reference parity: no analogue in pravega (stream store);
    analytics layer per the build brief."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    days = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select(F.col("n_name").alias("nation"),
                F.datediff("l_shipdate", "o_orderdate").alias("d"))
    )
    return (
        days.groupBy("nation")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY d)").cast("bigint").alias("p50_days"),
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY d)").cast("bigint").alias("p90_days"),
            F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY d)").cast("bigint").alias("p99_days"),
            F.expr(f"CAST(div(sum(CASE WHEN d <= 30 THEN 1 ELSE 0 END) * {_PPM}, count(*)) AS BIGINT)").alias("sla30_ppm"),
        )
        .orderBy("nation")
    )


LEADTIME_SQL = f"""
WITH days AS (
  SELECT n.n_name AS nation,
         datediff('day', o.o_orderdate, l.l_shipdate) AS d
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
)
SELECT nation,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(quantile_disc(d, 0.5) AS BIGINT) AS p50_days,
       CAST(quantile_disc(d, 0.9) AS BIGINT) AS p90_days,
       CAST(quantile_disc(d, 0.99) AS BIGINT) AS p99_days,
       CAST((sum(CASE WHEN d <= 30 THEN 1 ELSE 0 END) * {_PPM}) // count(*)
            AS BIGINT) AS sla30_ppm
FROM days
GROUP BY 1
ORDER BY nation
"""


# ------------------------------------------ inter-arrival stats (r11)
def events_inter_arrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type inter-arrival time profile over per-user sequences:
    exact p50/p90 of the gap (whole seconds) between a user's
    consecutive events of the same type, plus burst share (gaps under
    60 s) — the stream-characterization table a capacity planner and
    a bot-detection rule both read.

    All integers: gaps in floor seconds (micros div 1e6),
    percentile_disc picks, ppm floor-div. One (user_id, type) window
    shuffle, then a 5-group aggregation.

    Reference parity: no analogue in pravega (stream store);
    analytics layer per the build brief."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", F.unix_micros(F.col("ts")).alias("us")
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    gaps = (
        ev.withColumn("prev", F.lag("us").over(w))
        .filter(F.col("prev").isNotNull())
        .select("event_type", F.expr("div(us - prev, 1000000)").alias("gap_s"))
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_gaps"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_s)").cast("bigint").alias("p50_s"),
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY gap_s)").cast("bigint").alias("p90_s"),
            F.expr(f"CAST(div(sum(CASE WHEN gap_s < 60 THEN 1 ELSE 0 END) * {_PPM}, count(*)) AS BIGINT)").alias("burst_ppm"),
        )
        .orderBy("event_type")
    )


INTER_ARRIVAL_SQL = f"""
WITH gaps AS (
  SELECT event_type,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER w) // 1000000 AS gap_s
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY epoch_us(ts), event_id)
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(quantile_disc(gap_s, 0.5) AS BIGINT) AS p50_s,
       CAST(quantile_disc(gap_s, 0.9) AS BIGINT) AS p90_s,
       CAST((sum(CASE WHEN gap_s < 60 THEN 1 ELSE 0 END) * {_PPM}) // count(*)
            AS BIGINT) AS burst_ppm
FROM gaps
WHERE gap_s IS NOT NULL
GROUP BY 1
ORDER BY event_type
"""


# ------------------------------------------ seasonality index (r11)
def orders_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue seasonality: each calendar month's index vs the
    uniform-month expectation (1e6 = exactly average) — the demand
    planning table. Revenue is summed in exact CENTS (bigint); the
    index is a size-branched integer contract: below 7e11 total cents
    ($7 B) the exact ``div(month_cents * 12e6, total_cents)`` is
    overflow-safe and used directly; above it the chain
    ``div(month_cents, div(total_cents, 12e6))`` takes over, whose
    denominator is then >= 58333 so the floor error is <= 17 ppm
    relative. The branch condition compares the same bigint in both
    engines, so the contract stays deterministic — and there is no
    tiny-corpus cliff (the naive chain alone returns NULL below
    $120 k total and near-garbage just above it — review finding).

    Shape: one 12-group aggregation with map-side combine over the
    orders scan; the total joins back as a 1-row broadcast.

    Reference parity: no analogue in pravega (stream store);
    analytics layer per the build brief."""
    orders = _t(spark, sf_dir, "orders").select(
        F.month("o_orderdate").alias("month"),
        # exact cents: totalprice has 2-dp data; decimal cast then x100
        (F.col("o_totalprice").cast(DEC) * 100).cast("bigint").alias("cents"),
    )
    monthly = orders.groupBy("month").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum("cents").alias("cents"),
    )
    total = monthly.groupBy().agg(F.sum("cents").alias("total_cents"))
    return (
        monthly.crossJoin(F.broadcast(total))
        .select(
            F.col("month").cast("bigint").alias("month"),
            "n_orders",
            (F.col("cents") / 100).cast("double").alias("revenue"),
            F.expr(
                "CAST(CASE WHEN total_cents < 700000000000 "
                "THEN div(cents * 12000000, total_cents) "
                "ELSE div(cents, div(total_cents, 12000000)) END AS BIGINT)"
            ).alias("index_ppm"),
        )
        .orderBy("month")
    )


SEASONALITY_SQL = """
WITH monthly AS (
  SELECT CAST(month(o_orderdate) AS BIGINT) AS month,
         count(*) AS n_orders,
         sum(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)) AS cents
  FROM orders GROUP BY 1
),
total AS (SELECT sum(cents) AS total_cents FROM monthly)
SELECT month,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST(cents AS DOUBLE) / 100 AS revenue,
       CAST(CASE WHEN total_cents < 700000000000
            THEN (cents * 12000000) // total_cents
            ELSE cents // (total_cents // 12000000)
            END AS BIGINT) AS index_ppm
FROM monthly CROSS JOIN total
ORDER BY month
"""


QUERIES = {
    "events_funnel_conversion": events_funnel_conversion,
    "events_retention_cohorts": events_retention_cohorts,
    "q1_pricing_summary": q1_pricing_summary,
    "q2_min_price_supplier": min_price_supplier,
    "q3_shipping_priority": q3_shipping_priority,
    "q4_orders_with_returns": orders_with_returns,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q5_bucketed_colocated_join": q5_local_supplier_volume_bucketed,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q8_bucketed_colocated_join": q8_market_share_bucketed,
    "q9_product_type_profit": q9_product_type_profit,
    "q10_returned_items": q10_returned_items,
    "q11_important_part_value": q11_important_part_value,
    "q12_priority_shipping_class": q12_priority_shipping_class,
    "q13_customer_distribution": q13_customer_distribution,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q18_bucketed_colocated_agg": q18_large_volume_customers_bucketed,
    "q19_disjunctive_predicates": q19_disjunctive_predicates,
    "q20_dominant_part_suppliers": q20_dominant_part_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q22_global_sales_opportunity": q22_global_sales_opportunity,
    "cust_segment_set_ops": cust_segment_set_ops,
    "events_approx_distinct": events_approx_distinct,
    "events_value_percentiles": events_value_percentiles,
    "events_percentile_sketch": events_percentile_sketch,
    "orders_status_cube": orders_status_cube,
    "cust_above_nation_avg": cust_above_nation_avg,
    "top_parts_per_brand": top_parts_per_brand,
    "revenue_rollup": revenue_rollup,
    "customers_without_orders": customers_without_orders,
    "order_priority_pivot": order_priority_pivot,
    "events_hourly_agg": events_hourly_agg,
    "events_sessionization": events_sessionization,
    "events_interval_overlap": events_interval_overlap,
    "events_interval_overlap_sweepline": events_interval_overlap_sweepline,
    "events_cdc_scd2_history": events_cdc_scd2_history,
    "events_scd2_point_in_time": events_scd2_point_in_time,
    "events_session_window": events_session_window,
    "events_json_extract": events_json_extract,
    "events_asof_purchase": events_asof_purchase,
    "events_running_value": events_running_value,
    "events_rolling_distinct_users": events_rolling_distinct_users,
    "events_ewma_smoothed": events_ewma_smoothed,
    "events_countmin_heavy_hitters": events_countmin_heavy_hitters,
    "events_countmin_merged_days": events_countmin_merged_days,
    "events_gap_fill_locf": events_gap_fill_locf,
    "orders_rfm_segments": orders_rfm_segments,
    "events_cohort_ltv": events_cohort_ltv,
    "events_path_trigrams": events_path_trigrams,
    "lineitem_basket_lift": lineitem_basket_lift,
    "lineitem_leadtime_profile": lineitem_leadtime_profile,
    "events_inter_arrival": events_inter_arrival,
    "orders_seasonality_index": orders_seasonality_index,
    "events_anomaly_robust_z": events_anomaly_robust_z,
    "nation_trade_pagerank": nation_trade_pagerank,
    "events_value_deciles": events_value_deciles,
    "events_type_transitions": events_type_transitions,
    "events_drift_tvd": events_drift_tvd,
}

ORACLES = {
    "events_funnel_conversion": FUNNEL_SQL,
    "events_retention_cohorts": RETENTION_SQL,
    "q1_pricing_summary": Q1_SQL,
    "q2_min_price_supplier": Q2_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q4_orders_with_returns": Q4_SQL,
    "q5_local_supplier_volume": Q5_SQL,
    "q5_bucketed_colocated_join": Q5_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q8_bucketed_colocated_join": Q8_SQL,
    "q9_product_type_profit": Q9_SQL,
    "q10_returned_items": Q10_SQL,
    "q11_important_part_value": Q11_SQL,
    "q12_priority_shipping_class": Q12_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q15_top_supplier": Q15_SQL,
    "q16_supplier_part_counts": Q16_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q18_large_volume_customers": Q18_SQL,
    "q18_bucketed_colocated_agg": Q18_SQL,
    "q19_disjunctive_predicates": Q19_SQL,
    "q20_dominant_part_suppliers": Q20_SQL,
    "q21_waiting_suppliers": Q21_SQL,
    "q22_global_sales_opportunity": Q22_SQL,
    "cust_segment_set_ops": SET_OPS_SQL,
    "events_approx_distinct": APPROX_DISTINCT_SQL,
    "events_value_percentiles": PERCENTILES_SQL,
    "events_percentile_sketch": PERCENTILE_SKETCH_SQL,
    "orders_status_cube": CUBE_SQL,
    "cust_above_nation_avg": ABOVE_AVG_SQL,
    "top_parts_per_brand": TOP_PARTS_SQL,
    "revenue_rollup": ROLLUP_SQL,
    "customers_without_orders": NO_ORDERS_SQL,
    "order_priority_pivot": PRIORITY_PIVOT_SQL,
    "events_hourly_agg": EVENTS_HOURLY_SQL,
    "events_sessionization": SESSIONIZATION_SQL,
    "events_interval_overlap": INTERVAL_OVERLAP_SQL,
    "events_interval_overlap_sweepline": INTERVAL_OVERLAP_SQL,
    "events_cdc_scd2_history": CDC_SCD2_SQL,
    "events_scd2_point_in_time": SCD2_PIT_SQL,
    "events_session_window": SESSION_WINDOW_SQL,
    "events_json_extract": JSON_EXTRACT_SQL,
    "events_asof_purchase": ASOF_SQL,
    "events_running_value": RUNNING_SQL,
    "events_rolling_distinct_users": ROLLING_DISTINCT_SQL,
    "events_ewma_smoothed": EWMA_SQL,
    "events_countmin_heavy_hitters": COUNTMIN_SQL,
    "events_countmin_merged_days": COUNTMIN_MERGED_SQL,
    "events_gap_fill_locf": GAP_FILL_SQL,
    "orders_rfm_segments": RFM_SQL,
    "events_cohort_ltv": COHORT_LTV_SQL,
    "events_path_trigrams": PATH_TRIGRAMS_SQL,
    "lineitem_basket_lift": BASKET_LIFT_SQL,
    "lineitem_leadtime_profile": LEADTIME_SQL,
    "events_inter_arrival": INTER_ARRIVAL_SQL,
    "orders_seasonality_index": SEASONALITY_SQL,
    "events_anomaly_robust_z": ANOMALY_SQL,
    "nation_trade_pagerank": PAGERANK_SQL,
    "events_value_deciles": DECILES_SQL,
    "events_type_transitions": TRANSITIONS_SQL,
    "events_drift_tvd": DRIFT_TVD_SQL,
}
