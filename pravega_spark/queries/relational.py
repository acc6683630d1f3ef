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
            # sums stay at their natural scale: exact + order-independent,
            # no post-sum rounding that could differ between engines
            F.sum("qty").cast("decimal(24,4)").alias("sum_qty"),
            F.sum("price").cast("decimal(24,4)").alias("sum_base_price"),
            F.sum("disc_price").cast("decimal(30,8)").alias("sum_disc_price"),
            F.sum("charge").cast("decimal(38,12)").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DECIMAL(24,4)) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))) AS DECIMAL(24,4)) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))) AS DECIMAL(30,8)) AS sum_disc_price,
       CAST(sum((CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))) * (1 + CAST(l_tax AS DECIMAL(12,4)))) AS DECIMAL(38,12)) AS sum_charge,
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
        li.join(F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC)))
            .cast("decimal(30,8)")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(30,8)) AS revenue
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
            F.sum(F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC)))
            .cast("decimal(30,8)")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(30,8)) AS revenue
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
            F.sum(F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC)))
            .cast("decimal(30,8)")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(30,8)) AS revenue,
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
        .select("p_brand", "p_partkey", "p_name", F.col("p_retailprice").cast(DEC).alias("price"), "rk")
        .orderBy("p_brand", "rk")
    )


TOP_PARTS_SQL = """
SELECT p_brand, p_partkey, p_name, CAST(p_retailprice AS DECIMAL(18,4)) AS price, rk
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
        .agg(F.sum(F.col("l_extendedprice").cast(DEC)).cast("decimal(24,4)").alias("revenue"))
        .orderBy(F.asc_nulls_first("r_name"), F.asc_nulls_first("n_name"))
    )


ROLLUP_SQL = """
SELECT r_name, n_name, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(30,8)) AS revenue
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


def _priority_pivot_sql(spark: SparkSession, sf_dir: str) -> str:
    # priorities are a small closed set; enumerate for a portable pivot
    pris = [r[0] for r in __import__("duckdb").sql(
        f"select distinct o_orderpriority from '{sf_dir}/orders.parquet' order by 1"
    ).fetchall()]
    cols = ",\n".join(
        f"count(*) FILTER (WHERE o_orderpriority = '{p}') AS \"{p}\"" for p in pris
    )
    return f"SELECT o_orderstatus, {cols} FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"


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
            F.sum(F.col("value").cast(DEC)).cast(DEC).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("hour", "event_type")
    )


EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS total_value,
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
                | (F.col("ts").cast("long") - F.col("prev_ts").cast("long") > 1800),
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
       sum(n_events) AS total_events
FROM per_session GROUP BY user_id ORDER BY user_id
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
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


JSON_EXTRACT_SQL = """
SELECT event_type, count(*) AS n,
       sum(CAST(json_extract_string(props, '$.k') AS INT)) AS sum_k,
       min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------- events: as-of join
def events_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent prior
    signup (event-time as-of semantics, composed from a window over the
    unioned timeline — no Pandas fallback needed).

    At 100 TB the union+window shuffles once on (user_id); the same
    composition works partitioned since the as-of key is the partition key.
    """
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts"), F.col("event_id").alias("signup_event_id")
    )
    timeline = purchases.select(
        "user_id", "ts", "event_id", F.lit(None).cast("timestamp").alias("signup_ts"),
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
            (F.col("ts").cast("long") - F.col("last_signup_ts").cast("long")).alias("secs_since_signup"),
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
            F.sum(F.col("value").cast(DEC)).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast(DEC),
        )
        .filter(F.col("revision") <= 5)
        .select("user_id", "event_id", "revision", "running_value")
        .orderBy("user_id", "revision")
    )


RUNNING_SQL = """
SELECT user_id, event_id, revision, CAST(running_value AS DECIMAL(18,4)) AS running_value
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


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q10_returned_items": q10_returned_items,
    "top_parts_per_brand": top_parts_per_brand,
    "revenue_rollup": revenue_rollup,
    "customers_without_orders": customers_without_orders,
    "order_priority_pivot": order_priority_pivot,
    "events_hourly_agg": events_hourly_agg,
    "events_sessionization": events_sessionization,
    "events_json_extract": events_json_extract,
    "events_asof_purchase": events_asof_purchase,
    "events_running_value": events_running_value,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier_volume": Q5_SQL,
    "q10_returned_items": Q10_SQL,
    "top_parts_per_brand": TOP_PARTS_SQL,
    "revenue_rollup": ROLLUP_SQL,
    "customers_without_orders": NO_ORDERS_SQL,
    "order_priority_pivot": PRIORITY_PIVOT_SQL,
    "events_hourly_agg": EVENTS_HOURLY_SQL,
    "events_sessionization": SESSIONIZATION_SQL,
    "events_json_extract": JSON_EXTRACT_SQL,
    "events_asof_purchase": ASOF_SQL,
    "events_running_value": RUNNING_SQL,
}
