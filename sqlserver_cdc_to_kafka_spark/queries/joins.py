"""Join + event-time-window queries (SURVEY §2.3 J1–J8; §2.9 note — the
reference has no event-time windows, Spark gives them free over `events`)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.fixtures.cdc_events import (
    CDC_EVENTS_SQL,
    cdc_events,
)
from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import epoch_micros
from sqlserver_cdc_to_kafka_spark.model.envelope import OP_DELETE, OP_POST_UPDATE
from sqlserver_cdc_to_kafka_spark.registry import query
from sqlserver_cdc_to_kafka_spark.tables import load_table

_HOUR_US = 3_600_000_000


@query(
    "join_region_revenue",
    oracle="""
SELECT r_name,
       COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
""",
    bench=True,
)
def q_join_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1–J3 stand-in: the catalog-join chain as a star join — fact table
    scans once, constant-cardinality dims (nation=25, region=5) broadcast
    by hint; customer SCALES with SF, so its join is left to AQE, which
    broadcasts while it fits and shuffle-joins beyond (a hard hint there
    is a driver OOM at 100 TB). Money summed as DECIMAL for an exact,
    order-insensitive total."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
            ).alias("revenue"),
        )
    )


@query(
    "join_lsn_time_mapping",
    oracle=f"""
WITH {CDC_EVENTS_SQL},
mapping AS (SELECT change_seq // 3000 AS lsn_bucket,
                   MAX(epoch_us(__event_time)) AS tran_end_us
            FROM cdc_events GROUP BY 1)
SELECT c.change_seq, c.__operation, m.tran_end_us
FROM cdc_events c JOIN mapping m ON c.change_seq // 3000 = m.lsn_bucket
""",
)
def q_join_lsn_time_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 (sql_queries.py:264): change rows ⋈ lsn_time_mapping to attach the
    transaction end time — the FORCESEEK-hinted lookup becomes a hash join
    whose strategy AQE picks: the mapping is one row per ~3000 changes, so
    it broadcasts at test scale but SCALES with the feed (a hard hint would
    OOM the driver on a 100 TB change history)."""
    feed = cdc_events(spark, sf_dir)
    bucket = (F.col("change_seq") / 3000).cast("bigint")
    mapping = (
        feed.groupBy(bucket.alias("lsn_bucket"))
        .agg(F.max(epoch_micros(feed, "__event_time")).alias("tran_end_us"))
    )
    return (
        feed.withColumn("lsn_bucket", bucket)
        .join(mapping, "lsn_bucket")
        .select("change_seq", "__operation", "tran_end_us")
    )


@query(
    "join_delete_semi_anti",
    oracle=f"""
WITH {CDC_EVENTS_SQL},
dels AS (SELECT DISTINCT o_orderkey FROM cdc_events WHERE __operation = 1),
ups  AS (SELECT DISTINCT o_orderkey FROM cdc_events WHERE __operation = 4)
SELECT
  (SELECT COUNT(*) FROM orders
   WHERE o_orderkey NOT IN (SELECT o_orderkey FROM dels)) AS n_live,
  (SELECT COUNT(*) FROM orders
   WHERE o_orderkey IN (SELECT o_orderkey FROM ups)) AS n_updated
""",
)
def q_join_delete_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/J8: the replayer's set-based delete as a left_anti join and the
    validator's 'touched keys' as a left_semi join."""
    orders = load_table(spark, sf_dir, "orders")
    feed = cdc_events(spark, sf_dir)
    dels = feed.filter(F.col("__operation") == OP_DELETE).select("o_orderkey")
    ups = feed.filter(F.col("__operation") == OP_POST_UPDATE).select("o_orderkey")
    live = orders.join(dels, "o_orderkey", "left_anti").agg(
        F.count("*").alias("n_live")
    )
    updated = orders.join(ups, "o_orderkey", "left_semi").agg(
        F.count("*").alias("n_updated")
    )
    return live.crossJoin(updated)


@query(
    "window_tumbling_hourly",
    oracle=f"""
SELECT (epoch_us(ts) // {_HOUR_US}) * {_HOUR_US} AS hour_start_us,
       event_type,
       COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
FROM events GROUP BY 1, 2
""",
    bench=True,
)
def q_window_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window (1h) per event type — epoch-aligned bucket
    boundaries (identical to Structured Streaming's window() alignment and
    timezone-independent). Beyond-reference capability (SURVEY §2.9 note)."""
    ev = load_table(spark, sf_dir, "events")
    us = epoch_micros(ev, "ts")
    return (
        ev.withColumn("hour_start_us", us - (us % _HOUR_US))
        .groupBy("hour_start_us", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_value"),
        )
    )


@query(
    "topk_orders_per_priority",
    bench=True,
    oracle="""
SELECT o_orderpriority, o_orderkey, o_totalprice,
       CAST(row_number() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
FROM orders QUALIFY rnk <= 3
""",
)
def q_topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group (common OLAP pattern): partitioned window, no global
    sort — each group ranks independently in parallel."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk")
    )


_DAY_US = 86_400_000_000


@query(
    "join_asof_version",
    oracle="""
WITH cdc_lineitem AS (
  SELECT 2 AS __operation, (l_orderkey*8+l_linenumber)*3 AS change_seq,
         l_shipdate AS __event_time, l_orderkey, l_linenumber
  FROM lineitem
  UNION ALL
  SELECT 4, (l_orderkey*8+l_linenumber)*3+1, l_shipdate + INTERVAL 1 HOUR,
         l_orderkey, l_linenumber
  FROM lineitem WHERE (l_orderkey*8+l_linenumber) % 5 = 0
  UNION ALL
  SELECT 1, (l_orderkey*8+l_linenumber)*3+2, l_shipdate + INTERVAL 2 HOUR,
         l_orderkey, l_linenumber
  FROM lineitem WHERE (l_orderkey*8+l_linenumber) % 17 = 0),
v AS (SELECT l_orderkey, l_linenumber, change_seq, __operation,
             epoch_us(__event_time) AS vt FROM cdc_lineitem),
p AS (SELECT l_orderkey, l_linenumber,
             epoch_us(l_shipdate) + 5400000000 AS probe_us FROM lineitem)
SELECT p.l_orderkey, p.l_linenumber, p.probe_us,
       v.change_seq AS asof_seq,
       CAST(v.__operation AS INT) AS asof_operation
FROM p ASOF JOIN v
  ON p.l_orderkey = v.l_orderkey AND p.l_linenumber = v.l_linenumber
 AND p.probe_us >= v.vt
""",
)
def q_join_asof_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join on a COMPOSITE key: every line item probed 90 minutes
    after shipment against its own change feed — which change event was
    current then? (kk%5 rows see their update, others their insert.)

    Second PHYSICAL strategy for as-of (join_asof_order_state is the
    union-and-carry one): lead() validity intervals + the banded equi-join
    (operators/rangejoin.asof_join_banded). The oracle is DuckDB's native
    ASOF JOIN — an independent spec of the semantics, not a replica of
    either implementation."""
    from sqlserver_cdc_to_kafka_spark.fixtures.cdc_events import (
        cdc_lineitem_events,
    )
    from sqlserver_cdc_to_kafka_spark.operators.rangejoin import (
        asof_join_banded,
    )

    feed = cdc_lineitem_events(spark, sf_dir)
    versions = feed.select(
        "l_orderkey",
        "l_linenumber",
        "change_seq",
        F.col("__operation").cast("int").alias("asof_operation"),
        epoch_micros(feed, "__event_time").alias("vt"),
    )
    li = load_table(spark, sf_dir, "lineitem")
    points = li.select(
        "l_orderkey",
        "l_linenumber",
        (epoch_micros(li, "l_shipdate") + 90 * 60 * 1_000_000).alias("probe_us"),
    )
    out = asof_join_banded(
        points,
        versions,
        on=["l_orderkey", "l_linenumber"],
        point_col="probe_us",
        time_col="vt",
        band_width=365 * _DAY_US,
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "probe_us",
        F.col("change_seq").alias("asof_seq"),
        "asof_operation",
    )


@query(
    "join_salted_skew",
    oracle="""
WITH dim AS (
  SELECT * FROM (VALUES ('1-URGENT', 1), ('2-HIGH', 2), ('3-MEDIUM', 3),
                        ('4-NOT SPECIFIED', 4), ('5-LOW', 5))
           AS t(o_orderpriority, priority_rank))
SELECT d.priority_rank,
       COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS revenue
FROM orders o JOIN dim d ON o.o_orderpriority = d.o_orderpriority
GROUP BY 1
""",
)
def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-join result-equivalence witness: the 5-value o_orderpriority key
    is the classic hot-key shape; the salted join spreads each hot key over
    salt_factor sub-partitions (content-derived xxhash64 salt — no rand(),
    replay-stable) and must produce EXACTLY the plain join's result, proved
    against the unsalted SQL. The deterministic salting path is the no-AQE
    fallback; with AQE on, skewJoin handles this at runtime instead."""
    from sqlserver_cdc_to_kafka_spark.operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders")
    dim = spark.createDataFrame(
        [(p, r) for r, p in enumerate(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"], 1
        )],
        "o_orderpriority string, priority_rank int",
    )
    out = salted_join(orders, dim, on=["o_orderpriority"], salt_factor=8)
    return out.groupBy("priority_rank").agg(
        F.count("*").alias("n_orders"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
        ).alias("revenue"),
    )


@query(
    "join_asof_forward",
    oracle=f"""
WITH {CDC_EVENTS_SQL},
ships AS (
  -- pre-reduced: one row per (order, shipdate), earliest line number wins
  SELECT l_orderkey, epoch_us(l_shipdate) AS ship_us,
         MIN(l_linenumber) AS l_linenumber
  FROM lineitem GROUP BY 1, 2),
ranked AS (
  SELECT ce.o_orderkey, ce.change_seq,
         epoch_us(ce.__event_time) AS event_us,
         s.ship_us, s.l_linenumber,
         row_number() OVER (PARTITION BY ce.o_orderkey, ce.change_seq
                            ORDER BY s.ship_us) AS rn
  FROM cdc_events ce JOIN ships s
    ON ce.o_orderkey = s.l_orderkey AND s.ship_us >= epoch_us(ce.__event_time))
SELECT o_orderkey, change_seq, event_us,
       ship_us AS next_ship_us, CAST(l_linenumber AS INT) AS next_linenumber
FROM ranked WHERE rn = 1
""",
)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for every order change event, the NEXT shipment
    at or after it (next-event lookup — the reaction-time / fulfillment-
    latency direction the backward as-of can't answer).  Same
    union-and-carry operator (operators/asof.py) traversed in descending
    time: one shuffle, no range explosion; the oracle is the quadratic
    min-qualifying formulation.  The right side pre-reduces to one row per
    (order, shipdate) so time ties are impossible."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import epoch_micros
    from sqlserver_cdc_to_kafka_spark.operators.asof import asof_join

    li = load_table(spark, sf_dir, "lineitem")
    ships = (
        li.select(
            F.col("l_orderkey").alias("o_orderkey"),
            epoch_micros(li, "l_shipdate").alias("ship_us"),
            "l_linenumber",
        )
        .groupBy("o_orderkey", "ship_us")
        .agg(F.min("l_linenumber").alias("l_linenumber"))
    )
    ev = cdc_events(spark, sf_dir)
    probes = ev.select(
        "o_orderkey",
        "change_seq",
        epoch_micros(ev, "__event_time").alias("event_us"),
    )
    out = asof_join(
        probes,
        ships,
        on=["o_orderkey"],
        left_time="event_us",
        right_time="ship_us",
        right_payload=["ship_us", "l_linenumber"],
        direction="forward",
    )
    return out.select(
        "o_orderkey",
        "change_seq",
        F.col("__t").alias("event_us"),
        F.col("ship_us").alias("next_ship_us"),
        F.col("l_linenumber").cast("int").alias("next_linenumber"),
    )
