"""General OLAP analytics over the test tables — the query surface a
downstream consumer of the engine's materialized tables runs (TPC-H-shaped:
pricing summary, shipping priority, local-supplier volume), plus the
multi-table unified-topic merge (SURVEY §1.1 #4 'unified topics').

These exercise Catalyst end-to-end: multi-way joins with broadcast dims,
group-by aggregation with map-side partials, predicate pushdown into parquet
scans, and decimal-stable aggregation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.fixtures.cdc_events import (
    CDC_EVENTS_SQL,
    CDC_LINEITEM_SQL,
    cdc_events,
    cdc_lineitem_events,
)
from sqlserver_cdc_to_kafka_spark.registry import query
from sqlserver_cdc_to_kafka_spark.tables import load_table


@query(
    "olap_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    bench=True,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single-table scan + group-by rollup. The shipdate
    predicate reaches the parquet scan (PushedFilters); decimal sums keep
    float determinism vs the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "olap_shipping_priority",
    oracle="""
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → 3-way join → top-10 by
    aggregated revenue. customer scales with SF so its join is AQE-decided
    (broadcast while small, shuffle beyond); both date predicates push
    into the scans."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp_ntz")
    )
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "olap_local_supplier_volume",
    oracle="""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""",
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with a region filter walking down the dim
    chain — region/nation (constant cardinality) broadcast by hint;
    customer/supplier scale with SF, so their joins are AQE-decided."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "cdc_unified_topics",
    oracle=f"""
WITH {CDC_EVENTS_SQL}, {CDC_LINEITEM_SQL},
u AS (
  SELECT 'orders' AS source_table, change_seq * 2 AS unified_seq,
         __operation, CAST(o_orderkey AS VARCHAR) AS key_text
  FROM cdc_events
  UNION ALL
  SELECT 'lineitem', change_seq * 2 + 1, __operation,
         l_orderkey || '|' || l_linenumber
  FROM cdc_lineitem)
SELECT source_table, unified_seq, __operation, key_text
FROM u
""",
)
def q_unified_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unified topic (main.py:99-124): many tables' change feeds merged into
    one stream in a single global order. Each feed keeps its identity
    (source_table) and its key serialized to a common text form; the unified
    sequence interleaves deterministically (2k / 2k+1 — the fixture stand-in
    for global LSN order). Downstream, orderBy(unified_seq) or
    repartitionByRange gives the total order; the hash gate checks content,
    the ordering operators are covered by cdc_ordered_merge."""
    ev = cdc_events(spark, sf_dir).select(
        F.lit("orders").alias("source_table"),
        (F.col("change_seq") * 2).alias("unified_seq"),
        "__operation",
        F.col("o_orderkey").cast("string").alias("key_text"),
    )
    lev = cdc_lineitem_events(spark, sf_dir).select(
        F.lit("lineitem").alias("source_table"),
        (F.col("change_seq") * 2 + 1).alias("unified_seq"),
        "__operation",
        F.concat_ws("|", "l_orderkey", "l_linenumber").alias("key_text"),
    )
    return ev.unionByName(lev)


@query(
    "olap_value_histogram",
    oracle="""
WITH b AS (
  SELECT event_type,
         CASE WHEN value IS NULL THEN NULL
              WHEN value < 0 THEN 0
              WHEN value >= 1000 THEN 21
              ELSE CAST(FLOOR(value / 50) AS INT) + 1 END AS bucket
  FROM events)
SELECT event_type, bucket, COUNT(*) AS n
FROM b GROUP BY event_type, bucket
""",
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (width_bucket) of event values per type — the
    distribution-profiling primitive (data-quality dashboards, skew
    detection before a join). Pure map-side binning + one shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "bucket",
            F.width_bucket(F.col("value"), F.lit(0.0), F.lit(1000.0), F.lit(20)).cast(
                "int"
            ),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count("*").alias("n"))
    )


@query(
    "join_asof_order_state",
    oracle=f"""
WITH {CDC_EVENTS_SQL}
SELECT l_orderkey, l_linenumber, epoch_us(l_shipdate) AS ship_us,
       o_orderstatus AS status_at_ship, change_seq AS version_seq
FROM (SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem) li
ASOF JOIN cdc_events ce
  ON li.l_orderkey = ce.o_orderkey AND li.l_shipdate >= ce.__event_time
""",
)
def q_asof_order_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (the canonical missing-in-Spark operator): for every line
    item, the ORDER'S STATE AS OF ITS SHIP DATE — the latest change event at
    or before l_shipdate per order key. Implemented with the union-and-carry
    pattern (operators/asof.py): one shuffle, no range explosion; the oracle
    is DuckDB's native ASOF JOIN."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import epoch_micros
    from sqlserver_cdc_to_kafka_spark.operators.asof import asof_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_linenumber", "l_shipdate"
    )
    versions = cdc_events(spark, sf_dir).select(
        "o_orderkey", "__event_time", "o_orderstatus", "change_seq"
    )
    out = asof_join(
        li,
        versions,
        on=["o_orderkey"],
        left_time="l_shipdate",
        right_time="__event_time",
        right_payload=["o_orderstatus", "change_seq"],
    )
    ship_us = epoch_micros(load_table(spark, sf_dir, "lineitem"), "l_shipdate")
    return out.select(
        F.col("o_orderkey").alias("l_orderkey"),
        "l_linenumber",
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', __t)").alias("ship_us"),
        F.col("o_orderstatus").alias("status_at_ship"),
        F.col("change_seq").alias("version_seq"),
    )


@query(
    "olap_value_percentiles",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.95), 6) AS p95,
       ROUND(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
""",
)
def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (the latency-SLO shape of
    the reference's metrics, accumulator.py:231-243). Spark's percentile()
    is exact-with-interpolation like DuckDB's quantile_cont; at 100 TB swap
    for approx_percentile (t-digest) — same call shape, bounded memory."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
    )


@query(
    "join_range_version_intervals",
    oracle=f"""
WITH {CDC_EVENTS_SQL},
iv AS (
  SELECT o_orderkey, o_orderstatus, change_seq,
         epoch_us(__event_time) AS lo,
         lead(epoch_us(__event_time)) OVER (PARTITION BY o_orderkey
                                            ORDER BY change_seq) AS hi
  FROM cdc_events),
pts AS (SELECT l_orderkey, l_linenumber, epoch_us(l_shipdate) AS p
        FROM lineitem)
SELECT l_orderkey, l_linenumber, p AS ship_us,
       o_orderstatus AS status_in_interval, change_seq AS version_seq
FROM pts JOIN iv ON l_orderkey = o_orderkey
WHERE p >= lo AND p < COALESCE(hi, 4611686018427387904)
""",
    bench=True,
)
def q_range_version_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (point-in-interval): each line item matched to the order
    VERSION INTERVAL containing its ship date (intervals = the SCD2 windows
    of the change feed). Banded implementation — equi-join on (key, band)
    then exact containment; never a nested-loop range join. Equivalent
    result to the as-of join, via interval semantics."""
    from pyspark.sql import Window

    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import epoch_micros
    from sqlserver_cdc_to_kafka_spark.operators.rangejoin import banded_range_join

    # key-partitioned feed (r16): the lead() window below is keyed by
    # o_orderkey, so it reads the Generate's preserved hash(o_orderkey)
    # partitioning — the exploded interval feed is never shuffled; the one
    # exchange on this side moves the pre-explode orders rows
    feed = cdc_events(spark, sf_dir, key_partitioned=True)
    us = epoch_micros(feed, "__event_time")
    w = Window.partitionBy("o_orderkey").orderBy("change_seq")
    intervals = feed.select(
        "o_orderkey", "o_orderstatus", "change_seq", us.alias("lo")
    ).withColumn("hi", F.lead("lo").over(w))

    li = load_table(spark, sf_dir, "lineitem")
    ship_us = epoch_micros(li, "l_shipdate")
    points = li.select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_linenumber",
        ship_us.alias("p"),
    )
    out = banded_range_join(
        points,
        intervals,
        on=["o_orderkey"],
        point_col="p",
        lo_col="lo",
        hi_col="hi",
        band_width=30 * 86_400_000_000,  # 30-day bands ~ version spacing
    )
    return out.select(
        F.col("o_orderkey").alias("l_orderkey"),
        "l_linenumber",
        F.col("p").alias("ship_us"),
        F.col("o_orderstatus").alias("status_in_interval"),
        F.col("change_seq").alias("version_seq"),
    )


_HOUR_US2 = 3_600_000_000
_DAY_US2 = 86_400_000_000


@query(
    "window_hierarchical_rollup",
    oracle=f"""
WITH hourly AS (
  SELECT (epoch_us(ts) // {_HOUR_US2}) * {_HOUR_US2} AS hour_us,
         event_type, COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,6))) AS v
  FROM events GROUP BY 1, 2),
daily_from_hourly AS (
  -- CAST: DuckDB SUM(BIGINT) is HUGEINT (hashes as float64); Spark is BIGINT
  SELECT (hour_us // {_DAY_US2}) * {_DAY_US2} AS day_us, event_type,
         CAST(SUM(n) AS BIGINT) AS n, SUM(v) AS v
  FROM hourly GROUP BY 1, 2),
daily_direct AS (
  SELECT (epoch_us(ts) // {_DAY_US2}) * {_DAY_US2} AS day_us, event_type,
         COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,6))) AS v
  FROM events GROUP BY 1, 2)
SELECT h.day_us, h.event_type,
       h.n AS n_rolled, d.n AS n_direct,
       -- exact decimal scaled to integer micro-units: no engine-specific
       -- double rounding in the hash
       CAST(h.v * 1000000 AS BIGINT) AS v_rolled_micros,
       CAST(d.v * 1000000 AS BIGINT) AS v_direct_micros,
       h.n = d.n AS is_match
FROM daily_from_hourly h JOIN daily_direct d
  ON h.day_us = d.day_us AND h.event_type = d.event_type
""",
)
def q_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: the DAILY rollup is computed
    FROM THE HOURLY one (sums re-aggregate losslessly; decimal keeps it
    exact), and the query itself proves it equals the direct daily
    aggregation. At 100 TB each level materializes incrementally (only new
    hours touch the daily table) — this is the algebra that makes that
    valid."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import epoch_micros

    ev = load_table(spark, sf_dir, "events")
    us = epoch_micros(ev, "ts")
    hourly = (
        ev.withColumn("hour_us", us - us % _HOUR_US2)
        .groupBy("hour_us", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("v"),
        )
    )
    daily_rolled = (
        hourly.withColumn("day_us", F.col("hour_us") - F.col("hour_us") % _DAY_US2)
        .groupBy("day_us", "event_type")
        .agg(F.sum("n").alias("n_rolled"), F.sum("v").alias("v_rolled"))
    )
    daily_direct = (
        ev.withColumn("day_us", us - us % _DAY_US2)
        .groupBy("day_us", "event_type")
        .agg(
            F.count("*").alias("n_direct"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("v_direct"),
        )
    )
    return daily_rolled.join(daily_direct, ["day_us", "event_type"]).select(
        "day_us",
        "event_type",
        "n_rolled",
        "n_direct",
        (F.col("v_rolled") * 1_000_000).cast("bigint").alias("v_rolled_micros"),
        (F.col("v_direct") * 1_000_000).cast("bigint").alias("v_direct_micros"),
        (F.col("n_rolled") == F.col("n_direct")).alias("is_match"),
    )
