"""Deterministic synthetic CDC change feed (FIXTURES.md `cdc_events`).

The reference's core data object is a change row with an envelope
(``cdc_kafka/parsed_row.py:7-22``). The driver's test tables have no real CDC
source, so — per FIXTURES.md — a change feed is derived deterministically from
``orders`` (and from ``lineitem`` for the composite-key variant):

  for each source row with key k:
    Insert(k)                                  change_seq = k*3
    if k % 5  == 0: PostUpdate(k, status→'U')  change_seq = k*3 + 1
    if k % 17 == 0: Delete(k)                  change_seq = k*3 + 2

``change_seq`` is the scalar surrogate for the reference's ChangeIndex
``(lsn, command_id, seqval, operation)``; ``model.change_index`` expands it to
the full 10-byte struct when envelope fidelity is needed. The SAME derivation
is written twice — once as DataFrame ops, once as an ANSI-SQL CTE the DuckDB
oracle runs — so every operator over the feed is hash-checkable.

Update events carry ``__updated_fields = ['o_orderstatus']`` (the bitmask-
decoded subset, avro.py:536-543); insert/delete carry all columns
(avro.py:532-534). Delete events carry key + nulls for non-key payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.model.envelope import (
    OP_DELETE,
    OP_INSERT,
    OP_POST_UPDATE,
)
from sqlserver_cdc_to_kafka_spark.tables import ensure_parallel, load_table

ORDERS_PAYLOAD = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]

LINEITEM_PAYLOAD = [
    "l_orderkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_returnflag",
]


def cdc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change feed over ``orders`` (single-column PK ``o_orderkey``)."""
    orders = ensure_parallel(load_table(spark, sf_dir, "orders"))
    k = F.col("o_orderkey")

    ins = orders.select(
        F.lit(OP_INSERT).alias("__operation"),
        (k * 3).alias("change_seq"),
        F.col("o_orderdate").alias("__event_time"),
        F.array([F.lit(c) for c in ORDERS_PAYLOAD]).alias("__updated_fields"),
        *[F.col(c) for c in ORDERS_PAYLOAD],
    )
    upd = orders.filter(k % 5 == 0).select(
        F.lit(OP_POST_UPDATE).alias("__operation"),
        (k * 3 + 1).alias("change_seq"),
        (F.col("o_orderdate") + F.expr("INTERVAL 1 HOUR")).alias("__event_time"),
        F.array(F.lit("o_orderstatus")).alias("__updated_fields"),
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.lit("U").alias("o_orderstatus"),
        F.col("o_totalprice"),
        F.col("o_orderdate"),
        F.col("o_orderpriority"),
    )
    del_ = orders.filter(k % 17 == 0).select(
        F.lit(OP_DELETE).alias("__operation"),
        (k * 3 + 2).alias("change_seq"),
        (F.col("o_orderdate") + F.expr("INTERVAL 2 HOUR")).alias("__event_time"),
        F.array([F.lit(c) for c in ORDERS_PAYLOAD]).alias("__updated_fields"),
        F.col("o_orderkey"),
        F.lit(None).cast("bigint").alias("o_custkey"),
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit(None).cast(orders.schema["o_orderdate"].dataType).alias("o_orderdate"),
        F.lit(None).cast("string").alias("o_orderpriority"),
    )
    return ins.unionByName(upd).unionByName(del_)


def cdc_lineitem_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change feed over ``lineitem`` (composite PK ``(l_orderkey,
    l_linenumber)`` — exercises composite-key keyset logic, SURVEY §2 P4/S2).

    key surrogate kk = l_orderkey * 8 + l_linenumber (linenumber < 8 in the
    fixture data); same insert/update/delete cadence as the orders feed.
    """
    li = ensure_parallel(load_table(spark, sf_dir, "lineitem"))
    kk = F.col("l_orderkey") * 8 + F.col("l_linenumber")

    ins = li.select(
        F.lit(OP_INSERT).alias("__operation"),
        (kk * 3).alias("change_seq"),
        F.col("l_shipdate").alias("__event_time"),
        *[F.col(c) for c in LINEITEM_PAYLOAD],
    )
    upd = li.filter(kk % 5 == 0).select(
        F.lit(OP_POST_UPDATE).alias("__operation"),
        (kk * 3 + 1).alias("change_seq"),
        (F.col("l_shipdate") + F.expr("INTERVAL 1 HOUR")).alias("__event_time"),
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        (F.col("l_quantity") + 1.0).alias("l_quantity"),
        F.col("l_extendedprice"),
        F.col("l_returnflag"),
    )
    del_ = li.filter(kk % 17 == 0).select(
        F.lit(OP_DELETE).alias("__operation"),
        (kk * 3 + 2).alias("change_seq"),
        (F.col("l_shipdate") + F.expr("INTERVAL 2 HOUR")).alias("__event_time"),
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.lit(None).cast("double").alias("l_quantity"),
        F.lit(None).cast("double").alias("l_extendedprice"),
        F.lit(None).cast("string").alias("l_returnflag"),
    )
    return ins.unionByName(upd).unionByName(del_)


def with_cdc_views(spark: SparkSession, sf_dir: str) -> None:
    """Register both change feeds as temp views for the SQL API path."""
    cdc_events(spark, sf_dir).createOrReplaceTempView("cdc_events")
    cdc_lineitem_events(spark, sf_dir).createOrReplaceTempView("cdc_lineitem")


# --- DuckDB-oracle equivalents -------------------------------------------
# Identical derivation in ANSI SQL. Prepend these CTE bodies inside a WITH
# clause: f"WITH {CDC_EVENTS_SQL} SELECT ...".

CDC_EVENTS_SQL = """cdc_events AS (
  SELECT 2 AS __operation, o_orderkey*3 AS change_seq,
         o_orderdate AS __event_time,
         o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         o_orderpriority
  FROM orders
  UNION ALL
  SELECT 4, o_orderkey*3+1, o_orderdate + INTERVAL 1 HOUR,
         o_orderkey, o_custkey, 'U', o_totalprice, o_orderdate,
         o_orderpriority
  FROM orders WHERE o_orderkey % 5 = 0
  UNION ALL
  SELECT 1, o_orderkey*3+2, o_orderdate + INTERVAL 2 HOUR,
         o_orderkey, CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
         CAST(NULL AS DOUBLE), CAST(NULL AS TIMESTAMP), CAST(NULL AS VARCHAR)
  FROM orders WHERE o_orderkey % 17 = 0
)"""

CDC_LINEITEM_SQL = """cdc_lineitem AS (
  SELECT 2 AS __operation, (l_orderkey*8+l_linenumber)*3 AS change_seq,
         l_shipdate AS __event_time,
         l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
  FROM lineitem
  UNION ALL
  SELECT 4, (l_orderkey*8+l_linenumber)*3+1, l_shipdate + INTERVAL 1 HOUR,
         l_orderkey, l_linenumber, l_quantity + 1.0, l_extendedprice,
         l_returnflag
  FROM lineitem WHERE (l_orderkey*8+l_linenumber) % 5 = 0
  UNION ALL
  SELECT 1, (l_orderkey*8+l_linenumber)*3+2, l_shipdate + INTERVAL 2 HOUR,
         l_orderkey, l_linenumber, CAST(NULL AS DOUBLE),
         CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR)
  FROM lineitem WHERE (l_orderkey*8+l_linenumber) % 17 = 0
)"""
