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


def _conditional(struct_col, cond):
    """[struct] when cond else [] — typed empty via zero-length slice."""
    return F.slice(F.array(struct_col), 1, F.when(cond, 1).otherwise(0))


def cdc_events(
    spark: SparkSession, sf_dir: str, key_partitioned: bool = False
) -> DataFrame:
    """Change feed over ``orders`` (single-column PK ``o_orderkey``).

    Generated in ONE scan: each order row expands (explode) to its 1-3
    change events — no 3-way self-union, so the source is read and
    repartitioned once however many branches the derivation has.

    ``key_partitioned`` (r16, guide §2.4 "share one exchange"): hash-
    repartition ORDERS by ``o_orderkey`` BEFORE the explode and keep
    ``o_orderkey`` as the pass-through source column (outside the event
    struct), so the Generate preserves ``hashpartitioning(o_orderkey)`` and
    every key-clustered consumer (per-key windows, last-per-key aggregates,
    key joins) plans with NO further exchange of the event feed. The one
    shuffle then moves the PRE-explode orders rows — fewer rows, before the
    1-3× event multiplication — instead of the exploded feed, and a hash
    exchange (unlike the default round-robin) pays no sort-before-
    repartition. o_orderkey is unique per source row, so the hash spread is
    uniform — no skew risk. Identical rows, columns and column order either
    way; consumers whose first shuffle is NOT keyed by o_orderkey keep the
    default."""
    orders = load_table(spark, sf_dir, "orders")
    orders = (
        orders.repartition(F.col("o_orderkey"))
        if key_partitioned
        else ensure_parallel(orders)
    )
    k = F.col("o_orderkey")
    et = F.col("o_orderdate")
    all_fields = F.array(*[F.lit(c) for c in ORDERS_PAYLOAD])

    def ev(op, seq, time, updated, custkey, status, total, odate, prio):
        fields = [
            F.lit(op).alias("__operation"),
            seq.cast("bigint").alias("change_seq"),
            time.alias("__event_time"),
            updated.alias("__updated_fields"),
        ]
        if not key_partitioned:
            # default layout: key inside the struct (select("e.*") below)
            fields.append(k.alias("o_orderkey"))
        fields.extend(
            [
                custkey.alias("o_custkey"),
                status.alias("o_orderstatus"),
                total.alias("o_totalprice"),
                odate.alias("o_orderdate"),
                prio.alias("o_orderpriority"),
            ]
        )
        return F.struct(*fields)

    ins = ev(
        OP_INSERT, k * 3, et, all_fields,
        F.col("o_custkey"), F.col("o_orderstatus"), F.col("o_totalprice"),
        F.col("o_orderdate"), F.col("o_orderpriority"),
    )
    upd = ev(
        OP_POST_UPDATE, k * 3 + 1, et + F.expr("INTERVAL 1 HOUR"),
        F.array(F.lit("o_orderstatus")),
        F.col("o_custkey"), F.lit("U"), F.col("o_totalprice"),
        F.col("o_orderdate"), F.col("o_orderpriority"),
    )
    dtype_date = orders.schema["o_orderdate"].dataType
    del_ = ev(
        OP_DELETE, k * 3 + 2, et + F.expr("INTERVAL 2 HOUR"), all_fields,
        F.lit(None).cast("bigint"), F.lit(None).cast("string"),
        F.lit(None).cast("double"), F.lit(None).cast(dtype_date),
        F.lit(None).cast("string"),
    )
    events = F.concat(
        F.array(ins), _conditional(upd, k % 5 == 0), _conditional(del_, k % 17 == 0)
    )
    if key_partitioned:
        # o_orderkey passes through the Generate as the ORIGINAL attribute,
        # which is what lets Catalyst carry hashpartitioning(o_orderkey)
        # across the explode; column order matches the default path exactly
        return orders.select("o_orderkey", F.explode(events).alias("e")).select(
            "e.__operation",
            "e.change_seq",
            "e.__event_time",
            "e.__updated_fields",
            "o_orderkey",
            "e.o_custkey",
            "e.o_orderstatus",
            "e.o_totalprice",
            "e.o_orderdate",
            "e.o_orderpriority",
        )
    return orders.select(F.explode(events).alias("e")).select("e.*")


def cdc_lineitem_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change feed over ``lineitem`` (composite PK ``(l_orderkey,
    l_linenumber)`` — exercises composite-key keyset logic, SURVEY §2 P4/S2).

    key surrogate kk = l_orderkey * 8 + l_linenumber (linenumber < 8 in the
    fixture data); same insert/update/delete cadence and same single-scan
    explode generation as the orders feed.
    """
    li = ensure_parallel(load_table(spark, sf_dir, "lineitem"))
    kk = F.col("l_orderkey") * 8 + F.col("l_linenumber")
    et = F.col("l_shipdate")

    def ev(op, seq, time, qty, price, flag):
        return F.struct(
            F.lit(op).alias("__operation"),
            seq.cast("bigint").alias("change_seq"),
            time.alias("__event_time"),
            F.col("l_orderkey").alias("l_orderkey"),
            F.col("l_linenumber").alias("l_linenumber"),
            qty.alias("l_quantity"),
            price.alias("l_extendedprice"),
            flag.alias("l_returnflag"),
        )

    ins = ev(OP_INSERT, kk * 3, et, F.col("l_quantity"),
             F.col("l_extendedprice"), F.col("l_returnflag"))
    upd = ev(OP_POST_UPDATE, kk * 3 + 1, et + F.expr("INTERVAL 1 HOUR"),
             F.col("l_quantity") + 1.0, F.col("l_extendedprice"),
             F.col("l_returnflag"))
    del_ = ev(OP_DELETE, kk * 3 + 2, et + F.expr("INTERVAL 2 HOUR"),
              F.lit(None).cast("double"), F.lit(None).cast("double"),
              F.lit(None).cast("string"))
    events = F.concat(
        F.array(ins), _conditional(upd, kk % 5 == 0), _conditional(del_, kk % 17 == 0)
    )
    return li.select(F.explode(events).alias("e")).select("e.*")


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
