"""Scalar-function-layer queries (SURVEY §2.8) — the byte-level semantics the
survey flags as the riskiest parity bits (F1 truncation, F2 row hash, F3 LSN
hex, F5 update mask, F9 clock skew, F10 GUID order, F11 case fold)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.fixtures.cdc_events import (
    CDC_EVENTS_SQL,
    ORDERS_PAYLOAD,
    cdc_events,
)
from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
    clock_skew_adjust,
    epoch_micros,
)
from sqlserver_cdc_to_kafka_spark.functions.lsn import lsn_hex, lsn_hex_decode
from sqlserver_cdc_to_kafka_spark.functions.masks import update_mask_to_fields
from sqlserver_cdc_to_kafka_spark.functions.row_hash import _NULL, _SEP, synthetic_row_hash
from sqlserver_cdc_to_kafka_spark.functions.truncation import utf8_truncate
from sqlserver_cdc_to_kafka_spark.functions.uuids import sql_server_uuid_sort_key
from sqlserver_cdc_to_kafka_spark.registry import query
from sqlserver_cdc_to_kafka_spark.tables import load_table


@query(
    "fn_lsn_hex_roundtrip",
    oracle=f"""
WITH {CDC_EVENTS_SQL}
SELECT change_seq,
       '0x' || lpad(lower(hex(change_seq)), 20, '0') AS lsn_hex,
       CAST('0x' || lpad(lower(hex(change_seq)), 20, '0') AS BIGINT) AS decoded_seq
FROM cdc_events
""",
)
def q_lsn_hex_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 (change_index.py:57-72): 10-byte LSN ``0x<hex>`` persistence form,
    encoded and decoded with built-in expressions."""
    feed = cdc_events(spark, sf_dir)
    return feed.select(
        "change_seq",
        lsn_hex(F.col("change_seq")).alias("lsn_hex"),
        lsn_hex_decode(lsn_hex(F.col("change_seq"))).alias("decoded_seq"),
    )


_ROW_HASH_COLS = ["c_custkey", "c_name", "c_mktsegment"]
_ROW_HASH_SQL = " || chr(31) || ".join(
    f"'{c}' || chr(31) || coalesce(CAST({c} AS VARCHAR), '{_NULL}')"
    for c in _ROW_HASH_COLS
)


@query(
    "fn_row_hash_key",
    oracle=f"""
SELECT c_custkey,
       md5({_ROW_HASH_SQL}) AS row_hash,
       lower(c_name) AS key_fold
FROM customer
""",
)
def q_row_hash_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 (tracked_tables.py:418-426): synthetic ``_row_hash`` key for
    PK-less tables + F11 casefolded key compare (validation.py:49-51).
    Caveat preserved from the reference: the hash changes if the column set
    changes."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        synthetic_row_hash(_ROW_HASH_COLS).alias("row_hash"),
        F.lower(F.col("c_name")).alias("key_fold"),
    )


@query(
    "fn_string_truncation",
    oracle="""
SELECT c_custkey,
       substr(c_name, 1, 12) AS name_trunc,
       CAST(least(strlen(c_name), 12) AS INT) AS n_bytes,
       CAST(strlen(c_name) AS INT) AS orig_bytes
FROM customer
""",
)
def q_string_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 (tracked_tables.py:362-395): byte-budget truncation via the
    pandas UDF. The oracle's char-based substr is valid because c_name is
    ASCII; multi-byte boundary behavior is covered by unit-test goldens."""
    cust = load_table(spark, sf_dir, "customer")
    t = utf8_truncate(F.col("c_name"), 12)
    return cust.select(
        "c_custkey",
        t.alias("name_trunc"),
        F.octet_length(t).alias("n_bytes"),
        F.octet_length("c_name").alias("orig_bytes"),
    )


_MASK_SQL_CASES = ", ".join(
    f"CASE WHEN ((((o_orderkey % 63) + 1) >> {i}) & 1) = 1 THEN '{c}' END"
    for i, c in enumerate(ORDERS_PAYLOAD)
)


@query(
    "fn_update_mask",
    oracle=f"""
SELECT o_orderkey,
       (o_orderkey % 63) + 1 AS mask,
       array_to_string(
         list_filter([{_MASK_SQL_CASES}], x -> x IS NOT NULL), '|') AS updated_fields
FROM orders
""",
)
def q_update_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 (avro.py:536-543): update-mask bit expansion to column names, as
    pure array expressions (sequence→transform→filter) — no UDF."""
    orders = load_table(spark, sf_dir, "orders")
    df = orders.withColumn("mask", (F.col("o_orderkey") % 63) + 1)
    return df.select(
        "o_orderkey",
        "mask",
        F.concat_ws("|", update_mask_to_fields("mask", ORDERS_PAYLOAD)).alias(
            "updated_fields"
        ),
    )


_UUID_SQL = (
    "substr(h,1,8) || '-' || substr(h,9,4) || '-' || substr(h,13,4) || '-' || "
    "substr(h,17,4) || '-' || substr(h,21,12)"
)
_SORT_KEY_SQL = (
    "substr(h,21,12) || substr(h,17,4) || substr(h,15,2) || substr(h,13,2) || "
    "substr(h,11,2) || substr(h,9,2) || substr(h,7,2) || substr(h,5,2) || "
    "substr(h,3,2) || substr(h,1,2)"
)


@query(
    "fn_uuid_sort_order",
    oracle=f"""
SELECT o_orderkey, {_UUID_SQL} AS uuid, {_SORT_KEY_SQL} AS sort_key
FROM (SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR)) AS h FROM orders)
""",
)
def q_uuid_sort_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 (validation.py:19-41): SQL Server uniqueidentifier ordering — the
    byte permutation (10..15, 8, 9, 7..0) rebuilt as a sortable hex key."""
    orders = load_table(spark, sf_dir, "orders")
    h = F.md5(F.col("o_orderkey").cast("string"))
    uuid = F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
    return orders.select(
        "o_orderkey",
        uuid.alias("uuid"),
        sql_server_uuid_sort_key(uuid).alias("sort_key"),
    )


_SKEW_SECONDS = 5025.5


@query(
    "fn_clock_skew_adjust",
    oracle=f"""
SELECT o_orderkey,
       epoch_us(o_orderdate) + {int(_SKEW_SECONDS * 1e6)} AS adjusted_us
FROM orders
""",
)
def q_clock_skew_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 (clock_sync.py:24-39): apply the measured DB-clock skew to event
    times — interval arithmetic, surfaced as epoch micros for the
    tz-independent compare."""
    orders = load_table(spark, sf_dir, "orders")
    adj = orders.withColumn(
        "adjusted", clock_skew_adjust(F.col("o_orderdate"), _SKEW_SECONDS)
    )
    return adj.select(
        "o_orderkey", epoch_micros(adj, "adjusted").alias("adjusted_us")
    )
