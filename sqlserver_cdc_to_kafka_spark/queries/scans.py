"""Bounded-scan queries — the reference's Kafka consumption patterns
(SURVEY §2.1 S7/S8) modeled over the events log (partition = user bucket,
offset = event_id, timestamp = ts)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import epoch_micros
from sqlserver_cdc_to_kafka_spark.registry import query
from sqlserver_cdc_to_kafka_spark.tables import load_table

_APPROX_MAX = 2000
_N_PARTS = 8
_SKEW_BUFFER_US = 30_000_000  # 30 s rewind buffer (row_comparison_validator.py:124)


@query(
    "scan_bounded_tail",
    oracle=f"""
WITH wm AS (
  SELECT user_id % {_N_PARTS} AS partition,
         MIN(event_id) AS lo, MAX(event_id) AS hi
  FROM events GROUP BY 1),
bounds AS (
  SELECT partition, lo, hi,
         GREATEST(lo, hi - {_APPROX_MAX // _N_PARTS} + 1) AS start_offset
  FROM wm)
SELECT b.partition,
       b.start_offset,
       COUNT(*) AS n_read,
       MIN(e.event_id) AS first_offset,
       MAX(e.event_id) AS last_offset
FROM events e
JOIN bounds b ON e.user_id % {_N_PARTS} = b.partition
WHERE e.event_id >= b.start_offset AND e.event_id <= b.hi
GROUP BY 1, 2
""",
    bench=True,
)
def q_scan_bounded_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 (kafka.py:264-318): bounded tail consume — each partition starts
    at max(low watermark, high watermark − approx_max/partitions) and stops
    at the captured high watermark. Watermarks are one small aggregate,
    broadcast back onto the scan (no shuffle of the log)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "partition", F.col("user_id") % _N_PARTS
    )
    wm = ev.groupBy("partition").agg(
        F.min("event_id").alias("lo"), F.max("event_id").alias("hi")
    )
    bounds = wm.select(
        "partition",
        "hi",
        F.greatest(
            F.col("lo"), F.col("hi") - F.lit(_APPROX_MAX // _N_PARTS) + 1
        ).alias("start_offset"),
    )
    return (
        ev.join(F.broadcast(bounds), "partition")
        .filter(
            (F.col("event_id") >= F.col("start_offset"))
            & (F.col("event_id") <= F.col("hi"))
        )
        .groupBy("partition", "start_offset")
        .agg(
            F.count("*").alias("n_read"),
            F.min("event_id").alias("first_offset"),
            F.max("event_id").alias("last_offset"),
        )
    )


@query(
    "scan_timestamp_seek",
    oracle=f"""
WITH target AS (
  SELECT MIN(epoch_us(ts)) + 3600000000 AS t_us FROM events)
SELECT user_id % {_N_PARTS} AS partition,
       MIN(event_id) AS start_offset,
       COUNT(*) AS n_after
FROM events, target
WHERE epoch_us(ts) >= t_us - {_SKEW_BUFFER_US}
GROUP BY 1
""",
)
def q_scan_timestamp_seek(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 (row_comparison_validator.py:111-126): offsets_for_times seek —
    per partition, the first offset at/after (target time − 30 s clock-skew
    buffer). Target here = 1 h past the log start (deterministic). The target
    is a 1-row aggregate broadcast onto the scan — one job, no driver-side
    scalar pre-pass."""
    ev = load_table(spark, sf_dir, "events")
    us = epoch_micros(ev, "ts")
    target = ev.agg((F.min(us) + F.lit(3_600_000_000)).alias("t_us"))
    return (
        ev.crossJoin(F.broadcast(target))
        .filter(us >= F.col("t_us") - F.lit(_SKEW_BUFFER_US))
        .withColumn("partition", F.col("user_id") % _N_PARTS)
        .groupBy("partition")
        .agg(F.min("event_id").alias("start_offset"), F.count("*").alias("n_after"))
    )
