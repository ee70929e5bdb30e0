"""Audit / operational-analytics queries completing SURVEY §2 coverage:
W2 (snapshot-key order), W7 (snapshot start/complete pairing), A9 (metrics
interval rollup), A10 (progress-topic rollup), F6 (date/time conversions).
Each models the reference behavior over the driver's `events` log (the stand-in
for Kafka topics: partition = user bucket, offset = event_id)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import epoch_micros, int_div
from sqlserver_cdc_to_kafka_spark.operators.validation import (
    lag_regressions,
    progress_rollup,
    snapshot_history,
)
from sqlserver_cdc_to_kafka_spark.registry import query
from sqlserver_cdc_to_kafka_spark.tables import load_table

_DAY_US = 86_400_000_000
_METRICS_INTERVAL_US = 20_000_000  # 20 s reporting interval (constants.py:8)


@query(
    "val_snapshot_key_order",
    oracle="""
SELECT bucket,
       COUNT(*) FILTER (WHERE prev < ts) AS regressions,
       COUNT(*) AS n_rows
FROM (SELECT user_id % 8 AS bucket, ts,
             lag(ts) OVER (PARTITION BY user_id % 8 ORDER BY event_id) AS prev
      FROM events)
GROUP BY bucket
""",
)
def q_snapshot_key_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 (validation.py:148-160): snapshot keys must be NON-INCREASING per
    partition (reverse-keyset snapshots emit high key → low key); count
    violations — the same lag pattern as W1 with the comparison flipped."""
    ev = load_table(spark, sf_dir, "events").withColumn("bucket", F.col("user_id") % 8)
    return lag_regressions(ev, "bucket", "event_id", "ts", descending_expected=True)


@query(
    "val_snapshot_history",
    oracle="""
WITH log AS (
  SELECT 'topic_' || (user_id % 4) AS topic,
         CASE WHEN event_type IN ('view', 'click') THEN 'started'
              ELSE 'completed' END AS action,
         epoch_us(ts) AS t_us, event_id
  FROM events)
SELECT topic,
       arg_max(CASE WHEN action = 'started' THEN t_us END,
               CASE WHEN action = 'started' THEN event_id END) AS last_started,
       arg_max(CASE WHEN action = 'completed' THEN t_us END,
               CASE WHEN action = 'completed' THEN event_id END) AS last_completed,
       COUNT(*) FILTER (WHERE action = 'started') AS n_started,
       COUNT(*) FILTER (WHERE action = 'completed') AS n_completed,
       COALESCE(arg_max(CASE WHEN action = 'started' THEN t_us END,
                        CASE WHEN action = 'started' THEN event_id END)
                > arg_max(CASE WHEN action = 'completed' THEN t_us END,
                          CASE WHEN action = 'completed' THEN event_id END),
                arg_max(CASE WHEN action = 'started' THEN t_us END,
                        CASE WHEN action = 'started' THEN event_id END)
                IS NOT NULL) AS in_progress
FROM log GROUP BY topic
""",
)
def q_snapshot_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 (show_snapshot_history.py:73-77,114-124): last snapshot
    started/completed event per topic, by log position — max_by per group,
    no window. The snapshot log is modeled from the events table."""
    ev = load_table(spark, sf_dir, "events")
    log = ev.select(
        F.concat(F.lit("topic_"), F.col("user_id") % 4).alias("topic"),
        F.when(F.col("event_type").isin("view", "click"), "started")
        .otherwise("completed")
        .alias("action"),
        epoch_micros(ev, "ts").alias("t_us"),
        "event_id",
    )
    return snapshot_history(log, "topic", "action", "t_us", "event_id")


@query(
    "val_metrics_rollup",
    oracle=f"""
SELECT (epoch_us(ts) // {_METRICS_INTERVAL_US}) * 20 AS interval_start_s,
       COUNT(*) AS n_events,
       COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors,
       ROUND(CAST(MIN(value) AS DOUBLE), 6) AS min_value,
       ROUND(CAST(MAX(value) AS DOUBLE), 6) AS max_value,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
FROM events GROUP BY 1
""",
)
def q_metrics_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 (metric_reporting/accumulator.py:71-243): the 20-second metrics
    interval aggregation — counts, error counts, min/max/sum per interval.
    The reference accumulates in Python between reports; here each interval
    is an epoch-aligned group (decimal sum for float determinism)."""
    ev = load_table(spark, sf_dir, "events")
    us = epoch_micros(ev, "ts")
    return (
        ev.withColumn(
            "interval_start_s",
            # exact: bigint mod keeps this integral before the 1e6 scale-down
            ((us - us % _METRICS_INTERVAL_US) / F.lit(1_000_000)).cast("bigint"),
        )
        .groupBy("interval_start_s")
        .agg(
            F.count("*").alias("n_events"),
            F.count_if(F.col("event_type") == "error").alias("n_errors"),
            F.round(F.min("value").cast("double"), 6).alias("min_value"),
            F.round(F.max("value").cast("double"), 6).alias("max_value"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias("sum_value"),
        )
    )


@query(
    "val_progress_rollup",
    oracle="""
WITH log AS (
  SELECT 'topic_' || (user_id % 4) AS topic, event_id, epoch_us(ts) AS idx,
         CASE WHEN event_type IN ('view', 'click') THEN 'change_rows'
              ELSE 'snapshot_rows' END AS kind,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id % 4 ORDER BY event_id) AS prev,
         event_id - lag(event_id) OVER (PARTITION BY user_id % 4
                                        ORDER BY event_id) - 1 AS gap
  FROM events)
SELECT topic,
       COUNT(*) AS n_entries,
       COUNT(*) FILTER (WHERE prev > idx) AS regressions,
       COUNT(*) FILTER (WHERE prev = idx) AS duplicates,
       -- DuckDB SUM(INT) yields HUGEINT (float64 via pandas); Spark yields
       -- BIGINT — cast so the driver's value hash sees the same dtype
       CAST(COALESCE(SUM(gap), 0) AS BIGINT) AS missing_offsets,
       MIN(idx) AS min_idx,
       MAX(idx) AS max_idx,
       COUNT(DISTINCT kind) AS n_kinds
FROM log GROUP BY topic
""",
    bench=True,
)
def q_progress_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 (progress_topic_validator.py:56-153): full progress-topic audit in
    one pass — entry counts, regressions, duplicates, missing offsets, index
    extrema, entry kinds. Window and groupBy share the partitioning key:
    one shuffle total."""
    ev = load_table(spark, sf_dir, "events")
    log = ev.select(
        F.concat(F.lit("topic_"), F.col("user_id") % 4).alias("topic"),
        "event_id",
        epoch_micros(ev, "ts").alias("idx"),
        F.when(F.col("event_type").isin("view", "click"), "change_rows")
        .otherwise("snapshot_rows")
        .alias("kind"),
    )
    return progress_rollup(log, "topic", "event_id", "idx", "kind")


@query(
    "fn_datetime_parts",
    oracle=f"""
SELECT event_id,
       epoch_us(ts) // {_DAY_US} AS epoch_days,
       strftime(DATE '1970-01-01' + CAST(epoch_us(ts) // {_DAY_US} AS INT),
                '%Y-%m-%d') AS iso_date,
       (epoch_us(ts) % {_DAY_US}) // 1000 AS ms_since_midnight
FROM events WHERE event_id < 500
""",
)
def q_datetime_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 (avro.py:518,721-734): the serializer's date/time conversions —
    days-since-epoch (Avro date), ISO-8601 date string, and
    millis-since-midnight (Avro time-millis) — all tz-free epoch arithmetic
    so results are identical under any session timezone."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    us = epoch_micros(ev, "ts")
    days = int_div(us, _DAY_US)
    return ev.select(
        "event_id",
        days.alias("epoch_days"),
        F.date_format(
            F.date_add(F.lit("1970-01-01").cast("date"), days.cast("int")),
            "yyyy-MM-dd",
        ).alias("iso_date"),
        ((us % _DAY_US) / F.lit(1000)).cast("bigint").alias("ms_since_midnight"),
    )


@query(
    "val_truncation_report",
    oracle="""
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(*) FILTER (WHERE strlen(text) > 256) AS n_over_budget,
       MAX(strlen(text)) AS max_bytes,
       CAST(SUM(CASE WHEN strlen(text) > 256
                     THEN strlen(text) - 256 ELSE 0 END) AS BIGINT)
         AS reclaimable_bytes
FROM documents GROUP BY source
""",
)
def q_truncation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """find_truncation_opportunities (the reference's ops tool,
    find_truncation_opportunities.py:12): per source, how many values exceed
    a byte budget and how many bytes a truncation config would reclaim —
    the sizing input for F1's per-column truncation settings."""
    docs = load_table(spark, sf_dir, "documents")
    over = F.octet_length("text") > 256
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count_if(over).alias("n_over_budget"),
        F.max(F.octet_length("text")).cast("bigint").alias("max_bytes"),
        F.sum(
            F.when(over, F.octet_length("text") - 256).otherwise(0)
        ).cast("bigint").alias("reclaimable_bytes"),
    )
