"""Event-time window queries beyond tumbling (SURVEY §2.9 closing note):
sliding windows and session windows over the `events` log. The reference has
no event-time windows at all — Spark provides them natively; these queries
pin the exact semantics against an arithmetic DuckDB oracle.

Timezone safety: `F.window`/`F.session_window` align on the timestamp's
internal epoch-micros (UTC), not the session timezone; all outputs are epoch
numbers, so results hash identically under any session tz."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.registry import query
from sqlserver_cdc_to_kafka_spark.tables import load_table

_SLIDE_US = 1_800_000_000  # 30 min
_WIN_US = 3_600_000_000  # 1 h
_GAP_US = 600_000_000  # 10 min session gap


def _events_with_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # ts is epoch-nanos LONG (nanosAsLong); rebuild an instant for window fns
    return ev.withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))


@query(
    "window_sliding_hourly",
    oracle=f"""
WITH ev AS (SELECT epoch_us(ts) AS us, event_type, value FROM events),
expanded AS (
  SELECT (us // {_SLIDE_US}) * {_SLIDE_US} - i.i * {_SLIDE_US} AS window_start_us,
         event_type, value
  FROM ev CROSS JOIN (SELECT unnest(range(0, {_WIN_US // _SLIDE_US})) AS i) i)
SELECT window_start_us, event_type,
       COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_value
FROM expanded GROUP BY 1, 2
""",
    bench=True,
)
def q_window_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h window, 30 min slide) per event type. Spark's
    window() expands each row into window_size/slide rows (Expand node) then
    aggregates — same cost model as the oracle's explicit cross join."""
    ev = _events_with_time(spark, sf_dir)
    return (
        ev.groupBy(F.window("event_time", "1 hour", "30 minutes"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias(
                "total_value"
            ),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "window_session_per_user",
    oracle=f"""
WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
marked AS (
  SELECT user_id, us,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                   >= {_GAP_US}
              OR lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM ev),
grouped AS (
  SELECT user_id, us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us
                             ROWS UNBOUNDED PRECEDING) AS sess
  FROM marked)
SELECT user_id,
       MIN(us) AS session_start_us,
       MAX(us) + {_GAP_US} AS session_end_us,
       COUNT(*) AS n_events
FROM grouped GROUP BY user_id, sess
""",
    bench=True,
)
def q_window_session_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window (10 min inactivity gap) per user — Spark's native
    session_window merges events closer than the gap; window end = last
    event + gap. The oracle reproduces it with gaps-and-islands."""
    ev = _events_with_time(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("event_time", "10 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
            "n_events",
        )
    )
