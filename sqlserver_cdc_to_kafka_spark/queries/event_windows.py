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

from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import as_event_time
from sqlserver_cdc_to_kafka_spark.registry import query
from sqlserver_cdc_to_kafka_spark.streaming.windows import drained
from sqlserver_cdc_to_kafka_spark.tables import load_table

_SLIDE_US = 1_800_000_000  # 30 min
_WIN_US = 3_600_000_000  # 1 h
_GAP_US = 600_000_000  # 10 min session gap


def _events_with_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # ts dtype varies by testdata vintage (LONG nanos / TIMESTAMP_NTZ /
    # TIMESTAMP micros) — as_event_time dispatches on the actual dtype.
    return ev.withColumn("event_time", as_event_time(ev, "ts"))


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
    aggregates — same cost model as the oracle's explicit cross join.

    The sum is exact and order-insensitive WITHOUT a decimal aggregation
    buffer: each value casts to decimal(18,6) once (same row-level rounding
    the oracle applies), scales to an integer-micros BIGINT, and the SUM
    runs on longs — bit-identical output to the decimal sum (verified on
    the full sf0.1 grid) at ~15-20% less wall clock (r5 bench flagged the
    decimal sum as the drift vs r1; measured 0.36 s → 0.31 s steady-state,
    and long sums beat decimal128 sums by a growing margin as rows/task
    rise toward the 100 TB shape)."""
    ev = _events_with_time(spark, sf_dir)
    value_us = (F.col("value").cast("decimal(18,6)") * 1_000_000).cast("bigint")
    return (
        ev.groupBy(F.window("event_time", "1 hour", "30 minutes"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(value_us) / F.lit(1_000_000.0), 4).alias("total_value"),
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
    event + gap. The oracle reproduces it with gaps-and-islands.

    Kept native DELIBERATELY after profiling the r5 bench drift: a
    gaps-and-islands rewrite (lag + running-sum windows over epoch longs)
    measures ~20% faster at sf0.1 (0.40 s vs 0.49 s steady-state) but only
    because 100k rows are overhead-dominated — it shuffles every RAW event
    by user_id before any reduction, while native session_window partially
    merges sessions map-side (partial HashAggregate + MergingSessions
    below the exchange), so the shuffle carries pre-merged sessions. At
    100 TB the native plan moves orders of magnitude less data; the r1
    delta is fixed per-stage scheduling cost, not a plan regression."""
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


_STREAM_HOUR_US = 3_600_000_000


@query(
    "stream_windowed_counts_drain",
    oracle=f"""
SELECT (epoch_us(ts) // {_STREAM_HOUR_US}) * {_STREAM_HOUR_US} AS window_start_us,
       event_type,
       COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
FROM events GROUP BY 1, 2
""",
)
def q_stream_windowed_counts_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING end-to-end witness for event-time windows, on the SCALE
    PATH: readStream → withWatermark → window() → **append-mode parquet
    sink** (each window emitted exactly once when the watermark passes it;
    nothing accumulates in the driver — unlike complete-mode memory sinks,
    this survives 100 TB). A far-future sentinel event advances the final
    watermark so end-of-stream flushes every real window (see
    streaming.windows.windowed_counts_file_sink); the result must hash-match
    the batch oracle — streaming and batch window semantics are the same
    computation, proved. Decimal sum for engine-exact totals; epoch-micros
    outputs keep it timezone-independent."""
    from sqlserver_cdc_to_kafka_spark.streaming.windows import (
        windowed_counts_file_sink,
    )

    def agg_builder(ev: DataFrame) -> DataFrame:
        return (
            ev.withWatermark("event_time", "30 minutes")
            .groupBy(F.window("event_time", "1 hour"), "event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
            )
            .select(
                F.col("window.start").alias("window_start"),
                "event_type",
                "n",
                "total_value",
            )
        )

    out = windowed_counts_file_sink(spark, sf_dir, agg_builder)
    return out.select(
        F.unix_micros(F.col("window_start")).alias("window_start_us"),
        "event_type",
        "n",
        F.round(F.col("total_value").cast("double"), 2).alias("total_value"),
    )


@query(
    "stream_sessionize_stateful",
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
  FROM marked),
sessions AS (
  SELECT user_id, sess,
         MIN(us) AS session_start_us,
         MAX(us) + {_GAP_US} AS session_end_us,
         COUNT(*) AS n_events
  FROM grouped GROUP BY 1, 2),
last AS (SELECT user_id, MAX(sess) AS last_sess FROM sessions GROUP BY 1)
SELECT s.user_id, s.session_start_us, s.session_end_us, s.n_events
FROM sessions s JOIN last l
  ON s.user_id = l.user_id AND s.sess < l.last_sess
""",
)
def q_stream_sessionize_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM STATEFUL STREAMING operator, end-to-end: the events stream
    through ``applyInPandasWithState`` sessionization (explicit per-user
    state carried in the state store across micro-batches — the Spark
    surface for operators the reference hand-rolls as in-process dicts,
    e.g. replayer.py:499-525) must hash-match the batch gaps-and-islands
    oracle for every CLOSED session; each user's final session stays open
    in state by design (a live stream flushes it on timeout) and the oracle
    excludes it identically. Drained through an append-mode parquet sink +
    checkpoint — closed sessions emit incrementally, nothing accumulates in
    the driver."""
    import os
    import tempfile
    import uuid

    from sqlserver_cdc_to_kafka_spark.streaming.stateful import sessionize_stateful
    from sqlserver_cdc_to_kafka_spark.streaming.windows import (
        parquet_row_count,
        read_events_stream,
        scoped_shuffle_partitions,
        state_partitions,
    )

    ev = read_events_stream(spark, sf_dir)
    stream = ev.select("user_id", F.unix_micros("event_time").alias("us"))
    sessions = sessionize_stateful(stream)
    scratch = os.path.join(tempfile.gettempdir(), f"sessdrain_{uuid.uuid4().hex[:12]}")
    outdir = os.path.join(scratch, "out")
    # r16: state partitions sized to the feed (see windows.state_partitions)
    with scoped_shuffle_partitions(
        spark,
        state_partitions(spark, parquet_row_count(f"{sf_dir}/events.parquet")),
    ):
        q = (
            sessions.writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", os.path.join(scratch, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return drained(spark.read.parquet(outdir), scratch)


@query(
    "stream_stream_attribution_join",
    oracle=f"""
WITH c AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events
           WHERE event_type = 'click'),
p AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events
      WHERE event_type = 'purchase'),
j AS (
  SELECT c.user_id, c.event_id AS cid, p.event_id AS pid
  FROM c JOIN p ON c.user_id = p.user_id
              AND p.us >= c.us AND p.us <= c.us + 1800000000)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT cid) AS BIGINT) AS n_clicks_attributed,
       CAST(COUNT(DISTINCT pid) AS BIGINT) AS n_purchases_attributed
FROM j GROUP BY user_id
""",
)
def q_stream_stream_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM JOIN end-to-end (the last stateful-join surface):
    clicks and purchases arrive as two watermarked streams; an inner join
    on user + the [click, click+30min] event-time range emits each
    attribution pair exactly once, appended to a parquet sink, and the
    drained pairs must hash-match the batch self-join oracle. The
    watermarks bound state retention — the property that lets this join
    run forever on an unbounded stream (state is O(horizon), not
    O(stream)); the range predicate is what lets Spark prune each side's
    state store by event time."""
    from sqlserver_cdc_to_kafka_spark.streaming.stream_join import (
        attribution_join_drain,
    )

    pairs = attribution_join_drain(spark, sf_dir)
    return pairs.groupBy("user_id").agg(
        F.count("*").alias("n_pairs"),
        F.count_distinct("click_id").alias("n_clicks_attributed"),
        F.count_distinct("purchase_id").alias("n_purchases_attributed"),
    )


@query(
    "stream_stream_attribution_outer",
    oracle=f"""
WITH c AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events
           WHERE event_type = 'click'),
p AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events
      WHERE event_type = 'purchase'),
j AS (
  SELECT c.user_id, c.event_id AS cid, p.event_id AS pid
  FROM c LEFT JOIN p ON c.user_id = p.user_id
                    AND p.us >= c.us AND p.us <= c.us + 1800000000)
SELECT user_id,
       CAST(COUNT(DISTINCT cid) AS BIGINT) AS n_clicks,
       CAST(COUNT(pid) AS BIGINT) AS n_pairs,
       CAST(COUNT(*) FILTER (WHERE pid IS NULL) AS BIGINT) AS n_unattributed
FROM j GROUP BY user_id
""",
)
def q_stream_stream_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream join end-to-end — the semantics where an
    unmatched click may only emit (null purchase) after the watermark
    proves no future purchase can land in its attribution window. End of
    stream is handled by the same two-phase sentinel staging as the
    windowed file sink: phase 2's far-future sentinel rows advance both
    sides' watermarks so every expired left row flushes
    (streaming.stream_join.attribution_join_outer_drain). The drained rows
    hash-match the batch LEFT JOIN oracle: matched pairs once each,
    unattributed clicks exactly once with nulls."""
    from sqlserver_cdc_to_kafka_spark.streaming.stream_join import (
        attribution_join_outer_drain,
    )

    pairs = attribution_join_outer_drain(spark, sf_dir)
    return pairs.groupBy("user_id").agg(
        F.count_distinct("click_id").alias("n_clicks"),
        F.count("purchase_id").alias("n_pairs"),
        F.count_if(F.col("purchase_id").isNull()).alias("n_unattributed"),
    )


@query(
    "stream_heavy_hitters_cms",
    oracle="""
WITH ds AS (SELECT unnest([0, 1, 2, 3]) AS depth),
inst AS (SELECT CAST(user_id AS VARCHAR) AS item, depth,
                CAST('0x' || substr(md5(CAST(depth AS VARCHAR) || ':' ||
                                        CAST(user_id AS VARCHAR)), 1, 8)
                     AS BIGINT) % 256 AS bucket
         FROM events, ds)
SELECT CAST(depth AS BIGINT) AS depth, CAST(bucket AS BIGINT) AS bucket,
       COUNT(*) AS total
FROM inst GROUP BY 1, 2
""",
)
def q_stream_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING count-min sketch: per event-time window the stream
    aggregates (window, depth, bucket) CMS counters through the append-mode
    parquet sink (same scale path as stream_windowed_counts_drain), then
    the per-window sketches MERGE BY ADDITION into the global sketch —
    which must equal, cell for cell, the batch-computed CMS the oracle
    builds arithmetically.  That equality is the entire point of CMS in a
    streaming engine: frequency tracking with fixed state per window
    (depth×width cells, regardless of key cardinality) and lossless
    cross-window merge.  Deterministic md5 row hashes (pipeline/sketch.py)
    make the sketch bit-identical on any engine."""
    from sqlserver_cdc_to_kafka_spark.pipeline.sketch import CMS_DEPTH, _cms_bucket
    from sqlserver_cdc_to_kafka_spark.streaming.windows import (
        windowed_counts_file_sink,
    )

    def agg_builder(ev: DataFrame) -> DataFrame:
        inst = (
            ev.withWatermark("event_time", "30 minutes")
            .select(
                F.col("user_id").cast("string").alias("item"), "event_time"
            )
            .withColumn("depth", F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))))
        )
        return (
            inst.withColumn("bucket", _cms_bucket(F.col("depth"), F.col("item")))
            .groupBy(F.window("event_time", "1 hour"), "depth", "bucket")
            .agg(F.count("*").alias("n"))
            .select(
                F.col("window.start").alias("window_start"), "depth", "bucket", "n"
            )
        )

    out = windowed_counts_file_sink(spark, sf_dir, agg_builder)
    return (
        out.groupBy("depth", "bucket")
        .agg(F.sum("n").cast("bigint").alias("total"))
        .select(F.col("depth").cast("bigint").alias("depth"), F.col("bucket").cast("bigint").alias("bucket"), "total")
    )


@query(
    "stream_funnel_stateful",
    oracle="""
WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
v AS (SELECT user_id, MIN(us) AS t1 FROM ev
      WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT ev.user_id, MIN(us) AS t2 FROM ev JOIN v USING (user_id)
      WHERE event_type = 'click' AND us >= t1 GROUP BY ev.user_id),
p AS (SELECT ev.user_id, MIN(us) AS t3 FROM ev JOIN c USING (user_id)
      WHERE event_type = 'purchase' AND us >= t2 GROUP BY ev.user_id)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS step, COUNT(*) AS n_users,
         CAST(SUM(t1) AS BIGINT) AS t_checksum FROM v
  UNION ALL
  SELECT 2, COUNT(*), CAST(SUM(t2) AS BIGINT) FROM c
  UNION ALL
  SELECT 3, COUNT(*), CAST(SUM(t3) AS BIGINT) FROM p) f
""",
)
def q_stream_funnel_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SECOND custom stateful streaming operator (the pattern generalizes
    beyond sessionization): per-user funnel STATE MACHINE via
    applyInPandasWithState — stage + last-completion-time carried in the
    state store, step completions emitted the micro-batch they happen.
    The drained completion stream must reproduce the batch funnel's
    first-completion semantics exactly — counts AND the summed completion
    times (t_checksum pins every per-user timestamp, not just
    cardinality) against the same min-aggregate-chain oracle as
    events_funnel_conversion."""
    import os
    import tempfile
    import uuid

    from sqlserver_cdc_to_kafka_spark.streaming.stateful import funnel_stateful
    from sqlserver_cdc_to_kafka_spark.streaming.windows import (
        parquet_row_count,
        read_events_stream,
        scoped_shuffle_partitions,
        state_partitions,
    )

    ev = read_events_stream(spark, sf_dir)
    stream = ev.select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros("event_time").alias("us"),
    )
    completions = funnel_stateful(stream)
    scratch = os.path.join(
        tempfile.gettempdir(), f"funneldrain_{uuid.uuid4().hex[:12]}"
    )
    outdir = os.path.join(scratch, "out")
    # r16: state partitions sized to the feed (see windows.state_partitions)
    with scoped_shuffle_partitions(
        spark,
        state_partitions(spark, parquet_row_count(f"{sf_dir}/events.parquet")),
    ):
        q = (
            completions.writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", os.path.join(scratch, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return drained(
        spark.read.parquet(outdir)
        .groupBy("step")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("at_us").cast("bigint").alias("t_checksum"),
        ),
        scratch,
    )


@query(
    "stream_dedup_within_watermark",
    oracle="""
WITH dup AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events
  UNION ALL
  SELECT user_id, event_type, event_id, epoch_us(ts) FROM events
  WHERE event_id % 3 = 0)
SELECT user_id, event_type, event_id, us
FROM dup GROUP BY user_id, event_type, event_id, us
""",
)
def q_stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``dropDuplicatesWithinWatermark`` end-to-end: the stream
    carries every third event DUPLICATED (the at-least-once redelivery
    shape), and the built-in watermark-bounded dedup must emit each
    event_id exactly once — hash-matched against the batch DISTINCT of
    the same duplicated input.  Unlike plain dropDuplicates (whose state
    grows with every key ever seen), the WithinWatermark form expires key
    state once the watermark passes it — the bounded-state guarantee that
    makes streaming dedup viable over an unbounded feed.  Drained through
    the append-mode parquet sink."""
    import os
    import tempfile
    import uuid

    from sqlserver_cdc_to_kafka_spark.streaming.windows import (
        parquet_row_count,
        read_events_stream,
        scoped_shuffle_partitions,
        state_partitions,
    )

    ev = read_events_stream(spark, sf_dir)
    base = ev.select(
        "user_id",
        "event_type",
        "event_id",
        "event_time",
        F.unix_micros("event_time").alias("us"),
    )
    dup_stream = base.unionByName(base.filter(F.col("event_id") % 3 == 0))
    deduped = (
        dup_stream.withWatermark("event_time", "30 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("user_id", "event_type", "event_id", "us")
    )
    scratch = os.path.join(
        tempfile.gettempdir(), f"dedupwm_{uuid.uuid4().hex[:12]}"
    )
    outdir = os.path.join(scratch, "out")
    # r16: state partitions sized to the feed (see windows.state_partitions)
    with scoped_shuffle_partitions(
        spark,
        state_partitions(spark, parquet_row_count(f"{sf_dir}/events.parquet")),
    ):
        q = (
            deduped.writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", os.path.join(scratch, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return drained(spark.read.parquet(outdir), scratch)


_DG_SHORT_US = 300_000_000  # 5 min gap for click bursts
_DG_LONG_US = 1_200_000_000  # 20 min gap otherwise


@query(
    "window_session_dynamic_gap",
    oracle=f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us,
         CASE WHEN event_type = 'click' THEN {_DG_SHORT_US}
              ELSE {_DG_LONG_US} END AS gap
  FROM events),
marked AS (
  SELECT user_id, us, gap,
         CASE WHEN lag(us + gap) OVER w IS NULL
              OR us >= max(us + gap) OVER (PARTITION BY user_id ORDER BY us
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                                    AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_sess
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY us)),
grouped AS (
  SELECT user_id, us, gap,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us
                             ROWS UNBOUNDED PRECEDING) AS sess
  FROM marked)
SELECT user_id,
       MIN(us) AS session_start_us,
       MAX(us + gap) AS session_end_us,
       COUNT(*) AS n_events
FROM grouped GROUP BY user_id, sess
""",
)
def q_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a PER-EVENT gap expression — clicks extend a
    session only 5 min, other events 20 min (burst interactions shouldn't
    hold a session open as long as a purchase does).  Spark's
    session_window accepts a gap COLUMN natively; the oracle reproduces
    the exact semantics with gaps-and-islands where a new session starts
    iff the event is at/after the MAX extent (us+gap) of all prior events
    — note max-of-prefix, not lag: a long-gap event can outlast several
    short-gap successors, which a lag-based oracle would get wrong."""
    ev = _events_with_time(spark, sf_dir)
    gap = F.when(
        F.col("event_type") == "click",
        F.expr(f"make_interval(0, 0, 0, 0, 0, 0, {_DG_SHORT_US / 1e6})"),
    ).otherwise(F.expr(f"make_interval(0, 0, 0, 0, 0, 0, {_DG_LONG_US / 1e6})"))
    return (
        ev.groupBy(F.session_window("event_time", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
            "n_events",
        )
    )


@query(
    "stream_markov_transitions_drain",
    oracle="""
WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
            FROM events),
seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY us, event_id) AS prev_type
  FROM ev),
t AS (SELECT prev_type, event_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
SELECT prev_type, event_type, CAST(n AS BIGINT) AS n,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY prev_type) AS BIGINT)
         AS prob_ppm
FROM t
""",
)
def q_stream_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING Markov transition matrix: events stream through the
    ``applyInPandasWithState`` transition operator (per-user last-event
    state carried across micro-batches, so boundary-straddling pairs are
    never lost), drain to an append-mode parquet sink, and the drained
    pair stream aggregates into the SAME matrix the batch lag() window
    produces — hash-exact, because unlike sessionization no transition is
    ever left open.  Types ride the state store as integer ranks (fixed-
    width state rows); the rank→name map is a sorted 5-element broadcast."""
    import os
    import tempfile
    import uuid

    from sqlserver_cdc_to_kafka_spark.streaming.stateful import (
        markov_transitions_stateful,
    )
    from sqlserver_cdc_to_kafka_spark.streaming.windows import (
        parquet_row_count,
        read_events_stream,
        scoped_shuffle_partitions,
        state_partitions,
    )

    types = tuple(
        r.event_type
        for r in load_table(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .orderBy("event_type")
        .collect()
    )
    ev = read_events_stream(spark, sf_dir)
    stream = ev.select(
        "user_id",
        "event_type",
        F.unix_micros("event_time").alias("us"),
        "event_id",
    )
    pairs = markov_transitions_stateful(stream, types)
    import shutil

    scratch = os.path.join(
        tempfile.gettempdir(), f"markovdrain_{uuid.uuid4().hex[:12]}"
    )
    outdir = os.path.join(scratch, "out")
    try:
        # r16: state partitions sized to the feed (windows.state_partitions)
        with scoped_shuffle_partitions(
            spark,
            state_partitions(
                spark, parquet_row_count(f"{sf_dir}/events.parquet")
            ),
        ):
            q = (
                pairs.writeStream.format("parquet")
                .option("path", outdir)
                .option("checkpointLocation", os.path.join(scratch, "ckpt"))
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        drained = spark.read.parquet(outdir)
        names = spark.createDataFrame(
            [(i, t) for i, t in enumerate(types)], "r long, name string"
        )
        t = (
            drained.join(
                names.select(
                    F.col("r").alias("prev_rank"),
                    F.col("name").alias("prev_type"),
                ),
                "prev_rank",
            )
            .join(
                names.select(
                    F.col("r").alias("curr_rank"),
                    F.col("name").alias("event_type"),
                ),
                "curr_rank",
            )
            .groupBy("prev_type", "event_type")
            .agg(F.count("*").cast("bigint").alias("n"))
        )
        # materialize the bounded |types|² matrix before the scratch dir is
        # removed — the parquet read is lazy, so the plan must not outlive it
        rows = t.select(
            "prev_type",
            "event_type",
            "n",
            F.expr(
                "cast(n * 1000000 div sum(n) over (partition by prev_type)"
                " as bigint)"
            ).alias("prob_ppm"),
        ).collect()
        return spark.createDataFrame(
            rows,
            "prev_type string, event_type string, n bigint, prob_ppm bigint",
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
