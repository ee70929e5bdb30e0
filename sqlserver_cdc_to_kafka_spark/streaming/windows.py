"""Real Structured Streaming wrappers over the `events` fixture: watermarked
event-time windows and streaming dedupe — capabilities the reference lacks
(SURVEY §2.9 note) that Spark provides natively (T1/T8 analogs).

The events parquet carries nanosecond timestamps (surfaced as epoch-nanos
LONG, see tables.load_table); these helpers rebuild a proper timestamp
column for watermarking."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def events_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),  # epoch nanos (nanosAsLong)
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read of the events table (file micro-batch source) with a
    real TimestampType event-time column for watermarking."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The fixture is a single parquet file but FileStreamSource requires a
    # directory (it forces basePath to the stream path internally), so stage
    # the file into a scratch directory and stream that.
    src = f"{sf_dir}/events.parquet"
    stage = os.path.join(tempfile.gettempdir(), "spark_events_stream", sf_dir.strip("/").replace("/", "_"))
    os.makedirs(stage, exist_ok=True)
    dst = os.path.join(stage, "events.parquet")
    if not os.path.exists(dst):
        shutil.copyfile(src, dst)
    raw = (
        spark.readStream.schema(events_schema())
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    return raw.withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )


def windowed_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window aggregation (late data beyond the
    watermark is dropped — the reference's T8 'lateness' analog)."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window_duration), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def streaming_dedupe(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """T9 analog: drop duplicate event ids within the watermark horizon
    (the reference's capture-instance-overlap dedupe, restated as
    dropDuplicates on the stream)."""
    return events.withWatermark("event_time", watermark).dropDuplicates(["event_id"])


def run_stream_to_memory(df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming query to completion against the memory sink (test
    harness; production uses kafka/parquet sinks + checkpoints)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q
