"""Watermarked stream-stream joins — the last of Structured Streaming's
stateful join surfaces (tumbling/sliding/session windows, stateful
sessionize, and stream-static joins live in the sibling modules).

An inner stream-stream join with an event-time range condition emits each
matched pair exactly once, as soon as both sides have arrived; the
watermarks bound HOW LONG each side's rows are retained in the state store
— without them state grows forever on an unbounded stream. That retention
bound is the whole 100 TB story: state is O(rows inside the watermark
horizon), not O(stream length).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import as_event_time
from sqlserver_cdc_to_kafka_spark.streaming.windows import events_schema


def attribution_join_drain(
    spark: SparkSession,
    sf_dir: str,
    left_type: str = "click",
    right_type: str = "purchase",
    horizon_micros: int = 1_800_000_000,  # 30 min attribution window
    watermark: str = "30 minutes",
) -> DataFrame:
    """Drive a click→purchase attribution stream-stream join end-to-end and
    return the drained matched pairs as a batch DataFrame.

    Both sides stream from the same staged events file(s); each is filtered
    to its event type, watermarked, and inner-joined on user plus the
    event-time range [click, click + horizon]. Matched pairs append to a
    parquet sink (exactly once per pair); state for rows older than the
    watermark is dropped by the state store, which is what makes the join
    runnable on an unbounded stream."""
    scratch = os.path.join(tempfile.gettempdir(), f"ssj2_{uuid.uuid4().hex[:12]}")
    stage = os.path.join(scratch, "src")
    outdir = os.path.join(scratch, "out")
    ckpt = os.path.join(scratch, "ckpt")
    os.makedirs(stage)

    import shutil

    shutil.copyfile(f"{sf_dir}/events.parquet", os.path.join(stage, "events.parquet"))
    schema = events_schema(spark, sf_dir)

    def side(event_type: str, prefix: str) -> DataFrame:
        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        return (
            raw.withColumn("event_time", as_event_time(raw, "ts"))
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("event_time").alias(f"{prefix}_time"),
            )
            .withWatermark(f"{prefix}_time", watermark)
        )

    a, b = side(left_type, "a"), side(right_type, "b")
    joined = a.join(
        b,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("b_time") >= F.col("a_time"))
        & (
            F.col("b_time")
            <= F.col("a_time") + F.expr(f"INTERVAL {horizon_micros} MICROSECOND")
        ),
    ).select(
        F.col("a_user").alias("user_id"),
        F.col("a_id").alias("click_id"),
        F.col("b_id").alias("purchase_id"),
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(outdir)
