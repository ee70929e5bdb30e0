"""Append-mode windowed file sink: exactly-once across restarts.

The scale path for streaming window aggregation (readStream → watermark →
window → append-mode parquet sink + checkpoint; see
streaming.windows.windowed_counts_file_sink) must emit each window exactly
once even when the stream is stopped and resumed mid-corpus — state for
windows still open at shutdown lives in the checkpoint and merges with
post-restart events.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
    as_event_time,
    epoch_micros,
)
from sqlserver_cdc_to_kafka_spark.tables import load_table

_HOUR_US = 3_600_000_000


def _write_single_parquet(df, directory, name):
    tmp = os.path.join(directory, f"_tmp_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.startswith("part-") and f.endswith(".parquet"))
    os.makedirs(os.path.join(directory, "src"), exist_ok=True)
    dst = os.path.join(directory, "src", name)
    shutil.copyfile(os.path.join(tmp, part), dst)
    return dst


def _run_available_now(spark, src, ckpt, out, schema):
    raw = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    events = raw.withColumn("event_time", as_event_time(raw, "ts"))
    agg = (
        events.withWatermark("event_time", "30 minutes")
        .groupBy(F.window("event_time", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"), "event_type", "n"
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_windowed_file_sink_exactly_once_across_restart(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    with_us = ev.withColumn("us", epoch_micros(ev, "ts"))
    cut = with_us.approxQuantile("us", [0.5], 0.001)[0]
    base = str(tmp_path)
    first = with_us.filter(F.col("us") <= cut).drop("us")
    second = with_us.filter(F.col("us") > cut).drop("us")

    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    out = os.path.join(base, "out")
    schema = first.schema

    # phase 1: only the first half present; run to completion and stop
    _write_single_parquet(first, base, "a_first.parquet")
    _run_available_now(spark, src, ckpt, out, schema)

    # phase 2 (the "restart"): second half + a far-future sentinel that
    # advances the watermark past every real window; same checkpoint
    max_us = with_us.agg(F.max("us")).collect()[0][0]
    sentinel_us = (max_us // _HOUR_US + 3) * _HOUR_US
    sent = spark.createDataFrame(
        [tuple(None for _ in schema.fields)], schema
    ).select(
        *[
            (
                F.lit(sentinel_us).cast("bigint")
                if f.name == "ts" and f.dataType.simpleString() == "bigint"
                else F.timestamp_micros(F.lit(sentinel_us)).cast(f.dataType)
                if f.name == "ts"
                else F.col(f.name)
            ).alias(f.name)
            for f in schema.fields
        ]
    )
    _write_single_parquet(second, base, "b_second.parquet")
    _run_available_now(spark, src, ckpt, out, schema)

    # phase 3: sentinel staged ONLY after the real batches committed — the
    # explicit two-phase ordering the production sink uses (no mtime nudge)
    _write_single_parquet(sent, base, "z_sentinel.parquet")
    _run_available_now(spark, src, ckpt, out, schema)

    got = (
        spark.read.parquet(out)
        .filter(F.unix_micros("window_start") < sentinel_us // _HOUR_US * _HOUR_US)
    )
    # exactly once: no (window, event_type) key emitted twice across phases
    assert (
        got.groupBy("window_start", "event_type")
        .count()
        .filter(F.col("count") > 1)
        .count()
        == 0
    )
    # complete: equals the batch aggregation over the full corpus — incl.
    # windows spanning the restart (state merged via the checkpoint)
    ev2 = load_table(spark, sf_dir, "events")
    want = (
        ev2.withColumn("event_time", as_event_time(ev2, "ts"))
        .groupBy(F.window("event_time", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n")
    )
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_windowed_file_sink_multi_file_source(spark, sf_dir, tmp_path):
    """Multi-file real source in ONE pass: both halves staged together (in
    adversarial name/mtime order), sentinel staged in a second pass. The
    two-phase design must flush every real window regardless of how the
    real files are ordered within their pass."""
    ev = load_table(spark, sf_dir, "events")
    with_us = ev.withColumn("us", epoch_micros(ev, "ts"))
    cut = with_us.approxQuantile("us", [0.5], 0.001)[0]
    base = str(tmp_path)
    schema = ev.schema

    # stage BOTH real files before any pass; give the later-data file the
    # OLDER mtime so an mtime-ordered reader would process it first
    pa = _write_single_parquet(
        with_us.filter(F.col("us") > cut).drop("us"), base, "a_late_data.parquet"
    )
    pb = _write_single_parquet(
        with_us.filter(F.col("us") <= cut).drop("us"), base, "b_early_data.parquet"
    )
    os.utime(pa, (os.path.getmtime(pb) - 100, os.path.getmtime(pb) - 100))

    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    out = os.path.join(base, "out")
    _run_available_now(spark, src, ckpt, out, schema)

    max_us = with_us.agg(F.max("us")).collect()[0][0]
    sentinel_us = (max_us // _HOUR_US + 3) * _HOUR_US
    sent = spark.createDataFrame(
        [tuple(None for _ in schema.fields)], schema
    ).select(
        *[
            (
                F.lit(sentinel_us).cast("bigint")
                if f.name == "ts" and f.dataType.simpleString() == "bigint"
                else F.timestamp_micros(F.lit(sentinel_us)).cast(f.dataType)
                if f.name == "ts"
                else F.col(f.name)
            ).alias(f.name)
            for f in schema.fields
        ]
    )
    _write_single_parquet(sent, base, "z_sentinel.parquet")
    _run_available_now(spark, src, ckpt, out, schema)

    got = spark.read.parquet(out).filter(
        F.unix_micros("window_start") < sentinel_us // _HOUR_US * _HOUR_US
    )
    want = (
        ev.withColumn("event_time", as_event_time(ev, "ts"))
        .groupBy(F.window("event_time", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n")
    )
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
