"""Schema-contract guard against testdata drift.

Round-4 postmortem: the driver's ``events.parquet`` migrated its ``ts``
column from TIMESTAMP(NANOS) (surfaced as epoch-nanos LONG via nanosAsLong)
to plain TIMESTAMP micros. Code that hard-coded one form either raised
(AnalysisException on ``ts div 1000``) or — worse — silently collapsed every
event toward 1970 via an explicit-but-wrong readStream schema. The oracle
could not catch the silent case because the engine's own read path was wrong
on both sides of nothing: these tests pin the contract instead.

Contract: every table loads; every time column goes through
``functions.datetime_fns`` dispatch, which must produce identical epochs for
ALL representational forms of the same instant (LONG nanos, TIMESTAMP_NTZ,
TIMESTAMP).
"""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
    as_event_time,
    epoch_micros,
)
from sqlserver_cdc_to_kafka_spark.tables import TABLES, load_table


def test_all_tables_load_with_nonempty_schema(spark, sf_dir):
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        assert len(df.schema.fields) > 0, name
        assert df.limit(1).count() == 1, f"{name} is empty"


def test_events_ts_dispatch_handles_actual_schema(spark, sf_dir):
    """Whatever dtype the CURRENT testdata carries for events.ts, the
    dispatch must accept it and produce sane (post-2000, pre-2100) epochs —
    this is the test that fails if anyone reintroduces a hard-coded form."""
    ev = load_table(spark, sf_dir, "events")
    dt = ev.schema["ts"].dataType
    assert isinstance(dt, (T.LongType, T.TimestampType, T.TimestampNTZType)), dt
    row = ev.select(
        F.min(epoch_micros(ev, "ts")).alias("lo"),
        F.max(epoch_micros(ev, "ts")).alias("hi"),
    ).collect()[0]
    us_2000 = 946_684_800_000_000
    us_2100 = 4_102_444_800_000_000
    assert us_2000 < row["lo"] <= row["hi"] < us_2100, (
        f"epoch range [{row['lo']}, {row['hi']}] implausible — "
        "ts dtype dispatch is misinterpreting the raw values"
    )
    # the window-function form must agree with the epoch form
    et = ev.select(F.unix_micros(as_event_time(ev, "ts")).alias("us"))
    assert et.agg(F.min("us")).collect()[0][0] == row["lo"]


def test_dispatch_identical_across_all_ts_forms(spark):
    """One instant, three representations → one epoch. Fails if dispatch
    hard-codes either the nanos-LONG or the TIMESTAMP form."""
    instant = datetime.datetime(2024, 3, 1, 12, 34, 56, 789012)
    want_us = int(instant.replace(tzinfo=datetime.timezone.utc).timestamp() * 1e6)

    forms = {
        "long_nanos": spark.createDataFrame(
            [Row(ts=want_us * 1000)],
            T.StructType([T.StructField("ts", T.LongType())]),
        ),
        "timestamp_ntz": spark.createDataFrame(
            [Row(ts=instant)],
            T.StructType([T.StructField("ts", T.TimestampNTZType())]),
        ),
        "timestamp": spark.createDataFrame(
            [Row(ts=instant.replace(tzinfo=datetime.timezone.utc))],
            T.StructType([T.StructField("ts", T.TimestampType())]),
        ),
    }
    for label, df in forms.items():
        got = df.select(epoch_micros(df, "ts").alias("us")).collect()[0]["us"]
        assert got == want_us, f"{label}: {got} != {want_us}"
        got_et = df.select(
            F.unix_micros(as_event_time(df, "ts")).alias("us")
        ).collect()[0]["us"]
        assert got_et == want_us, f"{label} (as_event_time): {got_et} != {want_us}"


def test_streaming_schema_derived_from_file_not_hardcoded(spark, sf_dir):
    """The readStream schema must equal the batch-read schema of the actual
    fixture — an explicit schema that diverges reinterprets raw bytes
    without error (the r4 silent-corruption mode)."""
    from sqlserver_cdc_to_kafka_spark.streaming.windows import events_schema

    batch = load_table(spark, sf_dir, "events").schema
    assert events_schema(spark, sf_dir) == batch
